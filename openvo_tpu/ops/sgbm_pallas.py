"""Pallas TPU kernel for SGM path-cost aggregation.

The directional recurrence

    L_r(p, d) = C(p, d) + min(L_r(p-r, d), L_r(p-r, d+/-1) + P1,
                              min_k L_r(p-r, k) + P2) - min_k L_r(p-r, k)

is a scan along rows (or columns) of the (N0, N1, D) cost volume. The XLA
``lax.scan`` version in sgbm.py pays ~25us of loop overhead per step; here
the scan becomes a *sequential Pallas grid* over N0: grid steps run in order
on the core, so the per-direction L rows live in a VMEM scratch buffer that
carries state from one grid step to the next, and each step is pure VPU work
on a (N1, D) block with D on the lane axis (D is a multiple of 16, typically
128 = exactly one lane register row).

Up to three same-orientation directions (axis-1 shifts -1/0/+1) are computed
per sweep and their path costs summed on the fly — the individual L volumes
are never materialized. Reverse sweeps reuse the same kernel with a reversed
block index map.

This replaces the hot loop of OpenCV's SGBM C++ aggregation (reference
stereo_camera.py:51 via cv2.StereoSGBM.compute; SURVEY.md N4 north-star).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e9  # plain float: jnp scalars would be captured consts in the kernel


def _sweep_kernel(c_ref, out_ref, carry_ref, *, xshifts, p1, p2, g, reverse):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        carry_ref[...] = jnp.full(carry_ref.shape, BIG, carry_ref.dtype)

    n1, d = c_ref.shape[1], c_ref.shape[2]
    x_idx = jax.lax.broadcasted_iota(jnp.int32, (n1, 1), 0)
    d_idx = jax.lax.broadcasted_iota(jnp.int32, (1, d), 1)

    # G rows per grid step (amortizes per-step pipeline overhead); rows are
    # processed in sweep order within the block.
    rows = range(g - 1, -1, -1) if reverse else range(g)
    for r in rows:
        c = c_ref[r]
        if c.dtype == jnp.int16:
            # int16 x2-grid cost (see sgbm.bt_cost_volume): decode on load.
            c = c.astype(jnp.float32) * 0.5
        total = jnp.zeros_like(c)
        for j, k in enumerate(xshifts):
            prev = carry_ref[j]
            if k != 0:
                prev = jnp.roll(prev, k, axis=0)
                if k > 0:
                    prev = jnp.where(x_idx < k, BIG, prev)
                else:
                    prev = jnp.where(x_idx >= n1 + k, BIG, prev)
            minprev = jnp.min(prev, axis=-1, keepdims=True)
            up = jnp.where(d_idx < 1, BIG, jnp.roll(prev, 1, axis=-1))
            dn = jnp.where(d_idx >= d - 1, BIG, jnp.roll(prev, -1, axis=-1))
            cand = jnp.minimum(prev, jnp.minimum(up, dn) + p1)
            cand = jnp.minimum(cand, minprev + p2)
            L = c + cand - minprev
            carry_ref[j] = L
            total = total + L
        out_ref[r] = total


def _pick_g(n1: int, d: int, bytes_per_elem: int = 20, cap: int = 16) -> int:
    """Rows per grid step: as many as fit a ~12MB VMEM budget (input+output
    double buffers plus kernel temporaries ~ bytes_per_elem per element)."""
    return max(1, min(cap, int(12e6 // (bytes_per_elem * n1 * d))))


def sweep(cost, xshifts, p1: float, p2: float, reverse: bool, g: int | None = None):
    """One aggregation sweep along axis 0 of (N0, N1, D) ``cost``; returns
    the sum of the path costs of the given directions (axis-1 shifts).

    Processes ``g`` rows per sequential grid step. N0 is zero-padded to a
    multiple of g: a uniform-zero cost row leaves the carry in exactly the
    fresh-start state (L = cand - minprev = 0), so padding is semantically
    transparent for both sweep orders.
    """
    n0, n1, d = cost.shape
    if g is None:
        g = _pick_g(n1, d)
    n0p = -(-n0 // g) * g
    if cost.dtype not in (jnp.float32, jnp.int16):
        cost = cost.astype(jnp.float32)
    if n0p != n0:
        pad = jnp.zeros((n0p - n0, n1, d), cost.dtype)
        cost = jnp.concatenate([cost, pad] if not reverse else [pad, cost],
                               axis=0)
    nblocks = n0p // g
    if reverse:
        imap = lambda i: (nblocks - 1 - i, 0, 0)  # noqa: E731
    else:
        imap = lambda i: (i, 0, 0)  # noqa: E731

    kernel = functools.partial(
        _sweep_kernel, xshifts=tuple(xshifts), p1=float(p1), p2=float(p2),
        g=g, reverse=reverse,
    )
    out = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[pl.BlockSpec((g, n1, d), imap, memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((g, n1, d), imap, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n0p, n1, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((len(xshifts), n1, d), jnp.float32)],
    )(cost)
    if n0p != n0:
        out = out[:n0] if not reverse else out[n0p - n0:]
    return out


def aggregate_pallas(cost, num_paths: int, p1: float, p2: float):
    """Pallas version of sgbm.aggregate: sum over 4/5/8 directional sweeps."""
    costT = jnp.swapaxes(cost, 0, 1)

    def horiz(reverse):
        return jnp.swapaxes(sweep(costT, (0,), p1, p2, reverse), 0, 1)

    S = horiz(False) + horiz(True)
    if num_paths == 4:
        S += sweep(cost, (0,), p1, p2, False)
        S += sweep(cost, (0,), p1, p2, True)
    elif num_paths == 5:
        S += sweep(cost, (0, 1, -1), p1, p2, False)
    else:
        S += sweep(cost, (0, 1, -1), p1, p2, False)
        S += sweep(cost, (0, 1, -1), p1, p2, True)
    return S


def _shear_x_block(vol, sign: int, fill, axis: int = 0):
    """In-register per-lane shear of a (W, D) or (G, W, D) block along the
    W axis (same log-shift trick as sgbm._shear_x, usable inside kernels)."""
    w = vol.shape[axis]
    d = vol.shape[-1]
    lane_shape = [1] * vol.ndim
    lane_shape[-1] = d
    lane = jax.lax.broadcasted_iota(jnp.int32, tuple(lane_shape), vol.ndim - 1)
    x_shape = [1] * vol.ndim
    x_shape[axis] = w
    xs = jax.lax.broadcasted_iota(jnp.int32, tuple(x_shape), axis)
    out = vol
    k = 1
    while k < d:
        rolled = jnp.roll(out, sign * k, axis=axis)
        if sign < 0:
            rolled = jnp.where(xs >= w - k, fill, rolled)
        else:
            rolled = jnp.where(xs < k, fill, rolled)
        out = jnp.where((lane & k) != 0, rolled, out)
        k *= 2
    return out


def _wta_kernel(s_ref, disp_ref, valid_ref, *, min_disp, uniq, lr_max_diff, g):
    """Fused WTA + uniqueness + parabolic subpixel + left-right check.

    One pass over the aggregated volume S; emits the x16 int32 disparity grid
    and the validity mask. Mirrors sgbm._wta/_lr_check semantics exactly.
    """
    for r in range(g):
        s = s_ref[r]  # (W, D)
        w, d = s.shape
        d_idx = jax.lax.broadcasted_iota(jnp.int32, (w, d), 1)
        x_idx = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0)

        min_s = jnp.min(s, axis=-1, keepdims=True)
        # argmin via index-min trick (first minimum wins, like jnp.argmin)
        best = jnp.min(jnp.where(s == min_s, d_idx, d), axis=-1,
                       keepdims=True)

        valid = jnp.ones((w, 1), jnp.bool_)
        if uniq > 0:
            far = jnp.abs(d_idx - best) > 1
            bad = jnp.any(far & (s * (100.0 - uniq) < min_s * 100.0),
                          axis=-1, keepdims=True)
            valid &= ~bad

        s_m = jnp.sum(
            jnp.where(d_idx == jnp.maximum(best - 1, 0), s, 0.0),
            axis=-1, keepdims=True)
        s_p = jnp.sum(
            jnp.where(d_idx == jnp.minimum(best + 1, d - 1), s, 0.0),
            axis=-1, keepdims=True)
        min_s0 = min_s
        denom = s_m + s_p - 2.0 * min_s0
        interior = (best > 0) & (best < d - 1) & (denom > 0)
        frac = jnp.where(interior,
                         (s_m - s_p) / jnp.maximum(2.0 * denom, 1e-9), 0.0)
        frac = jnp.clip(frac, -0.5, 0.5)
        d_float = best.astype(jnp.float32) + frac + float(min_disp)
        disp16 = jnp.round(d_float * 16.0).astype(jnp.int32)

        if lr_max_diff >= 0:
            # Right-view WTA from the same volume: costR(x, d) = S(x+d, d).
            cost_r = _shear_x_block(s, -1, BIG, axis=0)
            minr = jnp.min(cost_r, axis=-1, keepdims=True)
            best_r = jnp.min(jnp.where(cost_r == minr, d_idx, d), axis=-1,
                             keepdims=True)
            # dR(x) = bestR[x - best(x)]: shear the bestR column across
            # lanes, select lane `best`.
            br = jnp.broadcast_to(best_r, (w, d)).astype(jnp.int32)
            shifted = _shear_x_block(br, +1, -(1 << 20), axis=0)
            d_r = jnp.sum(jnp.where(d_idx == best, shifted, 0), axis=-1,
                          keepdims=True)
            valid &= jnp.abs(best - d_r) <= lr_max_diff
        # No full-range right support on the left band.
        valid &= (x_idx - (best + min_disp)) >= 0

        disp_ref[r] = disp16[:, 0]
        valid_ref[r] = valid[:, 0].astype(jnp.int32)


def wta_pallas(S, params, g: int | None = None):
    """Fused Pallas WTA/post-processing pass over the aggregated volume.

    Returns (disp16 int32 (H, W), valid bool (H, W)); the uniqueness test,
    subpixel refinement, left-right check and left-band invalidation all
    happen inside the kernel in one pass over S.
    """
    h, w, d = S.shape
    if g is None:
        # 2-D output blocks need a sublane count divisible by 8.
        g = 8
    hp = -(-h // g) * g
    if hp != h:
        S = jnp.concatenate(
            [S, jnp.zeros((hp - h, w, d), S.dtype)], axis=0)
    kernel = functools.partial(
        _wta_kernel,
        min_disp=int(params.min_disparity),
        uniq=float(params.uniqueness_ratio),
        lr_max_diff=int(params.disp12_max_diff),
        g=g,
    )
    disp16, valid = pl.pallas_call(
        kernel,
        grid=(hp // g,),
        in_specs=[pl.BlockSpec((g, w, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((g, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((hp, w), jnp.int32),
            jax.ShapeDtypeStruct((hp, w), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(S.astype(jnp.float32))
    return disp16[:h], valid[:h].astype(bool)
