"""Pallas TPU kernels for SGM path-cost aggregation + fused WTA.

The directional recurrence

    L_r(p, d) = C(p, d) + min(L_r(p-r, d), L_r(p-r, d+/-1) + P1,
                              min_k L_r(p-r, k) + P2) - min_k L_r(p-r, k)

is a scan along rows or columns of the (H, W, D) cost volume. Each scan
becomes a *sequential Pallas grid*: grid steps run in order on the core, so
the per-direction L state lives in a VMEM scratch buffer that carries from
one step to the next, and each step is pure VPU work with D on the lane axis
(D is a multiple of 16, typically 128 = one lane register row).

Memory-traffic design (the round-2 rewrite; the whole 500 fps budget runs
through this file):

 - **No transposes.** Horizontal paths scan a grid over W with (H, g, D)
   column blocks; vertical paths scan a grid over H with (g, W, D) row
   blocks. The volume is never reshuffled in HBM.
 - **Directional sums accumulate across sweeps.** Every sweep takes the
   previous partial sum as an input block and writes partial+own; separate
   per-sweep S volumes are never materialized and never added in XLA.
 - **Integer exactness.** For int16 x2-grid costs (see sgbm.bt_cost_volume)
   all kernel arithmetic runs in int32 with penalties scaled x2; the partial
   sum is stored as int16 whenever the static bound
   n_dirs * (cost_max + 2*P2) <= 32767 allows (true for the default 5-path
   config), else int32. No rounding anywhere.
 - **WTA fused into the final sweep.** The last sweep is always a vertical
   one; when it reaches row r, the total S row is complete in registers, so
   WTA + uniqueness + subpixel + left-right check run in-kernel and only the
   (H, W) disparity/valid maps are written. The full f32 S volume
   (239 MB at KITTI res) never exists.

This replaces the hot loop of OpenCV's SGBM C++ aggregation (reference
stereo_camera.py:51 via cv2.StereoSGBM.compute; SURVEY.md N4 north-star).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG_F = 1e9      # plain floats: jnp scalars would be captured consts
BIG_I = 1 << 28  # headroom: BIG_I + 2*P2 stays far below int31


def _big(dtype):
    return BIG_I if jnp.issubdtype(dtype, jnp.integer) else BIG_F


def _to_acc(x, int_mode):
    """Load-convert a block to the accumulation dtype (int32 or f32)."""
    if int_mode:
        return x.astype(jnp.int32)
    return x.astype(jnp.float32)


def _dir_update(prev, c, d_idx, d, p1, p2, big):
    """One SGM recurrence step for one direction: (prev L row, cost row) ->
    new L row. All shapes (*, D)."""
    minprev = jnp.min(prev, axis=-1, keepdims=True)
    up = jnp.where(d_idx < 1, big, jnp.roll(prev, 1, axis=-1))
    dn = jnp.where(d_idx >= d - 1, big, jnp.roll(prev, -1, axis=-1))
    cand = jnp.minimum(prev, jnp.minimum(up, dn) + p1)
    cand = jnp.minimum(cand, minprev + p2)
    return c + cand - minprev


# ---------------------------------------------------------------------------
# Horizontal sweeps: grid over W, (H, g, D) column blocks, carry (1, H, D).
# ---------------------------------------------------------------------------


def _sweep_h_kernel(*refs, p1, p2, g, reverse, int_mode, has_acc):
    if has_acc:
        c_ref, acc_ref, out_ref, carry_ref = refs
    else:
        c_ref, out_ref, carry_ref = refs
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        carry_ref[...] = jnp.full(carry_ref.shape, _big(carry_ref.dtype),
                                  carry_ref.dtype)

    d = c_ref.shape[2]
    d_idx = jax.lax.broadcasted_iota(jnp.int32, (1, d), 1)
    big = _big(carry_ref.dtype)
    cols = range(g - 1, -1, -1) if reverse else range(g)
    for j in cols:
        c = _to_acc(c_ref[:, j, :], int_mode)
        L = _dir_update(carry_ref[0], c, d_idx, d, p1, p2, big)
        carry_ref[0] = L
        total = L
        if has_acc:
            total = total + _to_acc(acc_ref[:, j, :], int_mode)
        out_ref[:, j, :] = total.astype(out_ref.dtype)


def sweep_h(cost, p1, p2, reverse: bool, accum=None, out_dtype=None,
            g: int = 16):
    # g=16 default: the (H, g, D) blocks' tiled dims are (g, D), and int16
    # tiles need >= 16 sublanes.
    """One horizontal path sweep (left->right or right->left) over the
    (H, W, D) volume; returns own-L (+ accum if given) as an (H, W, D)
    volume of ``out_dtype``. Zero-padded columns are semantically
    transparent to the carry (fresh-start state)."""
    h, w, d = cost.shape
    int_mode = cost.dtype == jnp.int16
    acc_dtype = jnp.int32 if int_mode else jnp.float32
    if out_dtype is None:
        out_dtype = acc_dtype
    wp = -(-w // g) * g
    if wp != w:
        padc = jnp.zeros((h, wp - w, d), cost.dtype)
        parts = [cost, padc] if not reverse else [padc, cost]
        cost = jnp.concatenate(parts, axis=1)
        if accum is not None:
            pada = jnp.zeros((h, wp - w, d), accum.dtype)
            parts = [accum, pada] if not reverse else [pada, accum]
            accum = jnp.concatenate(parts, axis=1)
    nblocks = wp // g
    if reverse:
        imap = lambda i: (0, nblocks - 1 - i, 0)  # noqa: E731
    else:
        imap = lambda i: (0, i, 0)  # noqa: E731

    kernel = functools.partial(
        _sweep_h_kernel, p1=p1, p2=p2, g=g, reverse=reverse,
        int_mode=int_mode, has_acc=accum is not None,
    )
    spec = pl.BlockSpec((h, g, d), imap, memory_space=pltpu.VMEM)
    in_specs = [spec] if accum is None else [spec, spec]
    args = (cost,) if accum is None else (cost, accum)
    out = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=in_specs,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((h, wp, d), out_dtype),
        scratch_shapes=[pltpu.VMEM((1, h, d), acc_dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*args)
    if wp != w:
        out = out[:, :w] if not reverse else out[:, wp - w:]
    return out


# ---------------------------------------------------------------------------
# Vertical sweeps: grid over H, (g, W, D) row blocks, carry (ndirs, W, D).
# Diagonal directions are the same scan with a per-row x-shift of the carry.
# ---------------------------------------------------------------------------


def _shift_carry(prev, k, x_idx, n1, big):
    if k == 0:
        return prev
    out = jnp.roll(prev, k, axis=0)
    if k > 0:
        return jnp.where(x_idx < k, big, out)
    return jnp.where(x_idx >= n1 + k, big, out)


def _sweep_v_kernel(*refs, xshifts, p1, p2, g, reverse, int_mode, has_acc):
    if has_acc:
        c_ref, acc_ref, out_ref, carry_ref = refs
    else:
        c_ref, out_ref, carry_ref = refs
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        carry_ref[...] = jnp.full(carry_ref.shape, _big(carry_ref.dtype),
                                  carry_ref.dtype)

    n1, d = c_ref.shape[1], c_ref.shape[2]
    x_idx = jax.lax.broadcasted_iota(jnp.int32, (n1, 1), 0)
    d_idx = jax.lax.broadcasted_iota(jnp.int32, (1, d), 1)
    big = _big(carry_ref.dtype)
    rows = range(g - 1, -1, -1) if reverse else range(g)
    for r in rows:
        c = _to_acc(c_ref[r], int_mode)
        total = None
        for j, k in enumerate(xshifts):
            prev = _shift_carry(carry_ref[j], k, x_idx, n1, big)
            L = _dir_update(prev, c, d_idx, d, p1, p2, big)
            carry_ref[j] = L
            total = L if total is None else total + L
        if has_acc:
            total = total + _to_acc(acc_ref[r], int_mode)
        out_ref[r] = total.astype(out_ref.dtype)


def sweep_v(cost, xshifts, p1, p2, reverse: bool, accum=None, out_dtype=None,
            g: int = 4):
    """Vertical sweep (top-down or bottom-up) aggregating up to three
    same-orientation directions (axis-1 shifts), plus the running partial."""
    n0, n1, d = cost.shape
    int_mode = cost.dtype == jnp.int16
    acc_dtype = jnp.int32 if int_mode else jnp.float32
    if out_dtype is None:
        out_dtype = acc_dtype
    n0p = -(-n0 // g) * g
    if n0p != n0:
        padc = jnp.zeros((n0p - n0, n1, d), cost.dtype)
        cost = jnp.concatenate([cost, padc] if not reverse else [padc, cost],
                               axis=0)
        if accum is not None:
            pada = jnp.zeros((n0p - n0, n1, d), accum.dtype)
            accum = jnp.concatenate(
                [accum, pada] if not reverse else [pada, accum], axis=0)
    nblocks = n0p // g
    if reverse:
        imap = lambda i: (nblocks - 1 - i, 0, 0)  # noqa: E731
    else:
        imap = lambda i: (i, 0, 0)  # noqa: E731

    kernel = functools.partial(
        _sweep_v_kernel, xshifts=tuple(xshifts), p1=p1, p2=p2, g=g,
        reverse=reverse, int_mode=int_mode, has_acc=accum is not None,
    )
    spec = pl.BlockSpec((g, n1, d), imap, memory_space=pltpu.VMEM)
    in_specs = [spec] if accum is None else [spec, spec]
    args = (cost,) if accum is None else (cost, accum)
    out = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=in_specs,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((n0p, n1, d), out_dtype),
        scratch_shapes=[pltpu.VMEM((len(xshifts), n1, d), acc_dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*args)
    if n0p != n0:
        out = out[:n0] if not reverse else out[n0p - n0:]
    return out


# ---------------------------------------------------------------------------
# WTA post-processing (in-register, row-local) + the fused final sweep.
# ---------------------------------------------------------------------------


def _shear_x_block(vol, sign: int, fill, axis: int = 0):
    """In-register per-lane shear of a (W, D) block along the W axis (same
    log-shift trick as sgbm._shear_x, usable inside kernels)."""
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


def _wta_row(s, min_disp, uniq, lr_max_diff):
    """WTA + uniqueness + parabolic subpixel + left-right check on one
    aggregated row s (W, D) float32. Mirrors sgbm._wta/_lr_check semantics
    exactly; scale-invariant, so it works on the x2 cost grid unchanged.
    Returns (disp16 (W, 1) int32, valid (W, 1) bool)."""
    w, d = s.shape
    d_idx = jax.lax.broadcasted_iota(jnp.int32, (w, d), 1)
    x_idx = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0)

    min_s = jnp.min(s, axis=-1, keepdims=True)
    # argmin via index-min trick (first minimum wins, like jnp.argmin)
    best = jnp.min(jnp.where(s == min_s, d_idx, d), axis=-1, keepdims=True)

    valid = jnp.ones((w, 1), jnp.bool_)
    if uniq > 0:
        far = jnp.abs(d_idx - best) > 1
        bad = jnp.any(far & (s * (100.0 - uniq) < min_s * 100.0),
                      axis=-1, keepdims=True)
        valid &= ~bad

    s_m = jnp.sum(jnp.where(d_idx == jnp.maximum(best - 1, 0), s, 0.0),
                  axis=-1, keepdims=True)
    s_p = jnp.sum(jnp.where(d_idx == jnp.minimum(best + 1, d - 1), s, 0.0),
                  axis=-1, keepdims=True)
    denom = s_m + s_p - 2.0 * min_s
    interior = (best > 0) & (best < d - 1) & (denom > 0)
    frac = jnp.where(interior, (s_m - s_p) / jnp.maximum(2.0 * denom, 1e-9),
                     0.0)
    frac = jnp.clip(frac, -0.5, 0.5)
    d_float = best.astype(jnp.float32) + frac + float(min_disp)
    disp16 = jnp.round(d_float * 16.0).astype(jnp.int32)

    if lr_max_diff >= 0:
        # Right-view WTA from the same volume: costR(x, d) = S(x+d, d).
        cost_r = _shear_x_block(s, -1, BIG_F, axis=0)
        minr = jnp.min(cost_r, axis=-1, keepdims=True)
        best_r = jnp.min(jnp.where(cost_r == minr, d_idx, d), axis=-1,
                         keepdims=True)
        # dR(x) = bestR[x - best(x)]: shear the bestR column across lanes,
        # select lane `best`.
        br = jnp.broadcast_to(best_r, (w, d)).astype(jnp.int32)
        shifted = _shear_x_block(br, +1, -(1 << 20), axis=0)
        d_r = jnp.sum(jnp.where(d_idx == best, shifted, 0), axis=-1,
                      keepdims=True)
        valid &= jnp.abs(best - d_r) <= lr_max_diff
    # No full-range right support on the left band.
    valid &= (x_idx - (best + min_disp)) >= 0
    return disp16, valid


def _sweep_v_wta_kernel(c_ref, acc_ref, disp_ref, valid_ref, carry_ref, *,
                        xshifts, p1, p2, g, reverse, int_mode,
                        min_disp, uniq, lr_max_diff):
    """Final vertical sweep fused with WTA: when this sweep reaches a row,
    the total S row is complete (all other directions' sums arrive via
    acc_ref), so the disparity is produced in-register and S never exists
    in HBM."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        carry_ref[...] = jnp.full(carry_ref.shape, _big(carry_ref.dtype),
                                  carry_ref.dtype)

    n1, d = c_ref.shape[1], c_ref.shape[2]
    x_idx = jax.lax.broadcasted_iota(jnp.int32, (n1, 1), 0)
    d_idx = jax.lax.broadcasted_iota(jnp.int32, (1, d), 1)
    big = _big(carry_ref.dtype)
    rows = range(g - 1, -1, -1) if reverse else range(g)
    for r in rows:
        c = _to_acc(c_ref[r], int_mode)
        total = _to_acc(acc_ref[r], int_mode)
        for j, k in enumerate(xshifts):
            prev = _shift_carry(carry_ref[j], k, x_idx, n1, big)
            L = _dir_update(prev, c, d_idx, d, p1, p2, big)
            carry_ref[j] = L
            total = total + L
        # All-dtype-exact: x2-grid path costs stay far below 2^24.
        disp16, valid = _wta_row(total.astype(jnp.float32), min_disp, uniq,
                                 lr_max_diff)
        disp_ref[r] = disp16[:, 0]
        valid_ref[r] = valid[:, 0].astype(jnp.int32)


def sweep_v_wta(cost, xshifts, p1, p2, reverse: bool, accum, params,
                g: int = 8):
    """Final fused sweep: returns (disp16 int32 (H, W), valid bool (H, W))."""
    n0, n1, d = cost.shape
    int_mode = cost.dtype == jnp.int16
    acc_dtype = jnp.int32 if int_mode else jnp.float32
    n0p = -(-n0 // g) * g
    if n0p != n0:
        padc = jnp.zeros((n0p - n0, n1, d), cost.dtype)
        cost = jnp.concatenate([cost, padc] if not reverse else [padc, cost],
                               axis=0)
        pada = jnp.zeros((n0p - n0, n1, d), accum.dtype)
        accum = jnp.concatenate(
            [accum, pada] if not reverse else [pada, accum], axis=0)
    nblocks = n0p // g
    if reverse:
        imap3 = lambda i: (nblocks - 1 - i, 0, 0)  # noqa: E731
        imap2 = lambda i: (nblocks - 1 - i, 0)  # noqa: E731
    else:
        imap3 = lambda i: (i, 0, 0)  # noqa: E731
        imap2 = lambda i: (i, 0)  # noqa: E731

    kernel = functools.partial(
        _sweep_v_wta_kernel, xshifts=tuple(xshifts), p1=p1, p2=p2, g=g,
        reverse=reverse, int_mode=int_mode,
        min_disp=int(params.min_disparity),
        uniq=float(params.uniqueness_ratio),
        lr_max_diff=int(params.disp12_max_diff),
    )
    spec3 = pl.BlockSpec((g, n1, d), imap3, memory_space=pltpu.VMEM)
    spec2 = pl.BlockSpec((g, n1), imap2, memory_space=pltpu.VMEM)
    disp16, valid = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[spec3, spec3],
        out_specs=(spec2, spec2),
        out_shape=(
            jax.ShapeDtypeStruct((n0p, n1), jnp.int32),
            jax.ShapeDtypeStruct((n0p, n1), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((len(xshifts), n1, d), acc_dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(cost, accum)
    if n0p != n0:
        sl = slice(None, n0) if not reverse else slice(n0p - n0, None)
        disp16, valid = disp16[sl], valid[sl]
    return disp16, valid.astype(bool)


def aggregate_wta(cost, params, cost_max: int | None):
    """Full SGM aggregation + WTA, fused: (H, W, D) block-summed cost ->
    (disp16 int32 (H, W), valid bool (H, W)).

    ``cost_max`` is the static per-element bound of the encoded cost volume
    (block_size^2 * sentinel for the int16 x2 grid; None for float32 costs).
    It sizes the partial-sum dtype: a partial over n directions fits int16
    iff n * (cost_max + 2*P2) <= 32767.
    """
    int_mode = cost.dtype == jnp.int16
    if int_mode:
        p1 = 2 * int(params.effective_p1)
        p2 = 2 * int(params.effective_p2)
        per_dir = int(cost_max) + p2

        def partial_dtype(ndirs):
            return jnp.int16 if ndirs * per_dir <= 32767 else jnp.int32
    else:
        p1 = float(params.effective_p1)
        p2 = float(params.effective_p2)

        def partial_dtype(ndirs):
            return jnp.float32

    # Horizontal pair: left->right, then right->left accumulating onto it.
    s1 = sweep_h(cost, p1, p2, False, out_dtype=partial_dtype(1))
    s2 = sweep_h(cost, p1, p2, True, accum=s1, out_dtype=partial_dtype(2))

    if params.num_paths == 5:
        # OpenCV MODE_SGBM-like: + up, up-left, up-right in the final sweep.
        return sweep_v_wta(cost, (0, 1, -1), p1, p2, False, s2, params)
    if params.num_paths == 4:
        s3 = sweep_v(cost, (0,), p1, p2, False, accum=s2,
                     out_dtype=partial_dtype(3))
        return sweep_v_wta(cost, (0,), p1, p2, True, s3, params)
    # 8 paths: top-down trio accumulates, bottom-up trio fuses WTA.
    s3 = sweep_v(cost, (0, 1, -1), p1, p2, False, accum=s2,
                 out_dtype=partial_dtype(5))
    return sweep_v_wta(cost, (0, 1, -1), p1, p2, True, s3, params)
