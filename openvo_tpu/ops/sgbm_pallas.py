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


def _sweep_kernel(c_ref, out_ref, carry_ref, *, xshifts, p1, p2):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        carry_ref[...] = jnp.full(carry_ref.shape, BIG, carry_ref.dtype)

    c = c_ref[0]  # (N1, D)
    n1, d = c.shape
    x_idx = jax.lax.broadcasted_iota(jnp.int32, (n1, 1), 0)
    d_idx = jax.lax.broadcasted_iota(jnp.int32, (1, d), 1)

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
    out_ref[0] = total


def sweep(cost, xshifts, p1: float, p2: float, reverse: bool):
    """One aggregation sweep along axis 0 of (N0, N1, D) ``cost``; returns
    the sum of the path costs of the given directions (axis-1 shifts)."""
    n0, n1, d = cost.shape
    if reverse:
        imap = lambda i: (n0 - 1 - i, 0, 0)  # noqa: E731
    else:
        imap = lambda i: (i, 0, 0)  # noqa: E731

    kernel = functools.partial(
        _sweep_kernel, xshifts=tuple(xshifts), p1=float(p1), p2=float(p2)
    )
    return pl.pallas_call(
        kernel,
        grid=(n0,),
        in_specs=[pl.BlockSpec((1, n1, d), imap, memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, n1, d), imap, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n0, n1, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((len(xshifts), n1, d), jnp.float32)],
    )(cost.astype(jnp.float32))


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
