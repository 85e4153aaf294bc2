"""Pallas TPU kernel for steered-BRIEF window sampling.

The ORB descriptor stage samples each keypoint's blurred (39, 39) window at
512 rotated pattern positions (reference: cv2 ORB's GET_VALUE loop inside
detectAndCompute, stereo_odometer.py:117; SURVEY.md N7). The XLA form is
two (K, 256) take_along_axis gathers over (K, 1521) windows — and the
round-5 device trace priced them at 2.66 ms/frame (fusion.25/26, ~10 ns per
gathered element), over half the ORB budget.

Gather-free replacement: a rotated sample index is < 1521, so sampling is a
POSITION-ITERATED shift-select, the same trick as sgbm_pallas.lr_lookup —
for each reachable window position j, one vector compare (idx == j) and one
select against the broadcast window row j. Keypoints ride the LANE axis
(inputs arrive transposed) so every window row is one aligned (1, 128)
vector; per grid block of 128 keypoints the loop is ~2 VPU ops per position
on (512, 128) tiles: ~40 us/block vs ~670 us of gathers.

The iterated position set is the PROVABLY reachable subset of the 39x39
window: GET_VALUE rounds a rotation of a pattern point with |p| <=
sqrt(2)*13 = 18.3848, so each rounded coordinate is in [-18, 18] and the
rounded vector norm^2 is at most 338 + 2*18.3848*0.5*sqrt(2) + 0.5 < 365
(norm <= |Rp| + rounding displacement |e| <= 0.5*sqrt(2) per the triangle
inequality, coordinate-wise bound included) — 1143 of 1521 positions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.lru_cache(maxsize=None)
def reachable_positions(rw: int, max_norm2: int):
    """Flat indices j = (r + rw) * (2*rw+1) + (c + rw) of window positions
    with r, c in [-rw+1+?, ...]: all integer positions with
    r^2 + c^2 <= max_norm2, clipped to the window box."""
    size = 2 * rw + 1
    out = []
    for r in range(-rw, rw + 1):
        for c in range(-rw, rw + 1):
            if r * r + c * c <= max_norm2:
                out.append((r + rw) * size + (c + rw))
    return tuple(out)


def _brief_sample_kernel(win_ref, idx_ref, out_ref, *, positions):
    idx = idx_ref[...]
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    # Per-iteration REF row reads keep Mosaic's stack allocator to one
    # live buffer (cf. the lr_lookup stack-OOM note in sgbm_pallas).
    for j in positions:
        acc = jnp.where(idx == j, win_ref[j:j + 1, :], acc)
    out_ref[...] = acc


def brief_sample_t(win_t, idx_t, rw: int, max_norm2: int, gk: int = 128):
    """Per-keypoint window sampling, keypoints on lanes.

    win_t: (S, K) f32 — flattened (2rw+1)^2 windows, transposed.
    idx_t: (Q, K) int32 — flat window sample indices, transposed; every
      index must lie in the reachable set (rw, max_norm2) — true for
      GET_VALUE-rounded rotations of the BRIEF pattern by construction.
    Returns (Q, K) f32 samples. K must be a multiple of gk.
    """
    s, k = win_t.shape
    q = idx_t.shape[0]
    if k % gk:
        raise ValueError(f"K={k} not a multiple of {gk}")
    positions = reachable_positions(rw, max_norm2)
    kernel = functools.partial(_brief_sample_kernel, positions=positions)
    return pl.pallas_call(
        kernel,
        grid=(k // gk,),
        in_specs=[
            pl.BlockSpec((s, gk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q, gk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((q, gk), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q, k), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(win_t, idx_t)


def brief_sample(wins_flat, idx_p, idx_q, rw: int, max_norm2: int):
    """(tp, tq) samples for the p/q pattern indices: wins_flat (K, S) f32,
    idx_p/idx_q (K, N) int32 -> two (K, N) f32. Pads K to a lane multiple,
    runs the transposed kernel once for both index sets."""
    k, s = wins_flat.shape
    n = idx_p.shape[1]
    kp = -(-k // 128) * 128
    if kp != k:
        wins_flat = jnp.pad(wins_flat, ((0, kp - k), (0, 0)))
        idx_p = jnp.pad(idx_p, ((0, kp - k), (0, 0)))
        idx_q = jnp.pad(idx_q, ((0, kp - k), (0, 0)))
    idx_all = jnp.concatenate([idx_p, idx_q], axis=1)  # (K, 2N)
    samples = brief_sample_t(wins_flat.T, idx_all.T, rw, max_norm2)
    samples = samples.T[:k]  # (K, 2N)
    return samples[:, :n], samples[:, n:]
