"""Rigid-body-consistency inlier filter (greedy max-clique, "Paper alg").

Behavior-exact, jit-compilable rebuild of ``rigid_body_filter`` (reference
stereo_odometer.py:82-105; Howard-2008-style):

 1. delta_dist[i, j] = | ||p_i - p_j|| - ||p'_i - p'_j|| |
 2. consistency[i, j] = delta_dist[i, j] < rigidity_threshold
 3. seed the clique at the point with the most consistencies, then greedily
    add the not-yet-chosen point with the highest consistency count among
    points compatible with *every* clique member (leniency hardcoded 0,
    reference :103), until no candidate remains.

The data-dependent Python loop becomes a ``lax.while_loop`` over fixed-shape
(N,) state; padded (invalid) points have their consistency rows/cols zeroed so
they can never seed or join the clique.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rigid_body_filter(prev_pts, pts, mask, rigidity_threshold):
    """Greedy max-clique of mutually distance-consistent correspondences.

    Args:
      prev_pts, pts: (N, 3) padded point arrays.
      mask: (N,) bool validity of each correspondence.
      rigidity_threshold: scalar (meters).

    Returns (N,) int32 0/1 clique membership (0 for padded entries).
    """
    n = pts.shape[0]
    # Padded rows are zeroed (their consistency is masked out anyway); NaN
    # coordinates of *valid* rows are kept: NaN distances compare False, so a
    # NaN point is never consistent with anything and drops out of the clique
    # — exactly what the reference's numpy comparisons do.
    p = jnp.where(mask[:, None], pts, 0.0)
    q = jnp.where(mask[:, None], prev_pts, 0.0)
    d_now = jnp.linalg.norm(p[:, None, :] - p[None, :, :], axis=-1)
    d_prev = jnp.linalg.norm(q[:, None, :] - q[None, :, :], axis=-1)
    delta = jnp.abs(d_now - d_prev)
    consistency = (delta < rigidity_threshold).astype(jnp.int32)
    valid2d = (mask[:, None] & mask[None, :]).astype(jnp.int32)
    consistency = consistency * valid2d

    num_consistent = jnp.sum(consistency, axis=0)
    seed = jnp.argmax(num_consistent)
    clique0 = jnp.zeros((n,), jnp.int32).at[seed].set(1)
    compatible0 = consistency[seed]

    def cond(state):
        clique, compatible, it = state
        candidates = compatible - clique
        return (jnp.sum(candidates) > 0) & (it < n)

    def body(state):
        clique, compatible, it = state
        candidates = compatible - clique
        selected = jnp.argmax(num_consistent * candidates)
        clique = clique.at[selected].set(1)
        # compatible with every clique member (leniency = 0)
        compatible = (consistency @ clique >= jnp.sum(clique)).astype(jnp.int32)
        return clique, compatible, it + 1

    clique, _, _ = jax.lax.while_loop(cond, body, (clique0, compatible0, 0))
    # If the frame had no valid points at all, return an empty clique rather
    # than a spurious seed at index 0.
    return jnp.where(jnp.any(mask), clique, jnp.zeros_like(clique))
