"""Inf-aware renormalizing bilinear sampler for 3D point images.

Behavior-exact, vectorized rebuild of the reference's per-match Python loop
``bilinear_interpolate_pixels`` (reference stereo_odometer.py:50-79):

 - samples an (H, W, 3) 3D image at subpixel (x, y);
 - of the four neighbors, only those that are (a) inside the image and
   (b) finite in every channel contribute; the bilinear weights are
   renormalized over the contributing subset (``num / den``);
 - if all four neighbors are invalid the result is 0/0 = NaN, exactly like
   the reference (whose downstream NaN gate at stereo_odometer.py:207-209
   relies on this).

The reference reads the (floor_y, floor_x) corner unconditionally (keypoint
coordinates are always in-bounds); we do the same modulo index clipping that
never triggers for in-bounds keypoints.
"""

from __future__ import annotations

import jax.numpy as jnp


def bilinear_sample_3d(img3d, xs, ys):
    """Sample (H, W, 3) ``img3d`` at N subpixel positions -> (N, 3).

    ``xs``/``ys`` are float arrays of shape (N,).
    """
    H, W, C = img3d.shape
    flat = img3d.reshape(H * W, C)

    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    rx = (xs - x0)[:, None]
    ry = (ys - y0)[:, None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi, in_bounds):
        idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
        vals = jnp.take(flat, idx, axis=0)
        # The reference tests only isinf (NaNs pass through into the sum);
        # replicate: invalid <=> any channel is +/-inf, or out of bounds.
        noinf = ~jnp.any(jnp.isinf(vals), axis=-1)
        ok = (noinf & in_bounds)[:, None]
        return vals, ok

    in10 = (x0i + 1) < W
    in01 = (y0i + 1) < H
    in11 = in10 & in01
    always = jnp.ones_like(in10)

    p00, ok00 = tap(y0i, x0i, always)
    p10, ok10 = tap(y0i, x0i + 1, in10)
    p01, ok01 = tap(y0i + 1, x0i, in01)
    p11, ok11 = tap(y0i + 1, x0i + 1, in11)

    w00 = (1 - rx) * (1 - ry)
    w10 = rx * (1 - ry)
    w01 = (1 - rx) * ry
    w11 = rx * ry

    num = (
        jnp.where(ok00, w00 * p00, 0.0)
        + jnp.where(ok10, w10 * p10, 0.0)
        + jnp.where(ok01, w01 * p01, 0.0)
        + jnp.where(ok11, w11 * p11, 0.0)
    )
    den = (
        jnp.where(ok00, w00, 0.0)
        + jnp.where(ok10, w10, 0.0)
        + jnp.where(ok01, w01, 0.0)
        + jnp.where(ok11, w11, 0.0)
    )
    return num / den
