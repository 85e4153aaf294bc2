"""Undistort/rectify remap: gather source pixels at map coordinates with
bilinear interpolation.

TPU-native replacement for ``cv2.remap(img, map1, map2, INTER_LINEAR)``
(reference stereo_camera.py:29-33; SURVEY.md N3). Border behavior matches
OpenCV's default BORDER_CONSTANT(0): any of the four neighbors falling outside
the source contributes value 0 with its bilinear weight.

The implementation is a single fused XLA program: one flattened gather of the
four neighbors plus a weighted sum. XLA lowers the gather to efficient TPU
dynamic-gather; the whole remap fuses with the downstream grayscale/SGBM
pipeline stage under jit.
"""

from __future__ import annotations

import jax.numpy as jnp


def remap_bilinear(src, map_x, map_y):
    """Sample ``src`` (H, W) or (H, W, C) at float coords (map_x, map_y).

    Returns an array shaped like (map_h, map_w[, C]) in float32.
    """
    squeeze = src.ndim == 2
    if squeeze:
        src = src[..., None]
    H, W, C = src.shape
    srcf = src.astype(jnp.float32)

    x = map_x.astype(jnp.float32)
    y = map_y.astype(jnp.float32)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    flat = srcf.reshape(H * W, C)

    def tap(yi, xi):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
        vals = jnp.take(flat, idx.reshape(-1), axis=0).reshape(idx.shape + (C,))
        return jnp.where(valid[..., None], vals, 0.0)

    p00 = tap(y0i, x0i)
    p01 = tap(y0i, x0i + 1)
    p10 = tap(y0i + 1, x0i)
    p11 = tap(y0i + 1, x0i + 1)

    wx = fx[..., None]
    wy = fy[..., None]
    out = (
        p00 * (1 - wx) * (1 - wy)
        + p01 * wx * (1 - wy)
        + p10 * (1 - wx) * wy
        + p11 * wx * wy
    )
    return out[..., 0] if squeeze else out


def remap_u8(src, map_x, map_y):
    """remap_bilinear + round/clip back to uint8 (parity with cv2.remap on
    uint8 inputs, which rounds to nearest)."""
    out = remap_bilinear(src, map_x, map_y)
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
