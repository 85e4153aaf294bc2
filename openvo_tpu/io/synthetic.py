"""Synthetic stereo scene generator (test/bench harness).

No dataset ships in this environment, so integration tests and benchmarks run
on procedurally rendered stereo sequences with exact ground truth: a textured
"corridor" of planes rendered through an ideal pinhole stereo rig. Geometry is
exact (analytic ray-plane intersection), so ground-truth disparity and
ground-truth camera trajectories are available to arbitrary precision — this
plays the role of KITTI seq-00 in SURVEY.md section 4's test plan.

All host-side NumPy; images are produced once per test/bench session.
"""

from __future__ import annotations

import numpy as np


def make_texture(rng: np.random.Generator, size: int = 1024) -> np.ndarray:
    """Multi-octave value-noise texture rich in FAST/Harris corners.

    Every octave is independent random noise bilinearly upsampled, so every
    patch of the texture is globally unique — crucial for descriptor
    matching tests (repeated motifs would make every corner look alike and
    defeat the Lowe ratio test for ANY descriptor).
    """
    tex = np.zeros((size, size), np.float32)
    for octave, amp in ((16, 1.0), (64, 0.9), (256, 0.7), (1024, 0.25)):
        octave = min(octave, size)
        coarse = rng.uniform(0, 1, size=(octave, octave)).astype(np.float32)
        if octave < size:
            # bilinear upsample via repeated linear interp (no cv2 dependency)
            idx = np.linspace(0, octave - 1, size)
            i0 = np.floor(idx).astype(int)
            i1 = np.minimum(i0 + 1, octave - 1)
            f = (idx - i0).astype(np.float32)
            rows = coarse[i0] * (1 - f)[:, None] + coarse[i1] * f[:, None]
            up = rows[:, i0] * (1 - f)[None, :] + rows[:, i1] * f[None, :]
        else:
            up = coarse
        tex += amp * up
    tex -= tex.min()
    tex *= 255.0 / tex.max()
    return tex


def _sample_texture(tex, u, v):
    """Wrapped bilinear sample of texture at float coords."""
    size = tex.shape[0]
    uf = np.floor(u)
    vf = np.floor(v)
    fu = u - uf
    fv = v - vf
    u0 = uf.astype(np.int64) % size
    v0 = vf.astype(np.int64) % size
    u1 = (u0 + 1) % size
    v1 = (v0 + 1) % size
    return (
        tex[v0, u0] * (1 - fu) * (1 - fv)
        + tex[v0, u1] * fu * (1 - fv)
        + tex[v1, u0] * (1 - fu) * fv
        + tex[v1, u1] * fu * fv
    )


def corridor_planes(length: float = 30.0, half_width: float = 3.0):
    """A corridor of 4 textured planes (floor, two walls, back wall), meters.

    Each plane: (p0, n, e1, e2, tex_scale) with n the outward normal facing
    the camera path (camera moves along +z, y points down). ``length`` is
    the back-wall distance and ``half_width`` the wall offset — long
    sequences must size these so the trajectory (forward travel plus the
    lateral drift a steady yaw accumulates) stays inside the geometry
    with usable depth margin (round-5 bench: the 31.5 m path drove the
    camera through the default z=30 wall and into the x=+3 wall)."""
    return [
        # floor at y = +1.2 (y-down camera convention)
        (np.array([0, 1.2, 0.0]), np.array([0, -1.0, 0]),
         np.array([1.0, 0, 0]), np.array([0, 0, 1.0]), 60.0),
        (np.array([-half_width, 0, 0]), np.array([1.0, 0, 0]),
         np.array([0, 0, 1.0]), np.array([0, 1.0, 0]), 60.0),
        (np.array([half_width, 0, 0]), np.array([-1.0, 0, 0]),
         np.array([0, 0, 1.0]), np.array([0, 1.0, 0]), 60.0),
        (np.array([0, 0, length]), np.array([0, 0, -1.0]),
         np.array([1.0, 0, 0]), np.array([0, 1.0, 0]), 60.0),
    ]


def render_view(K, T_wc, planes, tex, img_size, supersample: int = 2):
    """Render one pinhole view. ``T_wc`` is camera-to-world (4x4);
    ``img_size`` is (width, height). Returns (image float32 HxW in [0,255],
    depth float32 HxW in camera z).

    Renders at ``supersample``x resolution and box-downsamples — cheap
    anti-aliasing so minified far-away texture stays frame-to-frame stable
    (raw point sampling shimmers and corrupts descriptor matching).
    """
    if supersample > 1:
        s = supersample
        K2 = K.copy().astype(np.float64)
        K2[0, 0] *= s
        K2[1, 1] *= s
        K2[0, 2] = s * K[0, 2] + (s - 1) / 2.0
        K2[1, 2] = s * K[1, 2] + (s - 1) / 2.0
        img, depth = render_view(K2, T_wc, planes, tex,
                                 (img_size[0] * s, img_size[1] * s),
                                 supersample=1)
        h, w = img_size[1], img_size[0]
        img = img.reshape(h, s, w, s).mean(axis=(1, 3))
        depth = depth.reshape(h, s, w, s)[:, 0, :, 0]
        return img, depth
    w, h = img_size
    Kinv = np.linalg.inv(K)
    u, v = np.meshgrid(np.arange(w, dtype=np.float64),
                       np.arange(h, dtype=np.float64))
    rays_cam = np.stack([u, v, np.ones_like(u)], axis=-1) @ Kinv.T
    R = T_wc[:3, :3]
    o = T_wc[:3, 3]
    rays = rays_cam @ R.T  # world-frame directions

    best_s = np.full((h, w), np.inf)
    img = np.zeros((h, w), np.float32)
    depth = np.full((h, w), np.inf, np.float32)
    for p0, n, e1, e2, scale in planes:
        denom = rays @ n
        with np.errstate(divide="ignore", invalid="ignore"):
            s = ((p0 - o) @ n) / denom
        valid = (denom < -1e-9) & (s > 0.05) & (s < best_s)
        if not valid.any():
            continue
        pts = o + rays * s[..., None]
        tu = (pts - p0) @ e1 * scale
        tv = (pts - p0) @ e2 * scale
        shade = _sample_texture(tex, tu[valid], tv[valid]).astype(np.float32)
        img[valid] = shade
        best_s[valid] = s[valid]
        depth[valid] = (s[valid] * rays_cam[valid][:, 2]).astype(np.float32)
    return img, depth


def make_rig(img_size=(320, 240), f=280.0, baseline=0.5):
    """Ideal rectified stereo rig: identical K, no distortion, pure x offset.

    Returns (K, dist, R, T) in the cv2.stereoRectify convention
    (x_right = R @ x_left + T, so T = (-baseline, 0, 0)).
    """
    w, h = img_size
    K = np.array([[f, 0, w / 2 - 0.5], [0, f, h / 2 - 0.5], [0, 0, 1.0]])
    dist = np.zeros(5)
    R = np.eye(3)
    T = np.array([-baseline, 0.0, 0.0])
    return K, dist, R, T


def camera_trajectory(n_frames: int, step: float = 0.1, yaw_rate: float = 0.004):
    """Forward corridor motion with gentle yaw. Returns (n, 4, 4) T_wc
    (camera-to-world) poses; frame 0 is identity."""
    poses = [np.eye(4)]
    for i in range(1, n_frames):
        yaw = yaw_rate
        c, s = np.cos(yaw), np.sin(yaw)
        dR = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        dT = np.eye(4)
        dT[:3, :3] = dR
        dT[:3, 3] = [0, 0, step]
        poses.append(poses[-1] @ dT)
    return np.stack(poses)


def render_stereo_sequence(n_frames=6, img_size=(320, 240), f=280.0,
                           baseline=0.5, seed=0, step=0.1, yaw_rate=0.004,
                           corridor_length=30.0, corridor_half_width=3.0):
    """Full synthetic sequence: stereo images + ground-truth poses.

    Returns dict with keys: left (n,H,W) float32, right (n,H,W), T_wc
    (n,4,4) ground-truth camera-to-world poses, K, baseline, planes.
    """
    rng = np.random.default_rng(seed)
    tex = make_texture(rng)
    planes = corridor_planes(corridor_length, corridor_half_width)
    K, dist, R, T = make_rig(img_size, f, baseline)
    poses = camera_trajectory(n_frames, step, yaw_rate)

    lefts, rights, depths = [], [], []
    right_offset = np.eye(4)
    right_offset[0, 3] = baseline  # right camera sits at +x in left-cam frame
    for i in range(n_frames):
        T_wc = poses[i]
        li, dep = render_view(K, T_wc, planes, tex, img_size)
        ri, _ = render_view(K, T_wc @ right_offset, planes, tex, img_size)
        lefts.append(li)
        rights.append(ri)
        depths.append(dep)
    return {
        "left": np.stack(lefts),
        "right": np.stack(rights),
        "depth": np.stack(depths),
        "T_wc": poses,
        "K": K,
        "dist": dist,
        "R": R,
        "T": T,
        "baseline": baseline,
        "img_size": img_size,
    }


def gt_disparity(depth, f, baseline):
    """Ground-truth disparity from depth: d = f * B / Z."""
    with np.errstate(divide="ignore"):
        return np.where(np.isfinite(depth), f * baseline / depth, 0.0)
