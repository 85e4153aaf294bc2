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
    """Multi-octave value-noise texture rich in FAST/Harris corners."""
    tex = np.zeros((size, size), np.float32)
    for octave in (8, 32, 128, 512):
        coarse = rng.uniform(0, 1, size=(octave, octave)).astype(np.float32)
        reps = size // octave
        up = np.kron(coarse, np.ones((reps, reps), np.float32))
        tex += up / (512 / octave) ** 0.25
    # High-contrast blocky detail for corners.
    blocks = rng.uniform(0, 1, size=(size // 8, size // 8)) > 0.5
    tex += 0.8 * np.kron(blocks, np.ones((8, 8))).astype(np.float32)
    tex -= tex.min()
    tex *= 255.0 / tex.max()
    return tex


def _sample_texture(tex, u, v):
    """Wrapped bilinear sample of texture at float coords."""
    size = tex.shape[0]
    u = np.mod(u, size)
    v = np.mod(v, size)
    u0 = np.floor(u).astype(np.int64)
    v0 = np.floor(v).astype(np.int64)
    fu = u - u0
    fv = v - v0
    u1 = (u0 + 1) % size
    v1 = (v0 + 1) % size
    return (
        tex[v0, u0] * (1 - fu) * (1 - fv)
        + tex[v0, u1] * fu * (1 - fv)
        + tex[v1, u0] * (1 - fu) * fv
        + tex[v1, u1] * fu * fv
    )


def corridor_planes():
    """A corridor of 4 textured planes (floor, two walls, back wall), meters.

    Each plane: (p0, n, e1, e2, tex_scale) with n the outward normal facing
    the camera path (camera moves along +z, y points down).
    """
    return [
        # floor at y = +1.5 (y-down camera convention)
        (np.array([0, 1.5, 0.0]), np.array([0, -1.0, 0]),
         np.array([1.0, 0, 0]), np.array([0, 0, 1.0]), 40.0),
        # left wall at x = -4
        (np.array([-4.0, 0, 0]), np.array([1.0, 0, 0]),
         np.array([0, 0, 1.0]), np.array([0, 1.0, 0]), 40.0),
        # right wall at x = +4
        (np.array([4.0, 0, 0]), np.array([-1.0, 0, 0]),
         np.array([0, 0, 1.0]), np.array([0, 1.0, 0]), 40.0),
        # back wall at z = 40
        (np.array([0, 0, 40.0]), np.array([0, 0, -1.0]),
         np.array([1.0, 0, 0]), np.array([0, 1.0, 0]), 40.0),
    ]


def render_view(K, T_wc, planes, tex, img_size):
    """Render one pinhole view. ``T_wc`` is camera-to-world (4x4);
    ``img_size`` is (width, height). Returns (image float32 HxW in [0,255],
    depth float32 HxW in camera z)."""
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


def make_rig(img_size=(320, 240), f=260.0, baseline=0.2):
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


def render_stereo_sequence(n_frames=6, img_size=(320, 240), f=260.0,
                           baseline=0.2, seed=0, step=0.1, yaw_rate=0.004):
    """Full synthetic sequence: stereo images + ground-truth poses.

    Returns dict with keys: left (n,H,W) float32, right (n,H,W), T_wc
    (n,4,4) ground-truth camera-to-world poses, K, baseline, planes.
    """
    rng = np.random.default_rng(seed)
    tex = make_texture(rng)
    planes = corridor_planes()
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
