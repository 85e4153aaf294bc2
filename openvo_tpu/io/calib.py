"""Calibration persistence: pickle-compatible with the reference + safe npz.

The reference's on-disk contract is four pickle files (stereo_camera.py:7-14):
left/right cam {'K','dist'}, rect {'R','T'}, and the SGBM parameter dict.
:func:`save_pfiles`/:func:`load_pfiles` reproduce that contract;
:func:`save_npz`/StereoCamera.from_npz provide a non-executable alternative.
"""

from __future__ import annotations

import pickle

import numpy as np

SGBM_KEYS = [
    "minDisparity", "numDisparities", "blockSize", "P1", "P2",
    "disp12MaxDiff", "preFilterCap", "uniquenessRatio",
    "speckleWindowSize", "speckleRange",
]


def save_pfiles(prefix, K_left, dist_left, K_right, dist_right, R, T, sgbm):
    """Write the reference's four pickle files; returns their paths."""
    paths = {
        "left": f"{prefix}_left.p",
        "right": f"{prefix}_right.p",
        "rect": f"{prefix}_rect.p",
        "sgbm": f"{prefix}_sgbm.p",
    }
    with open(paths["left"], "wb") as f:
        pickle.dump({"K": np.asarray(K_left), "dist": np.asarray(dist_left)}, f)
    with open(paths["right"], "wb") as f:
        pickle.dump({"K": np.asarray(K_right), "dist": np.asarray(dist_right)}, f)
    with open(paths["rect"], "wb") as f:
        pickle.dump({"R": np.asarray(R), "T": np.asarray(T)}, f)
    with open(paths["sgbm"], "wb") as f:
        pickle.dump({k: int(sgbm[k]) for k in SGBM_KEYS}, f)
    return paths


def save_npz(path, K_left, dist_left, K_right, dist_right, R, T, sgbm):
    arrays = {
        "K_left": np.asarray(K_left), "dist_left": np.asarray(dist_left),
        "K_right": np.asarray(K_right), "dist_right": np.asarray(dist_right),
        "R": np.asarray(R), "T": np.asarray(T),
    }
    for k in SGBM_KEYS:
        arrays[f"sgbm_{k}"] = np.asarray(int(sgbm[k]))
    np.savez(path, **arrays)
    return path
