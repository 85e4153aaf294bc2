"""ORB detector/descriptor: behavioral validation.

Per the design note in ops/orb.py, descriptors use our own deterministic
pattern (not OpenCV's learned table), so tests are behavioral (SURVEY.md
section 4 "set-level corner agreement + descriptor compatibility"):
 - corner sets overlap substantially with cv2.ORB keypoints;
 - descriptors match across a rotated/shifted view of the same scene with a
   high inlier ratio (rotation invariance via the orientation mechanism);
 - the detection mask is honored;
 - fixed-capacity padding contract holds.
"""

import cv2
import numpy as np
import pytest

from openvo_tpu.config import ORBParams
from openvo_tpu.io.synthetic import make_texture
from openvo_tpu.ops.hamming import ratio_test_match
from openvo_tpu.ops.orb import detect_and_compute, features_per_level


def scene(seed=0, h=240, w=320):
    tex = make_texture(np.random.default_rng(seed), 512)
    return tex[:h, :w].astype(np.float32)


def test_features_per_level_matches_opencv_budget():
    counts = features_per_level(500, 8, 1.2)
    assert sum(counts) == 500
    assert counts[0] > counts[1] > counts[-2]


def test_corner_overlap_with_cv2():
    img = scene(0)
    img_u8 = np.clip(img, 0, 255).astype(np.uint8)
    orb = cv2.ORB_create(nfeatures=300)
    ref_kps = orb.detect(img_u8, None)
    ours = detect_and_compute(img, None, ORBParams(nfeatures=300,
                                                   max_keypoints=512))
    xy = np.asarray(ours["xy"])[np.asarray(ours["valid"])]
    assert len(xy) >= 200
    ref_xy = np.array([k.pt for k in ref_kps])
    # Fraction of cv2 keypoints with one of ours within 4 px.
    d = np.linalg.norm(ref_xy[:, None, :] - xy[None, :, :], axis=-1)
    hit = (d.min(axis=1) <= 4.0).mean()
    assert hit > 0.5, f"corner overlap {hit:.2f}"


def test_descriptor_matching_under_rotation():
    img = scene(1)
    img_u8 = np.clip(img, 0, 255).astype(np.uint8)
    h, w = img.shape
    M = cv2.getRotationMatrix2D((w / 2, h / 2), 15.0, 1.0)
    rot = cv2.warpAffine(img_u8, M, (w, h)).astype(np.float32)

    p = ORBParams(nfeatures=300, max_keypoints=512)
    fa = detect_and_compute(img, None, p)
    fb = detect_and_compute(rot, None, p)
    idx, ok = (np.asarray(x) for x in ratio_test_match(
        fa["desc"], fb["desc"], 0.8, fa["valid"], fb["valid"]))
    n_matches = int(ok.sum())
    assert n_matches >= 40, f"only {n_matches} matches"

    # Geometric consistency: matched points should follow the rotation.
    xa = np.asarray(fa["xy"])[ok]
    xb = np.asarray(fb["xy"])[np.asarray(idx)[ok]]
    pred = np.c_[xa, np.ones(len(xa))] @ M.T
    err = np.linalg.norm(pred - xb, axis=1)
    inlier_ratio = (err < 3.0).mean()
    assert inlier_ratio > 0.6, f"rotation inlier ratio {inlier_ratio:.2f}"


def test_mask_is_honored():
    img = scene(2)
    h, w = img.shape
    mask = np.zeros((h, w), np.uint8)
    mask[:, : w // 2] = 255
    p = ORBParams(nfeatures=200, max_keypoints=256)
    out = detect_and_compute(img, mask, p)
    xy = np.asarray(out["xy"])[np.asarray(out["valid"])]
    assert len(xy) > 20
    assert (xy[:, 0] <= w // 2 + 1).all()


def test_fixed_capacity_contract():
    img = scene(3)
    p = ORBParams(nfeatures=100, max_keypoints=128)
    out = detect_and_compute(img, None, p)
    assert out["xy"].shape == (128, 2)
    assert out["desc"].shape == (128, 32)
    assert out["valid"].shape == (128,)
    v = np.asarray(out["valid"])
    assert v.sum() <= 128
    # Padding rows have zero descriptors.
    d = np.asarray(out["desc"])
    assert (d[~v] == 0).all()


def test_keypoints_respect_min_count_on_blank_image():
    img = np.full((240, 320), 128.0, np.float32)
    p = ORBParams(nfeatures=100, max_keypoints=128)
    out = detect_and_compute(img, None, p)
    assert int(np.asarray(out["valid"]).sum()) == 0
