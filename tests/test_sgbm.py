"""SGBM disparity vs the cv2.StereoSGBM oracle (tolerance-based: SURVEY.md
section 4 prescribes disparity agreement % + subpixel tolerance, not bit
parity — path sets and cost details differ)."""

import cv2
import numpy as np
import pytest

from openvo_tpu.config import SGBMParams
from openvo_tpu.io.synthetic import gt_disparity, render_stereo_sequence
from openvo_tpu.ops.sgbm import sgbm_disparity, sgbm_disparity16


def synthetic_pair(seed=0, img_size=(256, 160), f=210.0, baseline=0.3):
    seq = render_stereo_sequence(n_frames=1, img_size=img_size, f=f,
                                 baseline=baseline, seed=seed)
    left = np.clip(seq["left"][0], 0, 255).astype(np.uint8)
    right = np.clip(seq["right"][0], 0, 255).astype(np.uint8)
    gt = gt_disparity(seq["depth"][0], f, baseline)
    return left, right, gt


def make_params(num_disp=64, block=5, uniq=10, lr=1, speckle=False):
    return SGBMParams(
        min_disparity=0, num_disparities=num_disp, block_size=block,
        p1=8 * block * block, p2=32 * block * block,
        disp12_max_diff=lr, pre_filter_cap=63, uniqueness_ratio=uniq,
        speckle_window_size=100 if speckle else 0,
        speckle_range=2 if speckle else 0, num_paths=5,
    )


def cv2_sgbm(left, right, p: SGBMParams):
    m = cv2.StereoSGBM_create(
        p.min_disparity, p.num_disparities, p.block_size,
        p.p1, p.p2, p.disp12_max_diff, p.pre_filter_cap,
        p.uniqueness_ratio, p.speckle_window_size, p.speckle_range,
    )
    return m.compute(left, right).astype(np.float32) / 16.0


def interior_mask(shape, p: SGBMParams):
    """Region where both implementations have full matching support."""
    H, W = shape
    m = np.zeros((H, W), bool)
    b = p.block_size // 2 + 2
    m[b:-b, p.num_disparities + b : -b] = True
    return m


@pytest.mark.parametrize("seed", [0, 1])
def test_sgbm_agreement_vs_cv2(seed):
    left, right, _ = synthetic_pair(seed)
    p = make_params()
    ref = cv2_sgbm(left, right, p)
    ours = np.asarray(sgbm_disparity(left, right, p))
    roi = interior_mask(left.shape, p)
    both = roi & (ref > 0) & (ours > 0)
    agree1 = np.abs(ref[both] - ours[both]) <= 1.0
    assert both.mean() > 0.4, "too few co-valid pixels"
    assert agree1.mean() > 0.9, f"1px agreement {agree1.mean():.3f}"
    # Subpixel: median |diff| under 0.5 px on agreeing pixels
    assert np.median(np.abs(ref[both] - ours[both])) < 0.5


def test_sgbm_accuracy_vs_ground_truth():
    left, right, gt = synthetic_pair(2)
    p = make_params()
    ours = np.asarray(sgbm_disparity(left, right, p))
    roi = interior_mask(left.shape, p) & (gt > 2) & (gt < p.num_disparities - 2)
    valid = roi & (ours > 0)
    assert valid.sum() > 0.5 * roi.sum()
    err = np.abs(ours[valid] - gt[valid])
    assert (err <= 1.0).mean() > 0.9, f"gt 1px agreement {(err <= 1.0).mean():.3f}"


def test_sgbm_invalid_encoding_and_scale():
    left, right, _ = synthetic_pair(3)
    p = make_params()
    d16 = np.asarray(sgbm_disparity16(left, right, p))
    assert d16.dtype == np.int16
    # Invalid marker = (minD-1)*16 = -16; float output = /16.
    dflt = np.asarray(sgbm_disparity(left, right, p))
    inv = d16 == -16
    assert inv.any()
    np.testing.assert_allclose(dflt, d16.astype(np.float32) / 16.0)


def test_sgbm_speckle_filter_removes_islands():
    left, right, _ = synthetic_pair(4)
    p_no = make_params()
    p_sp = make_params(speckle=True)
    d_no = np.asarray(sgbm_disparity(left, right, p_no))
    d_sp = np.asarray(sgbm_disparity(left, right, p_sp))
    # Speckle filtering only ever invalidates.
    newly_invalid = (d_no > 0) & (d_sp < 0)
    still_valid = (d_no > 0) & (d_sp > 0)
    assert (d_sp > 0).sum() <= (d_no > 0).sum()
    # Values of surviving pixels unchanged.
    np.testing.assert_array_equal(d_no[still_valid], d_sp[still_valid])
    del newly_invalid
