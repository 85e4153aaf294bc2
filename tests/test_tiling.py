"""Spatial row-tiling of SGBM across a device mesh (SURVEY.md section 2c
"spatial sharding"): validated on an 8-virtual-CPU-device mesh in a
subprocess, bit-identical against the single-device pipeline — including
at a 2K-wide frame."""

import os
import subprocess
import sys

import pytest

SUB = r"""
import numpy as np
import jax
import jax.numpy as jnp

from openvo_tpu.config import SGBMParams
from openvo_tpu.io.synthetic import render_stereo_sequence
from openvo_tpu.ops.sgbm import sgbm_disparity16
from openvo_tpu.parallel.tiling import make_row_mesh, make_tiled_sgbm_fn

assert len(jax.devices()) == 8, jax.devices()

def check(img_size, num_disp):
    w, h = img_size
    params = SGBMParams(num_disparities=num_disp, block_size=5, p1=200,
                        p2=800, disp12_max_diff=1, pre_filter_cap=63,
                        uniqueness_ratio=10)
    seq = render_stereo_sequence(n_frames=1, img_size=img_size, f=220.0,
                                 baseline=0.4, seed=0)
    left = np.clip(seq["left"][0], 0, 255).astype(np.uint8)
    right = np.clip(seq["right"][0], 0, 255).astype(np.uint8)
    ref = np.asarray(sgbm_disparity16(jnp.asarray(left), jnp.asarray(right),
                                      params))
    mesh = make_row_mesh(8)
    fn = make_tiled_sgbm_fn(params, mesh)
    out = np.asarray(fn(jnp.asarray(left), jnp.asarray(right)))
    assert out.shape == ref.shape, (out.shape, ref.shape)
    neq = (out != ref).sum()
    assert neq == 0, f"{img_size}: {neq}/{ref.size} pixels differ"
    print(f"tiled == single-device at {img_size} ({ref.size} px)")

check((256, 96), 32)     # standard small frame
check((2048, 64), 32)    # 2K-wide frame (SURVEY 2c long-context analog)

# Indivisible H raises a clear ValueError, not a cryptic XLA sharding
# error (ADVICE r2).
params = SGBMParams(num_disparities=32, block_size=5, p1=200, p2=800)
fn = make_tiled_sgbm_fn(params, make_row_mesh(8))
try:
    fn(jnp.zeros((97, 128), jnp.uint8), jnp.zeros((97, 128), jnp.uint8))
    raise AssertionError("expected ValueError for H=97 on 8 devices")
except ValueError as e:
    assert "divisible" in str(e), e
print("TILED_OK")
"""

SPECKLE_SUB = r"""
import dataclasses
import numpy as np
import jax
import jax.numpy as jnp

from openvo_tpu.config import SGBMParams
from openvo_tpu.io.synthetic import render_stereo_sequence
from openvo_tpu.ops.sgbm import sgbm_disparity16
from openvo_tpu.parallel.tiling import make_row_mesh, make_tiled_sgbm_fn

assert len(jax.devices()) == 8, jax.devices()
params = SGBMParams(num_disparities=32, block_size=5, p1=200, p2=800,
                    disp12_max_diff=1, pre_filter_cap=63,
                    uniqueness_ratio=10, speckle_window_size=50,
                    speckle_range=2)
seq = render_stereo_sequence(n_frames=1, img_size=(256, 96), f=220.0,
                             baseline=0.4, seed=0)
left = np.clip(seq["left"][0], 0, 255).astype(np.uint8)
right = np.clip(seq["right"][0], 0, 255).astype(np.uint8)
ref = np.asarray(sgbm_disparity16(jnp.asarray(left), jnp.asarray(right),
                                  params))
fn = make_tiled_sgbm_fn(params, make_row_mesh(8))
out = np.asarray(fn(jnp.asarray(left), jnp.asarray(right)))
neq = (out != ref).sum()
assert neq == 0, f"{neq}/{ref.size} pixels differ with speckle on"
print("SPECKLE_TILED_OK")
"""


def _cpu_mesh_env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env.pop("OPENVO_TEST_PLATFORM", None)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("AXON_POOL_SVC_OVERRIDE", None)
    return env


def _run_sub(code):
    return subprocess.run(
        [sys.executable, "-c", code],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=_cpu_mesh_env(), capture_output=True, text=True, timeout=3000,
    )


@pytest.mark.slow
def test_tiled_sgbm_bit_identical_on_cpu_mesh():
    out = _run_sub(SUB)
    assert "TILED_OK" in out.stdout, out.stdout + out.stderr


@pytest.mark.slow
def test_tiled_sgbm_speckle_on_cpu_mesh():
    """The tiled path accepts speckle params (VERDICT r2 item 6): the
    all_gather + replicated pointer-jump pass must reproduce the
    single-device cv2-oracle-validated filter bit-for-bit. Matches
    reference stereo_camera.py:24-27 (speckle params always honored)."""
    out = _run_sub(SPECKLE_SUB)
    assert "SPECKLE_TILED_OK" in out.stdout, out.stdout + out.stderr


@pytest.mark.slow
def test_tiled_pallas_path_on_tpu():
    """TPU branch of the tiled path (VERDICT r2 item 4): on a 1-device TPU
    mesh the tiled fn runs the SAME Pallas kernels as the single-device
    path (banded cost_sweep_fused + sweep_v carry I/O + sweep_h_wta) and
    must reproduce sgbm_disparity16 exactly."""
    import jax
    if jax.default_backend() != "tpu":
        pytest.skip("needs the TPU backend")
    import numpy as np
    import jax.numpy as jnp
    from openvo_tpu.config import SGBMParams
    from openvo_tpu.io.synthetic import render_stereo_sequence
    from openvo_tpu.ops.sgbm import sgbm_disparity16
    from openvo_tpu.parallel.tiling import make_row_mesh, make_tiled_sgbm_fn

    params = SGBMParams(num_disparities=32, block_size=5, p1=200, p2=800,
                        disp12_max_diff=1, pre_filter_cap=63,
                        uniqueness_ratio=10)
    seq = render_stereo_sequence(n_frames=1, img_size=(256, 96), f=220.0,
                                 baseline=0.4, seed=0)
    left = np.clip(seq["left"][0], 0, 255).astype(np.uint8)
    right = np.clip(seq["right"][0], 0, 255).astype(np.uint8)
    ref = np.asarray(sgbm_disparity16(jnp.asarray(left), jnp.asarray(right),
                                      params))
    fn = make_tiled_sgbm_fn(params, make_row_mesh(1))
    out = np.asarray(fn(jnp.asarray(left), jnp.asarray(right)))
    neq = int((out != ref).sum())
    assert neq == 0, f"{neq}/{ref.size} pixels differ (tiled Pallas vs ref)"


@pytest.mark.slow
def test_sweep_v_carry_handoff_on_tpu():
    """Direct Pallas carry-I/O unit test: a vertical sweep split into two
    half-volume calls with the carry handed from the first to the second
    must equal the unsplit sweep — the exact mechanism the multi-device
    wavefront uses (parallel/tiling.py)."""
    import jax
    if jax.default_backend() != "tpu":
        pytest.skip("needs the TPU backend")
    import numpy as np
    import jax.numpy as jnp
    from openvo_tpu.ops.sgbm_pallas import sweep_v

    rng = np.random.default_rng(0)
    C = jnp.asarray(rng.integers(0, 1000, (64, 256, 64)).astype(np.int16))
    p1, p2 = 400.0, 1600.0

    @jax.jit
    def full(C):
        return sweep_v(C, (0, 1, -1), p1, p2, False, out_dtype=jnp.int32)

    @jax.jit
    def split(C):
        top, bot = C[:32], C[32:]
        s_top, carry = sweep_v(top, (0, 1, -1), p1, p2, False,
                               out_dtype=jnp.int32, return_carry=True)
        s_bot = sweep_v(bot, (0, 1, -1), p1, p2, False,
                        out_dtype=jnp.int32, init_carry=carry)
        return jnp.concatenate([s_top, s_bot], axis=0)

    ref = np.asarray(full(C))
    out = np.asarray(split(C))
    np.testing.assert_array_equal(out, ref)
