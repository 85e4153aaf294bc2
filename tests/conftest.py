"""Test configuration.

Platform policy: the suite runs on whatever JAX platform the environment
provides (the dev box tunnels to a real TPU chip, where compiles take ~1-3s
and transfers are fast). On this box the CPU backend pays a pathological
~40-120s first device-to-host transfer (axon plugin side effect) plus very
slow single-core XLA-CPU compiles, so CPU is NOT forced globally; the
multi-chip sharding tests that need the 8-virtual-device CPU mesh run in a
subprocess with JAX_PLATFORMS=cpu (see tests/test_sharding.py), which is the
SURVEY.md section 4 "fake backend" strategy.

Set OPENVO_TEST_PLATFORM=cpu to force everything onto CPU anyway.
"""

import os

if "OPENVO_TEST_PLATFORM" in os.environ:
    os.environ["JAX_PLATFORMS"] = os.environ["OPENVO_TEST_PLATFORM"]
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    # Harmless on TPU; gives the CPU fallback an 8-device virtual mesh.
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
# Oracle tests compare against float64 NumPy/OpenCV: keep matmuls exact f32.
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compilation cache: big win on repeat runs (single-core host).
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
