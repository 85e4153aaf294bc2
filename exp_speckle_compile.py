"""Isolate the speckle-on stream compile blowup (bench speckle-on timed out
at 1500s in compile). Times XLA *compilation* (lower+compile, no execution)
of the speckle subgraph and its vmapped form on the CPU backend.
Not part of the test suite."""

import os
import sys
import time

# CPU-only child semantics (see .claude/skills/verify): pop the axon vars.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ.pop("AXON_POOL_SVC_OVERRIDE", None)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def ctime(name, fn, *args):
    t0 = time.time()
    lowered = fn.lower(*args)
    t1 = time.time()
    lowered.compile()
    t2 = time.time()
    log(f"{name:44s} lower {t1-t0:6.1f}s  compile {t2-t1:6.1f}s")


def main():
    import jax
    import jax.numpy as jnp

    from openvo_tpu.config import SGBMParams
    from openvo_tpu.ops.sgbm import _speckle_filter

    H, W = 370, 1226  # cropped KITTI-ish
    p = SGBMParams(num_disparities=128, block_size=5, p1=200, p2=800,
                   disp12_max_diff=1, pre_filter_cap=63, uniqueness_ratio=10,
                   speckle_window_size=100, speckle_range=2)

    d16 = jnp.zeros((H, W), jnp.int32)
    v = jnp.ones((H, W), bool)
    d16b = jnp.zeros((16, H, W), jnp.int32)
    vb = jnp.ones((16, H, W), bool)

    f1 = jax.jit(lambda d, m: _speckle_filter(d, m, p).sum())
    ctime("speckle single-frame", f1, d16, v)

    f16 = jax.jit(lambda d, m: jax.vmap(
        lambda a, b: _speckle_filter(a, b, p))(d, m).sum())
    ctime("speckle vmap x16", f16, d16b, vb)


if __name__ == "__main__":
    main()
