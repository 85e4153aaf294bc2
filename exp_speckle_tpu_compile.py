"""Time TPU compilation of the speckle subgraph: single-frame, then vmap x4,
then vmap x16 (the bench speckle-on stream shape that timed out >1500s).
Run stages separately:  python exp_speckle_tpu_compile.py {one,v4,v16}
so each remote compile is its own bounded process. Not part of the suite."""

import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(stage):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from openvo_tpu.config import SGBMParams
    from openvo_tpu.ops.sgbm import _speckle_filter

    H, W = 370, 1226
    p = SGBMParams(num_disparities=128, block_size=5, p1=200, p2=800,
                   disp12_max_diff=1, pre_filter_cap=63, uniqueness_ratio=10,
                   speckle_window_size=100, speckle_range=2)

    if stage == "one":
        f = jax.jit(lambda d, m: _speckle_filter(d, m, p).sum())
        args = (jnp.zeros((H, W), jnp.int32), jnp.ones((H, W), bool))
    else:
        b = {"v4": 4, "v16": 16}[stage]
        f = jax.jit(lambda d, m: jax.vmap(
            lambda a, x: _speckle_filter(a, x, p))(d, m).sum())
        args = (jnp.zeros((b, H, W), jnp.int32), jnp.ones((b, H, W), bool))

    t0 = time.time()
    lowered = f.lower(*args)
    t1 = time.time()
    compiled = lowered.compile()
    t2 = time.time()
    log(f"[{stage}] lower {t1-t0:.1f}s  TPU compile {t2-t1:.1f}s")
    # quick run for sanity
    out = float(compiled(*args))
    log(f"[{stage}] run ok, out={out}")


if __name__ == "__main__":
    main(sys.argv[1])
