"""Per-stage SGBM timing on the real chip (scalar-output jits + float()
sync; see .claude/skills/verify for why block_until_ready can't be used
through the tunnel). Not part of the test suite."""

import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(name, fn, *args, reps=10):
    float(fn(*args))  # compile + sync
    # Pipelined async dispatch: K calls in flight, one final sync. The
    # tunnel adds a large per-sync RTT; amortize it over reps (and compare
    # against the 'noop baseline' row).
    t0 = time.time()
    outs = [fn(*args) for _ in range(reps)]
    float(outs[-1])
    dt = (time.time() - t0) / reps
    log(f"{name:28s} {dt * 1000:8.2f} ms")
    return dt


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from openvo_tpu.config import SGBMParams
    from openvo_tpu.io.synthetic import render_stereo_sequence
    from openvo_tpu.ops import sgbm
    from openvo_tpu.ops.sgbm_pallas import sweep_h, sweep_h_wta

    IMG_SIZE = (1242, 376)
    seq = render_stereo_sequence(n_frames=1, img_size=IMG_SIZE, f=718.0,
                                 baseline=0.54, seed=0)
    left = jnp.asarray(np.clip(seq["left"][0], 0, 255).astype(np.uint8))
    right = jnp.asarray(np.clip(seq["right"][0], 0, 255).astype(np.uint8))
    p = SGBMParams(num_disparities=128, block_size=5, p1=200, p2=800,
                   disp12_max_diff=1, pre_filter_cap=63, uniqueness_ratio=10)
    cap = max(p.pre_filter_cap, 15) | 1

    @jax.jit
    def full(l, r):
        return sgbm.sgbm_disparity16(l, r, p).astype(jnp.int32).sum()

    @jax.jit
    def costblock(l, r):
        lp = sgbm.prefilter_xsobel(l.astype(jnp.float32), cap)
        rp = sgbm.prefilter_xsobel(r.astype(jnp.float32), cap)
        C = sgbm.bt_cost_volume(lp, rp, p.min_disparity, p.num_disparities,
                                p.block_size, cap)
        C = sgbm.block_sum(C, p.block_size)
        return C.astype(jnp.int32).sum()

    def make_C(l, r):
        lp = sgbm.prefilter_xsobel(l.astype(jnp.float32), cap)
        rp = sgbm.prefilter_xsobel(r.astype(jnp.float32), cap)
        C = sgbm.bt_cost_volume(lp, rp, p.min_disparity, p.num_disparities,
                                p.block_size, cap)
        return sgbm.block_sum(C, p.block_size)

    C = jax.jit(make_C)(left, right)
    C.block_until_ready()
    sent = sgbm.int16_sentinel(p.block_size, cap)
    cost_max = p.block_size * p.block_size * sent
    p1e, p2e = 2 * p.effective_p1, 2 * p.effective_p2

    per_dir = cost_max + int(p2e)
    max_total = p.num_paths * per_dir

    @jax.jit
    def hsingle(C):
        s1 = sweep_h(C, p1e, p2e, False, out_dtype=jnp.int16)
        return s1.astype(jnp.int32).sum()

    @jax.jit
    def final_wta(C):
        s3 = jnp.zeros(C.shape, jnp.int16)
        d16, v = sweep_h_wta(C, p1e, p2e, s3, p, max_total=max_total)
        return d16.sum() + v.sum()

    timeit("noop baseline", jax.jit(lambda x: x.sum()),
           jnp.zeros((8, 128), jnp.float32))
    timeit("full sgbm_disparity16", full, left, right)
    timeit("cost+block", costblock, left, right)
    timeit("sweep_h fwd only", hsingle, C)
    timeit("final hsweep+wta+ring", final_wta, C)

    from openvo_tpu.ops.sgbm_pallas import sweep_v
    import dataclasses

    @jax.jit
    def v3_accum(C):
        s1 = jnp.zeros(C.shape, jnp.int16)
        s3 = sweep_v(C, (0, 1, -1), p1e, p2e, False, accum=s1,
                     out_dtype=jnp.int16, out_bias=32768.0)
        return s3.astype(jnp.int32).sum()

    p_nolr = dataclasses.replace(p, disp12_max_diff=-1)
    p_min = dataclasses.replace(p, disp12_max_diff=-1, uniqueness_ratio=0)

    @jax.jit
    def final_nolr(C):
        s3 = jnp.zeros(C.shape, jnp.int16)
        d16, v = sweep_h_wta(C, p1e, p2e, s3, p_nolr, max_total=max_total)
        return d16.sum() + v.sum()

    @jax.jit
    def final_min(C):
        s3 = jnp.zeros(C.shape, jnp.int16)
        d16, v = sweep_h_wta(C, p1e, p2e, s3, p_min, max_total=max_total)
        return d16.sum() + v.sum()

    @jax.jit
    def final_unpacked(C):
        s3 = jnp.zeros(C.shape, jnp.int16)
        d16, v = sweep_h_wta(C, p1e, p2e, s3, p, max_total=None)
        return d16.sum() + v.sum()

    timeit("sweep_v 3dir accum (noWTA)", v3_accum, C)
    timeit("final wta no-LR", final_nolr, C)
    timeit("final wta no-LR no-uniq", final_min, C)
    timeit("final wta unpacked-argmin", final_unpacked, C)


if __name__ == "__main__":
    main()
