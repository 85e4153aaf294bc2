"""Experiment: SGBM Pallas kernel grid/block-size tuning at KITTI volume
size. Measures each kernel at several g values to find per-grid-step
overhead vs block-size sweet spots. Scalar-output jits + pipelined
dispatch (tunnel-safe). Not part of the test suite."""

import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(name, fn, *args, reps=10):
    try:
        float(fn(*args))
    except Exception as e:  # noqa: BLE001 — experiment: report and move on
        log(f"{name:34s} FAILED {type(e).__name__}: {str(e)[:120]}")
        return None
    t0 = time.time()
    outs = [fn(*args) for _ in range(reps)]
    float(outs[-1])
    dt = (time.time() - t0) / reps
    log(f"{name:34s} {dt * 1000:8.2f} ms")
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
    from openvo_tpu.ops import sgbm_pallas as SP

    IMG_SIZE = (1242, 376)
    seq = render_stereo_sequence(n_frames=1, img_size=IMG_SIZE, f=718.0,
                                 baseline=0.54, seed=0)
    left = jnp.asarray(np.clip(seq["left"][0], 0, 255).astype(np.uint8))
    right = jnp.asarray(np.clip(seq["right"][0], 0, 255).astype(np.uint8))
    p = SGBMParams(num_disparities=128, block_size=5, p1=200, p2=800,
                   disp12_max_diff=1, pre_filter_cap=63, uniqueness_ratio=10)
    cap = max(p.pre_filter_cap, 15) | 1
    sent = sgbm.int16_sentinel(p.block_size, cap)
    p1e, p2e = float(2 * p.effective_p1), float(2 * p.effective_p2)
    cost_max = p.block_size * p.block_size * sent
    per_dir = cost_max + int(p2e)
    max_total = p.num_paths * per_dir

    def make_C(l, r):
        lp = sgbm.prefilter_xsobel(l.astype(jnp.float32), cap)
        rp = sgbm.prefilter_xsobel(r.astype(jnp.float32), cap)
        C = sgbm.bt_cost_volume(lp, rp, p.min_disparity, p.num_disparities,
                                p.block_size, cap)
        return sgbm.block_sum(C, p.block_size)

    C = jax.jit(make_C)(left, right)
    s1 = jax.jit(lambda C: SP.sweep_h(C, p1e, p2e, False,
                                      out_dtype=jnp.int16))(C)
    float(C.astype(jnp.float32).sum())

    noop = timeit("noop baseline", jax.jit(lambda x: x.sum()),
                  jnp.zeros((8, 128), jnp.float32))

    # Fused cost kernel (fixed CG=128)
    @jax.jit
    def t_fused(l, r):
        lp = sgbm.prefilter_xsobel(l.astype(jnp.float32), cap)
        rp = sgbm.prefilter_xsobel(r.astype(jnp.float32), cap)
        six = SP.prep_x2_envelopes(lp, rp)
        Cx, s1x = SP.cost_sweep_fused(*six, p, int(sent), p1e, p2e,
                                      s1_dtype=jnp.int16)
        return Cx.astype(jnp.int32).sum() + s1x.astype(jnp.int32).sum()

    timeit("cost_sweep_fused (CG=128)", t_fused, left, right)

    # sweep_h forward at several g
    for g in (16, 32, 64, 128):
        fn = jax.jit(lambda C, g=g: SP.sweep_h(
            C, p1e, p2e, False, out_dtype=jnp.int16,
            g=g).astype(jnp.int32).sum())
        timeit(f"sweep_h fwd g={g}", fn, C)

    # sweep_v 3-dir at several g
    for g in (4, 8, 16):
        fn = jax.jit(lambda C, s1, g=g: SP.sweep_v(
            C, (0, 1, -1), p1e, p2e, False, accum=s1, out_dtype=jnp.int16,
            out_bias=32768.0, g=g).astype(jnp.int32).sum())
        timeit(f"sweep_v 3dir g={g}", fn, C, s1)

    # final fused WTA sweep (g fixed 128); isolate ring and WTA costs
    import dataclasses
    s3 = jax.jit(lambda C, s1: SP.sweep_v(
        C, (0, 1, -1), p1e, p2e, False, accum=s1, out_dtype=jnp.int16,
        out_bias=32768.0))(C, s1)
    float(s3.astype(jnp.float32).sum())

    @jax.jit
    def t_final(C, s3):
        d16, v = SP.sweep_h_wta(C, p1e, p2e, s3, p, max_total=max_total,
                                acc_bias=32768.0)
        return d16.sum() + v.sum()

    p_nolr = dataclasses.replace(p, disp12_max_diff=-1)

    @jax.jit
    def t_final_nolr(C, s3):
        d16, v = SP.sweep_h_wta(C, p1e, p2e, s3, p_nolr,
                                max_total=max_total, acc_bias=32768.0)
        return d16.sum() + v.sum()

    timeit("sweep_h_wta (full)", t_final, C, s3)
    timeit("sweep_h_wta no-LR-ring", t_final_nolr, C, s3)

    # end-to-end
    @jax.jit
    def t_full(l, r):
        return sgbm.sgbm_disparity16(l, r, p).astype(jnp.int32).sum()

    timeit("FULL sgbm_disparity16", t_full, left, right)
    log(f"(noop baseline was {noop*1000:.2f} ms; subtract from all rows)")


if __name__ == "__main__":
    main()
