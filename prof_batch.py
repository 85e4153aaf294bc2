"""Does stacking frames along H amortize the SGBM sweeps' serial latency?

Times each Pallas stage at 1x/2x/4x stacked KITTI heights. If time scales
sublinearly with the stack factor, the kernels are latency-bound per grid
step and a batched-window pipeline (parallel/pipeline.py) buys throughput;
if it scales ~linearly they are VPU/HBM-throughput-bound and batching only
helps the non-SGBM stages. Not part of the test suite."""

import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(name, fn, *args, reps=10):
    float(fn(*args))  # compile + sync
    t0 = time.time()
    outs = [fn(*args) for _ in range(reps)]
    float(outs[-1])
    dt = (time.time() - t0) / reps
    log(f"{name:36s} {dt * 1000:8.2f} ms")
    return dt


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from openvo_tpu.config import SGBMParams
    from openvo_tpu.ops import sgbm
    from openvo_tpu.ops.sgbm_pallas import sweep_h, sweep_h_wta, sweep_v

    H, W, D = 376, 1242, 128
    p = SGBMParams(num_disparities=D, block_size=5, p1=200, p2=800,
                   disp12_max_diff=1, pre_filter_cap=63, uniqueness_ratio=10)
    cap = max(p.pre_filter_cap, 15) | 1
    sent = sgbm.int16_sentinel(p.block_size, cap)
    cost_max = p.block_size * p.block_size * sent
    p1e, p2e = float(2 * p.effective_p1), float(2 * p.effective_p2)
    per_dir = cost_max + int(p2e)
    max_total = p.num_paths * per_dir

    rng = np.random.default_rng(0)
    base = rng.integers(0, 2 * cost_max // (p.block_size ** 2),
                        size=(H, W, D)).astype(np.int16)
    img = rng.integers(0, 255, size=(H, W)).astype(np.float32)

    from openvo_tpu.ops.sgbm_pallas import cost_sweep_fused, prep_x2_envelopes

    for b in (1, 2, 4):
        # Horizontal sweeps + cost kernel batch along H (serial axis is W);
        # vertical sweeps batch along W (serial axis is H).
        C = jnp.asarray(np.tile(base, (b, 1, 1)))
        Cw = jnp.asarray(np.tile(base, (1, b, 1)))
        imgs = jnp.asarray(np.tile(img, (b, 1)))

        @jax.jit
        def h_fwd(C):
            return sweep_h(C, p1e, p2e, False,
                           out_dtype=jnp.int16).astype(jnp.int32).sum()

        @jax.jit
        def v3(Cw):
            s1 = jnp.zeros(Cw.shape, jnp.int16)
            return sweep_v(Cw, (0, 1, -1), p1e, p2e, False, accum=s1,
                           out_dtype=jnp.int16,
                           out_bias=32768.0).astype(jnp.int32).sum()

        @jax.jit
        def costk(li, ri):
            lp2, llo, lhi, rp2, rlo, rhi = prep_x2_envelopes(li, ri)
            Ck, s1k = cost_sweep_fused(lp2, llo, lhi, rp2, rlo, rhi, p,
                                       int(sent), p1e, p2e,
                                       s1_dtype=jnp.int16)
            return Ck.astype(jnp.int32).sum() + s1k.astype(jnp.int32).sum()

        @jax.jit
        def wta(C):
            # (H, g=128, D) blocks of a stacked volume blow VMEM past b=1;
            # the batched pipeline runs the fused WTA per frame (row-local
            # stage), so time exactly that: b separate slices.
            s = jnp.asarray(0, jnp.int32)
            for k in range(b):
                Ck = C[k * H:(k + 1) * H]
                s3 = jnp.zeros(Ck.shape, jnp.int16)
                d16, v = sweep_h_wta(Ck, p1e, p2e, s3, p,
                                     max_total=max_total)
                s = s + d16.sum() + v.sum()
            return s

        t_c = timeit(f"b={b} cost_sweep_fused", costk, imgs, imgs)
        t_h = timeit(f"b={b} sweep_h fwd", h_fwd, C)
        t_v = timeit(f"b={b} sweep_v 3dir+accum (W-stack)", v3, Cw)
        t_w = timeit(f"b={b} sweep_h_wta+ring x{b}", wta, C)
        log(f"b={b} per-frame: cost {t_c/b*1e3:.2f} h {t_h/b*1e3:.2f} "
            f"v {t_v/b*1e3:.2f} wta {t_w/b*1e3:.2f} ms")


if __name__ == "__main__":
    main()
