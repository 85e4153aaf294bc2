"""Does unrolling the final sweep's fori_loop recover ILP? (The 128-wide
python unroll spilled 116 MB of registers; small unroll factors may
balance ILP against register pressure.) Times sweep_hw_wta at
unroll 1/2/4 and validates bit-identity. Not part of the test suite."""

import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(name, fn, *args, reps=10):
    t0 = time.time()
    float(np.asarray(fn(*args)).reshape(-1)[0])
    log(f"...{name}: compile+first {time.time()-t0:.1f}s")
    t0 = time.time()
    outs = [fn(*args) for _ in range(reps)]
    float(np.asarray(outs[-1]).reshape(-1)[0])
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
    cost_max = p.block_size * p.block_size * int(sent)
    per_dir = cost_max + int(p2e)
    max_total = p.num_paths * per_dir
    enc = SP._partial_enc_ladder(per_dir)
    dtv, bv = enc(3)

    def prep(l, r):
        lp = sgbm.prefilter_xsobel(l.astype(jnp.float32), cap)
        rp = sgbm.prefilter_xsobel(r.astype(jnp.float32), cap)
        e = SP.prep_x2_envelopes(lp, rp)
        C_w, s1_w = SP.cost_sweep_fused(*e, p, int(sent), p1e, p2e,
                                        s1_dtype=enc(1)[0],
                                        out_layout="whd", keep_pad=True)
        C = jnp.swapaxes(C_w, 0, 1)
        sv = SP.sweep_v(C, (0, 1, -1), p1e, p2e, False, out_dtype=dtv,
                        out_bias=bv)
        return C_w, s1_w, jnp.swapaxes(sv, 0, 1)

    C_w, s1_w, sv_w = jax.jit(prep)(left, right)
    float(C_w.astype(jnp.float32)[0, 0, 0])

    noop = timeit("noop", jax.jit(lambda x: x.sum()),
                  jnp.zeros((8, 128), jnp.float32))
    outs = {}
    for u in (1, 2, 4):
        fn = jax.jit(lambda a, b, c, u=u: SP.sweep_hw_wta(
            a, p1e, p2e, b, c, p, max_total=max_total, acc2_bias=bv,
            w_true=IMG_SIZE[0], unroll=u))
        outs[u] = tuple(np.asarray(x) for x in fn(C_w, s1_w, sv_w))
        timeit(f"sweep_hw_wta unroll={u}", jax.jit(
            lambda a, b, c, u=u: sum(
                x.astype(jnp.int32).sum() for x in SP.sweep_hw_wta(
                    a, p1e, p2e, b, c, p, max_total=max_total,
                    acc2_bias=bv, w_true=IMG_SIZE[0], unroll=u))),
            C_w, s1_w, sv_w)
    for u in (2, 4):
        same = all(np.array_equal(x, y) for x, y in zip(outs[1], outs[u]))
        log(f"unroll={u} bit-identical to unroll=1: {same}")


if __name__ == "__main__":
    main()
