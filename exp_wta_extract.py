"""Experiment: the final WTA sweep's per-column neighbor/uniqueness
reductions — MXU masked dots vs VPU masked lane-reduces.

The kernel computes, per column, s_m = S[best-1], s_p = S[best+1] and a
uniqueness-violation flag. Both engines give bit-identical results (each
mask selects exactly one lane; min == sum); the question is which is
faster when the fori_loop body serializes on the result (3 small
(376,128)@(128,1) dots stream ~376 MXU rows each vs 3 ~9-op lane-reduce
chains on the VPU). Timing protocol per .claude/skills/verify: scalar-
output jits, 10 pipelined dispatches, one float() sync. Output to a file.
"""

import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


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

    def prep(l, r):
        lp = sgbm.prefilter_xsobel(l.astype(jnp.float32), cap)
        rp = sgbm.prefilter_xsobel(r.astype(jnp.float32), cap)
        e = SP.prep_x2_envelopes(lp, rp)
        C_w, s1_w = SP.cost_sweep_fused(*e, p, int(sent), p1e, p2e,
                                        s1_dtype=enc(1)[0],
                                        out_layout="whd", keep_pad=True)
        C = jnp.swapaxes(C_w, 0, 1)
        dtv, bv = enc(3)
        sv = SP.sweep_v(C, (0, 1, -1), p1e, p2e, False, out_dtype=dtv,
                        out_bias=bv)
        return C_w, s1_w, jnp.swapaxes(sv, 0, 1), bv

    C_w, s1_w, sv_w, bv = jax.jit(prep)(left, right)
    float(C_w.astype(jnp.float32)[0, 0, 0])

    def run(use_dots):
        def f(C_w, s1_w, sv_w):
            d16, valid = SP.sweep_hw_wta(
                C_w, p1e, p2e, s1_w, sv_w, p, max_total=max_total,
                acc2_bias=bv, w_true=IMG_SIZE[0], use_dots=use_dots)
            return d16.sum() + valid.astype(jnp.int32).sum()
        return jax.jit(f)

    outs = {}
    for use_dots in (True, False):
        fn = run(use_dots)
        t0 = time.time()
        outs[use_dots] = int(fn(C_w, s1_w, sv_w))
        log(f"use_dots={use_dots}: compile+first {time.time()-t0:.1f}s")
        t0 = time.time()
        rs = [fn(C_w, s1_w, sv_w) for _ in range(10)]
        float(rs[-1])
        log(f"use_dots={use_dots}: {(time.time()-t0)/10*1000:.2f} ms")
    assert outs[True] == outs[False], outs
    log("outputs identical across engines")


if __name__ == "__main__":
    main()
