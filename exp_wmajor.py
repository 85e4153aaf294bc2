"""Validate + time the W-major SGBM path (round 4) against the h-major
round-3 path. Both must be BIT-IDENTICAL (all arithmetic is integer-exact
f32; only the memory layout of the horizontal scans changed).

Not part of the test suite (tests/test_sgbm.py re-validates vs cv2)."""

import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(name, fn, *args, reps=10):
    float(fn(*args))
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

    def prefilt(l, r):
        lp = sgbm.prefilter_xsobel(l.astype(jnp.float32), cap)
        rp = sgbm.prefilter_xsobel(r.astype(jnp.float32), cap)
        return lp, rp

    def old_path(l, r):
        lp, rp = prefilt(l, r)
        cost_max = p.block_size * p.block_size * int(sent)
        per_dir = cost_max + int(p2e)
        max_total = p.num_paths * per_dir
        enc = SP._partial_enc_ladder(per_dir)
        lp2, llo, lhi, rp2, rlo, rhi = SP.prep_x2_envelopes(lp, rp)
        C, s1 = SP.cost_sweep_fused(lp2, llo, lhi, rp2, rlo, rhi, p,
                                    int(sent), p1e, p2e,
                                    s1_dtype=enc(1)[0])
        return SP._finish_from_s1(C, s1, p, p1e, p2e, enc, max_total)

    def new_path(l, r):
        lp, rp = prefilt(l, r)
        return SP.sgbm_fused_tpu(lp, rp, p, int(sent))

    d_old, v_old = jax.jit(old_path)(left, right)
    d_new, v_new = jax.jit(new_path)(left, right)
    d_old, v_old = np.asarray(d_old), np.asarray(v_old)
    d_new, v_new = np.asarray(d_new), np.asarray(v_new)
    same_d = np.array_equal(d_old, d_new)
    same_v = np.array_equal(v_old, v_new)
    log(f"disp16 identical: {same_d}   valid identical: {same_v}")
    if not same_d:
        bad = d_old != d_new
        log(f"  mismatched: {bad.sum()} / {bad.size} "
            f"({100*bad.mean():.3f}%); first rows: "
            f"{sorted(set(np.where(bad)[0][:20].tolist()))}")
    if not same_v:
        bad = v_old != v_new
        log(f"  valid mismatched: {bad.sum()} ({100*bad.mean():.3f}%)")

    noop = timeit("noop baseline", jax.jit(lambda x: x.sum()),
                  jnp.zeros((8, 128), jnp.float32))
    t_old = timeit("OLD h-major full fused sgbm", jax.jit(
        lambda l, r: old_path(l, r)[0].sum()), left, right)
    t_new = timeit("NEW w-major full fused sgbm", jax.jit(
        lambda l, r: new_path(l, r)[0].sum()), left, right)
    log(f"net kernel time old {1000*(t_old-noop):.2f} ms -> "
        f"new {1000*(t_new-noop):.2f} ms")


if __name__ == "__main__":
    main()
