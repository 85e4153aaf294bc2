"""Per-stage SGBM timing on the real chip (scalar-output jits + float()
sync; see .claude/skills/verify for why block_until_ready can't be used
through the tunnel). Round-4 version: W-major stage rows, most important
rows first (a timeout still yields the head of the table), no legacy-path
diagnostic compiles. Run with output to a FILE (not a tail pipe — a killed
run loses the pipe buffer). Not part of the test suite."""

import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(name, fn, *args, reps=10):
    t0 = time.time()
    float(fn(*args))  # compile + sync
    log(f"...{name}: compile+first {time.time()-t0:.1f}s")
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
    cost_max = p.block_size * p.block_size * int(sent)
    per_dir = cost_max + int(p2e)
    max_total = p.num_paths * per_dir
    enc = SP._partial_enc_ladder(per_dir)

    noop = timeit("noop baseline", jax.jit(lambda x: x.sum()),
                  jnp.zeros((8, 128), jnp.float32))

    disp_j = jax.jit(lambda l, r: sgbm.sgbm_disparity16(l, r, p))
    d16 = np.asarray(disp_j(left, right))
    try:
        import cv2
        m = cv2.StereoSGBM_create(
            minDisparity=p.min_disparity, numDisparities=p.num_disparities,
            blockSize=p.block_size, P1=p.p1, P2=p.p2,
            disp12MaxDiff=p.disp12_max_diff, preFilterCap=p.pre_filter_cap,
            uniquenessRatio=p.uniqueness_ratio)
        ref = m.compute(np.asarray(left), np.asarray(right))
        both = (d16 >= 0) & (ref >= 0)
        agree = (np.abs(d16 - ref) <= 16)[both]
        log(f"VALID vs cv2: both-valid {both.mean():.3f}, "
            f"1px agreement {agree.mean():.4f} (need > 0.90)")
    except Exception as e:  # noqa: BLE001 - oracle optional here
        log(f"cv2 oracle skipped: {e}")

    @jax.jit
    def full(l, r):
        return sgbm.sgbm_disparity16(l, r, p).astype(jnp.int32).sum()

    timeit("full sgbm_disparity16 (w-major)", full, left, right)

    # --- stage rows on the W-major path ---
    def prefilt(l, r):
        lp = sgbm.prefilter_xsobel(l.astype(jnp.float32), cap)
        rp = sgbm.prefilter_xsobel(r.astype(jnp.float32), cap)
        return lp, rp

    def cost_w(l, r):
        lp, rp = prefilt(l, r)
        e = SP.prep_x2_envelopes(lp, rp)
        return SP.cost_sweep_fused(*e, p, int(sent), p1e, p2e,
                                   s1_dtype=enc(1)[0], out_layout="whd",
                                   keep_pad=True)

    C_w, s1_w = jax.jit(cost_w)(left, right)
    float(C_w.astype(jnp.float32)[0, 0, 0])
    C = jax.jit(lambda a: jnp.swapaxes(a, 0, 1))(C_w)
    float(C.astype(jnp.float32)[0, 0, 0])
    dtv, bv = enc(3)
    sv = jax.jit(lambda C: SP.sweep_v(C, (0, 1, -1), p1e, p2e, False,
                                      out_dtype=dtv, out_bias=bv))(C)
    sv_w = jax.jit(lambda a: jnp.swapaxes(a, 0, 1))(sv)
    float(sv_w.astype(jnp.float32)[0, 0, 0])

    timeit("cost+box+s1 fused (whd out)", jax.jit(
        lambda l, r: sum(x.astype(jnp.int32).sum() for x in cost_w(l, r))),
        left, right)
    timeit("sweep_v 3dir (no accum)", jax.jit(
        lambda C: SP.sweep_v(C, (0, 1, -1), p1e, p2e, False, out_dtype=dtv,
                             out_bias=bv).astype(jnp.int32).sum()), C)
    timeit("final sweep_hw_wta (w-major)", jax.jit(
        lambda C_w, s1_w, sv_w: sum(
            x.astype(jnp.int32).sum()
            for x in SP.sweep_hw_wta(C_w, p1e, p2e, s1_w, sv_w, p,
                                     max_total=max_total, acc2_bias=bv,
                                     w_true=IMG_SIZE[0]))),
        C_w, s1_w, sv_w)
    # Transposes priced by materializing through a reshape-consumer the
    # compiler can't elide (sum alone is transpose-invariant!).
    timeit("transpose whd->hwd (priced)", jax.jit(
        lambda a: jnp.swapaxes(a, 0, 1).reshape(-1, 128)[::7].astype(
            jnp.int32).sum()), C_w)


if __name__ == "__main__":
    main()
