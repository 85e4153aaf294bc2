"""Why does lax.scan add ~4.7 ms/frame over a single step (exp_gap)?
Hypothesis: the fallback attempt's lax.cond copies its big captured
operands (prev/current FrameFeatures, ~9 MB each) per iteration.
Measures the full-step scan vs an attempt-1-only scan body (no cond)
in one process. Not part of the test suite."""

import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(name, fn, *args, reps=5):
    t0 = time.time()
    r = fn(*args)
    float(np.asarray(jax_first(r)).reshape(-1)[0])
    log(f"...{name}: compile+first {time.time()-t0:.1f}s")
    t0 = time.time()
    outs = [fn(*args) for _ in range(reps)]
    float(np.asarray(jax_first(outs[-1])).reshape(-1)[0])
    dt = (time.time() - t0) / reps
    log(f"{name:36s} {dt * 1000:8.2f} ms  ({16/dt:.1f} fps)")
    return dt


def jax_first(x):
    import jax
    return jax.tree_util.tree_leaves(x)[0]


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from openvo_tpu import OdometerConfig, StereoCamera
    from openvo_tpu.io.synthetic import render_stereo_sequence
    from openvo_tpu.models.stereo_odometer import (OdomState, init_state,
                                                   make_pipeline_fns,
                                                   make_step)

    IMG_SIZE = (1242, 376)
    SGBM_P = {
        "minDisparity": 0, "numDisparities": 128, "blockSize": 5,
        "P1": 200, "P2": 800, "disp12MaxDiff": 1, "preFilterCap": 63,
        "uniquenessRatio": 10, "speckleWindowSize": 0, "speckleRange": 0,
    }
    seq = render_stereo_sequence(n_frames=16, img_size=IMG_SIZE, f=718.0,
                                 baseline=0.54, seed=0, step=0.5,
                                 yaw_rate=0.004)
    cam = StereoCamera(seq["K"], seq["dist"], seq["K"], seq["dist"],
                      {"R": seq["R"], "T": seq["T"]}, SGBM_P, IMG_SIZE)
    cfg = OdometerConfig()
    lefts = jnp.asarray(np.clip(seq["left"], 0, 255).astype(np.uint8))
    rights = jnp.asarray(np.clip(seq["right"], 0, 255).astype(np.uint8))

    def mk():
        return init_state(cam.cropped_shape, cfg.orb.max_keypoints)

    step = make_step(cam, cfg, color=False)

    def run_seq(state, ls, rs):
        def body(s, lr):
            s2, ok, _ = step(s, lr[0], lr[1])
            return s2, (ok, s2.c_T_w)
        return jax.lax.scan(body, state, (ls, rs))

    # Attempt-1-only body: same extract + matching + state roll, NO cond.
    fns = make_pipeline_fns(cam, cfg, color=False)
    extract, attempt = fns["extract"], fns["attempt"]

    def run_nocond(state, ls, rs):
        def body(s, lr):
            feats = extract(lr[0], lr[1])
            n_kps = jnp.sum(feats.kp_valid.astype(jnp.int32))
            few = n_kps < cfg.min_matches
            first = ~s.has_cur
            T1, ok1, code1, _ = attempt(s.cur, feats, s.skipped,
                                        s.skip_code)
            success = ~few & (first | ok1)

            def sel(a, b):
                return jax.tree_util.tree_map(
                    lambda x, y: jnp.where(success, x, y), a, b)

            s2 = OdomState(
                cur=sel(feats, s.cur), prev=sel(s.cur, s.prev),
                has_cur=s.has_cur | success,
                has_prev=jnp.where(success, s.has_cur, s.has_prev),
                c_T_w=jnp.where(ok1 & ~first, T1 @ s.c_T_w, s.c_T_w),
                c_T_w_prev=jnp.where(ok1, s.c_T_w, s.c_T_w_prev),
                skipped=jnp.where(success, 0, s.skipped + 1
                                  ).astype(jnp.int32),
                skip_code=code1.astype(jnp.int32),
            )
            return s2, (success, s2.c_T_w)
        return jax.lax.scan(body, state, (ls, rs))

    noop = timeit("noop", jax.jit(lambda x: (x.sum(),)),
                  jnp.zeros((8, 128), jnp.float32))
    # No donation: timeit reuses the same state argument across reps.
    f1 = jax.jit(run_seq)
    t1 = timeit("scan FULL step (bench lat)", f1, mk(), lefts, rights)
    f2 = jax.jit(run_nocond)
    t2 = timeit("scan attempt-1-only (no cond)", f2, mk(), lefts, rights)
    log(f"cond cost ~ {(t1 - t2) * 1000 / 16:.2f} ms/frame")


if __name__ == "__main__":
    main()
