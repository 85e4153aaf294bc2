"""Full-step per-stage timing on the real chip: itemizes the whole frame
budget (remap, prefilter, SGBM, reproject, mask, ORB, match/pose, scan
overhead) so the bench frame time is accounted stage by stage
(VERDICT r2 item 2). Uses the pipelined scalar-jit method (see
.claude/skills/verify: block_until_ready is a no-op through the tunnel).
Not part of the test suite."""

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
    log(f"{name:34s} {dt * 1000:8.2f} ms")
    return dt


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from openvo_tpu import OdometerConfig, StereoCamera
    from openvo_tpu.io.synthetic import render_stereo_sequence
    from openvo_tpu.models.stereo_odometer import (init_state,
                                                   make_pipeline_fns,
                                                   make_step)
    from openvo_tpu.ops import sgbm
    from openvo_tpu.ops.orb import detect_and_compute
    from openvo_tpu.geometry.reproject import reproject_image_to_3d

    IMG_SIZE = (1242, 376)
    SGBM_P = {
        "minDisparity": 0, "numDisparities": 128, "blockSize": 5,
        "P1": 200, "P2": 800, "disp12MaxDiff": 1, "preFilterCap": 63,
        "uniquenessRatio": 10, "speckleWindowSize": 0, "speckleRange": 0,
    }
    seq = render_stereo_sequence(n_frames=2, img_size=IMG_SIZE, f=718.0,
                                 baseline=0.54, seed=0)
    cam = StereoCamera(seq["K"], seq["dist"], seq["K"], seq["dist"],
                       {"R": seq["R"], "T": seq["T"]}, SGBM_P, IMG_SIZE)
    cfg = OdometerConfig()
    left = jnp.asarray(np.clip(seq["left"][0], 0, 255).astype(np.uint8))
    right = jnp.asarray(np.clip(seq["right"][0], 0, 255).astype(np.uint8))
    left2 = jnp.asarray(np.clip(seq["left"][1], 0, 255).astype(np.uint8))
    right2 = jnp.asarray(np.clip(seq["right"][1], 0, 255).astype(np.uint8))

    from openvo_tpu.ops.remap import displacement_bounds
    log(f"remap bounds L: {displacement_bounds(*cam.map_left)} "
        f"R: {displacement_bounds(*cam.map_right)}")

    remap_l = cam._remap_left
    params = cam.sgbm
    sl = cam.crop_slice

    @jax.jit
    def t_remap(l):
        return remap_l(l.astype(jnp.float32)).sum()

    @jax.jit
    def t_sgbm(l, r):
        return sgbm.sgbm_disparity(
            remap_l(l.astype(jnp.float32)),
            cam._remap_right(r.astype(jnp.float32)), params).sum()

    @jax.jit
    def t_compute3d(l, r):
        fn = cam.compute_3d_fn(False, False)
        xyz, disp, img = fn(l, r)
        return jnp.where(jnp.isfinite(xyz), xyz, 0.0).sum() + disp.sum()

    @jax.jit
    def t_reproject(l, r):
        lf = remap_l(l.astype(jnp.float32))
        rf = cam._remap_right(r.astype(jnp.float32))
        disp = sgbm.sgbm_disparity(lf, rf, params)
        xyz = reproject_image_to_3d(disp, cam._q_dev)
        valid = disp >= (params.min_disparity - 0.75)
        xyz = jnp.where(valid[..., None], xyz, jnp.inf)
        return (jnp.where(jnp.isfinite(xyz), xyz, 0.0)[sl[0], sl[1]].sum()
                + disp.sum())

    # ORB on a realistic cropped frame
    fn3d = jax.jit(cam.compute_3d_fn(False, False))
    xyz0, disp0, img0 = fn3d(left, right)
    fmask = ((disp0 >= cfg.min_valid_disparity)
             & (disp0 <= cfg.max_valid_disparity)).astype(jnp.uint8)
    img0, fmask = jax.device_put(img0), jax.device_put(fmask)

    @jax.jit
    def t_orb(img, m):
        f = detect_and_compute(img, m, cfg.orb)
        return f["desc"].astype(jnp.int32).sum() + f["xy"].sum()

    # Full extract (compute_3d + mask + orb)
    fns = make_pipeline_fns(cam, cfg, color=False)

    @jax.jit
    def t_extract(l, r):
        f = fns["extract"](l, r)
        return f.desc.astype(jnp.int32).sum() + f.disp.sum()

    # Matching + pose on two real frames
    fA = jax.jit(fns["extract"])(left, right)
    fB = jax.jit(fns["extract"])(left2, right2)
    fA = jax.device_put(fA)
    fB = jax.device_put(fB)

    @jax.jit
    def t_attempt(a, b):
        T, ok, code, n = fns["attempt"](a, b, jnp.asarray(0, jnp.int32),
                                        jnp.asarray(0, jnp.int32))
        return T.sum() + n

    # Full step
    step = make_step(cam, cfg, color=False)
    state0 = init_state(cam.cropped_shape, cfg.orb.max_keypoints)

    @jax.jit
    def t_step(state, l, r):
        s2, ok, _ = step(state, l, r)
        return s2.c_T_w.sum() + s2.skipped

    timeit("noop baseline", jax.jit(lambda x: x.sum()),
           jnp.zeros((8, 128), jnp.float32))
    t_rm = timeit("remap (1 img)", t_remap, left)
    t_sg = timeit("remap x2 + sgbm", t_sgbm, left, right)
    t_rp = timeit("remap x2 + sgbm + reproject", t_reproject, left, right)
    t_c3 = timeit("compute_3d (full)", t_compute3d, left, right)
    t_ob = timeit("orb (cropped img)", t_orb, img0, fmask)
    t_ex = timeit("extract = c3d + mask + orb", t_extract, left, right)
    t_at = timeit("match + sample + kabsch", t_attempt, fA, fB)
    t_st = timeit("FULL STEP", t_step, state0, left, right)

    log("-" * 46)
    log(f"sgbm alone       ~{(t_sg - 2 * t_rm) * 1000:7.2f} ms")
    log(f"reproject+crop   ~{(t_rp - t_sg) * 1000:7.2f} ms")
    log(f"mask+orb         ~{(t_ex - t_c3) * 1000:7.2f} ms")
    log(f"step - extract   ~{(t_st - t_ex) * 1000:7.2f} ms")
    log(f"unaccounted vs step: "
        f"{(t_st - (t_c3 + (t_ex - t_c3) + t_at)) * 1000:7.2f} ms")


if __name__ == "__main__":
    main()
