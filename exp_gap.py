"""Attribute the extract-stage integration gap: cumulative jits through
compute_3d's internals (remap -> sgbm -> reproject -> inf-fill -> crop)
and extract (+mask +orb), so adjacent differences locate the ~4 ms
between the kernel stage sum and the measured frame. Not part of the
test suite."""

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
    log(f"{name:40s} {dt * 1000:8.2f} ms")
    return dt


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from openvo_tpu import OdometerConfig, StereoCamera
    from openvo_tpu.geometry.reproject import reproject_image_to_3d
    from openvo_tpu.io.synthetic import render_stereo_sequence
    from openvo_tpu.models.stereo_odometer import (init_state,
                                                   make_pipeline_fns,
                                                   make_step)
    from openvo_tpu.ops import sgbm
    from openvo_tpu.ops.orb import detect_and_compute

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
    params = cam.sgbm
    sl = cam.crop_slice

    def to16(l, r):
        lf = cam._remap_left(l.astype(jnp.float32))
        rf = cam._remap_right(r.astype(jnp.float32))
        return sgbm.sgbm_disparity16(lf, rf, params)

    noop = timeit("noop", jax.jit(lambda x: x.sum()),
                  jnp.zeros((8, 128), jnp.float32))
    timeit("G1 remap x2 + sgbm16", jax.jit(
        lambda l, r: to16(l, r).astype(jnp.int32).sum()), left, right)
    timeit("G2 G1 + /16 float", jax.jit(
        lambda l, r: (to16(l, r).astype(jnp.float32) / 16.0).sum()),
        left, right)

    def upto_xyz(l, r):
        disp = to16(l, r).astype(jnp.float32) / 16.0
        xyz = reproject_image_to_3d(disp, cam._q_dev)
        valid = disp >= (params.min_disparity - 0.75)
        return jnp.where(valid[..., None], xyz, jnp.inf), disp

    timeit("G3 G2 + reproject + inf-fill", jax.jit(
        lambda l, r: sum(jnp.where(jnp.isfinite(x), x, 0.0).sum()
                         for x in upto_xyz(l, r))), left, right)

    fn3d = cam.compute_3d_fn(False, False)
    timeit("G4 compute_3d (with crop)", jax.jit(
        lambda l, r: sum(
            jnp.where(jnp.isfinite(x.astype(jnp.float32)),
                      x.astype(jnp.float32), 0.0).sum()
            for x in fn3d(l, r))), left, right)

    fns = make_pipeline_fns(cam, cfg, color=False)

    timeit("G5 extract (c3d+mask+orb)", jax.jit(
        lambda l, r: (lambda f: f.desc.astype(jnp.int32).sum()
                      + f.disp.sum())(fns["extract"](l, r))), left, right)

    xyz0, disp0, img0 = jax.jit(fn3d)(left, right)
    fmask = ((disp0 >= cfg.min_valid_disparity)
             & (disp0 <= cfg.max_valid_disparity)).astype(jnp.uint8)
    img0, fmask = jax.device_put(img0), jax.device_put(fmask)
    timeit("G6 orb alone (cropped)", jax.jit(
        lambda im, m: (lambda f: f["desc"].astype(jnp.int32).sum())(
            detect_and_compute(im, m, cfg.orb))), img0, fmask)

    step = make_step(cam, cfg, color=False)
    state0 = init_state(cam.cropped_shape, cfg.orb.max_keypoints)
    timeit("G7 FULL STEP", jax.jit(
        lambda s, l, r: (lambda o: o[0].c_T_w.sum()
                         + o[1].astype(jnp.int32))(step(s, l, r))),
        state0, left, right)


if __name__ == "__main__":
    main()
