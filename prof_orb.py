"""Per-stage profile of the non-SGBM frame path (ORB, matching, pose) at
KITTI resolution. Scalar-output jits + pipelined dispatch (the tunnel
ignores block_until_ready; see .claude/skills/verify). Not part of the
test suite."""

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
    log(f"{name:28s} {dt * 1000:8.2f} ms")
    return dt


def _scalar(tree):
    import jax
    import jax.numpy as jnp
    leaves = jax.tree_util.tree_leaves(tree)
    return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from openvo_tpu import OdometerConfig, StereoCamera
    from openvo_tpu.io.synthetic import render_stereo_sequence
    from openvo_tpu.models.stereo_odometer import make_pipeline_fns
    from openvo_tpu.ops.orb import detect_and_compute
    from openvo_tpu.ops.hamming import ratio_test_match
    from openvo_tpu.ops.interpolate import bilinear_sample_3d

    IMG_SIZE = (1242, 376)
    SGBM = {
        "minDisparity": 0, "numDisparities": 128, "blockSize": 5,
        "P1": 200, "P2": 800, "disp12MaxDiff": 1, "preFilterCap": 63,
        "uniquenessRatio": 10, "speckleWindowSize": 0, "speckleRange": 0,
    }
    seq = render_stereo_sequence(n_frames=2, img_size=IMG_SIZE, f=718.0,
                                 baseline=0.54, seed=0, step=0.5)
    l0 = jnp.asarray(np.clip(seq["left"][0], 0, 255).astype(np.uint8))
    r0 = jnp.asarray(np.clip(seq["right"][0], 0, 255).astype(np.uint8))
    l1 = jnp.asarray(np.clip(seq["left"][1], 0, 255).astype(np.uint8))
    r1 = jnp.asarray(np.clip(seq["right"][1], 0, 255).astype(np.uint8))

    cam = StereoCamera(seq["K"], seq["dist"], seq["K"], seq["dist"],
                       {"R": seq["R"], "T": seq["T"]}, SGBM, IMG_SIZE)
    cfg = OdometerConfig()
    fns = make_pipeline_fns(cam, cfg, color=False)
    extract = jax.jit(fns["extract"])
    fa = extract(l0, r0)
    fb = extract(l1, r1)
    jax.block_until_ready((fa, fb))
    fa = jax.tree_util.tree_map(jnp.asarray, fa)
    fb = jax.tree_util.tree_map(jnp.asarray, fb)

    img = fa.img
    fmask = ((fa.disp >= 4) & (fa.disp <= 100)).astype(jnp.uint8)

    ex_s = jax.jit(lambda a, b: _scalar(fns["extract"](a, b)))
    orb_s = jax.jit(lambda im, m: _scalar(detect_and_compute(im, m, cfg.orb)))
    att_s = jax.jit(lambda a, b: _scalar(fns["attempt"](
        a, b, jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32))))
    match_s = jax.jit(lambda a, b: _scalar(ratio_test_match(
        a.desc, b.desc, 0.8, a.kp_valid, b.kp_valid)))
    samp_s = jax.jit(lambda a: _scalar(jnp.nan_to_num(bilinear_sample_3d(
        a.xyz, a.kp_xy[:, 0], a.kp_xy[:, 1]), posinf=0, neginf=0)))

    timeit("noop baseline", jax.jit(lambda x: x.sum()),
           jnp.zeros((8, 128), jnp.float32))
    timeit("extract (sgbm+orb)", ex_s, l0, r0)
    timeit("orb detect+compute", orb_s, img, fmask)
    timeit("attempt (match+pose)", att_s, fa, fb)
    timeit("ratio_test_match", match_s, fa, fb)
    timeit("bilinear_sample_3d", samp_s, fa)


if __name__ == "__main__":
    main()
