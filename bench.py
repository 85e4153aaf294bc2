"""Benchmark: stereo-VO throughput at KITTI resolution on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N}

vs_baseline is measured against the BASELINE.json north-star target of
500 stereo-VO frames/sec/chip at KITTI resolution (the reference itself
publishes no numbers - BASELINE.md).

Method: a synthetic corridor sequence at KITTI resolution (1242x376, 128
disparities, 500 ORB features) is uploaded to the device once; the full
jitted odometer step (rectify -> SGBM -> reproject -> ORB -> match -> Kabsch
-> gates -> pose chain) runs as a device-side lax.scan over the frames, i.e.
streaming VO with zero host round-trips — BASELINE config 2's "jit-fused
frame-to-frame tracking loop".
"""

import json
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

    from openvo_tpu import OdometerConfig, StereoCamera
    from openvo_tpu.io.synthetic import render_stereo_sequence
    from openvo_tpu.models.stereo_odometer import init_state, make_step

    IMG_SIZE = (1242, 376)   # KITTI odometry gray resolution
    F, B = 718.0, 0.54       # KITTI-like focal length / baseline
    N_FRAMES = 16
    SGBM = {
        "minDisparity": 0, "numDisparities": 128, "blockSize": 5,
        "P1": 200, "P2": 800, "disp12MaxDiff": 1, "preFilterCap": 63,
        "uniquenessRatio": 10, "speckleWindowSize": 0, "speckleRange": 0,
    }

    log(f"devices: {jax.devices()}")
    t0 = time.time()
    seq = render_stereo_sequence(n_frames=N_FRAMES, img_size=IMG_SIZE, f=F,
                                 baseline=B, seed=0, step=0.5, yaw_rate=0.004)
    log(f"rendered {N_FRAMES} frames at {IMG_SIZE} in {time.time()-t0:.1f}s")

    cam = StereoCamera(seq["K"], seq["dist"], seq["K"], seq["dist"],
                       {"R": seq["R"], "T": seq["T"]}, SGBM, IMG_SIZE)
    cfg = OdometerConfig()
    step = make_step(cam, cfg, color=False)

    lefts = jnp.asarray(np.clip(seq["left"], 0, 255).astype(np.uint8))
    rights = jnp.asarray(np.clip(seq["right"], 0, 255).astype(np.uint8))

    def run(state, ls, rs):
        def body(s, lr):
            s2, ok, _ = step(s, lr[0], lr[1])
            return s2, (ok, s2.c_T_w)
        return jax.lax.scan(body, state, (ls, rs))

    run_j = jax.jit(run, donate_argnums=(0,))

    state = init_state(cam.cropped_shape, cfg.orb.max_keypoints)
    t0 = time.time()
    state, (oks, c_T_w) = run_j(state, lefts, rights)
    jax.block_until_ready(state)
    tracked = int(np.asarray(oks).sum())
    log(f"compile+first run: {time.time()-t0:.1f}s, tracked "
        f"{tracked}/{N_FRAMES}")

    # Accuracy at full resolution (VERDICT r1: throughput and ATE must be
    # measured together): camera-in-world poses vs synthetic ground truth.
    poses = np.linalg.inv(np.asarray(c_T_w, np.float64))
    gt = np.asarray(seq["T_wc"], np.float64)
    ate = float(np.mean(np.linalg.norm(
        poses[:, :3, 3] - gt[:N_FRAMES, :3, 3], axis=1)))
    path_len = 0.5 * (N_FRAMES - 1)
    log(f"ATE {ate:.3f} m over {path_len:.1f} m path "
        f"({100 * ate / path_len:.1f}%)")

    # Steady state: several timed passes over the resident frames.
    best = float("inf")
    for it in range(3):
        state = init_state(cam.cropped_shape, cfg.orb.max_keypoints)
        t0 = time.time()
        state, (oks, _) = run_j(state, lefts, rights)
        jax.block_until_ready(state)
        dt = time.time() - t0
        best = min(best, dt)
        log(f"pass {it}: {dt*1000:.1f} ms for {N_FRAMES} frames "
            f"({N_FRAMES/dt:.1f} fps)")

    fps = N_FRAMES / best
    print(json.dumps({
        "metric": "stereo_vo_throughput_kitti_res",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / 500.0, 4),
        "tracked_frames": tracked,
        "total_frames": N_FRAMES,
        "ate_m": round(ate, 4),
        "ate_pct_of_path": round(100 * ate / path_len, 2),
    }))


if __name__ == "__main__":
    main()
