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
    # The KITTI loader's shipped defaults enable speckle (io/kitti.py);
    # the bench reports BOTH paths (VERDICT r2 item 5).
    SGBM_SPECKLE = dict(SGBM, speckleWindowSize=100, speckleRange=2)

    log(f"devices: {jax.devices()}")
    t0 = time.time()
    seq = render_stereo_sequence(n_frames=N_FRAMES, img_size=IMG_SIZE, f=F,
                                 baseline=B, seed=0, step=0.5, yaw_rate=0.004)
    log(f"rendered {N_FRAMES} frames at {IMG_SIZE} in {time.time()-t0:.1f}s")

    cfg = OdometerConfig()
    lefts = jnp.asarray(np.clip(seq["left"], 0, 255).astype(np.uint8))
    rights = jnp.asarray(np.clip(seq["right"], 0, 255).astype(np.uint8))

    def bench_config(sgbm_dict, tag):
        cam = StereoCamera(seq["K"], seq["dist"], seq["K"], seq["dist"],
                           {"R": seq["R"], "T": seq["T"]}, sgbm_dict,
                           IMG_SIZE)
        step = make_step(cam, cfg, color=False)

        def run(state, ls, rs):
            def body(s, lr):
                s2, ok, _ = step(s, lr[0], lr[1])
                return s2, (ok, s2.c_T_w)
            return jax.lax.scan(body, state, (ls, rs))

        run_j = jax.jit(run, donate_argnums=(0,))

        state = init_state(cam.cropped_shape, cfg.orb.max_keypoints)
        t0 = time.time()
        state, (oks, c_T_w) = run_j(state, lefts, rights)
        tracked = int(np.asarray(oks).sum())
        log(f"[{tag}] compile+first run: {time.time()-t0:.1f}s, tracked "
            f"{tracked}/{N_FRAMES}")

        # Accuracy (VERDICT r1: throughput and ATE measured together).
        poses = np.linalg.inv(np.asarray(c_T_w, np.float64))
        gt = np.asarray(seq["T_wc"], np.float64)
        ate = float(np.mean(np.linalg.norm(
            poses[:, :3, 3] - gt[:N_FRAMES, :3, 3], axis=1)))
        path_len = 0.5 * (N_FRAMES - 1)
        log(f"[{tag}] ATE {ate:.3f} m over {path_len:.1f} m path "
            f"({100 * ate / path_len:.1f}%)")

        # Steady state: several timed passes over the resident frames.
        # block_until_ready is a no-op through the axon tunnel, so each
        # timed pass ends with an EXPLICIT host fetch of a scalar that
        # depends on the whole pass (tunnel-proof sync, VERDICT r2).
        best = float("inf")
        for it in range(3):
            state = init_state(cam.cropped_shape, cfg.orb.max_keypoints)
            t0 = time.time()
            state, (oks, _) = run_j(state, lefts, rights)
            n_ok = int(np.asarray(oks.sum()))  # host fetch = hard sync
            dt = time.time() - t0
            best = min(best, dt)
            log(f"[{tag}] pass {it}: {dt*1000:.1f} ms for {N_FRAMES} "
                f"frames ({N_FRAMES/dt:.1f} fps, {n_ok} ok)")
        return N_FRAMES / best, tracked, ate, path_len

    fps, tracked, ate, path_len = bench_config(SGBM, "speckle-off")
    fps_on, tracked_on, ate_on, _ = bench_config(SGBM_SPECKLE, "speckle-on")

    print(json.dumps({
        "metric": "stereo_vo_throughput_kitti_res",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / 500.0, 4),
        "tracked_frames": tracked,
        "total_frames": N_FRAMES,
        "ate_m": round(ate, 4),
        "ate_pct_of_path": round(100 * ate / path_len, 2),
        "speckle_off_fps": round(fps, 2),
        "speckle_on_fps": round(fps_on, 2),
        "speckle_on_tracked": tracked_on,
        "speckle_on_ate_m": round(ate_on, 4),
    }))


if __name__ == "__main__":
    main()
