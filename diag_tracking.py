"""Diagnose bench tracking failures: per-frame skip causes at KITTI res,
with the OpenCV reference run on the same frames as control. Not part of
the test suite."""

import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from openvo_tpu import OdometerConfig, StereoCamera, StereoOdometer
    from openvo_tpu.io.synthetic import render_stereo_sequence

    IMG_SIZE = (1242, 376)
    F, B = 718.0, 0.54
    N = 16
    SGBM = {
        "minDisparity": 0, "numDisparities": 128, "blockSize": 5,
        "P1": 200, "P2": 800, "disp12MaxDiff": 1, "preFilterCap": 63,
        "uniquenessRatio": 10, "speckleWindowSize": 0, "speckleRange": 0,
    }
    t0 = time.time()
    seq = render_stereo_sequence(n_frames=N, img_size=IMG_SIZE, f=F,
                                 baseline=B, seed=0, step=0.5,
                                 yaw_rate=0.004)
    log(f"rendered in {time.time()-t0:.0f}s")
    lefts = np.clip(seq["left"], 0, 255).astype(np.uint8)
    rights = np.clip(seq["right"], 0, 255).astype(np.uint8)

    cam = StereoCamera(seq["K"], seq["dist"], seq["K"], seq["dist"],
                       {"R": seq["R"], "T": seq["T"]}, SGBM, IMG_SIZE)
    odo = StereoOdometer(cam, config=OdometerConfig())
    gt = seq["T_wc"]
    for i in range(N):
        ok = odo.update(lefts[i], rights[i])
        st = odo.last_stats
        pose = odo.current_pose()
        err = np.linalg.norm(pose[:3, 3] - gt[i][:3, 3])
        log(f"frame {i:2d}: ok={int(ok)} cause={odo.skip_cause:10s} "
            f"kps={int(st['n_kps']):4d} matches={int(st['n_matches']):4d} "
            f"ok1={int(st['ok1'])} ok2={int(st['ok2'])} err={err:.3f}")

    if "--ref" in sys.argv:
        sys.path.insert(0, "/root/reference/src")
        from openVO import StereoOdometer as RefOdometer
        from openVO.stereo_camera import StereoCamera as RefCamera
        ref_cam = RefCamera(seq["K"], seq["dist"], seq["K"], seq["dist"],
                            {"R": seq["R"], "T": seq["T"].reshape(3, 1)},
                            SGBM, IMG_SIZE)
        ref = RefOdometer(ref_cam)
        for i in range(N):
            t0 = time.time()
            ok = ref.update(lefts[i], rights[i])
            pose = ref.current_pose()
            err = np.linalg.norm(pose[:3, 3] - gt[i][:3, 3])
            log(f"ref {i:2d}: ok={int(ok)} cause={ref.skip_cause:10s} "
                f"err={err:.3f} ({time.time()-t0:.1f}s)")


if __name__ == "__main__":
    main()
