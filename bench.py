"""Benchmark: stereo-VO throughput at KITTI resolution on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N}

vs_baseline is measured against the BASELINE.json north-star target of
500 stereo-VO frames/sec/chip at KITTI resolution (the reference itself
publishes no numbers - BASELINE.md).

Method: a synthetic corridor sequence at KITTI resolution (1242x376, 128
disparities, 500 ORB features) is uploaded to the device once; the full
jitted odometer pipeline (rectify -> SGBM -> reproject -> ORB -> match ->
Kabsch -> gates -> pose chain) runs with zero host round-trips — BASELINE
config 2's "jit-fused frame-to-frame tracking loop". Two execution shapes
are timed:
 - throughput (headline): batched feature extraction (the per-frame,
   state-independent 95% of the work: SGBM/ORB/reproject, batch-gridded
   Pallas kernels) + a lax.scan of the sequential match/pose state machine
   over the extracted features. Bit-identical trajectory to sequential
   stepping; this is simply the execution shape that fills the chip.
 - latency: the strict frame-at-a-time lax.scan of the full step
   (causal per-frame latency), reported as latency_fps.

Robustness: each config runs in a SUBPROCESS with its own timeout (a cold
XLA/Mosaic compile on the remote-compile terminal can take many minutes;
a wedged pass must not prevent the JSON line). The parent never imports
jax. Run `python bench.py --one <tag>` manually to reproduce one config.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

TARGET_FPS = 500.0
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


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_one(tag: str):
    """Run one bench config on the TPU; prints a JSON result line."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from openvo_tpu import OdometerConfig, StereoCamera
    from openvo_tpu.io.synthetic import render_stereo_sequence
    from openvo_tpu.models.stereo_odometer import init_state, make_step
    from openvo_tpu.parallel.stream import make_stream_fn

    sgbm_dict = {"speckle-off": SGBM, "speckle-on": SGBM_SPECKLE}[tag]

    log(f"devices: {jax.devices()}")
    t0 = time.time()
    seq = render_stereo_sequence(n_frames=N_FRAMES, img_size=IMG_SIZE, f=F,
                                 baseline=B, seed=0, step=0.5, yaw_rate=0.004)
    log(f"rendered {N_FRAMES} frames at {IMG_SIZE} in {time.time()-t0:.1f}s")

    cfg = OdometerConfig()
    lefts = jnp.asarray(np.clip(seq["left"], 0, 255).astype(np.uint8))
    rights = jnp.asarray(np.clip(seq["right"], 0, 255).astype(np.uint8))
    cam = StereoCamera(seq["K"], seq["dist"], seq["K"], seq["dist"],
                       {"R": seq["R"], "T": seq["T"]}, sgbm_dict, IMG_SIZE)

    def time_passes(run_fn, mk_state, label):
        t0 = time.time()
        state, (oks, c_T_w) = run_fn(mk_state(), lefts, rights)
        tracked = int(np.asarray(oks).sum())
        log(f"[{label}] compile+first run: {time.time()-t0:.1f}s, "
            f"tracked {tracked}/{N_FRAMES}")
        poses = np.linalg.inv(np.asarray(c_T_w, np.float64))
        gt = np.asarray(seq["T_wc"], np.float64)
        ate = float(np.mean(np.linalg.norm(
            poses[:, :3, 3] - gt[:N_FRAMES, :3, 3], axis=1)))
        path_len = 0.5 * (N_FRAMES - 1)
        log(f"[{label}] ATE {ate:.3f} m over {path_len:.1f} m path "
            f"({100 * ate / path_len:.1f}%)")
        # block_until_ready is a no-op through the axon tunnel, so each
        # timed pass ends with an EXPLICIT host fetch of a scalar that
        # depends on the whole pass (tunnel-proof sync, VERDICT r2).
        best = float("inf")
        for it in range(3):
            t0 = time.time()
            _, (oks, _) = run_fn(mk_state(), lefts, rights)
            n_ok = int(np.asarray(oks.sum()))  # host fetch = hard sync
            dt = time.time() - t0
            best = min(best, dt)
            log(f"[{label}] pass {it}: {dt*1000:.1f} ms for {N_FRAMES} "
                f"frames ({N_FRAMES/dt:.1f} fps, {n_ok} ok)")
        return N_FRAMES / best, tracked, ate, path_len

    def mk_state():
        return init_state(cam.cropped_shape, cfg.orb.max_keypoints)

    # Throughput shape (headline): batched extract + scanned state machine.
    stream = jax.jit(make_stream_fn(cam, cfg, color=False),
                     donate_argnums=(0,))
    fps, tracked, ate, path_len = time_passes(stream, mk_state, f"{tag}/tp")
    # Partial result line FIRST: if the latency-shape compile below blows
    # the subprocess budget (a chip claim-wedge can eat most of it), the
    # parent still harvests the headline number from the killed child.
    print("BENCH_PARTIAL " + json.dumps({
        "tag": tag, "fps": fps, "tracked": tracked, "ate": ate,
        "path_len": path_len,
    }), flush=True)

    # Latency shape: strict frame-at-a-time scan of the full step.
    step = make_step(cam, cfg, color=False)

    def run_seq(state, ls, rs):
        def body(s, lr):
            s2, ok, _ = step(s, lr[0], lr[1])
            return s2, (ok, s2.c_T_w)
        return jax.lax.scan(body, state, (ls, rs))

    run_seq_j = jax.jit(run_seq, donate_argnums=(0,))
    lat_fps, lat_tracked, lat_ate, _ = time_passes(run_seq_j, mk_state,
                                                   f"{tag}/lat")

    print("BENCH_RESULT " + json.dumps({
        "tag": tag, "fps": fps, "tracked": tracked, "ate": ate,
        "path_len": path_len, "latency_fps": lat_fps,
        "latency_tracked": lat_tracked,
    }), flush=True)


def main():
    if len(sys.argv) >= 3 and sys.argv[1] == "--one":
        run_one(sys.argv[2])
        return

    # Parent: orchestrate subprocess per config; never imports jax.
    results = {}
    budget = {"speckle-off": int(os.environ.get("BENCH_TIMEOUT_OFF", 1750)),
              "speckle-on": int(os.environ.get("BENCH_TIMEOUT_ON", 1500))}
    for tag in ("speckle-off", "speckle-on"):
        t0 = time.time()
        out_text = ""
        try:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one", tag],
                stdout=subprocess.PIPE, stderr=sys.stderr,
                timeout=budget[tag], text=True)
            out_text = p.stdout or ""
        except subprocess.TimeoutExpired as e:
            log(f"[{tag}] TIMED OUT after {time.time()-t0:.0f}s")
            out = e.stdout or b""
            out_text = out.decode() if isinstance(out, bytes) else out
        # Prefer the full result; fall back to the partial (headline
        # throughput measured before a timed-out latency-shape compile).
        for key in ("BENCH_RESULT ", "BENCH_PARTIAL "):
            for line in out_text.splitlines():
                if line.startswith(key):
                    results[tag] = json.loads(line[len(key):])
            if tag in results:
                break
        if tag not in results:
            log(f"[{tag}] no result")

    off = results.get("speckle-off")
    on = results.get("speckle-on")
    if off is None:
        # Primary config failed: still print a parseable line.
        print(json.dumps({
            "metric": "stereo_vo_throughput_kitti_res", "value": 0.0,
            "unit": "frames/sec/chip", "vs_baseline": 0.0,
            "error": "speckle-off bench did not complete",
        }))
        return

    out = {
        "metric": "stereo_vo_throughput_kitti_res",
        "value": round(off["fps"], 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(off["fps"] / TARGET_FPS, 4),
        "tracked_frames": off["tracked"],
        "total_frames": N_FRAMES,
        "ate_m": round(off["ate"], 4),
        "ate_pct_of_path": round(100 * off["ate"] / off["path_len"], 2),
        "latency_fps": (round(off["latency_fps"], 2)
                        if "latency_fps" in off else None),
        "speckle_off_fps": round(off["fps"], 2),
    }
    if on is not None:
        out.update({
            "speckle_on_fps": round(on["fps"], 2),
            "speckle_on_tracked": on["tracked"],
            "speckle_on_ate_m": round(on["ate"], 4),
        })
    else:
        out["speckle_on_fps"] = None
    print(json.dumps(out))


if __name__ == "__main__":
    main()
