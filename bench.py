"""Benchmark: stereo-VO throughput at KITTI resolution on one TPU chip.

Prints JSON lines of the form
  {"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N, ...}
CUMULATIVELY — one updated line after EVERY completed pass, so a harvested
tail always carries the best number measured so far even if a later pass
times out (VERDICT r3 item 1: the round-3 artifact died with rc 124 and
parsed:null because the single final line printed only after all configs
finished). The driver should take the LAST parseable line.

vs_baseline is against the BASELINE.json north-star of 500 stereo-VO
frames/sec/chip at KITTI resolution (the reference itself publishes no
numbers - BASELINE.md; its pipeline is /root/reference/src/openVO/
stereo_camera.py:43-55 + stereo_odometer.py:115-160).

Passes (each a SUBPROCESS with its own budget; worst-case total is bounded
by GLOBAL_BUDGET so a wedged compile can never eat the driver's window):
  off-lat  speckle-off, frame-at-a-time lax.scan of the full jitted step
           (rectify -> SGBM -> reproject -> ORB -> match -> Kabsch -> gates
           -> pose chain). Causal per-frame latency.
  off-tp   speckle-off, batched feature extraction + scanned state machine
           (parallel/stream.py). Bit-identical trajectory.
  on-lat   speckle ON (the KITTI loader's shipped default, io/kitti.py),
           latency shape.
  rig      8-camera vmapped rig (BASELINE config 4): aggregate
           frames/sec/chip across cameras.

The headline `value` is the best completed speckle-off shape; per-shape
numbers and compile seconds are reported as separate fields.

Run `python bench.py --one <pass>` to reproduce a single pass manually.
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
N_FRAMES = 64            # >= 64 frames / 31.5 m path (VERDICT r4 item 6)
RENDER_TAG = 2           # bump when the scene geometry/params change
N_CAMERAS = 8            # rig pass (BASELINE config 4)
SEQ_CACHE = "/root/repo/.bench_seq.npz"
SGBM = {
    "minDisparity": 0, "numDisparities": 128, "blockSize": 5,
    "P1": 200, "P2": 800, "disp12MaxDiff": 1, "preFilterCap": 63,
    "uniquenessRatio": 10, "speckleWindowSize": 0, "speckleRange": 0,
}
# The KITTI loader's shipped defaults enable speckle (io/kitti.py:24-28);
# the bench reports BOTH paths (VERDICT r2 item 5 / r3 item 4).
SGBM_SPECKLE = dict(SGBM, speckleWindowSize=100, speckleRange=2)

# Per-pass subprocess budgets (seconds). Ordered by importance; the parent
# additionally enforces GLOBAL_BUDGET over the whole run.
PASSES = [
    ("off-lat", int(os.environ.get("BENCH_T_OFF_LAT", 500))),
    ("off-tp", int(os.environ.get("BENCH_T_OFF_TP", 350))),
    ("on-lat", int(os.environ.get("BENCH_T_ON", 250))),
    ("rig", int(os.environ.get("BENCH_T_RIG", 300))),
]
GLOBAL_BUDGET = int(os.environ.get("BENCH_GLOBAL_BUDGET", 1250))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def get_sequence():
    """Render (or load cached) synthetic corridor sequence at KITTI res.

    Rendering takes ~40 s on this box; the npz cache shares it across the
    pass subprocesses."""
    if os.path.exists(SEQ_CACHE):
        try:
            with np.load(SEQ_CACHE) as z:
                seq = {k: z[k] for k in z.files}
            if (seq["left"].shape[0] == N_FRAMES
                    and int(seq.get("render_tag", 0)) == RENDER_TAG):
                log(f"loaded cached sequence from {SEQ_CACHE}")
                return seq
        except Exception as e:  # noqa: BLE001 - corrupt cache: re-render
            log(f"seq cache load failed ({e}); re-rendering")
    from openvo_tpu.io.synthetic import render_stereo_sequence
    t0 = time.time()
    # Corridor sized for the 31.5 m path: the camera must neither reach
    # the back wall (valid-disparity band needs >= ~4 m of scene ahead)
    # nor drift into a side wall (steady yaw accumulates ~4 m laterally).
    seq = render_stereo_sequence(n_frames=N_FRAMES, img_size=IMG_SIZE, f=F,
                                 baseline=B, seed=0, step=0.5,
                                 yaw_rate=0.004, corridor_length=80.0,
                                 corridor_half_width=7.0)
    log(f"rendered {N_FRAMES} frames at {IMG_SIZE} in {time.time()-t0:.1f}s")
    seq["render_tag"] = np.asarray(RENDER_TAG)
    try:
        np.savez(SEQ_CACHE, **{k: np.asarray(v) for k, v in seq.items()})
    except Exception as e:  # noqa: BLE001 - cache is best-effort
        log(f"seq cache save failed: {e}")
    return seq


def run_one(tag: str):
    """Run one bench pass on the TPU; prints a PASS_RESULT JSON line."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from openvo_tpu import OdometerConfig, StereoCamera
    from openvo_tpu.models.stereo_odometer import init_state, make_step
    from openvo_tpu.parallel.stream import make_stream_fn

    sgbm_dict = SGBM_SPECKLE if tag.startswith("on") else SGBM

    log(f"devices: {jax.devices()}")
    seq = get_sequence()
    cfg = OdometerConfig()
    lefts = jnp.asarray(np.clip(seq["left"], 0, 255).astype(np.uint8))
    rights = jnp.asarray(np.clip(seq["right"], 0, 255).astype(np.uint8))
    cam = StereoCamera(seq["K"], seq["dist"], seq["K"], seq["dist"],
                       {"R": seq["R"], "T": seq["T"]}, sgbm_dict, IMG_SIZE)

    def mk_state():
        return init_state(cam.cropped_shape, cfg.orb.max_keypoints)

    def cache_entries():
        try:
            return len(os.listdir("/root/repo/.jax_cache"))
        except OSError:
            return 0

    def time_passes(run_fn, mk_st, label, n_work):
        n_cache0 = cache_entries()
        t0 = time.time()
        state, (oks, c_T_w) = run_fn(mk_st(), lefts, rights)
        tracked = int(np.asarray(oks).sum())
        compile_s = time.time() - t0
        # cold vs warm compile is observable (VERDICT r4 item 7): a cold
        # compile writes new persistent-cache entries, a warm one doesn't.
        compile_cold = cache_entries() > n_cache0
        log(f"[{label}] compile+first run: {compile_s:.1f}s, "
            f"tracked {tracked}/{np.asarray(oks).size}")
        cw = np.asarray(c_T_w, np.float64)
        if cw.ndim == 4:  # rig: (T, N, 4, 4) -> camera 0
            cw = cw[:, 0]
        poses = np.linalg.inv(cw)
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
            _, (oks, _) = run_fn(mk_st(), lefts, rights)
            n_ok = int(np.asarray(oks.sum()))  # host fetch = hard sync
            dt = time.time() - t0
            best = min(best, dt)
            log(f"[{label}] pass {it}: {dt*1000:.1f} ms for {n_work} "
                f"frames ({n_work/dt:.1f} fps, {n_ok} ok)")
        return dict(fps=n_work / best, tracked=tracked, ate=ate,
                    path_len=path_len, compile_s=round(compile_s, 1),
                    compile_cold=compile_cold)

    if tag == "rig":
        step = make_step(cam, cfg, color=False)
        rig_step = jax.vmap(step)

        def run_rig(states, ls, rs):
            def body(s, lr):
                s2, ok, _ = rig_step(s, lr[0], lr[1])
                return s2, (ok, s2.c_T_w)
            return jax.lax.scan(body, states, (ls, rs))

        run_rig_j = jax.jit(run_rig, donate_argnums=(0,))
        # Identical streams per camera: throughput-only number, compute is
        # shape-bound so duplicated data times the same as distinct data.
        lefts = jnp.broadcast_to(lefts[:, None], (N_FRAMES, N_CAMERAS)
                                 + lefts.shape[1:])
        rights = jnp.broadcast_to(rights[:, None], (N_FRAMES, N_CAMERAS)
                                  + rights.shape[1:])

        def mk_rig():
            one = mk_state()
            return jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x, (N_CAMERAS,) + x.shape), one)

        r = time_passes(run_rig_j, mk_rig, tag, N_FRAMES * N_CAMERAS)
    elif tag.endswith("-tp"):
        # chunk=16: a 64-frame batched extract would hold ~64 x 360 MB of
        # kernel-materialized sweep volumes (> HBM); 16 is the r4 shape.
        stream = jax.jit(make_stream_fn(cam, cfg, color=False, chunk=16),
                         donate_argnums=(0,))
        r = time_passes(stream, mk_state, tag, N_FRAMES)
    else:  # latency shape: frame-at-a-time scan of the full step
        step = make_step(cam, cfg, color=False)

        def run_seq(state, ls, rs):
            def body(s, lr):
                s2, ok, _ = step(s, lr[0], lr[1])
                return s2, (ok, s2.c_T_w)
            return jax.lax.scan(body, state, (ls, rs))

        run_seq_j = jax.jit(run_seq, donate_argnums=(0,))
        r = time_passes(run_seq_j, mk_state, tag, N_FRAMES)

    r["tag"] = tag
    print("PASS_RESULT " + json.dumps(r), flush=True)


def emit(results):
    """Print the cumulative headline JSON line from completed passes."""
    off_lat = results.get("off-lat")
    off_tp = results.get("off-tp")
    shapes = [(s, r) for s, r in (("latency", off_lat), ("stream", off_tp))
              if r is not None]
    if not shapes:
        print(json.dumps({
            "metric": "stereo_vo_throughput_kitti_res", "value": 0.0,
            "unit": "frames/sec/chip", "vs_baseline": 0.0,
            "error": "no speckle-off pass completed",
        }), flush=True)
        return
    head_shape, head = max(shapes, key=lambda sr: sr[1]["fps"])
    out = {
        "metric": "stereo_vo_throughput_kitti_res",
        "value": round(head["fps"], 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(head["fps"] / TARGET_FPS, 4),
        "headline_shape": head_shape,
        "tracked_frames": head["tracked"],
        "total_frames": N_FRAMES,
        "ate_m": round(head["ate"], 4),
        "ate_pct_of_path": round(100 * head["ate"] / head["path_len"], 2),
    }
    for key, r in (("latency", off_lat), ("stream", off_tp),
                   ("speckle_on", results.get("on-lat")),
                   ("rig", results.get("rig"))):
        if r is not None:
            out[f"{key}_fps"] = round(r["fps"], 2)
            out[f"{key}_compile_s"] = r["compile_s"]
            out[f"{key}_compile_cold"] = r.get("compile_cold")
        else:
            out[f"{key}_fps"] = None
    on = results.get("on-lat")
    if on is not None:
        out["speckle_on_tracked"] = on["tracked"]
        out["speckle_on_ate_m"] = round(on["ate"], 4)
    if results.get("rig") is not None:
        out["rig_fps_aggregate"] = out.pop("rig_fps")
        out["rig_n_cameras"] = N_CAMERAS
    print(json.dumps(out), flush=True)


def scan_siblings():
    """Loudly report other python processes: on this 1-core/1-chip box a
    sibling (e.g. an orphaned pytest, as during the r3 bench window) starves
    the bench and wedges compiles."""
    try:
        out = subprocess.run(["ps", "-eo", "pid,etime,args"],
                             capture_output=True, text=True, timeout=10)
        me = os.getpid()
        for line in out.stdout.splitlines()[1:]:
            if "python" in line and str(me) not in line.split()[:1]:
                if "tpu_init" in line or "bench.py" in line:
                    continue
                log(f"!!! SIBLING PYTHON PROCESS DURING BENCH: {line.strip()}")
    except Exception as e:  # noqa: BLE001 - diagnostics only
        log(f"sibling scan failed: {e}")


def main():
    if len(sys.argv) >= 3 and sys.argv[1] == "--one":
        run_one(sys.argv[2])
        return

    scan_siblings()
    # Parent: orchestrate one subprocess per pass; never imports jax.
    results = {}
    t_start = time.time()
    for tag, budget in PASSES:
        remaining = GLOBAL_BUDGET - (time.time() - t_start)
        budget = min(budget, int(remaining))
        if budget < 60:
            log(f"[{tag}] skipped: {remaining:.0f}s of global budget left")
            continue
        t0 = time.time()
        out_text = ""
        try:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one", tag],
                stdout=subprocess.PIPE, stderr=sys.stderr,
                timeout=budget, text=True)
            out_text = p.stdout or ""
        except subprocess.TimeoutExpired as e:
            log(f"[{tag}] TIMED OUT after {time.time()-t0:.0f}s")
            out = e.stdout or b""
            out_text = out.decode() if isinstance(out, bytes) else out
        for line in out_text.splitlines():
            if line.startswith("PASS_RESULT "):
                results[tag] = json.loads(line[len("PASS_RESULT "):])
        if tag not in results:
            log(f"[{tag}] no result")
        # Cumulative emit: the driver takes the LAST parseable line, so a
        # later timeout can never lose an earlier pass's number.
        emit(results)


if __name__ == "__main__":
    main()
