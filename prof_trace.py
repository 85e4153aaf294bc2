"""Device-trace capture for the full VO pipeline (VERDICT r4 item 2).

Captures a jax.profiler trace (real per-kernel device events work through
the axon tunnel — verified: pid '/device:TPU:0' carries per-fusion 'X'
events with microsecond durations) of:
  scan   the 16-frame lax.scan of the full jitted odometer step (the bench
         off-lat shape) — per-kernel device time AND inter-kernel gaps.
  sgbm   10 reps of sgbm_disparity16 alone.
  orb    10 reps of ORB detect_and_compute alone.

Writes traces under /tmp/ovo_trace/<tag>/; analyze with
  python tools/trace_report.py /tmp/ovo_trace/<tag>
Run ONE tag per process (`python prof_trace.py scan`); output to a file.
Not part of the test suite.
"""

import sys
import time

import numpy as np

OUT = "/tmp/ovo_trace"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(tag):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from bench import IMG_SIZE, SGBM, get_sequence
    from openvo_tpu import OdometerConfig, StereoCamera

    seq = get_sequence()
    cfg = OdometerConfig()
    lefts = jnp.asarray(np.clip(seq["left"], 0, 255).astype(np.uint8))
    rights = jnp.asarray(np.clip(seq["right"], 0, 255).astype(np.uint8))
    cam = StereoCamera(seq["K"], seq["dist"], seq["K"], seq["dist"],
                       {"R": seq["R"], "T": seq["T"]}, SGBM, IMG_SIZE)
    outdir = f"{OUT}/{tag}"

    if tag == "scan":
        from openvo_tpu.models.stereo_odometer import init_state, make_step
        step = make_step(cam, cfg, color=False)

        def run_seq(state, ls, rs):
            def body(s, lr):
                s2, ok, _ = step(s, lr[0], lr[1])
                return s2, (ok, s2.c_T_w)
            return jax.lax.scan(body, state, (ls, rs))

        run_j = jax.jit(run_seq)

        def mk():
            return init_state(cam.cropped_shape, cfg.orb.max_keypoints)

        t0 = time.time()
        _, (oks, _) = run_j(mk(), lefts, rights)
        log(f"compile+first: {time.time()-t0:.1f}s, "
            f"tracked {int(np.asarray(oks).sum())}/16")
        with jax.profiler.trace(outdir):
            _, (oks, _) = run_j(mk(), lefts, rights)
            _ = int(np.asarray(oks.sum()))
    elif tag == "stream":
        from openvo_tpu.models.stereo_odometer import init_state
        from openvo_tpu.parallel.stream import make_stream_fn
        stream = jax.jit(make_stream_fn(cam, cfg, color=False, chunk=16))

        def mk():
            return init_state(cam.cropped_shape, cfg.orb.max_keypoints)

        t0 = time.time()
        _, (oks, _) = stream(mk(), lefts, rights)
        log(f"compile+first: {time.time()-t0:.1f}s, "
            f"tracked {int(np.asarray(oks).sum())}/{oks.shape[0]}")
        with jax.profiler.trace(outdir):
            _, (oks, _) = stream(mk(), lefts, rights)
            _ = int(np.asarray(oks.sum()))
    elif tag == "sgbm":
        from openvo_tpu.ops import sgbm
        p = cam.sgbm

        @jax.jit
        def f(l, r):
            return sgbm.sgbm_disparity16(l, r, p).astype(jnp.int32).sum()

        l0, r0 = lefts[0], rights[0]
        float(f(l0, r0))
        with jax.profiler.trace(outdir):
            for _ in range(10):
                r = f(l0, r0)
            float(r)
    elif tag == "orb":
        from openvo_tpu.ops.orb import detect_and_compute
        H, W = lefts.shape[1:3]

        @jax.jit
        def f(img):
            out = detect_and_compute(img, jnp.ones((H, W), jnp.uint8),
                                     cfg.orb)
            return out["xy"].sum() + out["desc"].astype(jnp.int32).sum()

        float(f(lefts[0]))
        with jax.profiler.trace(outdir):
            for _ in range(10):
                r = f(lefts[0])
            float(r)
    else:
        raise SystemExit(f"unknown tag {tag}")
    log(f"trace written to {outdir}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "scan")
