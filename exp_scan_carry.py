"""Second scan-overhead suspect (after exp_scan_cond refuted the cond):
the ~18 MB of FrameFeatures carried through the scan. Scans a body that
does the SAME extract + attempt work but carries only a 4x4 pose (each
frame matches against a FIXED pre-extracted reference held as a closure
constant). If this runs at the single-step rate, the big carry is the
cost; if not, the overhead lives in the scan machinery itself.
Not part of the test suite."""

import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(name, fn, *args, reps=5):
    import jax
    t0 = time.time()
    r = fn(*args)
    float(np.asarray(jax.tree_util.tree_leaves(r)[0]).reshape(-1)[0])
    log(f"...{name}: compile+first {time.time()-t0:.1f}s")
    t0 = time.time()
    outs = [fn(*args) for _ in range(reps)]
    float(np.asarray(jax.tree_util.tree_leaves(outs[-1])[0]
                     ).reshape(-1)[0])
    dt = (time.time() - t0) / reps
    log(f"{name:40s} {dt * 1000:8.2f} ms  ({16/dt:.1f} fps)")
    return dt


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from openvo_tpu import OdometerConfig, StereoCamera
    from openvo_tpu.io.synthetic import render_stereo_sequence
    from openvo_tpu.models.stereo_odometer import make_pipeline_fns

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

    fns = make_pipeline_fns(cam, cfg, color=False)
    extract, attempt = fns["extract"], fns["attempt"]
    feats0 = jax.jit(extract)(lefts[0], rights[0])
    feats0 = jax.device_put(feats0)

    def run_small_carry(c0, ls, rs):
        def body(c, lr):
            feats = extract(lr[0], lr[1])
            T1, ok1, code1, _ = attempt(
                feats0, feats, jnp.asarray(0, jnp.int32),
                jnp.asarray(0, jnp.int32))
            c2 = jnp.where(ok1, T1 @ c, c)
            return c2, ok1
        return jax.lax.scan(body, c0, (ls, rs))

    def run_extract_only(c0, ls, rs):
        def body(c, lr):
            feats = extract(lr[0], lr[1])
            c2 = c + feats.desc.astype(jnp.float32).sum() + feats.disp.sum()
            return c2, c2
        return jax.lax.scan(body, c0, (ls, rs))

    timeit("noop", jax.jit(lambda x: (x.sum(),)),
           jnp.zeros((8, 128), jnp.float32))
    timeit("scan small-carry (extract+attempt)",
           jax.jit(run_small_carry), jnp.eye(4), lefts, rights)
    timeit("scan extract-only (scalar carry)",
           jax.jit(run_extract_only), jnp.asarray(0.0), lefts, rights)


if __name__ == "__main__":
    main()
