"""ORB internal per-stage profile at KITTI resolution: FAST, Harris, NMS,
top-k selection, orientation, blur, descriptors — per level and summed —
so the ~5 ms ORB budget (round-2 profile) is itemized before optimizing.
Scalar-output jits + pipelined dispatch (tunnel-safe; see
.claude/skills/verify). Not part of the test suite."""

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

    from openvo_tpu.config import ORBParams
    from openvo_tpu.io.synthetic import render_stereo_sequence
    from openvo_tpu.ops import orb as O
    from openvo_tpu.ops.image import gaussian_blur, resize_bilinear

    IMG_SIZE = (1242, 376)
    seq = render_stereo_sequence(n_frames=1, img_size=IMG_SIZE, f=718.0,
                                 baseline=0.54, seed=0)
    img = jnp.asarray(np.clip(seq["left"][0], 0, 255).astype(np.float32))
    H, W = img.shape
    params = ORBParams()
    mask = jnp.ones((H, W), jnp.uint8)

    noop = timeit("noop baseline", jax.jit(lambda x: x.sum()),
                  jnp.zeros((8, 128), jnp.float32))

    # --- level-0 stage costs ---
    k0 = O.features_per_level(params.nfeatures, params.nlevels,
                              params.scale_factor)[0]

    @jax.jit
    def t_fast(im):
        s, c = O.fast_score(im, float(params.fast_threshold))
        return s.sum() + c.sum()

    @jax.jit
    def t_harris(im):
        return O.harris_response(im).sum()

    @jax.jit
    def t_nms(im):
        s, c = O.fast_score(im, float(params.fast_threshold))
        return (c & O._nms3x3(s)).sum()

    @jax.jit
    def t_topk(im):
        s, _ = O.fast_score(im, float(params.fast_threshold))
        v, i = jax.lax.top_k(s.reshape(-1), k0)
        return v.sum() + i.sum()

    @jax.jit
    def t_detect_level(im, m):
        xy, r, v = O._detect_level(im, m, k0, params)
        return xy.sum() + r.sum() + v.sum()

    @jax.jit
    def t_blur(im):
        return jnp.round(gaussian_blur(im, 7, 2.0)).sum()

    @jax.jit
    def t_resize(im):
        h1 = int(round(H / params.scale_factor))
        w1 = int(round(W / params.scale_factor))
        return resize_bilinear(im, h1, w1).sum()

    xy0, r0, v0 = jax.jit(
        lambda im, m: O._detect_level(im, m, k0, params))(img, mask)
    ang0 = jax.jit(lambda im, xy, v: O._orientations(im, xy, v))(
        img, xy0, v0)
    imgb = jax.jit(lambda im: jnp.round(gaussian_blur(im, 7, 2.0)))(img)

    @jax.jit
    def t_orient(im, xy, v):
        return O._orientations(im, xy, v).sum()

    @jax.jit
    def t_desc(im, xy, a, v):
        return O._descriptors(im, xy, a, v).astype(jnp.int32).sum()

    @jax.jit
    def t_full(im, m):
        f = O.detect_and_compute(im, m, params)
        return f["desc"].astype(jnp.int32).sum() + f["xy"].sum()

    t_f = timeit("L0 fast_score", t_fast, img)
    t_h = timeit("L0 harris", t_harris, img)
    t_n = timeit("L0 fast+nms", t_nms, img)
    t_k = timeit("L0 fast+topk", t_topk, img)
    t_d = timeit("L0 detect_level (all)", t_detect_level, img, mask)
    t_o = timeit("L0 orientations (K windows)", t_orient, img, xy0, v0)
    t_b = timeit("L0 gaussian blur", t_blur, img)
    t_de = timeit("L0 descriptors", t_desc, imgb, xy0, ang0, v0)
    t_r = timeit("L0->L1 resize", t_resize, img)
    t_all = timeit("FULL ORB (8 levels)", t_full, img, mask)

    log("-" * 46)
    log(f"net L0 topk        ~{(t_k - t_f) * 1000:7.2f} ms")
    log(f"net L0 detect sum  ~{(t_d - noop) * 1000:7.2f} ms")
    lvl0 = (t_d - noop) + (t_o - noop) + (t_b - noop) + (t_de - noop)
    log(f"L0 total           ~{lvl0 * 1000:7.2f} ms")
    log(f"full ORB           ~{(t_all - noop) * 1000:7.2f} ms")


if __name__ == "__main__":
    main()
