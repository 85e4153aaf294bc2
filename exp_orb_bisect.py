"""Bisect the batched-pyramid ORB cost: cumulative jits (stack build ->
+pixel stages -> +topk -> +windows -> +blur -> +descriptors -> full),
so adjacent-row differences attribute the budget even with tunnel RTT
noise. Not part of the test suite."""

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
    log(f"{name:36s} {dt * 1000:8.2f} ms")
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
    img = jnp.asarray(np.clip(seq["left"][0], 0, 255).astype(np.uint8))
    params = ORBParams()
    H, W = img.shape
    mask = jnp.ones((H, W), jnp.uint8)
    nl = params.nlevels
    b = params.edge_threshold

    dims = []
    for level in range(nl):
        scale = params.scale_factor**level
        dims.append((max(int(round(H / scale)), 2 * b + 3),
                     max(int(round(W / scale)), 2 * b + 3)))

    def build_stack(imgf):
        stack = jnp.zeros((nl, H, W), jnp.float32)
        stack = jax.lax.dynamic_update_slice(stack, imgf[None], (0, 0, 0))
        for level in range(1, nl):
            h_l, w_l = dims[level]
            img_l = resize_bilinear(imgf, h_l, w_l)
            img_l = jnp.pad(img_l, ((0, H - h_l), (0, W - w_l)))
            stack = jax.lax.dynamic_update_slice(stack, img_l[None],
                                                 (level, 0, 0))
        return stack

    def stages(stack):
        score, corner = jax.vmap(
            lambda im: O.fast_score(im, float(params.fast_threshold)))(stack)
        corner = corner & jax.vmap(O._nms3x3)(score)
        hl = jnp.asarray([h for h, _ in dims], jnp.int32)[:, None, None]
        wl = jnp.asarray([w for _, w in dims], jnp.int32)[:, None, None]
        ys = jax.lax.broadcasted_iota(jnp.int32, (1, H, W), 1)
        xs = jax.lax.broadcasted_iota(jnp.int32, (1, H, W), 2)
        corner &= ((xs >= b) & (xs < wl - b) & (ys >= b) & (ys < hl - b))
        resp = jax.vmap(O.harris_response)(stack)
        return score, corner, resp

    k_eff = O.features_per_level(params.nfeatures, nl, params.scale_factor)
    P = max(k_eff)

    def topk(corner, resp):
        flat = jnp.where(corner, resp, -jnp.inf).reshape(nl, -1)
        return O._topk_rows(flat, P)

    imgf = img.astype(jnp.float32)

    noop = timeit("noop", jax.jit(lambda x: x.sum()),
                  jnp.zeros((8, 128), jnp.float32))
    timeit("A stack build", jax.jit(
        lambda im: build_stack(im.astype(jnp.float32)).sum()), img)
    timeit("B A+fast/nms/harris", jax.jit(
        lambda im: sum(x.astype(jnp.float32).sum()
                       for x in stages(build_stack(im.astype(jnp.float32))))),
        img)
    timeit("C B+topk", jax.jit(
        lambda im: sum(
            x.astype(jnp.float32).sum() for x in topk(
                *stages(build_stack(im.astype(jnp.float32)))[1:])), ), img)

    def upto_windows(im):
        stack = build_stack(im.astype(jnp.float32))
        _, corner, resp = stages(stack)
        tv, ti = topk(corner, resp)
        xy2 = jnp.stack([ti % W, ti // W], axis=-1).astype(jnp.int32)
        lv = jnp.repeat(jnp.arange(nl, dtype=jnp.int32), P)
        wins = O._patch_windows_stack(stack, lv, xy2.reshape(-1, 2),
                                      O.HALF_PATCH)
        return wins.sum() + tv.sum()

    timeit("D C+orient windows", jax.jit(upto_windows), img)
    timeit("E blur stack alone", jax.jit(
        lambda im: jnp.round(jax.vmap(lambda x: gaussian_blur(x, 7, 2.0))(
            build_stack(im.astype(jnp.float32)))).sum()), img)

    @jax.jit
    def full(im, m):
        f = O.detect_and_compute(im, m, params)
        return f["desc"].astype(jnp.int32).sum() + f["xy"].sum()

    timeit("F FULL ORB", full, img, mask)


if __name__ == "__main__":
    main()
