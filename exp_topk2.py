"""Measure TPU top-k/selection primitive costs at ORB scale (round 4).

The looped ORB's ~4.3 ms and the batched-pyramid's ~9.8 ms both appear to
be dominated by per-level top-k (lax.top_k lowering ~ sort cost, measured
~3.2 ms per 467k-element sort on this chip). Times the candidate
primitives to pick a replacement. Not part of the test suite."""

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
    log(f"{name:40s} {dt * 1000:8.2f} ms")
    return dt


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from openvo_tpu.ops.orb import _topk_flat, _topk_rows

    n = 466992  # 376 x 1242
    k = 108
    rng = np.random.default_rng(0)
    base = rng.random(n).astype(np.float32)
    # realistic sparsity: ~3% corners, rest -inf
    sparse = np.where(rng.random(n) < 0.03, base, -np.inf).astype(np.float32)
    flat = jnp.asarray(sparse)
    flat8 = jnp.asarray(np.stack([sparse] * 8))

    noop = timeit("noop", jax.jit(lambda x: x.sum()),
                  jnp.zeros((8, 128), jnp.float32))

    timeit("lax.top_k flat 467k k=108", jax.jit(
        lambda f: sum(x.sum() for x in jax.lax.top_k(f, k))), flat)
    timeit("_topk_flat two-stage 467k", jax.jit(
        lambda f: sum(x.sum() for x in _topk_flat(f, k))), flat)
    timeit("_topk_rows (8, 467k)", jax.jit(
        lambda f: sum(x.sum() for x in _topk_rows(f, k))), flat8)
    timeit("sort_key_val 467k", jax.jit(
        lambda f: jax.lax.sort_key_val(
            f, jnp.arange(n, dtype=jnp.int32))[1].sum()), flat)
    try:
        timeit("approx_max_k 467k k=108", jax.jit(
            lambda f: sum(x.sum() for x in jax.lax.approx_max_k(f, k))),
            flat)
        timeit("approx_max_k recall .99", jax.jit(
            lambda f: sum(x.sum() for x in jax.lax.approx_max_k(
                f, k, recall_target=0.99))), flat)
        timeit("approx (8,467k) k=108", jax.jit(
            lambda f: sum(x.sum() for x in jax.lax.approx_max_k(f, k))),
            flat8)
    except Exception as e:  # noqa: BLE001
        log(f"approx_max_k unavailable: {e}")

    def thresh_binsearch(f, iters=20):
        lo = jnp.float32(-1.0)
        hi = jnp.float32(2.0)
        for _ in range(iters):
            mid = 0.5 * (lo + hi)
            cnt = jnp.sum(f > mid)
            hi, lo = jnp.where(cnt >= k, jnp.stack([hi, mid]),
                               jnp.stack([mid, lo]))
        return lo

    timeit("binary-search threshold x20", jax.jit(
        lambda f: thresh_binsearch(f)), flat)

    # two-stage with exact-k shrink: stage-1 rows keep only 8 each
    def topk_shrink(f, k1=8):
        G = 1024
        m = -(-n // G)
        pad = G * m - n
        rows = jnp.pad(f, (0, pad), constant_values=-jnp.inf).reshape(G, m)
        rv, ri = jax.lax.top_k(rows, k1)  # (G, k1)
        gi = ri + jnp.arange(G, dtype=jnp.int32)[:, None] * m
        fv, fi = jax.lax.top_k(rv.reshape(-1), k)
        return fv, jnp.take(gi.reshape(-1), fi)

    timeit("two-stage G=1024 k1=8 (approx)", jax.jit(
        lambda f: sum(x.sum() for x in topk_shrink(f))), flat)


if __name__ == "__main__":
    main()
