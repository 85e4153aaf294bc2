"""Speckle-filter timing + compile-time check on the real chip (pipelined
scalar-jit method; see .claude/skills/verify). Not part of the test suite."""

import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(name, fn, *args, reps=10):
    t0 = time.time()
    float(fn(*args))  # compile + sync
    log(f"{name:34s} compile+first {time.time()-t0:8.1f} s")
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

    from openvo_tpu.config import SGBMParams
    from openvo_tpu.ops import sgbm

    H, W = 376, 1242
    p = SGBMParams(num_disparities=128, block_size=5, p1=200, p2=800,
                   disp12_max_diff=1, pre_filter_cap=63, uniqueness_ratio=10,
                   speckle_window_size=100, speckle_range=2)

    rng = np.random.default_rng(0)
    # Piecewise-constant disparity patches + salt noise: speckle-realistic.
    base = np.repeat(np.repeat(
        rng.integers(4, 90, size=(H // 8 + 1, W // 8 + 1)), 8, 0), 8, 1)
    d = base[:H, :W] * 16
    noise = rng.random((H, W)) < 0.03
    d = np.where(noise, rng.integers(4, 90, size=(H, W)) * 16, d)
    disp16 = jnp.asarray(d.astype(np.int32))
    valid = jnp.asarray(rng.random((H, W)) < 0.97)

    @jax.jit
    def full(disp16, valid):
        return sgbm._speckle_filter(disp16, valid, p).sum()

    @jax.jit
    def labels_only(disp16, valid):
        max_diff = 16 * p.speckle_range
        conn_x = (jnp.abs(disp16 - sgbm._shift_fill(disp16, 1, 1, 1 << 20))
                  <= max_diff)
        conn_y = (jnp.abs(disp16 - sgbm._shift_fill(disp16, 1, 0, 1 << 20))
                  <= max_diff)
        conn_x &= valid & sgbm._shift_fill(valid, 1, 1, False)
        conn_y &= valid & sgbm._shift_fill(valid, 1, 0, False)
        idx = (jax.lax.broadcasted_iota(jnp.int32, (H, W), 0) * W
               + jax.lax.broadcasted_iota(jnp.int32, (H, W), 1))
        labels = idx.astype(jnp.float32)
        for _ in range(4):
            labels = sgbm._run_min(labels, conn_x, axis=1)
            labels = sgbm._run_min(labels, conn_y, axis=0)
        return labels.sum()

    @jax.jit
    def hist_only(lab_flat, valid):
        n = H * W
        sizes = jnp.zeros((n,), jnp.int32).at[lab_flat].add(
            jnp.where(valid.reshape(-1), 1, 0))
        return jnp.take(sizes, lab_flat).sum()

    @jax.jit
    def jump_only(lab_flat):
        lab = lab_flat
        for _ in range(4):
            lab = jnp.take(lab, lab)
        return lab.sum()

    lab_flat = jnp.arange(H * W, dtype=jnp.int32)
    timeit("labels (scans only)", labels_only, disp16, valid)
    timeit("pointer-jump x4", jump_only, lab_flat)
    timeit("size histogram + take", hist_only, lab_flat, valid)
    timeit("FULL speckle filter", full, disp16, valid)


if __name__ == "__main__":
    main()
