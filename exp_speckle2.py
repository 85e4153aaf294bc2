"""Speckle round 4: can the pointer-jump gathers (~12 ms) and the
scatter histogram (~7 ms) be replaced by scans + sort-based counting?

Measures:
 1. lax.sort_key_val cost on 467k elements (the candidate primitive),
 2. scan-only label convergence on REAL sgbm output (rounds until the
    labels stop changing, checked against the converged fixed point),
 3. sort-based size counting == scatter-based sizes, and its cost,
 4. full filter: current vs scans+sort variant, equality + timing.

Not part of the test suite."""

import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(name, fn, *args, reps=10):
    t0 = time.time()
    r = fn(*args)
    jax_sync(r)
    log(f"...{name}: compile+first {time.time()-t0:.1f}s")
    t0 = time.time()
    outs = [fn(*args) for _ in range(reps)]
    jax_sync(outs[-1])
    dt = (time.time() - t0) / reps
    log(f"{name:36s} {dt * 1000:8.2f} ms")
    return dt


def jax_sync(x):
    import jax
    leaves = jax.tree_util.tree_leaves(x)
    float(np.asarray(leaves[0]).reshape(-1)[0])


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from openvo_tpu.config import SGBMParams
    from openvo_tpu.io.synthetic import render_stereo_sequence
    from openvo_tpu.ops import sgbm as S

    IMG_SIZE = (1242, 376)
    seq = render_stereo_sequence(n_frames=1, img_size=IMG_SIZE, f=718.0,
                                 baseline=0.54, seed=0)
    left = jnp.asarray(np.clip(seq["left"][0], 0, 255).astype(np.uint8))
    right = jnp.asarray(np.clip(seq["right"][0], 0, 255).astype(np.uint8))
    p = SGBMParams(num_disparities=128, block_size=5, p1=200, p2=800,
                   disp12_max_diff=1, pre_filter_cap=63, uniqueness_ratio=10,
                   speckle_window_size=100, speckle_range=2)
    # Raw disparity + validity BEFORE speckle: reuse the pipeline pieces.
    pne = dataclidx = None  # noqa: F841 (clarity)
    import dataclasses
    p_off = dataclasses.replace(p, speckle_window_size=0, speckle_range=0)
    d16 = np.asarray(jax.jit(
        lambda l, r: S.sgbm_disparity16(l, r, p_off))(left, right))
    disp16 = jnp.asarray(d16.astype(np.int32))
    valid = jnp.asarray(d16 != (p.min_disparity - 1) * 16)
    H, W = d16.shape
    n = H * W
    log(f"valid px: {int(np.asarray(valid).sum())}/{n}")

    max_diff = 16 * p.speckle_range

    def conn(d, v):
        cx = (jnp.abs(d - S._shift_fill(d, 1, -1, 1 << 20)) <= max_diff)
        cy = (jnp.abs(d - S._shift_fill(d, 1, -2, 1 << 20)) <= max_diff)
        cx &= v & S._shift_fill(v, 1, -1, False)
        cy &= v & S._shift_fill(v, 1, -2, False)
        return cx, cy

    def labels_scan(d, v, rounds):
        cx, cy = conn(d, v)
        idx = (jax.lax.broadcasted_iota(jnp.int32, (H, W), 0) * W
               + jax.lax.broadcasted_iota(jnp.int32, (H, W), 1))
        lab = idx.astype(jnp.float32)
        for _ in range(rounds):
            lab = S._run_min(lab, cx, axis=-1)
            lab = S._run_min(lab, cy, axis=-2)
        return lab.astype(jnp.int32)

    # --- 2. convergence: rounds until fixed point on real data ---
    labs = {r: np.asarray(jax.jit(
        lambda d, v, r=r: labels_scan(d, v, r))(disp16, valid))
        for r in (2, 3, 4, 6, 8, 12)}
    # fixed point via the full current filter machinery (scans+jumps)
    for r in (2, 3, 4, 6, 8):
        diff = (labs[r] != labs[12]).sum()
        log(f"scan rounds {r:2d}: {diff} px differ from rounds=12")

    # --- 1 & 3. sort cost + sort-based sizes ---
    lab12 = jnp.asarray(labs[12]).reshape(-1)

    def sort_cost(lab):
        sk, sv = jax.lax.sort_key_val(lab, jnp.arange(n, dtype=jnp.int32))
        return sk.sum() + sv.sum()

    def sizes_scatter(lab, v):
        sizes = jnp.zeros((n,), jnp.int32).at[lab].add(
            jnp.where(v.reshape(-1), 1, 0))
        return jnp.take(sizes, lab).reshape(H, W)

    def sizes_sort(lab, v):
        # sort pixels by label; run-lengths of equal labels via Hillis-
        # Steele segmented SUM on the sorted array; then un-sort by a
        # second key-val sort on the original index.
        # NOTE: invalid pixels are label-singletons (connectivity requires
        # both-valid), so component size == segment LENGTH of the sorted
        # labels — the count vector is all-ones, no gather needed. Invalid
        # pixels get size 1 (scatter version gives 0): both <= threshold,
        # and the caller ANDs with valid, so the filter output is equal.
        del v
        pos = jnp.arange(n, dtype=jnp.int32)
        sk, sval = jax.lax.sort_key_val(lab, pos)
        scnt = jnp.ones((n,), jnp.int32)
        # segmented inclusive sum from both directions = total per segment:
        seg_start = jnp.concatenate([jnp.ones((1,), bool),
                                     sk[1:] != sk[:-1]])
        # forward inclusive scan within segments
        tot = scnt
        conn_f = ~seg_start
        k = 1
        while k < n:
            t = jnp.where(conn_f, tot + S._shift_fill(tot, k, 0, 0), tot)
            c = conn_f & S._shift_fill(conn_f, k, 0, False)
            tot, conn_f = t, c
            k *= 2
        # tot now = inclusive-from-segment-start sums; segment TOTAL =
        # value at segment end; broadcast back via reverse max-scan:
        seg_end = jnp.concatenate([sk[1:] != sk[:-1],
                                   jnp.ones((1,), bool)])
        total = jnp.where(seg_end, tot, 0)
        conn_b = ~S._shift_fill(seg_start, -1, 0, True)  # connected to next
        k = 1
        while k < n:
            t = jnp.maximum(total, jnp.where(
                conn_b, S._shift_fill(total, -k, 0, 0), 0))
            c = conn_b & S._shift_fill(conn_b, -k, 0, False)
            total, conn_b = t, c
            k *= 2
        # un-sort: scatter-free via second sort keyed by original position
        _, out = jax.lax.sort_key_val(sval, total)
        return out.reshape(H, W)

    za = np.asarray(jax.jit(sizes_scatter)(lab12, valid))
    zb = np.asarray(jax.jit(sizes_sort)(lab12, valid))
    vmask = np.asarray(valid)
    log(f"sizes sort==scatter (valid px): "
        f"{np.array_equal(za[vmask], zb[vmask])}")

    timeit("sort_key_val 467k", jax.jit(sort_cost), lab12)
    timeit("sizes via scatter+take", jax.jit(
        lambda l, v: sizes_scatter(l, v).sum()), lab12, valid)
    timeit("sizes via 2x sort + scans", jax.jit(
        lambda l, v: sizes_sort(l, v).sum()), lab12, valid)
    timeit("labels scans x4", jax.jit(
        lambda d, v: labels_scan(d, v, 4).sum()), disp16, valid)
    timeit("labels scans x8", jax.jit(
        lambda d, v: labels_scan(d, v, 8).sum()), disp16, valid)

    # --- 4. full filter variants ---
    def filt_new(d16i, v, rounds=6):
        lab = labels_scan(d16i, v, rounds).reshape(-1)
        sz = sizes_sort(lab, v)
        return v & (sz > p.speckle_window_size)

    ref = np.asarray(jax.jit(
        lambda d, v: S._speckle_filter(d, v, p))(disp16, valid))
    new = np.asarray(jax.jit(filt_new)(disp16, valid))
    log(f"full filter equal (scans6+sort vs current): "
        f"{np.array_equal(ref, new)}; diff px: {(ref != new).sum()}")
    timeit("FULL current filter", jax.jit(
        lambda d, v: S._speckle_filter(d, v, p).sum()), disp16, valid)
    timeit("FULL scans6+sortsizes", jax.jit(
        lambda d, v: filt_new(d, v).sum()), disp16, valid)


if __name__ == "__main__":
    main()
