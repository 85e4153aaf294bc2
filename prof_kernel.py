"""Kernel-cost ladder: isolate what makes the SGM sweep slow.

k0: DMA + convert + lane-reduce only (no recurrence)
k1: + scalar carry recurrence (no lane rolls)
k2: + full 1-direction update (lane rolls +-1)
k4: 3 directions as a python loop
adt = accumulation dtype (int32 vs float32 vs int16) to test VPU op cost.
Not part of the test suite.
"""

import functools
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(name, fn, *args, reps=10):
    float(fn(*args))
    t0 = time.time()
    outs = [fn(*args) for _ in range(reps)]
    float(outs[-1])
    dt = (time.time() - t0) / reps
    log(f"{name:32s} {dt * 1000:8.2f} ms")
    return dt


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    H, W, D = 376, 1242, 128
    rng = np.random.default_rng(0)
    C = jnp.asarray(rng.integers(0, 12000, size=(H, W, D), dtype=np.int16))

    def ladder_kernel(c_ref, out_ref, carry_ref, *, g, mode, ndir, adt):
        i = pl.program_id(0)
        isint = jnp.issubdtype(adt, jnp.integer)
        big = (20000 if adt == jnp.int16 else (1 << 28)) if isint else 1e9
        p1 = 400 if isint else 400.0
        p2 = 1600 if isint else 1600.0

        @pl.when(i == 0)
        def _init():
            carry_ref[...] = jnp.full(carry_ref.shape, big, adt)

        d = c_ref.shape[2]
        d_idx = jax.lax.broadcasted_iota(jnp.int32, (1, d), 1)
        for r in range(g):
            c = c_ref[r].astype(adt)
            if mode == "k0":
                out_ref[r] = jnp.sum(c.astype(jnp.int32), axis=-1)
                continue
            total = None
            for j in range(ndir):
                prev = carry_ref[j]
                minprev = jnp.min(prev, axis=-1, keepdims=True)
                if mode == "k1":
                    cand = jnp.minimum(prev, minprev + p2)
                else:
                    up = jnp.where(d_idx < 1, big, jnp.roll(prev, 1, axis=-1))
                    dn = jnp.where(d_idx >= d - 1, big,
                                   jnp.roll(prev, -1, axis=-1))
                    cand = jnp.minimum(prev, jnp.minimum(up, dn) + p1)
                    cand = jnp.minimum(cand, minprev + p2)
                L = c + cand - minprev
                carry_ref[j] = L.astype(adt)
                total = L if total is None else total + L
            out_ref[r] = jnp.sum(total.astype(jnp.int32), axis=-1)

    def run(mode, g, ndir=1, adt=None):
        import jax.numpy as jnp
        if adt is None:
            adt = jnp.int32
        n0p = -(-H // g) * g
        Cp = C if n0p == H else jnp.concatenate(
            [C, jnp.zeros((n0p - H, W, D), C.dtype)], axis=0)
        kernel = functools.partial(ladder_kernel, g=g, mode=mode, ndir=ndir,
                                   adt=adt)
        fn = pl.pallas_call(
            kernel,
            grid=(n0p // g,),
            in_specs=[pl.BlockSpec((g, W, D), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((g, W), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n0p, W), jnp.int32),
            scratch_shapes=[pltpu.VMEM((ndir, W, D), adt)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )
        del Cp
        return jax.jit(lambda x: fn(x).sum())

    timeit("noop baseline", jax.jit(lambda x: x.sum()),
           jnp.zeros((8, 128), jnp.float32))
    g = 8
    timeit("k0 dma+reduce", run("k0", g), C)
    # int16 accumulation: Mosaic has no int16 lane reductions; skipped.
    for adt, tag in ((jnp.int32, "i32"), (jnp.float32, "f32")):
        timeit(f"k1 carry-no-rolls {tag}", run("k1", g, adt=adt), C)
        timeit(f"k2 full-1dir {tag}", run("k2", g, adt=adt), C)
        timeit(f"k4 3dir-loop {tag}", run("k4", g, ndir=3, adt=adt), C)


if __name__ == "__main__" and "--rolls" not in sys.argv:
    main()


def roll_axis_costs():
    """Which roll axes are slow? 7 log-shift rolls along various axes of a
    KITTI-sized block, one pallas kernel each."""
    import functools
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    H, W, D = 376, 1242, 128
    C = jnp.zeros((H, W, D), jnp.float32) + 1.0

    def kern(c_ref, out_ref, *, mode, g):
        x = c_ref[...]
        if mode == "sub3":       # roll along axis 1 (sublane dim of 3D)
            for k in (1, 2, 4, 8, 16, 32, 64):
                x = x + jnp.roll(x, -k, axis=1)
        elif mode == "lane3":    # roll along axis 2 (lane dim)
            for k in (1, 2, 4, 8, 16, 32, 64):
                x = x + jnp.roll(x, -k, axis=2)
        elif mode == "sub2":     # per-row 2D rolls along sublane axis
            for r in range(g):
                y = x[r]
                for k in (1, 2, 4, 8, 16, 32, 64):
                    y = y + jnp.roll(y, -k, axis=0)
                x = x.at[r].set(y)
        elif mode == "transp":   # transpose then lane rolls then back
            t = jnp.swapaxes(x, 1, 2)  # (g, D, W)
            for k in (1, 2, 4, 8, 16, 32, 64):
                t = t + jnp.roll(t, -k, axis=2)
            x = jnp.swapaxes(t, 1, 2)
        out_ref[...] = x

    def run(mode, g=8):
        fn = pl.pallas_call(
            functools.partial(kern, mode=mode, g=g),
            grid=(H // g,),
            in_specs=[pl.BlockSpec((g, W, D), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((g, W, D), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((H, W, D), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )
        return jax.jit(lambda x: fn(x).sum())

    timeit("noop baseline", jax.jit(lambda x: x.sum()),
           jnp.zeros((8, 128), jnp.float32))
    for mode in ("lane3", "sub3", "sub2", "transp"):
        try:
            timeit(f"7 rolls {mode}", run(mode), C)
        except Exception as e:
            log(f"{mode}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__" and "--rolls" in __import__("sys").argv:
    roll_axis_costs()
