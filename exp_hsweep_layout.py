"""Experiment: why are the horizontal SGBM sweeps slower than their
vreg-op floor? Hypotheses measured here, at KITTI volume size:

 H1. Narrow per-column access: (H, g, D) blocks put W on the sublane
     axis, so c_ref[:, j, :] loads / out_ref[:, j, :] stores are
     single-sublane masked ops (376 of them per column). A kernel that
     runs on a PRE-TRANSPOSED (W, H, D) volume reads c_ref[j] as full
     (H, D) tile planes instead.
 H2. jnp.roll on the lane axis lowers suboptimally; pltpu.roll is the
     native Mosaic rotate.

Rows printed (scalar-output jits, pipelined dispatch, tunnel-safe):
  baseline  sweep_h fwd g=16            (current production kernel)
  V1        sweep_h fwd on (W,H,D)      (scan axis OUTER; aligned access)
  V1t       V1 + the XLA transposes     (to price the layout change)
  V2        sweep_h fwd pltpu.roll      (lane rotates via Mosaic op)
  V3        sweep_v 3dir pltpu.roll     (vs the g=4 baseline row)

Not part of the test suite."""

import functools
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(name, fn, *args, reps=10):
    try:
        float(fn(*args))
    except Exception as e:  # noqa: BLE001 — experiment: report and move on
        log(f"{name:34s} FAILED {type(e).__name__}: {str(e)[:160]}")
        return None
    t0 = time.time()
    outs = [fn(*args) for _ in range(reps)]
    float(outs[-1])
    dt = (time.time() - t0) / reps
    log(f"{name:34s} {dt * 1000:8.2f} ms")
    return dt


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from openvo_tpu.config import SGBMParams
    from openvo_tpu.io.synthetic import render_stereo_sequence
    from openvo_tpu.ops import sgbm
    from openvo_tpu.ops import sgbm_pallas as SP

    IMG_SIZE = (1242, 376)
    seq = render_stereo_sequence(n_frames=1, img_size=IMG_SIZE, f=718.0,
                                 baseline=0.54, seed=0)
    left = jnp.asarray(np.clip(seq["left"][0], 0, 255).astype(np.uint8))
    right = jnp.asarray(np.clip(seq["right"][0], 0, 255).astype(np.uint8))
    p = SGBMParams(num_disparities=128, block_size=5, p1=200, p2=800,
                   disp12_max_diff=1, pre_filter_cap=63, uniqueness_ratio=10)
    cap = max(p.pre_filter_cap, 15) | 1
    p1e, p2e = float(2 * p.effective_p1), float(2 * p.effective_p2)

    def make_C(l, r):
        lp = sgbm.prefilter_xsobel(l.astype(jnp.float32), cap)
        rp = sgbm.prefilter_xsobel(r.astype(jnp.float32), cap)
        C = sgbm.bt_cost_volume(lp, rp, p.min_disparity, p.num_disparities,
                                p.block_size, cap)
        return sgbm.block_sum(C, p.block_size)

    C = jax.jit(make_C)(left, right)
    float(C.astype(jnp.float32).sum())
    h, w, d = C.shape
    log(f"volume {C.shape} {C.dtype}")

    noop = timeit("noop baseline", jax.jit(lambda x: x.sum()),
                  jnp.zeros((8, 128), jnp.float32))

    # ---- baseline: production forward horizontal sweep ----
    base = jax.jit(lambda C: SP.sweep_h(
        C, p1e, p2e, False, out_dtype=jnp.int16).astype(jnp.int32).sum())
    timeit("sweep_h fwd g=16 (baseline)", base, C)

    # ---- V1: scan axis OUTER — kernel over a (W, H, D) volume ----
    def _kern_wout(c_ref, out_ref, carry_ref, *, p1, p2, g, roll):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            carry_ref[...] = jnp.full(carry_ref.shape, SP.BIG_F, jnp.float32)

        dd = c_ref.shape[2]
        d_idx = jax.lax.broadcasted_iota(jnp.int32, (1, dd), 1)
        for j in range(g):
            c = c_ref[j].astype(jnp.float32)
            prev = carry_ref[0]
            minprev = jnp.min(prev, axis=-1, keepdims=True)
            up = jnp.where(d_idx < 1, SP.BIG_F, roll(prev, 1, -1))
            dn = jnp.where(d_idx >= dd - 1, SP.BIG_F, roll(prev, -1, -1))
            cand = jnp.minimum(prev, jnp.minimum(up, dn) + p1)
            cand = jnp.minimum(cand, minprev + p2)
            L = c + cand - minprev
            carry_ref[0] = L
            out_ref[j] = L.astype(out_ref.dtype)

    def sweep_h_wout(cwhd, g=16, roll=jnp.roll):
        ww, hh, dd = cwhd.shape
        wp = -(-ww // g) * g
        if wp != ww:
            cwhd = jnp.concatenate(
                [cwhd, jnp.zeros((wp - ww, hh, dd), cwhd.dtype)], axis=0)
        spec = pl.BlockSpec((g, hh, dd), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(_kern_wout, p1=p1e, p2=p2e, g=g, roll=roll),
            grid=(wp // g,),
            in_specs=[spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((wp, hh, dd), jnp.int16),
            scratch_shapes=[pltpu.VMEM((1, hh, dd), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(cwhd)
        return out[:ww]

    Cw = jax.jit(lambda C: jnp.swapaxes(C, 0, 1))(C)
    float(Cw.astype(jnp.float32).sum())

    v1 = jax.jit(lambda Cw: sweep_h_wout(Cw).astype(jnp.int32).sum())
    timeit("V1 sweep_h fwd (W,H,D) kernel", v1, Cw)

    v1t = jax.jit(lambda C: jnp.swapaxes(
        sweep_h_wout(jnp.swapaxes(C, 0, 1)), 0, 1).astype(jnp.int32).sum())
    timeit("V1t V1 + transposes in/out", v1t, C)

    tr = jax.jit(lambda C: jnp.swapaxes(C, 0, 1).astype(jnp.int32).sum())
    timeit("transpose alone (H,W,D)->(W,H,D)", tr, C)

    # ---- V2: pltpu.roll in the W-outer kernel ----
    def plroll(x, k, axis):
        # pltpu.roll requires a non-negative shift; a left-roll by k is a
        # right-roll by (n - k).
        axis = axis if axis >= 0 else x.ndim + axis
        n = x.shape[axis]
        return pltpu.roll(x, k % n, axis)

    v2 = jax.jit(lambda Cw: sweep_h_wout(
        Cw, roll=plroll).astype(jnp.int32).sum())
    timeit("V2 (W,H,D) + pltpu.roll", v2, Cw)

    # ---- V3: production sweep_v vs pltpu.roll variant ----
    s1 = jax.jit(lambda C: SP.sweep_h(C, p1e, p2e, False,
                                      out_dtype=jnp.int16))(C)
    float(s1.astype(jnp.float32).sum())

    v3_base = jax.jit(lambda C, s1: SP.sweep_v(
        C, (0, 1, -1), p1e, p2e, False, accum=s1, out_dtype=jnp.int16,
        out_bias=32768.0).astype(jnp.int32).sum())
    timeit("sweep_v 3dir g=4 (baseline)", v3_base, C, s1)

    log(f"(noop baseline was {noop*1000:.2f} ms)")


if __name__ == "__main__":
    main()
