"""Pallas TPU kernels for SGM path-cost aggregation + fused WTA.

The directional recurrence

    L_r(p, d) = C(p, d) + min(L_r(p-r, d), L_r(p-r, d+/-1) + P1,
                              min_k L_r(p-r, k) + P2) - min_k L_r(p-r, k)

is a scan along rows or columns of the (H, W, D) cost volume. Each scan
becomes a *sequential Pallas grid*: grid steps run in order on the core, so
the per-direction L state lives in a VMEM scratch buffer that carries from
one step to the next, and each step is pure VPU work with D on the lane axis
(D is a multiple of 16, typically 128 = one lane register row).

Memory-traffic design (the round-2 rewrite; the whole 500 fps budget runs
through this file):

 - **No transposes.** Horizontal paths scan a grid over W with (H, g, D)
   column blocks; vertical paths scan a grid over H with (g, W, D) row
   blocks. The volume is never reshuffled in HBM.
 - **Directional sums accumulate across sweeps.** Every sweep takes the
   previous partial sum as an input block and writes partial+own; separate
   per-sweep S volumes are never materialized and never added in XLA.
 - **Exact f32 arithmetic.** For int16 x2-grid costs (see
   sgbm.bt_cost_volume) penalties are scaled x2 and every sum stays far
   below 2^24, so f32 kernel arithmetic is bit-exact — and ~6x faster than
   int32 on this VPU (measured). int16/int32 are storage formats only: the
   partial sum is stored int16 whenever the static bound
   n_dirs * (cost_max + 2*P2) <= 32767 allows (true for the default 5-path
   config), else int32.
 - **WTA fused into the final sweep.** The last sweep is always a vertical
   one; when it reaches row r, the total S row is complete in registers, so
   WTA + uniqueness + subpixel + left-right check run in-kernel and only the
   (H, W) disparity/valid maps are written. The full f32 S volume
   (239 MB at KITTI res) never exists.

This replaces the hot loop of OpenCV's SGBM C++ aggregation (reference
stereo_camera.py:51 via cv2.StereoSGBM.compute; SURVEY.md N4 north-star).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG_F = 1e9  # plain float: jnp scalars would be captured consts

# ALL kernel arithmetic is float32: on this TPU generation the VPU runs
# int32 min/add ~6x slower than f32 (measured: 3 full directions 1.5 ms in
# f32 vs 8.7 ms in int32 at KITTI volume size). Every quantity on the x2
# cost grid stays far below 2^24, so f32 is EXACT — int16/int32 are used
# only as HBM storage formats, converted on load/store.


def _big(dtype):
    del dtype
    return BIG_F


def _to_acc(x, int_mode):
    """Load-convert a block to the f32 accumulation format."""
    del int_mode
    return x.astype(jnp.float32)


def _dir_update(prev, c, d_idx, d, p1, p2, big):
    """One SGM recurrence step: (prev L, cost) -> new L. ``prev`` may be
    (W, D) for one direction or (nd, W, D) for a batch of directions that
    share the cost row (one wide VPU op instead of nd serial ones)."""
    minprev = jnp.min(prev, axis=-1, keepdims=True)
    up = jnp.where(d_idx < 1, big, jnp.roll(prev, 1, axis=-1))
    dn = jnp.where(d_idx >= d - 1, big, jnp.roll(prev, -1, axis=-1))
    cand = jnp.minimum(prev, jnp.minimum(up, dn) + p1)
    cand = jnp.minimum(cand, minprev + p2)
    return c + cand - minprev


# ---------------------------------------------------------------------------
# Horizontal sweeps: grid over W, (H, g, D) column blocks, carry (1, H, D).
# ---------------------------------------------------------------------------


def _sweep_h_kernel(*refs, p1, p2, g, reverse, int_mode, has_acc):
    if has_acc:
        c_ref, acc_ref, out_ref, carry_ref = refs
    else:
        c_ref, out_ref, carry_ref = refs
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        carry_ref[...] = jnp.full(carry_ref.shape, _big(carry_ref.dtype),
                                  carry_ref.dtype)

    d = c_ref.shape[2]
    d_idx = jax.lax.broadcasted_iota(jnp.int32, (1, d), 1)
    big = _big(carry_ref.dtype)
    cols = range(g - 1, -1, -1) if reverse else range(g)
    for j in cols:
        c = _to_acc(c_ref[:, j, :], int_mode)
        L = _dir_update(carry_ref[0], c, d_idx, d, p1, p2, big)
        carry_ref[0] = L
        total = L
        if has_acc:
            total = total + _to_acc(acc_ref[:, j, :], int_mode)
        out_ref[:, j, :] = total.astype(out_ref.dtype)


def sweep_h(cost, p1, p2, reverse: bool, accum=None, out_dtype=None,
            g: int = 16):
    # g=16 default: the (H, g, D) blocks' tiled dims are (g, D), and int16
    # tiles need >= 16 sublanes.
    """One horizontal path sweep (left->right or right->left) over the
    (H, W, D) volume; returns own-L (+ accum if given) as an (H, W, D)
    volume of ``out_dtype``. Zero-padded columns are semantically
    transparent to the carry (fresh-start state)."""
    h, w, d = cost.shape
    int_mode = cost.dtype == jnp.int16
    acc_dtype = jnp.float32  # all arithmetic is f32 (see header note)
    if out_dtype is None:
        out_dtype = acc_dtype
    wp = -(-w // g) * g
    if wp != w:
        padc = jnp.zeros((h, wp - w, d), cost.dtype)
        parts = [cost, padc] if not reverse else [padc, cost]
        cost = jnp.concatenate(parts, axis=1)
        if accum is not None:
            pada = jnp.zeros((h, wp - w, d), accum.dtype)
            parts = [accum, pada] if not reverse else [pada, accum]
            accum = jnp.concatenate(parts, axis=1)
    nblocks = wp // g
    if reverse:
        imap = lambda i: (0, nblocks - 1 - i, 0)  # noqa: E731
    else:
        imap = lambda i: (0, i, 0)  # noqa: E731

    kernel = functools.partial(
        _sweep_h_kernel, p1=p1, p2=p2, g=g, reverse=reverse,
        int_mode=int_mode, has_acc=accum is not None,
    )
    spec = pl.BlockSpec((h, g, d), imap, memory_space=pltpu.VMEM)
    in_specs = [spec] if accum is None else [spec, spec]
    args = (cost,) if accum is None else (cost, accum)
    out = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=in_specs,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((h, wp, d), out_dtype),
        scratch_shapes=[pltpu.VMEM((1, h, d), acc_dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*args)
    if wp != w:
        out = out[:, :w] if not reverse else out[:, wp - w:]
    return out


# ---------------------------------------------------------------------------
# Fused cost + block-sum + forward horizontal sweep.
#
# The BT cost volume never exists un-summed in HBM: per column x, the sheared
# right-image row window  rsh[., d] = right(x - minD - d)  is ONE dynamic
# lane slice of a pre-REVERSED padded right image (the reversal turns the
# per-lane shear into a contiguous window — no gathers, no 7-pass log-shift
# shear, no (H, W, D) broadcast in HBM). The 2D BT envelopes commute with
# the shear, so they are precomputed once per frame as cheap 2D images and
# sliced the same way. The 5x5 box sum runs in-register (vertical rolls +
# a sliding column window), and the left->right SGM sweep consumes each
# box column as it is produced. Outputs: the block-summed cost volume C
# (for the remaining sweeps) and the forward-path partial sum S1.
# ---------------------------------------------------------------------------


_CG = 128  # columns per fused-kernel block: keeps every window slice static


def _cost_sweep_kernel(*refs, nch_r, dd, w, min_disp, radius, sentinel,
                       p1, p2):
    """refs = [3 left chunks] x3 images, [nch_r right chunks] x3 images,
    c_out, s_out, carry. All window slices are STATIC: the reversed right
    image is chunk-aligned so column x's shear window is a fixed offset
    into the concatenated chunks (see cost_sweep_fused)."""
    it = iter(refs)
    l_chunks = [[next(it) for _ in range(3)] for _ in range(3)]
    r_chunks = [[next(it) for _ in range(nch_r)] for _ in range(3)]
    c_out_ref, s_out_ref, carry_ref = next(it), next(it), next(it)
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        carry_ref[...] = jnp.full(carry_ref.shape, BIG_F, jnp.float32)

    h = c_out_ref.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, dd), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0)

    lwin = [jnp.concatenate([c[...] for c in img], axis=1)
            for img in l_chunks]
    rwin = [jnp.concatenate([c[...] for c in img], axis=1)
            for img in r_chunks]

    def raw_cost_col(j):
        """(H, D) x2-grid block cost for column x = i*CG + j, pre-box."""
        x = i * _CG + j
        # right-side shear window: lane d = right(x - minD - d)
        off = (radius - 1 - j) + _CG
        rsh = rwin[0][:, off:off + dd]
        r_lo = rwin[1][:, off:off + dd]
        r_hi = rwin[2][:, off:off + dd]
        lo = _CG + j
        lpx = lwin[0][:, lo:lo + 1]
        llox = lwin[1][:, lo:lo + 1]
        lhix = lwin[2][:, lo:lo + 1]
        c_l = jnp.maximum(jnp.maximum(lpx - r_hi, r_lo - lpx), 0.0)
        c_r = jnp.maximum(jnp.maximum(rsh - lhix, llox - rsh), 0.0)
        cost = jnp.minimum(c_l, c_r)
        # Validity mirrors the old NaN propagation: the envelope at
        # x-minD-d = 0 used an out-of-range neighbor, so require >= 1.
        # Out-of-image columns (x < 0 left halo, x >= w right pad) are
        # fully sentinel.
        xr = x - min_disp - lane
        invalid = (xr < 1) | (xr > w - 1) | (x < 0) | (x > w - 1)
        return jnp.where(invalid, float(sentinel), cost)

    def vbox(slab):
        """Vertical (2*radius+1) box sum with edge-replicated borders."""
        out = slab
        top = slab[0:1, :]
        bot = slab[h - 1:h, :]
        for k in range(1, radius + 1):
            up = jnp.roll(slab, -k, axis=0)
            up = jnp.where(row >= h - k, bot, up)
            dn = jnp.roll(slab, k, axis=0)
            dn = jnp.where(row < k, top, dn)
            out = out + up + dn
        return out

    # Sliding window over columns: at most 2*radius+1 slabs live at once.
    window = []
    for j in range(-radius, _CG + radius):
        window.append(vbox(raw_cost_col(j)))
        if len(window) > 2 * radius + 1:
            window.pop(0)
        if j < radius:
            continue
        jo = j - radius  # output column
        box = window[0]
        for s in window[1:]:
            box = box + s
        # Reshape while still f32, then convert: Mosaic cannot shape-cast
        # narrow-lane int16 vectors.
        c_out_ref[:, jo:jo + 1, :] = box[:, None, :].astype(c_out_ref.dtype)
        L = _dir_update(carry_ref[0], box, lane, dd, p1, p2, BIG_F)
        carry_ref[0] = L
        s_out_ref[:, jo:jo + 1, :] = L[:, None, :].astype(s_out_ref.dtype)


def cost_sweep_fused(lp, llo, lhi, rp, rlo, rhi, params, sentinel: int,
                     p1: float, p2: float, s1_dtype=jnp.int16):
    """Fused cost volume + box sum + forward horizontal sweep.

    Inputs are x2-scaled 2D prefiltered images and their BT envelopes
    (H, W) float32. Returns (C int16 (H, W, D), S1 (H, W, D)) on the exact
    x2 grid. Only used inside the int16 sentinel envelope (the caller
    falls back to the XLA volume path otherwise).

    Layout trick: with CG=128 columns per grid block, the shear window
    rsh[., d] = right(x - minD - d) of every column is a STATIC slice of
    nch adjacent 128-lane chunks of the REVERSED padded right image,
    selected per block by a descending BlockSpec index map — no gathers,
    no dynamic lane slicing, no 7-pass log-shift shear, and the cost
    volume is built and consumed without any XLA (H, W, D) intermediate.
    """
    h, w = lp.shape
    dd = params.num_disparities
    md = params.min_disparity
    radius = params.block_size // 2
    nblocks = -(-w // _CG)
    wp = nblocks * _CG

    # Left images, padded one chunk on each side: column x of block i sits
    # at lane CG + (x - CG*i) of the 3-chunk window (i-1, i, i+1).
    lpadw = (nblocks + 2) * _CG
    lpad = [jnp.pad(img, ((0, 0), (_CG, lpadw - w - _CG)))
            for img in (lp, llo, lhi)]

    # Reversed right images: rrev[k] = rpad[rw - 1 - k] with rpad holding
    # right(t - extra_l). Lane of (x, d) is K - x + d with
    # K = rw - 1 - extra_l + minD; choosing K = CG*M + (radius - 1) makes
    # block i's window exactly chunks (M-1-i ... M-1-i+nch-1), and column
    # j's slice start (radius-1-j) + CG static.
    nch = (2 * radius - 1 + dd) // _CG + 2
    m_blk = nblocks + 1  # +1 chunk of headroom keeps the right pad >= 0
    rw = _CG * (m_blk + nch)
    extra_l = rw - 1 + md - (_CG * m_blk + radius - 1)
    assert extra_l >= dd + radius + max(md, 0), (extra_l, dd, md)
    assert rw - w - extra_l >= 0, (rw, w, extra_l)

    def rev(img):
        p = jnp.pad(img, ((0, 0), (extra_l, rw - w - extra_l)))
        return p[:, ::-1]

    rrev = [rev(img) for img in (rp, rlo, rhi)]

    def chunk(f):
        return pl.BlockSpec((h, _CG), lambda i: (0, f(i)),
                            memory_space=pltpu.VMEM)

    # 3 images x chunks, image-major (matches the kernel's unpack order).
    l_specs = [chunk(lambda i, o=o: i + o)
               for _ in range(3) for o in (0, 1, 2)]
    r_specs = [chunk(lambda i, o=o: m_blk - 1 - i + o)
               for _ in range(3) for o in range(nch)]

    out_spec = pl.BlockSpec((h, _CG, dd), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _cost_sweep_kernel, nch_r=nch, dd=dd, w=w, min_disp=md,
        radius=radius, sentinel=int(sentinel), p1=float(p1), p2=float(p2),
    )
    args = []
    for img in lpad:
        args.extend([img] * 3)
    for img in rrev:
        args.extend([img] * nch)
    C, s1 = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=l_specs + r_specs,
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((h, wp, dd), jnp.int16),
            jax.ShapeDtypeStruct((h, wp, dd), s1_dtype),
        ),
        scratch_shapes=[pltpu.VMEM((1, h, dd), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*args)
    if wp != w:
        C, s1 = C[:, :w], s1[:, :w]
    return C, s1


# ---------------------------------------------------------------------------
# Vertical sweeps: grid over H, (g, W, D) row blocks, carry (ndirs, W, D).
# Diagonal directions are the same scan with a per-row x-shift of the carry.
# ---------------------------------------------------------------------------


def _shift_carry(prev, k, x_idx, n1, big):
    if k == 0:
        return prev
    out = jnp.roll(prev, k, axis=0)
    if k > 0:
        return jnp.where(x_idx < k, big, out)
    return jnp.where(x_idx >= n1 + k, big, out)


def _row_step(carry_ref, c, xshifts, x_idx, d_idx, n1, d, p1, p2, big):
    """One row of the vertical recurrence: shift each direction's carry,
    batch-update all directions in one (nd, W, D) op, store the new carry,
    return the directions' sum for this row."""
    if len(xshifts) == 1:
        prev = _shift_carry(carry_ref[0], xshifts[0], x_idx, n1, big)[None]
    else:
        prev = jnp.stack(
            [_shift_carry(carry_ref[j], k, x_idx, n1, big)
             for j, k in enumerate(xshifts)], axis=0)
    L = _dir_update(prev, c[None], d_idx, d, p1, p2, big)
    carry_ref[...] = L
    return jnp.sum(L, axis=0)


def _sweep_v_kernel(*refs, xshifts, p1, p2, g, reverse, int_mode, has_acc):
    if has_acc:
        c_ref, acc_ref, out_ref, carry_ref = refs
    else:
        c_ref, out_ref, carry_ref = refs
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        carry_ref[...] = jnp.full(carry_ref.shape, _big(carry_ref.dtype),
                                  carry_ref.dtype)

    n1, d = c_ref.shape[1], c_ref.shape[2]
    x_idx = jax.lax.broadcasted_iota(jnp.int32, (n1, 1), 0)
    d_idx = jax.lax.broadcasted_iota(jnp.int32, (1, d), 1)
    big = _big(carry_ref.dtype)
    rows = range(g - 1, -1, -1) if reverse else range(g)
    for r in rows:
        c = _to_acc(c_ref[r], int_mode)
        total = _row_step(carry_ref, c, xshifts, x_idx, d_idx, n1, d,
                          p1, p2, big)
        if has_acc:
            total = total + _to_acc(acc_ref[r], int_mode)
        out_ref[r] = total.astype(out_ref.dtype)


def sweep_v(cost, xshifts, p1, p2, reverse: bool, accum=None, out_dtype=None,
            g: int = 4):
    """Vertical sweep (top-down or bottom-up) aggregating up to three
    same-orientation directions (axis-1 shifts), plus the running partial."""
    n0, n1, d = cost.shape
    int_mode = cost.dtype == jnp.int16
    acc_dtype = jnp.float32  # all arithmetic is f32 (see header note)
    if out_dtype is None:
        out_dtype = acc_dtype
    n0p = -(-n0 // g) * g
    if n0p != n0:
        padc = jnp.zeros((n0p - n0, n1, d), cost.dtype)
        cost = jnp.concatenate([cost, padc] if not reverse else [padc, cost],
                               axis=0)
        if accum is not None:
            pada = jnp.zeros((n0p - n0, n1, d), accum.dtype)
            accum = jnp.concatenate(
                [accum, pada] if not reverse else [pada, accum], axis=0)
    nblocks = n0p // g
    if reverse:
        imap = lambda i: (nblocks - 1 - i, 0, 0)  # noqa: E731
    else:
        imap = lambda i: (i, 0, 0)  # noqa: E731

    kernel = functools.partial(
        _sweep_v_kernel, xshifts=tuple(xshifts), p1=p1, p2=p2, g=g,
        reverse=reverse, int_mode=int_mode, has_acc=accum is not None,
    )
    spec = pl.BlockSpec((g, n1, d), imap, memory_space=pltpu.VMEM)
    in_specs = [spec] if accum is None else [spec, spec]
    args = (cost,) if accum is None else (cost, accum)
    out = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=in_specs,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((n0p, n1, d), out_dtype),
        scratch_shapes=[pltpu.VMEM((len(xshifts), n1, d), acc_dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*args)
    if n0p != n0:
        out = out[:n0] if not reverse else out[n0p - n0:]
    return out


# ---------------------------------------------------------------------------
# WTA post-processing (in-register, row-local) + the fused final sweep.
# ---------------------------------------------------------------------------


def _shear_x_block(vol, sign: int, fill, axis: int = 0):
    """In-register per-lane shear of a (W, D) block along the W axis (same
    log-shift trick as sgbm._shear_x, usable inside kernels)."""
    w = vol.shape[axis]
    d = vol.shape[-1]
    lane_shape = [1] * vol.ndim
    lane_shape[-1] = d
    lane = jax.lax.broadcasted_iota(jnp.int32, tuple(lane_shape), vol.ndim - 1)
    x_shape = [1] * vol.ndim
    x_shape[axis] = w
    xs = jax.lax.broadcasted_iota(jnp.int32, tuple(x_shape), axis)
    out = vol
    k = 1
    while k < d:
        rolled = jnp.roll(out, sign * k, axis=axis)
        if sign < 0:
            rolled = jnp.where(xs >= w - k, fill, rolled)
        else:
            rolled = jnp.where(xs < k, fill, rolled)
        out = jnp.where((lane & k) != 0, rolled, out)
        k *= 2
    return out


def _shear_x_padded(vol, fill, axis: int = 1):
    """Negative-direction shear via fill-padding: append D sublanes of
    ``fill`` along ``axis`` so the log-shift rolls wrap harmlessly through
    the pad zone — saves one boundary compare+select per pass (the shear
    runs once per grid block over the full volume; this is the fused WTA
    kernel's hottest stretch)."""
    d = vol.shape[-1]
    pad_shape = list(vol.shape)
    pad_shape[axis] = d
    padded = jnp.concatenate(
        [vol, jnp.full(tuple(pad_shape), fill, vol.dtype)], axis=axis)
    lane_shape = [1] * vol.ndim
    lane_shape[-1] = d
    lane = jax.lax.broadcasted_iota(jnp.int32, tuple(lane_shape),
                                    vol.ndim - 1)
    out = padded
    k = 1
    while k < d:
        rolled = jnp.roll(out, -k, axis=axis)
        out = jnp.where((lane & k) != 0, rolled, out)
        k *= 2
    sl = [slice(None)] * vol.ndim
    sl[axis] = slice(0, vol.shape[axis])
    return out[tuple(sl)]


def _next_pow2(n):
    p = 1
    while p < n:
        p *= 2
    return p


def _wta_block(s, int_mode, min_disp, uniq, lr_max_diff):
    """WTA + uniqueness + parabolic subpixel on an aggregated block
    s (g, W, D) (f32, on the x2 cost grid in int mode). Mirrors
    sgbm._wta semantics exactly; scale-invariant, so the x2 grid needs no
    decode. Returns (disp16, valid, best, best_r), all (g, W) int32.

    ``best_r`` is the *right view's* WTA lane (costR(x, d) = S(x+d, d));
    the dR(x) = best_r[x - best(x)] lookup of the left-right check is a
    tiny 2-D gather done by the caller in XLA — cheaper than a second
    in-kernel shear.
    """
    gg, w, d = s.shape
    sf = s.astype(jnp.float32)
    d_f = jax.lax.broadcasted_iota(jnp.int32, (1, 1, d), 2).astype(jnp.float32)
    x_idx = jax.lax.broadcasted_iota(jnp.int32, (1, w, 1), 1)

    # Packed-key argmin: one reduction gives (min value, first-min lane).
    # Exact in f32 when max_sum * mult < 2^24 (true for the x2 int16 grid:
    # 8 paths * (32767/25*5^2 + 2P2) * 128 < 2^24); float-cost mode falls
    # back to the compare-based argmin.
    mult = _next_pow2(d)
    if int_mode:
        key = sf * float(mult) + d_f
        bestkey = jnp.min(key, axis=-1, keepdims=True)
        bk = bestkey.astype(jnp.int32)        # (g, w, 1): tiny int ops
        best = bk & (mult - 1)
        min_s = ((bk - best) // mult).astype(jnp.float32)
    else:
        min_s = jnp.min(sf, axis=-1, keepdims=True)
        best = jnp.min(jnp.where(sf == min_s, d_f, float(d)), axis=-1,
                       keepdims=True).astype(jnp.int32)
    best_f = best.astype(jnp.float32)

    valid = jnp.ones((gg, w, 1), jnp.bool_)
    if uniq > 0:
        far = jnp.abs(d_f - best_f) > 1.0
        bad = jnp.any(far & (sf * (100.0 - uniq) < min_s * 100.0),
                      axis=-1, keepdims=True)
        valid &= ~bad

    s_m = jnp.sum(jnp.where(d_f == jnp.maximum(best_f - 1, 0.0), sf, 0.0),
                  axis=-1, keepdims=True)
    s_p = jnp.sum(
        jnp.where(d_f == jnp.minimum(best_f + 1, float(d - 1)), sf, 0.0),
        axis=-1, keepdims=True)
    denom = s_m + s_p - 2.0 * min_s
    interior = (best > 0) & (best < d - 1) & (denom > 0)
    frac = jnp.where(interior, (s_m - s_p) / jnp.maximum(2.0 * denom, 1e-9),
                     0.0)
    frac = jnp.clip(frac, -0.5, 0.5)
    d_float = best_f + frac + float(min_disp)
    disp16 = jnp.round(d_float * 16.0).astype(jnp.int32)

    if lr_max_diff >= 0:
        # Right-view WTA from the same volume: costR(x, d) = S(x+d, d).
        if int_mode:
            key_r = _shear_x_padded(key, BIG_F, axis=1)
            bkr = jnp.min(key_r, axis=-1, keepdims=True).astype(jnp.int32)
            best_r = bkr & (mult - 1)
        else:
            cost_r = _shear_x_padded(sf, BIG_F, axis=1)
            minr = jnp.min(cost_r, axis=-1, keepdims=True)
            best_r = jnp.min(jnp.where(cost_r == minr, d_f, float(d)),
                             axis=-1, keepdims=True).astype(jnp.int32)
    else:
        best_r = jnp.zeros((gg, w, 1), jnp.int32)
    # No full-range right support on the left band.
    valid &= (x_idx - (best + min_disp)) >= 0
    return (disp16[..., 0], valid[..., 0].astype(jnp.int32),
            best[..., 0], best_r[..., 0])


def _sweep_v_wta_kernel(c_ref, acc_ref, disp_ref, valid_ref, best_ref,
                        bestr_ref, carry_ref, tot_ref, *,
                        xshifts, p1, p2, g, reverse, int_mode,
                        min_disp, uniq, lr_max_diff):
    """Final vertical sweep fused with WTA: when this sweep reaches a row,
    the total S row is complete (all other directions' sums arrive via
    acc_ref), so the disparity is produced in-register and S never exists
    in HBM. Rows accumulate into a VMEM total block; WTA then runs once
    per block (batched over g rows) instead of per row."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        carry_ref[...] = jnp.full(carry_ref.shape, _big(carry_ref.dtype),
                                  carry_ref.dtype)

    n1, d = c_ref.shape[1], c_ref.shape[2]
    x_idx = jax.lax.broadcasted_iota(jnp.int32, (n1, 1), 0)
    d_idx = jax.lax.broadcasted_iota(jnp.int32, (1, d), 1)
    big = _big(carry_ref.dtype)
    rows = range(g - 1, -1, -1) if reverse else range(g)
    for r in rows:
        c = _to_acc(c_ref[r], int_mode)
        total = _row_step(carry_ref, c, xshifts, x_idx, d_idx, n1, d,
                          p1, p2, big)
        tot_ref[r] = total + _to_acc(acc_ref[r], int_mode)

    disp16, valid, best, best_r = _wta_block(
        tot_ref[...], int_mode, min_disp, uniq, lr_max_diff)
    disp_ref[...] = disp16
    valid_ref[...] = valid
    best_ref[...] = best
    bestr_ref[...] = best_r


def sweep_v_wta(cost, xshifts, p1, p2, reverse: bool, accum, params,
                g: int = 8):
    """Final fused sweep: returns (disp16 int32 (H, W), valid bool (H, W))."""
    n0, n1, d = cost.shape
    int_mode = cost.dtype == jnp.int16
    acc_dtype = jnp.float32  # all arithmetic is f32 (see header note)
    n0p = -(-n0 // g) * g
    if n0p != n0:
        padc = jnp.zeros((n0p - n0, n1, d), cost.dtype)
        cost = jnp.concatenate([cost, padc] if not reverse else [padc, cost],
                               axis=0)
        pada = jnp.zeros((n0p - n0, n1, d), accum.dtype)
        accum = jnp.concatenate(
            [accum, pada] if not reverse else [pada, accum], axis=0)
    nblocks = n0p // g
    if reverse:
        imap3 = lambda i: (nblocks - 1 - i, 0, 0)  # noqa: E731
        imap2 = lambda i: (nblocks - 1 - i, 0)  # noqa: E731
    else:
        imap3 = lambda i: (i, 0, 0)  # noqa: E731
        imap2 = lambda i: (i, 0)  # noqa: E731

    lr_max_diff = int(params.disp12_max_diff)
    kernel = functools.partial(
        _sweep_v_wta_kernel, xshifts=tuple(xshifts), p1=p1, p2=p2, g=g,
        reverse=reverse, int_mode=int_mode,
        min_disp=int(params.min_disparity),
        uniq=float(params.uniqueness_ratio),
        lr_max_diff=lr_max_diff,
    )
    spec3 = pl.BlockSpec((g, n1, d), imap3, memory_space=pltpu.VMEM)
    spec2 = pl.BlockSpec((g, n1), imap2, memory_space=pltpu.VMEM)
    disp16, valid, best, best_r = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[spec3, spec3],
        out_specs=(spec2, spec2, spec2, spec2),
        out_shape=tuple(
            jax.ShapeDtypeStruct((n0p, n1), jnp.int32) for _ in range(4)),
        scratch_shapes=[
            pltpu.VMEM((len(xshifts), n1, d), acc_dtype),
            pltpu.VMEM((g, n1, d), acc_dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(cost, accum)
    if n0p != n0:
        sl = slice(None, n0) if not reverse else slice(n0p - n0, None)
        disp16, valid = disp16[sl], valid[sl]
        best, best_r = best[sl], best_r[sl]
    valid = valid.astype(bool)
    if lr_max_diff >= 0:
        # dR(x) = bestR[x - best(x)]: a tiny (H, W) gather along rows —
        # cheaper in XLA than a second full shear inside the kernel.
        x = jnp.arange(n1, dtype=jnp.int32)[None, :]
        idx = jnp.clip(x - best, 0, n1 - 1)
        d_r = jnp.take_along_axis(best_r, idx, axis=1)
        ok = (jnp.abs(best - d_r) <= lr_max_diff) | (x - best < 0)
        valid &= ok
    return disp16, valid


def aggregate_wta(cost, params, cost_max: int | None):
    """Full SGM aggregation + WTA, fused: (H, W, D) block-summed cost ->
    (disp16 int32 (H, W), valid bool (H, W)).

    ``cost_max`` is the static per-element bound of the encoded cost volume
    (block_size^2 * sentinel for the int16 x2 grid; None for float32 costs).
    It sizes the partial-sum dtype: a partial over n directions fits int16
    iff n * (cost_max + 2*P2) <= 32767.
    """
    int_mode = cost.dtype == jnp.int16
    if int_mode:
        # Penalties on the x2 grid; arithmetic is f32 (exact), so the
        # values just need to be float-typed.
        p1 = float(2 * params.effective_p1)
        p2 = float(2 * params.effective_p2)
        per_dir = int(cost_max) + int(p2)

        def partial_dtype(ndirs):
            return jnp.int16 if ndirs * per_dir <= 32767 else jnp.int32
    else:
        p1 = float(params.effective_p1)
        p2 = float(params.effective_p2)

        def partial_dtype(ndirs):
            return jnp.float32

    # Horizontal pair: left->right, then right->left accumulating onto it.
    s1 = sweep_h(cost, p1, p2, False, out_dtype=partial_dtype(1))
    return _finish_from_s1(cost, s1, params, p1, p2, partial_dtype)


def _finish_from_s1(cost, s1, params, p1, p2, partial_dtype):
    """Remaining sweeps after the forward-horizontal partial s1 (which may
    come from sweep_h or from the fused cost kernel)."""
    s2 = sweep_h(cost, p1, p2, True, accum=s1, out_dtype=partial_dtype(2))
    if params.num_paths == 5:
        # OpenCV MODE_SGBM-like: + up, up-left, up-right in the final sweep.
        return sweep_v_wta(cost, (0, 1, -1), p1, p2, False, s2, params)
    if params.num_paths == 4:
        s3 = sweep_v(cost, (0,), p1, p2, False, accum=s2,
                     out_dtype=partial_dtype(3))
        return sweep_v_wta(cost, (0,), p1, p2, True, s3, params)
    # 8 paths: top-down trio accumulates, bottom-up trio fuses WTA.
    s3 = sweep_v(cost, (0, 1, -1), p1, p2, False, accum=s2,
                 out_dtype=partial_dtype(5))
    return sweep_v_wta(cost, (0, 1, -1), p1, p2, True, s3, params)


def sgbm_fused_tpu(lp, rp, params, sentinel: int):
    """Full TPU SGBM from x1-scale prefiltered images: fused cost/box/first
    sweep, then the remaining accumulating sweeps + fused WTA.

    ``lp``/``rp`` are the prefiltered (H, W) f32 images; ``sentinel`` is the
    x2-grid invalid-cost sentinel from sgbm.int16_sentinel (must not be
    None). Returns (disp16 int32 (H, W), valid bool (H, W)).
    """
    p1 = float(2 * params.effective_p1)
    p2 = float(2 * params.effective_p2)
    bs = params.block_size
    cost_max = bs * bs * int(sentinel)
    per_dir = cost_max + int(p2)

    def partial_dtype(ndirs):
        return jnp.int16 if ndirs * per_dir <= 32767 else jnp.int32

    def env(a):
        am = 0.5 * (a + jnp.roll(a, 1, axis=1))
        ap = 0.5 * (a + jnp.roll(a, -1, axis=1))
        return (jnp.minimum(jnp.minimum(am, ap), a),
                jnp.maximum(jnp.maximum(am, ap), a))

    lp2 = lp.astype(jnp.float32) * 2.0
    rp2 = rp.astype(jnp.float32) * 2.0
    llo, lhi = env(lp2)
    rlo, rhi = env(rp2)
    C, s1 = cost_sweep_fused(lp2, llo, lhi, rp2, rlo, rhi, params,
                             int(sentinel), p1, p2,
                             s1_dtype=partial_dtype(1))
    return _finish_from_s1(C, s1, params, p1, p2, partial_dtype)
