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
 - **WTA fused into the final sweep.** The last sweep is the right-to-left
   HORIZONTAL direction; when it reaches column x, the total S column is
   complete in registers, so WTA + uniqueness + subpixel run in-kernel and
   only (H, W) disparity/valid maps are written — the full f32 S volume
   (239 MB at KITTI res) never exists. The left-right check's right-view
   WTA falls out of the same scan via a D-slot ring buffer (one static
   lane-roll + min per column), replacing the round-2 anti-diagonal shear
   that was ~1/3 of the SGBM budget.

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
                       p1, p2, band_halo, w_major, s1_bias):
    """refs = [3 left chunks] x3 images, [nch_r right chunks] x3 images,
    [edge flags if band_halo], c_out, s_out, carry. All window slices are
    STATIC: the reversed right image is chunk-aligned so column x's shear
    window is a fixed offset into the concatenated chunks (see
    cost_sweep_fused).

    ``band_halo`` > 0 marks row-tiled operation: the first/last band_halo
    rows are real halo rows from vertical neighbors; on the devices whose
    SMEM edge flag is set (global top/bottom of the image) the halo rows'
    COST is replaced by the adjacent core row's cost, reproducing the
    single-device edge-replicated box sum exactly (parallel/tiling.py)."""
    it = iter(refs)
    l_chunks = [[next(it) for _ in range(3)] for _ in range(3)]
    r_chunks = [[next(it) for _ in range(nch_r)] for _ in range(3)]
    flags_ref = next(it) if band_halo else None
    c_out_ref, s_out_ref, carry_ref = next(it), next(it), next(it)
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        carry_ref[...] = jnp.full(carry_ref.shape, BIG_F, jnp.float32)

    h = l_chunks[0][0].shape[0]  # image rows (c_out is (CG, h, D) w-major)
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
        cost = jnp.where(invalid, float(sentinel), cost)
        if band_halo:
            is_top = flags_ref[0] > 0
            is_bot = flags_ref[1] > 0
            top_fix = cost[band_halo:band_halo + 1]
            bot_fix = cost[h - band_halo - 1:h - band_halo]
            cost = jnp.where((row < band_halo) & is_top, top_fix, cost)
            cost = jnp.where((row >= h - band_halo) & is_bot, bot_fix,
                             cost)
        return cost

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
        # Pad columns (x >= w) become UNIFORM sentinel: a disparity-uniform
        # column is fresh-start-transparent to every SGM direction (with a
        # uniform carry u, L = c + min(u, u+p1, u+p2) - u = c), which lets
        # the padded (wp, H, D) volume flow through all later sweeps with
        # no pad/slice copies (keep_pad mode). The raw per-pixel sentinel
        # is already uniform; this re-asserts uniformity where the box
        # window mixes in real columns near the right edge.
        xglob = i * _CG + jo
        box = jnp.where(xglob > w - 1, float(sentinel), box)
        L = _dir_update(carry_ref[0], box, lane, dd, p1, p2, BIG_F)
        carry_ref[0] = L
        # biased-int16 encoding (s1_bias 0 = raw; skip the op to keep the
        # default path's HLO — and its compile cache entries — unchanged)
        s_enc = L - s1_bias if s1_bias else L
        if w_major:
            # (W, H, D) output layout: one aligned (H, D) tile-plane store
            # per column (vs the (H, 1, D) single-sublane masked store of
            # the h-major layout — the narrow-access pattern measured ~4.5x
            # slower per sweep, exp_hsweep_layout).
            c_out_ref[jo] = box.astype(c_out_ref.dtype)
            s_out_ref[jo] = s_enc.astype(s_out_ref.dtype)
        else:
            # Reshape while still f32, then convert: Mosaic cannot
            # shape-cast narrow-lane int16 vectors.
            c_out_ref[:, jo:jo + 1, :] = (
                box[:, None, :].astype(c_out_ref.dtype))
            s_out_ref[:, jo:jo + 1, :] = (
                s_enc[:, None, :].astype(s_out_ref.dtype))


def cost_sweep_fused(lp, llo, lhi, rp, rlo, rhi, params, sentinel: int,
                     p1: float, p2: float, s1_dtype=jnp.int16,
                     band_halo: int = 0, edge_flags=None,
                     out_layout: str = "hwd", s1_bias: float = 0.0,
                     keep_pad: bool = False):
    """Fused cost volume + box sum + forward horizontal sweep.

    Inputs are x2-scaled 2D prefiltered images and their BT envelopes
    (H, W) float32. Returns (C int16, S1) on the exact x2 grid — in
    (H, W, D) layout by default, or (W, H, D) with ``out_layout="whd"``
    (aligned per-column stores; the fast path used by sgbm_fused_tpu).
    Only used inside the int16 sentinel envelope (the caller
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

    w_major = out_layout == "whd"
    if w_major:
        out_spec = pl.BlockSpec((_CG, h, dd), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        out_sh = (wp, h, dd)
    else:
        out_spec = pl.BlockSpec((h, _CG, dd), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)
        out_sh = (h, wp, dd)
    kernel = functools.partial(
        _cost_sweep_kernel, nch_r=nch, dd=dd, w=w, min_disp=md,
        radius=radius, sentinel=int(sentinel), p1=float(p1), p2=float(p2),
        band_halo=int(band_halo), w_major=w_major, s1_bias=float(s1_bias),
    )
    args = []
    for img in lpad:
        args.extend([img] * 3)
    for img in rrev:
        args.extend([img] * nch)
    flag_specs = []
    if band_halo:
        flag_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
        args.append(jnp.asarray(edge_flags, jnp.int32))
    C, s1 = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=l_specs + r_specs + flag_specs,
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct(out_sh, jnp.int16),
            jax.ShapeDtypeStruct(out_sh, s1_dtype),
        ),
        scratch_shapes=[pltpu.VMEM((1, h, dd), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*args)
    if wp != w and not keep_pad:
        C, s1 = (C[:w], s1[:w]) if w_major else (C[:, :w], s1[:, :w])
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


def _sweep_v_kernel(*refs, xshifts, p1, p2, g, reverse, int_mode, has_acc,
                    acc_bias, out_bias, has_init, ret_carry, nblocks):
    refs = list(refs)
    c_ref = refs.pop(0)
    acc_ref = refs.pop(0) if has_acc else None
    init_ref = refs.pop(0) if has_init else None
    out_ref = refs.pop(0)
    cout_ref = refs.pop(0) if ret_carry else None
    carry_ref = refs.pop(0)
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        if has_init:
            carry_ref[...] = init_ref[...]
        else:
            carry_ref[...] = jnp.full(carry_ref.shape,
                                      _big(carry_ref.dtype),
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
            total = total + (_to_acc(acc_ref[r], int_mode) + acc_bias)
        out_ref[r] = (total - out_bias).astype(out_ref.dtype)

    if ret_carry:
        @pl.when(i == nblocks - 1)
        def _emit_carry():
            cout_ref[...] = carry_ref[...]


def sweep_v(cost, xshifts, p1, p2, reverse: bool, accum=None, out_dtype=None,
            g: int = 4, acc_bias: float = 0.0, out_bias: float = 0.0,
            init_carry=None, return_carry: bool = False):
    """Vertical sweep (top-down or bottom-up) aggregating up to three
    same-orientation directions (axis-1 shifts), plus the running partial.

    ``acc_bias``/``out_bias`` implement the biased-int16 2-byte encoding of
    _partial_enc_ladder for the accum input / the written output.

    ``init_carry`` (ndirs, W, D) f32 seeds the per-direction L state (used
    by the row-tiled multi-device pipeline, parallel/tiling.py, to continue
    a sweep across tile boundaries exactly); ``return_carry`` also returns
    the final L state for handing to the next tile. Carry I/O requires H
    divisible by g (zero-padded rows would corrupt the outgoing carry)."""
    n0, n1, d = cost.shape
    int_mode = cost.dtype == jnp.int16
    acc_dtype = jnp.float32  # all arithmetic is f32 (see header note)
    if out_dtype is None:
        out_dtype = acc_dtype
    if return_carry or init_carry is not None:
        while n0 % g:
            g //= 2
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

    nd = len(xshifts)
    kernel = functools.partial(
        _sweep_v_kernel, xshifts=tuple(xshifts), p1=p1, p2=p2, g=g,
        reverse=reverse, int_mode=int_mode, has_acc=accum is not None,
        acc_bias=float(acc_bias), out_bias=float(out_bias),
        has_init=init_carry is not None, ret_carry=return_carry,
        nblocks=nblocks,
    )
    spec = pl.BlockSpec((g, n1, d), imap, memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((nd, n1, d), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    in_specs = [spec]
    args = [cost]
    if accum is not None:
        in_specs.append(spec)
        args.append(accum)
    if init_carry is not None:
        in_specs.append(cspec)
        args.append(init_carry.astype(jnp.float32))
    out_specs = spec
    out_shape = jax.ShapeDtypeStruct((n0p, n1, d), out_dtype)
    if return_carry:
        out_specs = (spec, cspec)
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((nd, n1, d), jnp.float32))
    out = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((nd, n1, d), acc_dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*args)
    if return_carry:
        out, carry_out = out
    if n0p != n0:
        out = out[:n0] if not reverse else out[n0p - n0:]
    if return_carry:
        return out, carry_out
    return out


# ---------------------------------------------------------------------------
# WTA post-processing (in-register, column-local) + the fused final sweep.
#
# The final sweep is the right-to-left HORIZONTAL direction, fused with WTA:
# scanning columns in descending x, the total S column is complete as soon
# as the R->L recurrence has run, and the right view's WTA
#
#     bestR(x) = argmin_d S(x + d, d)
#
# falls out of the same scan *incrementally*: column x contributes lane d
# to right-pixel x - d, so a D-slot ring buffer R with R[s] = running min
# for right pixel (x - s) absorbs each column with ONE static lane roll
# (R <- min(roll(R, -1), key_col)) and completes slot 0 (= right pixel x)
# exactly at column x. This replaces the previous final-vertical-sweep
# design whose in-kernel anti-diagonal shear (log2(D) full-volume
# roll+select passes) was ~1/3 of the whole SGBM budget (round-2 profile).
# ---------------------------------------------------------------------------


def _next_pow2(n):
    p = 1
    while p < n:
        p *= 2
    return p


def _wta_cols(s, x_real, packed_ok, min_disp, uniq):
    """WTA + uniqueness + parabolic subpixel on a COLUMN block s (H, g, D)
    of the fully aggregated volume (f32; scale-invariant, so the x2 cost
    grid needs no decode). ``x_real`` is the (1, g, 1) global column index
    (for the left-band validity cut). Mirrors sgbm._wta semantics exactly.
    Returns (disp16, valid, best), all (H, g) int32.
    """
    hh, g, d = s.shape
    sf = s.astype(jnp.float32)
    d_f = jax.lax.broadcasted_iota(jnp.int32, (1, 1, d), 2).astype(jnp.float32)

    # Packed-key argmin: one reduction gives (min value, first-min lane).
    # Exact in f32 only when max_total * next_pow2(D) + D < 2^24; the
    # caller verifies that STATIC bound (sweep_h_wta) and passes
    # ``packed_ok`` — large-block int16 configs (e.g. block_size >= 9 with
    # 8 paths) exceed it and fall back to the compare-based argmin, as
    # does float-cost mode (ADVICE r2).
    mult = _next_pow2(d)
    if packed_ok:
        key = sf * float(mult) + d_f
        bestkey = jnp.min(key, axis=-1, keepdims=True)
        bk = bestkey.astype(jnp.int32)        # (H, g, 1): tiny int ops
        best = bk & (mult - 1)
        min_s = ((bk - best) // mult).astype(jnp.float32)
    else:
        min_s = jnp.min(sf, axis=-1, keepdims=True)
        best = jnp.min(jnp.where(sf == min_s, d_f, float(d)), axis=-1,
                       keepdims=True).astype(jnp.int32)
    best_f = best.astype(jnp.float32)

    valid = jnp.ones((hh, g, 1), jnp.bool_)
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

    # No full-range right support on the left band.
    valid &= (x_real - (best + min_disp)) >= 0
    return (disp16[..., 0], valid[..., 0].astype(jnp.int32), best[..., 0])


def _sweep_h_wta_kernel(c_ref, acc_ref, disp_ref, valid_ref, best_ref,
                        bestr_ref, carry_ref, tot_ref, ring_ref, *,
                        p1, p2, g, int_mode, packed_ok, min_disp, uniq,
                        lr_max_diff, pad_left, nblocks, acc_bias):
    """Final right-to-left horizontal sweep fused with WTA + incremental
    right-view WTA. When this sweep reaches a column, the total S column is
    complete (all other directions' sums arrive via acc_ref), so the
    disparity is produced in-register and S never exists in HBM.

    Ring-buffer invariant (see section comment): after processing column x,
    ring[s] = min over already-seen contributions for right pixel (x - s);
    the per-column update is ring <- min(roll(ring, -1), key_col), right
    pixel x completes at slot 0, which is then reset for its wrap-around
    reuse at column x - D.
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        carry_ref[...] = jnp.full(carry_ref.shape, BIG_F, jnp.float32)
        ring_ref[...] = jnp.full(ring_ref.shape, BIG_F, jnp.float32)

    h, _, d = c_ref.shape
    d_idx = jax.lax.broadcasted_iota(jnp.int32, (1, d), 1)
    d_f = d_idx.astype(jnp.float32)
    lane0 = d_idx == 0
    mult = float(_next_pow2(d))
    blk = nblocks - 1 - i
    if lr_max_diff < 0:
        bestr_ref[...] = jnp.zeros(bestr_ref.shape, jnp.int32)
    for j in range(g - 1, -1, -1):
        c = _to_acc(c_ref[:, j, :], int_mode)
        L = _dir_update(carry_ref[0], c, d_idx, d, p1, p2, BIG_F)
        carry_ref[0] = L
        total = L + (_to_acc(acc_ref[:, j, :], int_mode) + acc_bias)
        tot_ref[:, j, :] = total
        if lr_max_diff >= 0:
            # Deposit this column into the right-view ring buffer and
            # extract the completed right pixel (slot 0). Tie-breaking
            # matches the left WTA: packed keys prefer the smallest d;
            # the compare fallback uses <= because contributions for a
            # given right pixel arrive in DECREASING d order.
            rolled = jnp.roll(ring_ref[0], -1, axis=-1)
            if packed_ok:
                key = total * mult + d_f
                ring = jnp.minimum(rolled, key)
                br = ring[:, 0:1].astype(jnp.int32) & (int(mult) - 1)
            else:
                rolled_arg = jnp.roll(ring_ref[1], -1, axis=-1)
                take = total <= rolled
                ring = jnp.where(take, total, rolled)
                ring_arg = jnp.where(take, d_f, rolled_arg)
                br = ring_arg[:, 0:1].astype(jnp.int32)
                # Reset slot 0 AFTER extraction, for its wrap-around reuse;
                # arg sentinel d = "no contribution seen".
                ring_ref[1] = jnp.where(lane0, float(d), ring_arg)
            ring_ref[0] = jnp.where(lane0, BIG_F, ring)
            bestr_ref[:, j:j + 1] = br

    # WTA in column chunks: the uniqueness/subpixel math holds ~8 live
    # (H, chunk, D) f32 temporaries on the Mosaic vector stack — chunking
    # bounds that footprint (a whole 128-column block OOMs VMEM at
    # KITTI-class shapes).
    ck = 16
    iota_ck = jax.lax.broadcasted_iota(jnp.int32, (1, ck, 1), 1)
    for c0 in range(0, g, ck):
        disp16, valid, best = _wta_cols(
            tot_ref[:, c0:c0 + ck, :],
            blk * g + c0 - pad_left + iota_ck,
            packed_ok, min_disp, uniq)
        disp_ref[:, c0:c0 + ck] = disp16
        valid_ref[:, c0:c0 + ck] = valid
        best_ref[:, c0:c0 + ck] = best


def sweep_h_wta(cost, p1, p2, accum, params, g: int = 128,
                max_total: int | None = None, acc_bias: float = 0.0):
    """Final fused sweep (right-to-left horizontal direction + WTA +
    incremental right-view WTA): returns (disp16 int32 (H, W), valid bool).

    ``accum`` carries the sum of all other directions. ``max_total`` is the
    static upper bound on the fully aggregated S (on the cost volume's
    encoding grid); it gates the packed-key argmin on f32 exactness
    (max_total * next_pow2(D) + D < 2^24). None disables the packed trick.

    g=128 columns per block: the (H, g) disparity outputs need a
    128-divisible lane dimension (Mosaic block rule).
    """
    h, w, d = cost.shape
    int_mode = cost.dtype == jnp.int16
    packed_ok = (max_total is not None
                 and max_total * _next_pow2(d) + d < 2 ** 24)
    wp = -(-w // g) * g
    pad_left = wp - w
    if pad_left:
        padc = jnp.zeros((h, pad_left, d), cost.dtype)
        cost = jnp.concatenate([padc, cost], axis=1)
        pada = jnp.zeros((h, pad_left, d), accum.dtype)
        accum = jnp.concatenate([pada, accum], axis=1)
    nblocks = wp // g
    imap3 = lambda i: (0, nblocks - 1 - i, 0)  # noqa: E731
    imap2 = lambda i: (0, nblocks - 1 - i)  # noqa: E731

    lr_max_diff = int(params.disp12_max_diff)
    kernel = functools.partial(
        _sweep_h_wta_kernel, p1=p1, p2=p2, g=g, int_mode=int_mode,
        packed_ok=packed_ok, min_disp=int(params.min_disparity),
        uniq=float(params.uniqueness_ratio), lr_max_diff=lr_max_diff,
        pad_left=pad_left, nblocks=nblocks, acc_bias=float(acc_bias),
    )
    spec3 = pl.BlockSpec((h, g, d), imap3, memory_space=pltpu.VMEM)
    spec2 = pl.BlockSpec((h, g), imap2, memory_space=pltpu.VMEM)
    n_ring = 1 if packed_ok else 2
    disp16, valid, best, best_r = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[spec3, spec3],
        out_specs=(spec2, spec2, spec2, spec2),
        out_shape=tuple(
            jax.ShapeDtypeStruct((h, wp), jnp.int32) for _ in range(4)),
        scratch_shapes=[
            pltpu.VMEM((1, h, d), jnp.float32),       # R->L carry
            pltpu.VMEM((h, g, d), jnp.float32),       # total S block
            pltpu.VMEM((n_ring, h, d), jnp.float32),  # right-WTA ring
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(cost, accum)
    if lr_max_diff >= 0:
        # dR(x) = bestR[x - best(x)] via the gather-free shift-select
        # kernel (lr_lookup; the take_along_axis it replaced traced at
        # 4.5 ms/frame). Runs on the pad-wide maps (shared coordinates);
        # the left band (x - best < 0) reads junk and is overridden below.
        d_r = lr_lookup(best, best_r, d)
    if pad_left:
        disp16, valid = disp16[:, pad_left:], valid[:, pad_left:]
        best = best[:, pad_left:]
        if lr_max_diff >= 0:
            d_r = d_r[:, pad_left:]
    valid = valid.astype(bool)
    if lr_max_diff >= 0:
        x = jnp.arange(w, dtype=jnp.int32)[None, :]
        ok = (jnp.abs(best - d_r) <= lr_max_diff) | (x - best < 0)
        # best_r = D encodes "no contribution seen" (compare fallback);
        # packed mode can't produce it, and cv2 treats missing right
        # support as unmatched -> invalid, which |best - D| > maxdiff
        # reproduces for every real best.
        valid &= ok
    return disp16, valid


# ---------------------------------------------------------------------------
# Left-right-check lookup: d_r(x) = bestR[x - best(x)], gather-free.
#
# The round-4 implementation was a jnp.take_along_axis on the (H, W) maps,
# annotated "tiny gather — cheaper in XLA than threading it through the ring
# kernel". The first real device trace (round 5) showed that ONE op was
# 4.5 ms/frame — half the whole SGBM budget — at the ~10 ns/element XLA:TPU
# gather rate. Since best(x) < D, the lookup is a D-way SHIFT-SELECT with
# purely static slices: out = select(best == s, window_shifted_by_s) over
# s = 0..D-1, which is ~0.26 VPU ops/element instead of a gather.
# ---------------------------------------------------------------------------


def _lr_lookup_kernel(*refs, d, g, nprev):
    best_ref, out_ref, win_ref = refs[0], refs[-2], refs[-1]
    win_refs = refs[1:-2]
    for k, r in enumerate(win_refs):
        win_ref[:, k * g:(k + 1) * g] = r[...]
    best = best_ref[...]
    base = nprev * g
    dr = jnp.zeros_like(best)
    # Per-iteration REF slice reads (not slices of one loaded value): each
    # window view lives for a single select, so Mosaic's stack allocator
    # reuses one buffer instead of keeping d sliced temporaries live (a
    # value-slicing version stack-OOMed scoped VMEM at 41 MB). The
    # lane-unaligned reads cost a relayout each (0.23 ms/frame total) —
    # but the "fix" of rolling a register-held chunk by one lane per
    # iteration measured WORSE (0.51 ms): d serial data-dependent rolls
    # cannot pipeline, while the independent unaligned reads can.
    for s in range(d):
        dr = jnp.where(best == s, win_ref[:, base - s:base + g - s], dr)
    out_ref[...] = dr


def lr_lookup(best, best_r, d: int, g: int = 128):
    """Row-wise lookup ``d_r[h, x] = best_r[h, x - best[h, x]]`` for
    ``best`` values in [0, d); positions with ``x - best < 0`` return
    unspecified values (every caller overrides them with the explicit
    left-band term). Both maps are (H, Wp) int32 with Wp a multiple of g;
    returns (H, Wp) int32."""
    h, wp = best.shape
    if wp % g:
        raise ValueError(f"width {wp} not a multiple of {g=}")
    nprev = max(1, -(-(d - 1) // g))
    bpad = jnp.zeros((h, nprev * g), best_r.dtype)
    best_r_p = jnp.concatenate([bpad, best_r], axis=1)
    spec = pl.BlockSpec((h, g), lambda i: (0, i), memory_space=pltpu.VMEM)
    win_specs = [
        pl.BlockSpec((h, g), lambda i, k=k: (0, i + k),
                     memory_space=pltpu.VMEM)
        for k in range(nprev + 1)
    ]
    return pl.pallas_call(
        functools.partial(_lr_lookup_kernel, d=d, g=g, nprev=nprev),
        grid=(wp // g,),
        in_specs=[spec] + win_specs,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((h, wp), jnp.int32),
        scratch_shapes=[pltpu.VMEM((h, (nprev + 1) * g), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(best, *([best_r_p] * (nprev + 1)))


def _sweep_hw_wta_kernel(c_ref, acc1_ref, acc2_ref, mins_ref, sm_ref,
                         sp_ref, packed_ref, carry_ref, ring_ref, buf_ref,
                         *, p1, p2, g, int_mode, packed_ok, min_disp, uniq,
                         lr_max_diff, w_lim, nblocks, acc1_bias,
                         acc2_bias, use_dots):
    """W-major final sweep: identical semantics to _sweep_h_wta_kernel but
    over a (W, H, D) volume, so each column access c_ref[j] is one aligned
    (H, D) tile-plane load instead of an (H, 1, D) single-sublane masked
    access (~4.5x faster per sweep at KITTI volume, exp_hsweep_layout).
    Takes TWO accumulator volumes (the fused cost kernel's forward-
    horizontal partial s1 — already W-major — and the vertical trio's sum,
    transposed once in XLA) so sweep_v needs no W-major rewrite; the f32
    adds are integer-exact, so the result is bit-identical to the h-major
    kernel.

    The kernel emits only the per-column WTA REDUCTIONS (min_s, the two
    subpixel neighbor sums, and a packed best|bestR|uniqueness-violated
    word); all remaining algebra is XLA work on (H, W) maps in the
    wrapper. Per-column results are LANE-PACKED: masked into lane j of
    (H, g) scratch buffers and flushed once per block as aligned (H, g)
    stores. This replaces the first W-major attempt's tot-scratch +
    chunked-WTA design (8 ms alone: per-column relayout stores and
    (ck, H, D) re-reads) and the second attempt's full in-kernel WTA
    (7.1 ms: serial lane reduces + (H, 1) column algebra at full
    plane-op cost)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        carry_ref[...] = jnp.full(carry_ref.shape, BIG_F, jnp.float32)
        ring_ref[...] = jnp.full(ring_ref.shape, BIG_F, jnp.float32)

    _, h, d = c_ref.shape
    d_idx = jax.lax.broadcasted_iota(jnp.int32, (1, d), 1)
    d_f = d_idx.astype(jnp.float32)
    lane0 = d_idx == 0
    mult = float(_next_pow2(d))
    lane_g = jax.lax.broadcasted_iota(jnp.int32, (1, g), 1)
    ones_col = jnp.ones((d, 1), jnp.float32)
    blk = nblocks - 1 - i

    # fori_loop, not a python unroll: the 128-wide unrolled body (with one
    # MXU dot per column) made the register allocator spill 116 MB of VMEM.
    # All loop state lives in refs, so the body carries nothing.
    def _column(t, _):
        j = g - 1 - t
        # Right-pad columns (x >= w_lim, uniform-sentinel cost) are
        # recurrence-transparent but must NOT deposit into the right-view
        # ring: a pad column x would contribute to real right pixels
        # x - d, which do not exist in the unpadded image.
        in_pad = blk * g + j >= w_lim
        c = _to_acc(c_ref[j], int_mode)
        L = _dir_update(carry_ref[0], c, d_idx, d, p1, p2, BIG_F)
        carry_ref[0] = L
        total = (L + (_to_acc(acc1_ref[j], int_mode) + acc1_bias)
                 + (_to_acc(acc2_ref[j], int_mode) + acc2_bias))
        if lr_max_diff >= 0:
            # Right-view ring buffer: same invariant as the h-major kernel
            # (see the section comment above _sweep_h_wta_kernel).
            rolled = jnp.roll(ring_ref[0], -1, axis=-1)
            if packed_ok:
                key = jnp.where(in_pad, BIG_F, total * mult + d_f)
                ring = jnp.minimum(rolled, key)
                br = ring[:, 0:1].astype(jnp.int32) & (int(mult) - 1)
            else:
                rolled_arg = jnp.roll(ring_ref[1], -1, axis=-1)
                take = (total <= rolled) & ~in_pad
                ring = jnp.where(take, total, rolled)
                ring_arg = jnp.where(take, d_f, rolled_arg)
                br = ring_arg[:, 0:1].astype(jnp.int32)
                ring_ref[1] = jnp.where(lane0, float(d), ring_arg)
            ring_ref[0] = jnp.where(lane0, BIG_F, ring)
        else:
            br = jnp.zeros((h, 1), jnp.int32)

        # --- per-column WTA reductions ONLY (subpixel/uniqueness/validity
        # algebra runs in XLA on (H, W) maps after the kernel — 128x
        # cheaper per op than in-kernel (H, 1) column math). The two
        # neighbor sums and the uniqueness-violation count are MXU dots
        # (masked S @ ones): one matmul instead of a 7-step serial lane
        # reduce each, off the VPU's critical path. ---
        sf = total
        if packed_ok:
            key = sf * mult + d_f
            bk = jnp.min(key, axis=-1, keepdims=True).astype(jnp.int32)
            best = bk & (int(mult) - 1)
            min_s = ((bk - best) // int(mult)).astype(jnp.float32)
        else:
            min_s = jnp.min(sf, axis=-1, keepdims=True)
            best = jnp.min(jnp.where(sf == min_s, d_f, float(d)), axis=-1,
                           keepdims=True).astype(jnp.int32)
        best_f = best.astype(jnp.float32)

        # s_m/s_p select exactly ONE lane each, so a masked lane-MIN and a
        # masked lane-SUM are value-identical IN EXACT ARITHMETIC — but
        # the MXU dot path (default precision) rounds f32 operands
        # through bf16 passes, flipping the subpixel disp16 by +-1 LSB on
        # ~1% of pixels (measured r5). The VPU lane-reduce engine is
        # exact and timing-equivalent, so it is the default; use_dots
        # remains for measurement.
        m_mask = d_f == jnp.maximum(best_f - 1, 0.0)
        p_mask = d_f == jnp.minimum(best_f + 1, float(d - 1))
        if uniq > 0:
            far = jnp.abs(d_f - best_f) > 1.0
            viol = far & (sf * (100.0 - uniq) < min_s * 100.0)
        if use_dots:
            def lane_dot(x):  # (h, d) @ (d, 1) sum over lanes on the MXU
                return jax.lax.dot_general(
                    x, ones_col, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

            s_m = lane_dot(jnp.where(m_mask, sf, 0.0))
            s_p = lane_dot(jnp.where(p_mask, sf, 0.0))
            if uniq > 0:
                bad = (lane_dot(viol.astype(jnp.float32)) > 0
                       ).astype(jnp.int32)
        else:
            s_m = jnp.min(jnp.where(m_mask, sf, BIG_F), axis=-1,
                          keepdims=True)
            s_p = jnp.min(jnp.where(p_mask, sf, BIG_F), axis=-1,
                          keepdims=True)
            if uniq > 0:
                bad = jnp.any(viol, axis=-1, keepdims=True
                              ).astype(jnp.int32)
        if uniq <= 0:
            bad = jnp.zeros((h, 1), jnp.int32)

        # --- lane-pack the column's reduction results into lane j ---
        sel = lane_g == j
        buf_ref[0] = jnp.where(sel, min_s.astype(jnp.int32), buf_ref[0])
        buf_ref[1] = jnp.where(sel, s_m.astype(jnp.int32), buf_ref[1])
        buf_ref[2] = jnp.where(sel, s_p.astype(jnp.int32), buf_ref[2])
        buf_ref[3] = jnp.where(sel, best | (br << 10) | (bad << 20),
                               buf_ref[3])
        return _

    jax.lax.fori_loop(0, g, _column, 0)
    # Block complete: one aligned (H, g) store per output.
    mins_ref[...] = buf_ref[0]
    sm_ref[...] = buf_ref[1]
    sp_ref[...] = buf_ref[2]
    packed_ref[...] = buf_ref[3]


def sweep_hw_wta(cost, p1, p2, acc1, acc2, params, g: int = 128,
                 max_total: int | None = None, acc1_bias: float = 0.0,
                 acc2_bias: float = 0.0, w_true: int | None = None,
                 use_dots: bool = False):
    """W-major final fused sweep (right-to-left horizontal + WTA +
    incremental right-view WTA) over a (W, H, D) volume; returns
    (disp16 int32 (H, W), valid bool (H, W)) in the standard image layout.

    ``acc1``/``acc2`` are (W, H, D) partial-sum volumes (their f32 sum with
    the in-kernel R->L term is integer-exact, so splitting the accumulator
    changes nothing numerically). ``max_total`` gates the packed-key argmin
    exactly as in sweep_h_wta. g must stay 128: the lane-packed result
    buffers hold one column per lane and flush once per block.

    ``w_true``: inputs may arrive RIGHT-padded to a g multiple with
    uniform-sentinel pad columns (cost_sweep_fused keep_pad mode). Uniform
    columns are fresh-start-transparent to the recurrence, pad columns are
    masked out of the right-view ring in-kernel, and outputs are sliced
    back to w_true — no pad/slice copies of the 120 MB volumes anywhere."""
    wp, h, d = cost.shape
    w = w_true if w_true is not None else wp
    int_mode = cost.dtype == jnp.int16
    packed_ok = (max_total is not None
                 and max_total * _next_pow2(d) + d < 2 ** 24)
    if wp % g:
        raise ValueError(f"padded width {wp} not a multiple of {g=}")
    nblocks = wp // g
    imap3 = lambda i: (nblocks - 1 - i, 0, 0)  # noqa: E731
    imap2 = lambda i: (0, nblocks - 1 - i)  # noqa: E731

    lr_max_diff = int(params.disp12_max_diff)
    kernel = functools.partial(
        _sweep_hw_wta_kernel, p1=p1, p2=p2, g=g, int_mode=int_mode,
        packed_ok=packed_ok, min_disp=int(params.min_disparity),
        uniq=float(params.uniqueness_ratio), lr_max_diff=lr_max_diff,
        w_lim=int(w), nblocks=nblocks, acc1_bias=float(acc1_bias),
        acc2_bias=float(acc2_bias), use_dots=use_dots,
    )
    spec3 = pl.BlockSpec((g, h, d), imap3, memory_space=pltpu.VMEM)
    spec2 = pl.BlockSpec((h, g), imap2, memory_space=pltpu.VMEM)
    min_s, s_m, s_p, packed = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[spec3, spec3, spec3],
        out_specs=(spec2, spec2, spec2, spec2),
        out_shape=tuple(
            jax.ShapeDtypeStruct((h, wp), jnp.int32) for _ in range(4)),
        scratch_shapes=[
            pltpu.VMEM((1, h, d), jnp.float32),       # R->L carry
            pltpu.VMEM((2 if not packed_ok else 1, h, d),
                       jnp.float32),                  # right-WTA ring
            pltpu.VMEM((4, h, g), jnp.int32),         # lane-packed results
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(cost, acc1, acc2)
    best_p = packed & 1023
    if lr_max_diff >= 0:
        # dR(x) = bestR[x - best(x)] via the gather-free shift-select
        # kernel (the take_along_axis it replaced traced at 4.5 ms/frame
        # — half the SGBM budget). Pad-wide: shared coordinates.
        d_r = lr_lookup(best_p, (packed >> 10) & 1023, d)
        if wp != w:
            d_r = d_r[:, :w]
    if wp != w:
        min_s, s_m = min_s[:, :w], s_m[:, :w]
        s_p, packed = s_p[:, :w], packed[:, :w]

    # --- XLA post-pass on (H, W) maps: subpixel, uniqueness, validity ---
    # (mirrors _wta_cols exactly; maps are 128x cheaper than volume ops).
    best = packed & 1023
    bad = packed >> 20
    min_f = min_s.astype(jnp.float32)
    s_mf = s_m.astype(jnp.float32)
    s_pf = s_p.astype(jnp.float32)
    best_f = best.astype(jnp.float32)
    denom = s_mf + s_pf - 2.0 * min_f
    interior = (best > 0) & (best < d - 1) & (denom > 0)
    frac = jnp.where(interior,
                     (s_mf - s_pf) / jnp.maximum(2.0 * denom, 1e-9), 0.0)
    frac = jnp.clip(frac, -0.5, 0.5)
    disp16 = jnp.round((best_f + frac + float(params.min_disparity)) * 16.0
                       ).astype(jnp.int32)
    valid = bad == 0
    # No full-range right support on the left band.
    x = jnp.arange(w, dtype=jnp.int32)[None, :]
    valid &= (x - (best + int(params.min_disparity))) >= 0
    if lr_max_diff >= 0:
        ok = (jnp.abs(best - d_r) <= lr_max_diff) | (x - best < 0)
        valid &= ok
    return disp16, valid


def _partial_enc_ladder(per_dir: int):
    """Storage encoding (dtype, bias) for an n-direction partial sum on the
    x2 int grid: 2-byte whenever the static bound allows. Values are
    non-negative, so a +32768 load-bias extends the 2-byte window to 65535
    (e.g. the default 5-path block-5 config's 4-direction partial) without
    unsigned types, which Mosaic cannot cast to/from f32. Bias arithmetic
    is exact (integers < 2^24); else int32, bias 0."""
    def partial_enc(ndirs):
        t = ndirs * per_dir
        if t <= 32767:
            return jnp.int16, 0.0
        if t <= 65535:
            return jnp.int16, 32768.0
        return jnp.int32, 0.0
    return partial_enc


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
        max_total = params.num_paths * per_dir
        partial_enc = _partial_enc_ladder(per_dir)
    else:
        p1 = float(params.effective_p1)
        p2 = float(params.effective_p2)
        max_total = None

        def partial_enc(ndirs):
            return jnp.float32, 0.0

    # Forward horizontal sweep first; the reverse one is fused with WTA.
    # sweep_h has no store-bias support, so when enc(1) would need the
    # biased-int16 window (per_dir > 32767) store s1 as int32 instead —
    # _finish_from_s1 reads s1 with acc_bias 0 either way (ADVICE r4).
    s1_dt, s1_b = partial_enc(1)
    if s1_b:
        s1_dt = jnp.int32
    s1 = sweep_h(cost, p1, p2, False, out_dtype=s1_dt)
    return _finish_from_s1(cost, s1, params, p1, p2, partial_enc,
                           max_total)


def _finish_from_s1(cost, s1, params, p1, p2, partial_enc,
                    max_total=None):
    """Remaining sweeps after the forward-horizontal partial s1 (which may
    come from sweep_h or from the fused cost kernel). The right-to-left
    horizontal direction always runs LAST, fused with the WTA + the
    incremental right-view check (sweep_h_wta)."""
    if params.num_paths == 5:
        # OpenCV MODE_SGBM-like: up, up-left, up-right accumulate; R->L
        # closes the sum in the fused WTA sweep.
        dt3, b3 = partial_enc(4)
        s3 = sweep_v(cost, (0, 1, -1), p1, p2, False, accum=s1,
                     out_dtype=dt3, out_bias=b3)
    elif params.num_paths == 4:
        dt2, b2 = partial_enc(2)
        s2 = sweep_v(cost, (0,), p1, p2, False, accum=s1,
                     out_dtype=dt2, out_bias=b2)
        dt3, b3 = partial_enc(3)
        s3 = sweep_v(cost, (0,), p1, p2, True, accum=s2,
                     out_dtype=dt3, acc_bias=b2, out_bias=b3)
    else:  # 8 paths: top-down trio, then bottom-up trio.
        dt2, b2 = partial_enc(4)
        s2 = sweep_v(cost, (0, 1, -1), p1, p2, False, accum=s1,
                     out_dtype=dt2, out_bias=b2)
        dt3, b3 = partial_enc(7)
        s3 = sweep_v(cost, (0, 1, -1), p1, p2, True, accum=s2,
                     out_dtype=dt3, acc_bias=b2, out_bias=b3)
    return sweep_h_wta(cost, p1, p2, s3, params, max_total=max_total,
                       acc_bias=b3)


def prep_x2_envelopes(lp, rp):
    """x2-scaled prefiltered images + their BT half-sample envelopes (the
    2D inputs of cost_sweep_fused)."""
    def env(a):
        am = 0.5 * (a + jnp.roll(a, 1, axis=1))
        ap = 0.5 * (a + jnp.roll(a, -1, axis=1))
        return (jnp.minimum(jnp.minimum(am, ap), a),
                jnp.maximum(jnp.maximum(am, ap), a))

    lp2 = lp.astype(jnp.float32) * 2.0
    rp2 = rp.astype(jnp.float32) * 2.0
    llo, lhi = env(lp2)
    rlo, rhi = env(rp2)
    return lp2, llo, lhi, rp2, rlo, rhi


def sgbm_fused_tpu(lp, rp, params, sentinel: int):
    """Full TPU SGBM from x1-scale prefiltered images: fused cost/box/first
    sweep, then the remaining accumulating sweeps + fused WTA.

    ``lp``/``rp`` are the prefiltered (H, W) f32 images; ``sentinel`` is the
    x2-grid invalid-cost sentinel from sgbm.int16_sentinel (must not be
    None). Returns (disp16 int32 (H, W), valid bool (H, W)).

    Layout plan (round 4): the horizontal scans run W-major — the fused
    cost kernel emits (W, H, D) volumes with aligned per-column stores and
    the final fused WTA sweep reads them the same way (~4.5x faster per
    horizontal sweep than the (H, g, D) narrow-access layout,
    exp_hsweep_layout). The vertical trio stays H-major (its (g, W, D) row
    blocks are already aligned); one XLA transpose each way bridges the
    layouts, and the vertical partial feeds the final kernel as a second
    accumulator so s1 itself never needs transposing.
    """
    p1 = float(2 * params.effective_p1)
    p2 = float(2 * params.effective_p2)
    bs = params.block_size
    cost_max = bs * bs * int(sentinel)
    per_dir = cost_max + int(p2)
    max_total = params.num_paths * per_dir
    partial_enc = _partial_enc_ladder(per_dir)
    b1 = partial_enc(1)[1]

    lp2, llo, lhi, rp2, rlo, rhi = prep_x2_envelopes(lp, rp)
    # keep_pad: the (wp, H, D) volumes flow right-padded through every
    # sweep (uniform-sentinel pads are recurrence-transparent; the final
    # kernel masks them from the LR ring and slices its small outputs) —
    # avoiding ~5 full-volume pad/slice copies per frame.
    C_w, s1_w = cost_sweep_fused(lp2, llo, lhi, rp2, rlo, rhi, params,
                                 int(sentinel), p1, p2,
                                 s1_dtype=partial_enc(1)[0],
                                 out_layout="whd", s1_bias=b1,
                                 keep_pad=True)
    C = jnp.swapaxes(C_w, 0, 1)
    # Vertical partial (all non-horizontal directions), H-major.
    if params.num_paths == 5:
        dtv, bv = partial_enc(3)
        sv = sweep_v(C, (0, 1, -1), p1, p2, False, out_dtype=dtv,
                     out_bias=bv)
    elif params.num_paths == 4:
        dt2, b2 = partial_enc(1)
        s2 = sweep_v(C, (0,), p1, p2, False, out_dtype=dt2, out_bias=b2)
        dtv, bv = partial_enc(2)
        sv = sweep_v(C, (0,), p1, p2, True, accum=s2, acc_bias=b2,
                     out_dtype=dtv, out_bias=bv)
    else:  # 8 paths
        dt2, b2 = partial_enc(3)
        s2 = sweep_v(C, (0, 1, -1), p1, p2, False, out_dtype=dt2,
                     out_bias=b2)
        dtv, bv = partial_enc(6)
        sv = sweep_v(C, (0, 1, -1), p1, p2, True, accum=s2, acc_bias=b2,
                     out_dtype=dtv, out_bias=bv)
    sv_w = jnp.swapaxes(sv, 0, 1)
    return sweep_hw_wta(C_w, p1, p2, s1_w, sv_w, params,
                        max_total=max_total, acc1_bias=b1, acc2_bias=bv,
                        w_true=lp.shape[1])
