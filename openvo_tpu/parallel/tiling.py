"""Spatial tile sharding for SGBM: image rows sharded across a device mesh
with halo exchange (SURVEY.md section 2c "spatial sharding" — the domain's
context-parallelism analog, for 2K-class imagery that exceeds one chip's
comfortable working set).

Decomposition (exact, not an approximation):

 - Each device holds an H/n-row band of the stereo pair. The cost volume
   needs a (block radius + 1)-row halo (1 row for the x-Sobel prefilter +
   radius for the box sum): the neighboring devices' boundary rows travel
   via ``jax.lax.ppermute`` over ICI; global top/bottom edges replicate
   their own border row, reproducing the single-device edge-pad semantics.
 - Horizontal path sweeps and the WTA/uniqueness/subpixel/left-right
   post-processing are row-local: fully parallel across devices.
 - Vertical path sweeps are a scan across rows, so tiles depend on their
   upper (top-down) / lower (bottom-up) neighbor. They run as a
   *device wavefront*: n masked steps in which the per-direction L carry
   (the sweep's boundary row) hops to the next device via ppermute. Total
   sequential work equals ONE whole-image sweep — the vertical recurrence
   is inherently serial — while cost volume, horizontal sweeps and WTA
   scale with the mesh.
 - Speckle filtering is a GLOBAL connected-component pass over the tiny
   (H, W) disparity map (not the (H, W, D) volume), so the tiled path
   ``all_gather``s the per-band disparities over ICI and runs the
   pointer-jump labeling replicated — byte-for-byte the single-device
   filter — then slices its own band of the verdicts.

On TPU the per-tile math runs the SAME fused Pallas kernels as the
single-device path (ops/sgbm_pallas.py): cost_sweep_fused with the banded
edge fix-up, sweep_v with carry in/out for the wavefront handoff, and the
fused sweep_h_wta (all row-local stages need no changes at all). On CPU
meshes (the multi-chip test harness) it falls back to the XLA building
blocks (ops/sgbm.py) with explicit scan carries. Both produce the
single-device result — validated bit-identically in tests/test_tiling.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from openvo_tpu.config import SGBMParams
from openvo_tpu.ops import sgbm as S
from openvo_tpu.ops import sgbm_pallas as SP

ROW_AXIS = "rows"


def make_row_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (ROW_AXIS,))


def _exchange_halo(band, n_dev, halo):
    """Extend a local (H_t, W) band with ``halo`` rows from each vertical
    neighbor (ppermute over ICI); global edges replicate the border row,
    matching the single-device edge-pad."""
    idx = jax.lax.axis_index(ROW_AXIS)
    down = [(i, i + 1) for i in range(n_dev - 1)]   # my bottom rows -> next
    up = [(i + 1, i) for i in range(n_dev - 1)]     # my top rows -> prev
    from_above = jax.lax.ppermute(band[-halo:], ROW_AXIS, down)
    from_below = jax.lax.ppermute(band[:halo], ROW_AXIS, up)
    top_edge = jnp.broadcast_to(band[0:1], (halo,) + band.shape[1:])
    bot_edge = jnp.broadcast_to(band[-1:], (halo,) + band.shape[1:])
    above = jnp.where(idx == 0, top_edge, from_above)
    below = jnp.where(idx == n_dev - 1, bot_edge, from_below)
    return jnp.concatenate([above, band, below], axis=0)


def _vertical_wavefront(C, xshifts, p1, p2, reverse, n_dev):
    """Top-down (or bottom-up) directional sweep across row tiles (XLA
    building blocks): n masked steps; the (ndirs, W, D) L carry hops
    device-to-device via ppermute."""
    idx = jax.lax.axis_index(ROW_AXIS)
    big_carry = tuple(
        jnp.full(C.shape[1:], S.BIG, jnp.float32) for _ in xshifts
    )
    if reverse:
        perm = [(i + 1, i) for i in range(n_dev - 1)]
        order = lambda k: n_dev - 1 - k  # noqa: E731
    else:
        perm = [(i, i + 1) for i in range(n_dev - 1)]
        order = lambda k: k  # noqa: E731

    Sv = jnp.zeros(C.shape, jnp.float32)
    carry = big_carry
    for k in range(n_dev):
        mine = idx == order(k)
        # The first tile in sweep order starts fresh; later tiles use the
        # received carry (only valid on the device whose turn it is).
        init = carry if k > 0 else big_carry
        S_k, carry_out = S._scan_dirs(C, xshifts, p1, p2, reverse,
                                      init=init, return_carry=True)
        Sv = jnp.where(mine, S_k, Sv)
        if k < n_dev - 1:
            carry = tuple(
                jax.lax.ppermute(c, ROW_AXIS, perm) for c in carry_out
            )
    return Sv


def _vertical_wavefront_pallas(C, accum, xshifts, p1, p2, reverse, n_dev,
                               out_dtype, acc_bias, out_bias):
    """Wavefront over the Pallas sweep_v kernels: same n-step carry handoff
    as :func:`_vertical_wavefront`, but each step runs the production
    sweep kernel with explicit carry in/out blocks."""
    idx = jax.lax.axis_index(ROW_AXIS)
    nd = len(xshifts)
    big = jnp.full((nd,) + C.shape[1:], SP.BIG_F, jnp.float32)
    if reverse:
        perm = [(i + 1, i) for i in range(n_dev - 1)]
        order = lambda k: n_dev - 1 - k  # noqa: E731
    else:
        perm = [(i, i + 1) for i in range(n_dev - 1)]
        order = lambda k: k  # noqa: E731

    out = jnp.zeros(C.shape, out_dtype)
    carry = big
    for k in range(n_dev):
        mine = idx == order(k)
        init = carry if k > 0 else big
        S_k, carry_out = SP.sweep_v(
            C, xshifts, p1, p2, reverse, accum=accum, out_dtype=out_dtype,
            acc_bias=acc_bias, out_bias=out_bias,
            init_carry=init, return_carry=True)
        out = jnp.where(mine, S_k, out)
        if k < n_dev - 1:
            carry = jax.lax.ppermute(carry_out, ROW_AXIS, perm)
    return out


def _tiled_core_xla(left_t, right_t, params, n_dev, cap):
    """Per-band (disp16, valid) via the XLA building blocks (CPU meshes)."""
    h_t = left_t.shape[0]
    radius = params.block_size // 2
    halo = radius + 1  # prefilter stencil (1) + block-sum radius
    p1, p2 = float(params.effective_p1), float(params.effective_p2)
    idx = jax.lax.axis_index(ROW_AXIS)
    lx = _exchange_halo(left_t.astype(jnp.float32), n_dev, halo)
    rx = _exchange_halo(right_t.astype(jnp.float32), n_dev, halo)
    lp = S.prefilter_xsobel(lx, cap)
    rp = S.prefilter_xsobel(rx, cap)
    Cc = S.bt_cost_volume(lp, rp, params.min_disparity,
                          params.num_disparities,
                          block_size=params.block_size, cap=cap)
    Cc = Cc.astype(jnp.float32)  # exact; simplifies the edge fix-up
    # The single-device block_sum edge-replicates COST rows at global
    # borders; replicated RAW rows would feed the Sobel a different
    # vertical context, so fix the halo in cost space for the edge
    # devices (interior tiles keep their real neighbor rows).
    top_fix = jnp.broadcast_to(Cc[halo:halo + 1],
                               (radius,) + Cc.shape[1:])
    bot_fix = jnp.broadcast_to(Cc[h_t + halo - 1:h_t + halo],
                               (radius,) + Cc.shape[1:])
    top = jnp.where(idx == 0, top_fix, Cc[halo - radius:halo])
    bot = jnp.where(idx == n_dev - 1, bot_fix,
                    Cc[h_t + halo:h_t + halo + radius])
    core = jnp.concatenate([top, Cc[halo:h_t + halo], bot], axis=0)
    # Vertical box over the (h_t + 2*radius) core rows, then the same
    # horizontal edge-padded box as the single-device block_sum.
    v = core[:h_t]
    for j0 in range(1, 2 * radius + 1):
        v = v + core[j0:j0 + h_t]
    v = jnp.pad(v, ((0, 0), (radius, radius), (0, 0)), mode="edge")
    w_img = left_t.shape[1]
    C = v[:, :w_img]
    for j0 in range(1, 2 * radius + 1):
        C = C + v[:, j0:j0 + w_img]
    if S.int16_sentinel(params.block_size, cap) is not None:
        C = C * 0.5  # decode the x2 int16 grid (sgbm._scan_dirs does
        # this on load for int16 volumes; ours is already f32)

    # Horizontal pair: row-local, fully parallel across tiles.
    costT = jnp.swapaxes(C, 0, 1)
    Sh = (jnp.swapaxes(S._scan_dirs(costT, (0,), p1, p2, False), 0, 1)
          + jnp.swapaxes(S._scan_dirs(costT, (0,), p1, p2, True), 0, 1))

    # Vertical sweeps: device wavefront with carry handoff.
    if params.num_paths == 4:
        Stot = (Sh
                + _vertical_wavefront(C, (0,), p1, p2, False, n_dev)
                + _vertical_wavefront(C, (0,), p1, p2, True, n_dev))
    elif params.num_paths == 5:
        Stot = Sh + _vertical_wavefront(C, (0, 1, -1), p1, p2, False,
                                        n_dev)
    else:
        Stot = (Sh
                + _vertical_wavefront(C, (0, 1, -1), p1, p2, False,
                                      n_dev)
                + _vertical_wavefront(C, (0, 1, -1), p1, p2, True,
                                      n_dev))

    # WTA + uniqueness + subpixel + LR + left band: row-local.
    disp16, valid, best = S._wta(Stot, params)
    if params.disp12_max_diff >= 0:
        valid &= S._lr_check(Stot, best, params)
    x = jnp.arange(C.shape[1])[None, :]
    valid &= (x - (best + params.min_disparity)) >= 0
    return disp16, valid


def _tiled_core_pallas(left_t, right_t, params, n_dev, cap, sentinel):
    """Per-band (disp16, valid) via the production Pallas kernels (TPU):
    banded cost_sweep_fused, sweep_v wavefront with carry I/O, fused
    sweep_h_wta. Row-local stages are unchanged from the single-device
    path; only the vertical sweeps hop carries between devices."""
    h_t = left_t.shape[0]
    radius = params.block_size // 2
    halo = radius + 1
    idx = jax.lax.axis_index(ROW_AXIS)
    p1 = float(2 * params.effective_p1)
    p2 = float(2 * params.effective_p2)
    per_dir = params.block_size ** 2 * int(sentinel) + int(p2)
    max_total = params.num_paths * per_dir
    enc = SP._partial_enc_ladder(per_dir)

    lx = _exchange_halo(left_t.astype(jnp.float32), n_dev, halo)
    rx = _exchange_halo(right_t.astype(jnp.float32), n_dev, halo)
    lp = S.prefilter_xsobel(lx, cap)
    rp = S.prefilter_xsobel(rx, cap)
    edge_flags = jnp.stack([(idx == 0).astype(jnp.int32),
                            (idx == n_dev - 1).astype(jnp.int32)])
    lp2, llo, lhi, rp2, rlo, rhi = SP.prep_x2_envelopes(lp, rp)
    # enc(1) bias must be both APPLIED at the store (s1_bias) and undone at
    # the first wavefront's accum read (acc_bias) — the single-chip path
    # does the same; storing biased-dtype values unbiased wraps int16 for
    # per_dir > 32767 configs (ADVICE r4).
    s1_dt, s1_b = enc(1)
    C_band, s1_band = SP.cost_sweep_fused(
        lp2, llo, lhi, rp2, rlo, rhi, params, int(sentinel), p1, p2,
        s1_dtype=s1_dt, s1_bias=s1_b, band_halo=halo,
        edge_flags=edge_flags)
    C = C_band[halo:halo + h_t]
    s1 = s1_band[halo:halo + h_t]

    if params.num_paths == 5:
        dt3, b3 = enc(4)
        s3 = _vertical_wavefront_pallas(C, s1, (0, 1, -1), p1, p2, False,
                                        n_dev, dt3, s1_b, b3)
    elif params.num_paths == 4:
        dt2, b2 = enc(2)
        s2 = _vertical_wavefront_pallas(C, s1, (0,), p1, p2, False,
                                        n_dev, dt2, s1_b, b2)
        dt3, b3 = enc(3)
        s3 = _vertical_wavefront_pallas(C, s2, (0,), p1, p2, True,
                                        n_dev, dt3, b2, b3)
    else:
        dt2, b2 = enc(4)
        s2 = _vertical_wavefront_pallas(C, s1, (0, 1, -1), p1, p2, False,
                                        n_dev, dt2, s1_b, b2)
        dt3, b3 = enc(7)
        s3 = _vertical_wavefront_pallas(C, s2, (0, 1, -1), p1, p2, True,
                                        n_dev, dt3, b2, b3)
    return SP.sweep_h_wta(C, p1, p2, s3, params, max_total=max_total,
                          acc_bias=b3)


def make_tiled_sgbm_fn(params: SGBMParams, mesh: Mesh):
    """Build a jitted (left (H, W) u8, right (H, W) u8) -> disparity16
    function whose rows are sharded over ``mesh``. H must be a multiple of
    the mesh size. Speckle filtering runs as a replicated global pass over
    the all_gathered (H, W) disparity (see module docstring)."""
    n_dev = mesh.shape[ROW_AXIS]
    cap = max(params.pre_filter_cap, 15) | 1
    sentinel = S.int16_sentinel(params.block_size, cap)
    use_pallas = jax.default_backend() == "tpu" and sentinel is not None

    def local_fn(left_t, right_t):
        h_t = left_t.shape[0]
        if use_pallas:
            disp16, valid = _tiled_core_pallas(left_t, right_t, params,
                                               n_dev, cap, sentinel)
        else:
            disp16, valid = _tiled_core_xla(left_t, right_t, params,
                                            n_dev, cap)
        if params.speckle_window_size > 0 and params.speckle_range > 0:
            # Global connected components over the (H, W) disparity map:
            # gather all bands over ICI, run the pointer-jump labeling
            # replicated (identical on every device), slice our band.
            idx = jax.lax.axis_index(ROW_AXIS)
            d_all = jax.lax.all_gather(disp16, ROW_AXIS, axis=0,
                                       tiled=True)
            v_all = jax.lax.all_gather(valid, ROW_AXIS, axis=0,
                                       tiled=True)
            keep = S._speckle_filter(d_all, v_all, params)
            valid = jax.lax.dynamic_slice_in_dim(keep, idx * h_t, h_t, 0)
        invalid_val = (params.min_disparity - 1) * 16
        return jnp.where(valid, disp16, invalid_val).astype(jnp.int16)

    sharded = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(ROW_AXIS), P(ROW_AXIS)),
        out_specs=P(ROW_AXIS),
        check_rep=False,
    )

    jitted = None

    def _constrained(left, right):
        sh = NamedSharding(mesh, P(ROW_AXIS))
        left = jax.lax.with_sharding_constraint(left, sh)
        right = jax.lax.with_sharding_constraint(right, sh)
        return sharded(left, right)

    def fn(left, right):
        nonlocal jitted
        if left.shape[0] % n_dev != 0:
            raise ValueError(
                f"row-tiled SGBM needs H divisible by the mesh size: "
                f"H={left.shape[0]}, mesh={n_dev} devices")
        if jitted is None:
            jitted = jax.jit(_constrained)
        return jitted(left, right)

    return fn
