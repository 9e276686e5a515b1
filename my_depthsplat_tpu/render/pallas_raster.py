"""Pallas TPU tile rasterizer: depth-sorted alpha compositing + custom VJP.

The fast path replacing the reference's external CUDA rasterizer
(diff-gaussian-rasterization, driven from cuda_splatting.py:98-126):

- forward: one grid step per 16x16 tile; the tile's contiguous run of the
  sorted instance array (built by instances.py) is DMA'd chunk-by-chunk from
  HBM into VMEM and composited front-to-back with the exact CUDA gates
  (power<=0, alpha>=1/255, 0.99 clamp, 1e-4 transmittance early-stop);
  per-pixel color, final transmittance, and last-contributor index are
  written out. Runs are NOT chunk-aligned: DMA windows start at the 128-lane
  aligned floor and leading/trailing lanes belonging to neighboring tiles are
  masked.
- backward: walks the same chunks in reverse, reconstructing per-instance
  transmittance by division from the stored final transmittance (the CUDA
  back-to-front scheme) and producing per-INSTANCE gradients. Because aligned
  windows overlap neighboring runs, gradient writes are read-modify-write;
  grid steps execute sequentially and each chunk adds zero outside its own
  live range, so accumulation is race-free and deterministic.
  Instance->gaussian reduction happens outside via the pack gather's custom
  VJP (a deterministic segment scatter-add).

Kernel I/O is tile-major (gy, gx, 256, 8) so every block satisfies the TPU
(8, 128)-alignment rules; channels are [r, g, b, T_final, n_contrib, pad...].

Note: like the CUDA backward, the 0.99 alpha clamp is ignored in the gradient
(opacity gradients flow as if unclamped).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..geometry import get_fov
from .camera import (
    ALPHA_MAX,
    ALPHA_MIN,
    TILE_X,
    TILE_Y,
    TRANSMITTANCE_EPS,
    scale_invariant_normalization,
)
from .instances import (
    PACKED_ROWS,
    TileInstances,
    build_tile_instances_batched,
)
from .projection import project_gaussians

_ALIGN = 128  # Mosaic lane-slice alignment for HBM DMA windows
# Max gaussians per view-group so the pack-VJP scatter accumulator
# (PACKED_ROWS x rows x 4 B) stays inside the fast-cache regime (~16 MB on
# v5e; measured cliff: 15 ns/index below, 100+ ns above).
_SCATTER_ACC_ROWS_FAST = 262_144
_NPIX = TILE_X * TILE_Y
# Instances per DMA chunk. The kernels' live VMEM working set scales with
# NPIX * CHUNK (the wide per-chunk alpha/scan intermediates), so CHUNK
# shrinks as tile area grows to stay inside the ~16 MB scoped-vmem limit.
# CHUNK must be a MULTIPLE of the 128-lane DMA alignment: windows start at
# the aligned floor and advance by CHUNK, so a non-multiple would break the
# pl.multiple_of claim on every window after the first.
CHUNK = max(_ALIGN, (256 * 256) // _NPIX // _ALIGN * _ALIGN)
_OUTC = 8  # r, g, b, t_final, n_contrib, pad, pad, pad

# Set True (e.g. from tests) to run the kernels in the Pallas interpreter on
# CPU; the compiled path requires a TPU.
INTERPRET = False


def _shift_lanes(x, shift, fill):
    """Shift lanes (axis 1) right by ``shift`` (left if negative), filling the
    vacated lanes with ``fill``. Static slice + concat instead of
    pltpu.roll+where: one fewer VPU op per scan step, and (unlike
    tpu.dynamic_rotate) it lowers for 16-bit dtypes too."""
    pad = jnp.full((x.shape[0], abs(shift)), fill, x.dtype)
    if shift > 0:
        return jnp.concatenate([pad, x[:, :-shift]], axis=1)
    return jnp.concatenate([x[:, -shift:], pad], axis=1)


def _lane_cumsum(x, inclusive=True, reverse=False):
    """Cumulative sum along axis 1 as a log2(n)-step doubling scan of exact
    VPU adds (lax.cumsum/cumprod do not lower in Pallas TPU kernels, and
    a triangular MXU matmul would run at reduced precision)."""
    n = x.shape[1]
    acc = x
    shift = 1
    while shift < n:
        acc = acc + _shift_lanes(acc, shift, 0.0)
        shift *= 2
    if reverse:
        total = jnp.sum(x, axis=1, keepdims=True)
        acc = total - acc + x  # suffix-inclusive
        if not inclusive:
            acc = acc - x
    elif not inclusive:
        acc = acc - x
    return acc


def _lane_cumprod(x, reverse=False):
    """Inclusive cumulative product along axis 1 (same doubling scan with
    multiplies). Direct products replace the exp(cumsum(log(...))) round
    trip — one transcendental-free scan instead of log + scan + exp."""
    n = x.shape[1]
    acc = x
    shift = 1
    while shift < n:
        acc = acc * _shift_lanes(acc, shift if not reverse else -shift, 1.0)
        shift *= 2
    return acc


def _pixel_coords(ty, tx, dtype=jnp.float32):
    p = jax.lax.broadcasted_iota(jnp.int32, (_NPIX, 1), 0)
    row = p // TILE_X
    col = p % TILE_X
    px = (tx * TILE_X + col).astype(dtype)
    py = (ty * TILE_Y + row).astype(dtype)
    return px, py


def _chunk_alpha(data, px, py, lane_mask, cdt=jnp.float32):
    """Shared alpha evaluation for a chunk.

    data: (PACKED_ROWS, CHUNK) packed rows; px/py: (NPIX, 1);
    lane_mask: (1, CHUNK) bool. Returns (a, g_exp, dx, dy, gate).

    cdt: compute dtype for the wide (NPIX, CHUNK) quadratic/exp math. The
    pixel deltas dx/dy are always formed in f32 (positions up to ~1k pixels
    would lose whole pixels in bf16) and only then cast down; bf16 runs the
    VPU-bound math at ~2x rate as an opt-in training precision.
    """
    x = data[0:1, :]
    y = data[1:2, :]
    ca = data[2:3, :].astype(cdt)
    cb = data[3:4, :].astype(cdt)
    cc = data[4:5, :].astype(cdt)
    op = data[5:6, :]
    dx32 = px - x  # (NPIX, CHUNK) exact pixel deltas
    dy32 = py - y
    dx = dx32.astype(cdt)
    dy = dy32.astype(cdt)
    # only the pure-arithmetic quadratic runs at the compute dtype: Mosaic
    # has no bf16 lowering for cmpf/rotate, and exp goes through f32 anyway
    power = (
        -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    ).astype(jnp.float32)
    g_exp = jnp.exp(power)
    alpha = jnp.minimum(ALPHA_MAX, op * g_exp)
    gate = (power <= 0.0) & (alpha >= ALPHA_MIN) & lane_mask
    a = jnp.where(gate, alpha, 0.0)
    return a, g_exp, dx32, dy32


def _fwd_kernel(
    starts_ref,  # (n_tiles,) int32 scalar-prefetch
    counts_ref,  # (n_tiles,) int32 scalar-prefetch
    bg_ref,  # (3,) f32 scalar-prefetch
    packed_ref,  # (PACKED_ROWS, L) in HBM/ANY
    *rest,  # [init_ref (chained)], out_ref, data_vmem, sem
    cdt=jnp.float32,
    chained=False,
    add_bg=True,
):
    # chained=True threads compositing state across multiple kernel launches
    # (the huge-G grouped forward path): init_ref carries the previous
    # groups' [rgb, t_frozen, n_contrib, p_raw] per pixel, and the
    # background is composited only by the final group (add_bg).
    # NOTE: in chained mode the n_contrib channel (out channel 4) is the
    # group-LOCAL 1-based last-contributor position within THIS group's run
    # (it resets per group rather than accumulating), NOT the global
    # contributor index the flat path reports. The grouped backward depends
    # on exactly this local value (its per-group masking is positional
    # within the group's run); for image consumers the channel is
    # diagnostic-only in chained mode.
    if chained:
        init_ref, out_ref, data_vmem, sem = rest
    else:
        out_ref, data_vmem, sem = rest
    bb = pl.program_id(0)
    ty = pl.program_id(1)
    tx = pl.program_id(2)
    tile_idx = (bb * pl.num_programs(1) + ty) * pl.num_programs(2) + tx
    start = starts_ref[tile_idx]
    count = counts_ref[tile_idx]
    # Runs are contiguous in the sorted array (NOT chunk-aligned). Mosaic can
    # only DMA lane slices at 128-multiples, so windows start at the aligned
    # floor and the <=127 leading lanes (previous tiles' instances) plus any
    # trailing overrun (later tiles') are masked out.
    lead = start % _ALIGN
    base = pl.multiple_of(start - lead, _ALIGN)
    # Empty tiles must issue NO windows: their `start` is just an insertion
    # point that can lie beyond the (budget-truncated) packed buffer, so a
    # lead-only window would DMA out of bounds.
    n_chunks = jnp.where(count > 0, pl.cdiv(lead + count, CHUNK), 0)

    px, py = _pixel_coords(ty, tx)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)

    def get_dma(c):
        # chunk c's window into the double buffer slot c % 2
        return pltpu.make_async_copy(
            packed_ref.at[:, pl.ds(pl.multiple_of(base + c * CHUNK, _ALIGN), CHUNK)],
            data_vmem.at[c % 2], sem.at[c % 2],
        )

    @pl.when(n_chunks > 0)
    def _():
        get_dma(jnp.zeros((), jnp.int32)).start()

    def cond(carry):
        # early exit once every pixel's raw product is below the termination
        # threshold (the whole tile is done) — the CUDA analog of all threads
        # setting `done`.
        c, p_raw, *_ = carry
        return (c < n_chunks) & (jnp.max(p_raw) >= TRANSMITTANCE_EPS)

    def body(carry):
        # p_raw: the UNfrozen running product over all alpha-gated lanes —
        # monotone decreasing forever, so the >= eps include test is sticky
        # across chunk boundaries exactly like CUDA's per-pixel `done` flag.
        # t_frozen: transmittance frozen at the last included lane (what the
        # background composites against).
        c, p_raw, t_frozen, rgb, ncon = carry

        # prefetch the next chunk while compositing this one (the blocking
        # start/wait pair serialized ~1 us of DMA latency per chunk)
        @pl.when(c + 1 < n_chunks)
        def _():
            get_dma(c + 1).start()

        get_dma(c).wait()
        data = data_vmem[c % 2]

        pos0 = c * CHUNK + lane - lead  # 0-based index within the run
        lane_mask = (pos0 >= 0) & (pos0 < count)
        a, _, _, _ = _chunk_alpha(data, px, py, lane_mask, cdt)

        om = (1.0 - a).astype(cdt)  # >= 0.01 (a <= 0.99)
        cp = _lane_cumprod(om)  # scan runs at the compute dtype's VPU rate
        # exclusive prefix: shift the inclusive product right one lane (lane
        # 0 continues from the previous chunk's carry). Replaces a per-element
        # divide (p_full / om, ~8 VPU ops each) with a shift — and is exact
        # instead of reconstructing through rounding.
        cp_prev = _shift_lanes(cp, 1, 1.0)
        # carries stay f32: the running product spans many chunks
        p_full = p_raw * cp.astype(jnp.float32)
        p_prev = p_raw * cp_prev.astype(jnp.float32)
        include = p_full >= TRANSMITTANCE_EPS
        weight = jnp.where(include, a * p_prev, 0.0)

        rgb = rgb + jnp.concatenate(
            [
                jnp.sum(weight * data[6 + ch : 7 + ch, :], axis=1, keepdims=True)
                for ch in range(3)
            ],
            axis=1,
        )  # (NPIX, 3) — exact VPU reductions (thin matmuls lose precision)

        # weight > 0 <=> gated AND included (a >= ALPHA_MIN wherever gated,
        # and the exclusive prefix product is strictly positive)
        contributes = weight > 0.0
        pos = (pos0 + 1).astype(jnp.float32)  # 1-based within the run
        ncon = jnp.maximum(
            ncon, jnp.max(jnp.where(contributes, pos, 0.0), axis=1, keepdims=True)
        )

        t_frozen = jnp.min(
            jnp.where(include, p_full, t_frozen), axis=1, keepdims=True
        )
        p_raw = p_full[:, -1:]
        return c + 1, p_raw, t_frozen, rgb, ncon

    if chained:
        st = init_ref[0, 0, 0, :, :]  # (NPIX, OUTC)
        init = (
            jnp.zeros((), jnp.int32),
            st[:, 5:6],  # p_raw (running raw product, sticky termination)
            st[:, 3:4],  # t_frozen
            st[:, 0:3],  # rgb (no background yet)
            jnp.zeros((_NPIX, 1), jnp.float32),  # n_contrib: group-LOCAL
        )
    else:
        init = (
            jnp.zeros((), jnp.int32),
            jnp.ones((_NPIX, 1), jnp.float32),
            jnp.ones((_NPIX, 1), jnp.float32),
            jnp.zeros((_NPIX, 3), jnp.float32),
            jnp.zeros((_NPIX, 1), jnp.float32),
        )
    c_exit, p_raw_fin, transmittance, rgb, ncon = jax.lax.while_loop(
        cond, body, init
    )

    # drain the prefetch issued by the last body before early exit —
    # a dangling DMA would corrupt the next grid step's semaphore counts
    @pl.when((n_chunks > 0) & (c_exit < n_chunks))
    def _():
        get_dma(c_exit).wait()

    if add_bg:
        bg = jnp.stack(
            [bg_ref[bb * 3 + 0], bg_ref[bb * 3 + 1], bg_ref[bb * 3 + 2]]
        )[None, :]
        rgb = rgb + transmittance * bg
    out_ref[0, 0, 0, :, 0:3] = rgb
    out_ref[0, 0, 0, :, 3:4] = transmittance
    out_ref[0, 0, 0, :, 4:5] = ncon
    # channel 5 carries the raw running product so a later chained group can
    # resume the sticky-termination test exactly
    out_ref[0, 0, 0, :, 5:6] = p_raw_fin
    out_ref[0, 0, 0, :, 6:_OUTC] = jnp.zeros((_NPIX, _OUTC - 6), jnp.float32)


def _bwd_kernel(
    starts_ref,
    counts_ref,
    bg_ref,
    packed_ref,  # ANY
    fwd_ref,  # (1, 1, NPIX, OUTC) block — forward outputs (T_final, n_contrib)
    cot_ref,  # (1, 1, NPIX, OUTC) block — output cotangent (g_img in [:3])
    zeros_ref,  # ANY — aliased into dpacked (zero init); not read
    *rest,  # [carry_in_ref], dpacked_ref, [carry_out_ref], scratches...
    cdt=jnp.float32,
    chained=False,
):
    # chained=True runs ONE depth group of the huge-G grouped render's
    # backward: the (ta, g_dot_ra) recurrences that the flat kernel threads
    # across chunks extend across group launches processed in REVERSE depth
    # order. carry_in channels [0]=ta (transmittance after this group's
    # last included lane), [1]=g_dot_ra (cotangent . color behind); the
    # final loop carry is emitted through carry_out to seed the previous
    # (nearer) group. fwd_ref must be the state AFTER this group, whose
    # channel 4 is the group-LOCAL n_contrib (see _fwd_kernel).
    if chained:
        (carry_in_ref, dpacked_ref, carry_out_ref,
         data_vmem, dout_vmem, dprev_vmem, sem_in, sem_out, sem_prev) = rest
    else:
        (dpacked_ref, data_vmem, dout_vmem, dprev_vmem,
         sem_in, sem_out, sem_prev) = rest
    bb = pl.program_id(0)
    ty = pl.program_id(1)
    tx = pl.program_id(2)
    tile_idx = (bb * pl.num_programs(1) + ty) * pl.num_programs(2) + tx
    start = starts_ref[tile_idx]
    count = counts_ref[tile_idx]
    lead = start % _ALIGN
    base = pl.multiple_of(start - lead, _ALIGN)

    px, py = _pixel_coords(ty, tx)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)

    fwd = fwd_ref[0, 0, 0, :, :]  # (NPIX, OUTC)
    g_img = cot_ref[0, 0, 0, :, 0:3]  # (NPIX, 3)
    t_final = fwd[:, 3:4]
    ncon = fwd[:, 4:5]  # float count, 1-based
    bg = jnp.stack(
        [bg_ref[bb * 3 + 0], bg_ref[bb * 3 + 1], bg_ref[bb * 3 + 2]]
    )[None, :]

    if chained:
        # seeds arrive from the NEXT (farther) group's backward — or, for
        # the final group, computed by the caller (t_frozen + bg term)
        ci = carry_in_ref[0, 0, 0, :, :]
        ta0 = ci[:, 0:1]
        g_dot_ra0 = ci[:, 1:2]
    else:
        ta0 = t_final
        # dL/dT_final from the background term seeds the "color behind" carry.
        g_dot_ra0 = jnp.sum(g_img * bg, axis=1, keepdims=True) * t_final

    # Chunks past the tile's last contributor carry zero gradient; the output
    # is zero-initialized via input aliasing, so they can be skipped entirely.
    live = jnp.minimum(
        jnp.max(ncon).astype(jnp.int32), count
    )
    # As in the forward: no windows for empty/quiet tiles (their start can be
    # out of bounds, and a lead-only window would read AND write OOB).
    n_chunks = jnp.where(live > 0, pl.cdiv(lead + live, CHUNK), 0)

    def window_of(c):
        return pl.ds(pl.multiple_of(base + c * CHUNK, _ALIGN), CHUNK)

    def in_dma(rev_c):
        return pltpu.make_async_copy(
            packed_ref.at[:, window_of(n_chunks - 1 - rev_c)],
            data_vmem.at[rev_c % 2],
            sem_in.at[rev_c % 2],
        )

    def out_dma(rev_c):
        return pltpu.make_async_copy(
            dout_vmem.at[rev_c % 2],
            dpacked_ref.at[:, window_of(n_chunks - 1 - rev_c)],
            sem_out.at[rev_c % 2],
        )

    @pl.when(n_chunks > 0)
    def _():
        in_dma(jnp.zeros((), jnp.int32)).start()

    def body(rev_c, carry):
        ta, g_dot_ra = carry  # transmittance after chunk, g . (color behind)
        c = n_chunks - 1 - rev_c
        window = window_of(c)
        # A window's lanes belong exclusively to this tile's run unless it is
        # the run's first chunk (<=127 leading lanes of earlier tiles) or
        # reaches past the run's end (later tiles' lanes). Interior chunks
        # skip the read-modify-write entirely: nothing else ever writes their
        # lanes, and dpacked is zero-initialized via input aliasing.
        interior = (c >= 1) & ((c + 1) * CHUNK <= lead + count)

        # prefetch the next (reverse-order) chunk while computing this one
        @pl.when(rev_c + 1 < n_chunks)
        def _():
            in_dma(rev_c + 1).start()

        # Boundary windows overlap neighboring tiles' runs, so their writes
        # are read-modify-write: start the gradient read-back early and
        # overlap it with the compute below. Grid steps execute sequentially,
        # so RMW accumulation is race-free and each lane's gradient is
        # written only by chunks that add zero outside their own live range.
        copy_prev = pltpu.make_async_copy(
            dpacked_ref.at[:, window], dprev_vmem, sem_prev
        )

        @pl.when(jnp.logical_not(interior))
        def _():
            copy_prev.start()

        in_dma(rev_c).wait()
        data = data_vmem[rev_c % 2]

        pos0 = c * CHUNK + lane - lead  # 0-based index within the run
        lane_mask = (pos0 >= 0) & (pos0 < count)
        a, g_exp, dx, dy = _chunk_alpha(data, px, py, lane_mask, cdt)
        mask = (a > 0.0) & (pos0.astype(jnp.float32) < ncon)
        a = jnp.where(mask, a, 0.0)

        one_minus = jnp.maximum(1.0 - a, 1e-6)
        # t_i (transmittance before instance i) via a forward exclusive
        # prefix product from the chunk-start transmittance: one per-pixel
        # divide (chunk total) instead of a full elementwise divide by the
        # suffix product (exactly the same quantity, fewer VPU ops).
        # The scan runs at the compute dtype's VPU rate; the carries and the
        # gradient assembly below stay f32.
        cp = _lane_cumprod(one_minus.astype(cdt)).astype(jnp.float32)
        ta_before = ta / cp[:, -1:]
        t_i = ta_before * _shift_lanes(cp, 1, 1.0)  # (NPIX, CHUNK)
        w = a * t_i

        gc = (
            g_img[:, 0:1] * data[6:7, :]
            + g_img[:, 1:2] * data[7:8, :]
            + g_img[:, 2:3] * data[8:9, :]
        )  # (NPIX, CHUNK) = g_p . c_i
        contrib = gc * w
        s = _lane_cumsum(contrib, inclusive=True, reverse=True)
        g_dot_r = g_dot_ra + s - contrib  # g_p . (color behind instance i)

        da = jnp.where(mask, t_i * gc - g_dot_r / one_minus, 0.0)
        op = data[5:6, :]
        d_op = jnp.where(mask, g_exp * da, 0.0)
        d_power = jnp.where(mask, op * g_exp * da, 0.0)

        ca = data[2:3, :]
        cb = data[3:4, :]
        cc_ = data[4:5, :]
        d_x = d_power * (ca * dx + cb * dy)
        d_y = d_power * (cc_ * dy + cb * dx)
        d_ca = d_power * (-0.5 * dx * dx)
        d_cb = d_power * (-dx * dy)
        d_cc = d_power * (-0.5 * dy * dy)
        # d_color rows computed directly as exact reductions over pixels

        # the previous iteration's out-copy reuses this slot: drain it first
        @pl.when(rev_c >= 2)
        def _():
            out_dma(rev_c - 2).wait()

        slot = rev_c % 2
        dout_vmem[slot, 0:1, :] = jnp.sum(d_x, axis=0, keepdims=True)
        dout_vmem[slot, 1:2, :] = jnp.sum(d_y, axis=0, keepdims=True)
        dout_vmem[slot, 2:3, :] = jnp.sum(d_ca, axis=0, keepdims=True)
        dout_vmem[slot, 3:4, :] = jnp.sum(d_cb, axis=0, keepdims=True)
        dout_vmem[slot, 4:5, :] = jnp.sum(d_cc, axis=0, keepdims=True)
        dout_vmem[slot, 5:6, :] = jnp.sum(d_op, axis=0, keepdims=True)
        dout_vmem[slot, 6:7, :] = jnp.sum(
            w * g_img[:, 0:1], axis=0, keepdims=True
        )
        dout_vmem[slot, 7:8, :] = jnp.sum(
            w * g_img[:, 1:2], axis=0, keepdims=True
        )
        dout_vmem[slot, 8:9, :] = jnp.sum(
            w * g_img[:, 2:3], axis=0, keepdims=True
        )
        dout_vmem[slot, 9:PACKED_ROWS, :] = jnp.zeros(
            (PACKED_ROWS - 9, CHUNK), jnp.float32
        )

        @pl.when(jnp.logical_not(interior))
        def _():
            copy_prev.wait()
            dout_vmem[slot] = dout_vmem[slot] + dprev_vmem[:, :]

        out_dma(rev_c).start()

        ta_new = ta_before
        g_dot_ra_new = g_dot_ra + s[:, 0:1]
        return ta_new, g_dot_ra_new

    ta_fin, gdr_fin = jax.lax.fori_loop(0, n_chunks, body, (ta0, g_dot_ra0))

    if chained:
        carry_out_ref[0, 0, 0, :, 0:1] = ta_fin
        carry_out_ref[0, 0, 0, :, 1:2] = gdr_fin
        carry_out_ref[0, 0, 0, :, 2:_OUTC] = jnp.zeros(
            (_NPIX, _OUTC - 2), jnp.float32
        )

    # drain the (up to two) out-copies still in flight after the last chunk
    @pl.when(n_chunks >= 2)
    def _():
        out_dma(n_chunks - 2).wait()

    @pl.when(n_chunks >= 1)
    def _():
        out_dma(n_chunks - 1).wait()


def _tile_spec():
    return pl.BlockSpec(
        (1, 1, 1, _NPIX, _OUTC), lambda bb, i, j, s, c, b: (bb, i, j, 0, 0)
    )


def _composite_fwd_impl(packed, starts, counts, background, grid_hw, cdt_name,
                        init=None, add_bg=True):
    """packed (ROWS, L_total); starts/counts (B*T,) with global offsets;
    background (B, 3); grid_hw = (B, gy, gx). ``init`` (same tile-major shape
    as the output) chains compositing state from a previous depth group;
    add_bg=False defers the background to a later group."""
    b, gy, gx = grid_hw
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    args = [packed]
    if init is not None:
        in_specs.append(_tile_spec())
        args.append(init)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b, gy, gx),
        in_specs=in_specs,
        out_specs=_tile_spec(),
        scratch_shapes=[
            pltpu.VMEM((2, PACKED_ROWS, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _fwd_kernel, cdt=jnp.dtype(cdt_name).type,
            chained=init is not None, add_bg=add_bg,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, gy, gx, _NPIX, _OUTC), jnp.float32),
        interpret=INTERPRET,
    )(starts.reshape(-1), counts.reshape(-1), background.reshape(-1), *args)


def _composite_bwd_impl(
    packed, starts, counts, background, grid_hw, fwd_out, cot, cdt_name,
    carry_in=None,
):
    """carry_in (tile-major (B, gy, gx, NPIX, OUTC), channels [ta, g_dot_ra])
    switches on chained mode: returns (d_packed, carry_out) for one depth
    group of the grouped render's reverse walk."""
    b, gy, gx = grid_hw
    chained = carry_in is not None
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        _tile_spec(),
        _tile_spec(),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    args = [packed, fwd_out, cot]
    zeros = jnp.zeros(packed.shape, jnp.float32)
    args.append(zeros)
    if chained:
        in_specs.append(_tile_spec())
        args.append(carry_in)
        out_specs = (pl.BlockSpec(memory_space=pl.ANY), _tile_spec())
        out_shape = (
            jax.ShapeDtypeStruct(packed.shape, jnp.float32),
            jax.ShapeDtypeStruct((b, gy, gx, _NPIX, _OUTC), jnp.float32),
        )
    else:
        out_specs = pl.BlockSpec(memory_space=pl.ANY)
        out_shape = jax.ShapeDtypeStruct(packed.shape, jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b, gy, gx),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((2, PACKED_ROWS, CHUNK), jnp.float32),
            pltpu.VMEM((2, PACKED_ROWS, CHUNK), jnp.float32),
            pltpu.VMEM((PACKED_ROWS, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _bwd_kernel, cdt=jnp.dtype(cdt_name).type, chained=chained
        ),
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=INTERPRET,
        input_output_aliases={6: 0},  # zeros buffer -> d_packed
    )(starts.reshape(-1), counts.reshape(-1), background.reshape(-1),
      *args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def composite_tiles(
    packed, starts, counts, background, grid_hw, compute_dtype="float32"
):
    """Raw tile-major output (B, gy, gx, NPIX, OUTC); grid_hw = (B, gy, gx).

    compute_dtype: "float32" (exact CUDA-gate parity) or "bfloat16" (the wide
    per-chunk quadratic/exp math and prefix scans run in bf16 with f32
    transmittance carries and f32 gradient assembly — an opt-in training
    precision, ~1e-2 image tolerance)."""
    return _composite_fwd_impl(
        packed, starts, counts, background, grid_hw, compute_dtype
    )


def _composite_bwd_real(grid_hw, compute_dtype, res, cot):
    packed, starts, counts, background, fwd_out = res
    d_packed = _composite_bwd_impl(
        packed, starts, counts, background, grid_hw, fwd_out, cot,
        compute_dtype,
    )
    g_img = cot[..., 0:3]
    t_final = fwd_out[..., 3]
    d_bg = jnp.einsum("bghpc,bghp->bc", g_img, t_final)
    zero_i = jnp.zeros_like(starts)
    return d_packed, zero_i, zero_i, d_bg


def _composite_fwd_real(packed, starts, counts, background, grid_hw,
                        compute_dtype):
    out = _composite_fwd_impl(
        packed, starts, counts, background, grid_hw, compute_dtype
    )
    return out, (packed, starts, counts, background, out)


composite_tiles.defvjp(_composite_fwd_real, _composite_bwd_real)


# Huge-G path: above this per-view gaussian count the flat layout leaves
# both measured fast regimes (int32 sort keys + cache-resident pack tables;
# see build_tile_instances_grouped), so the render switches to depth-grouped
# chained compositing. Differentiable: the custom VJP walks groups in
# reverse depth order with carried (ta, g_dot_ra) state, so high-res
# training (e.g. 12-view 512x960 fine-tuning) backpropagates at any
# gaussian count, matching the CUDA reference.
_CHAIN_MIN_G = 1 << 21
# 2^18 slots/group keeps each group's (18, s) u16 pack table at 9.4 MB —
# inside the ~16 MB cache — where the pack gather runs at 2.47 ns/index vs
# 11.27 at 2^19 (18.9 MB, just over): measured r5, scripts/
# profile_gather_huge.py; worth ~143 ms on the 5.9M-gaussian headline.
_CHAIN_GROUP_SLOTS = 1 << 18


def _render_grouped_impl(static, arrays):
    """Per-view, per-depth-group chained compositing.

    The group loop is statically UNROLLED: a lax.while_loop variant (one
    shape-static group body via grouped_group_layout's dynamic slot-slice
    offset, with output-invariant early termination on saturated
    transmittance) was built and measured SLOWER on the headline — 1756 vs
    1726 ms, no compile-time win — because the random/headline scene never
    saturates and the 15.7 MB state carry crosses the loop boundary every
    iteration (PERF.md round-5). The background is composited once after
    all groups — the same rgb += t_frozen * bg the kernel's add_bg
    performs."""
    (image_shape, use_sh, max_tiles, budget, big_cap, cdt, group_slots) = static
    extrinsics, fovs, means, cov, sh, opac, background = arrays
    h, w = image_shape
    b = extrinsics.shape[0]
    gy, gx = (h + TILE_Y - 1) // TILE_Y, (w + TILE_X - 1) // TILE_X

    from .instances import build_tile_instances_grouped

    images = []
    dropped = jnp.zeros((), jnp.float32)
    for i in range(b):
        sg = project_gaussians(
            extrinsics[i], means[i], cov[i], sh[i], opac[i],
            jnp.tan(0.5 * fovs[i, 0]), jnp.tan(0.5 * fovs[i, 1]),
            image_shape, use_sh,
        )
        groups, nd = build_tile_instances_grouped(
            sg, image_shape, group_slots, max_tiles, CHUNK,
            budget, big_cap,
        )
        dropped = dropped + nd
        # state channels: rgb(3), t_frozen, n_contrib, p_raw, pad, pad
        state = jnp.zeros((1, gy, gx, _NPIX, _OUTC), jnp.float32)
        state = state.at[..., 3].set(1.0).at[..., 5].set(1.0)
        bg_i = background[i : i + 1]
        for inst in groups:
            state = _composite_fwd_impl(
                inst.packed, inst.starts, inst.counts, bg_i, (1, gy, gx),
                cdt, init=state, add_bg=False,
            )
        state = state.at[..., 0:3].add(
            state[..., 3:4] * bg_i[0][None, None, None, None, :]
        )
        img = state[..., 0:3].reshape(1, gy, gx, TILE_Y, TILE_X, 3)
        img = img.transpose(0, 1, 3, 2, 4, 5).reshape(
            1, gy * TILE_Y, gx * TILE_X, 3
        )
        images.append(img[:, :h, :w])
    return jnp.concatenate(images, axis=0), dropped


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _render_grouped(static, arrays):
    return _render_grouped_impl(static, arrays)


def _render_grouped_fwd(static, arrays):
    # residuals = the inputs: the backward REPLAYS projection + group build
    # + chained forward (rematerialization) so peak memory stays at one
    # view's layout instead of every view's saved instances
    return _render_grouped_impl(static, arrays), arrays


def _render_grouped_bwd(static, arrays, cot):
    """Reverse-order chained VJP over depth groups.

    The flat backward's per-chunk (ta, g_dot_ra) recurrences extend across
    group boundaries: groups partition the depth order, so walking groups
    farthest-first with the carries threaded through the chained _bwd_kernel
    reproduces the flat gradient (the CUDA backward at any gaussian count,
    cuda_splatting.py:112-123 / the rasterizer's backward kernels). Each
    group's lane gradients reduce into a cache-resident (9, group_slots)
    slot accumulator — the scatter stays in the measured fast regime by
    construction — then one exact u16 permutation gather returns them to
    gaussian order and the projection VJP routes them to
    means/cov/sh/opacity (and extrinsics/fovs). Discrete layout structure
    (depth sort, tile binning, culling) is non-differentiable, exactly like
    the flat path.
    """
    (image_shape, use_sh, max_tiles, budget, big_cap, cdt, group_slots) = static
    extrinsics, fovs, means, cov, sh, opac, background = arrays
    g_image = cot[0]  # (B, H, W, 3); cot[1] (num_dropped) has no gradient
    h, w = image_shape
    b = extrinsics.shape[0]
    gy, gx = (h + TILE_Y - 1) // TILE_Y, (w + TILE_X - 1) // TILE_X
    g_count = means.shape[1]

    from .instances import (
        _N_DATA_ROWS,
        _from_u16,
        _to_u16,
        build_tile_instances_grouped,
    )

    d_extr, d_fovs = [], []
    d_means, d_cov, d_sh, d_opac, d_bg = [], [], [], [], []
    for i in range(b):
        # ONE projection trace per view: jax.vjp's primal (via has_aux)
        # provides both the differentiable outputs and the full
        # ScreenGaussians the layout replay consumes
        def proj_diff(e, fv, m, c, s_, o):
            sgd = project_gaussians(
                e, m, c, s_, o,
                jnp.tan(0.5 * fv[0]), jnp.tan(0.5 * fv[1]),
                image_shape, use_sh,
            )
            return (sgd.xy, sgd.conic, sgd.color, sgd.opacity), sgd

        _, vjp_fn, sg = jax.vjp(
            proj_diff, extrinsics[i], fovs[i], means[i], cov[i], sh[i],
            opac[i], has_aux=True,
        )
        groups, _nd, aux = build_tile_instances_grouped(
            sg, image_shape, group_slots, max_tiles, CHUNK, budget, big_cap,
            with_aux=True,
        )
        # replay the chained forward, saving the state AFTER each group
        # (channel 4 = that group's LOCAL n_contrib — the per-group
        # backward's positional mask)
        state = jnp.zeros((1, gy, gx, _NPIX, _OUTC), jnp.float32)
        state = state.at[..., 3].set(1.0).at[..., 5].set(1.0)
        bg_i = background[i : i + 1]
        states = []
        for inst in groups:
            # add_bg never: the forward composites the background outside
            # the group loop; the backward only consumes t_frozen/ncon/
            # p_raw from these states, none of which add_bg affects
            state = _composite_fwd_impl(
                inst.packed, inst.starts, inst.counts, bg_i, (1, gy, gx),
                cdt, init=state, add_bg=False,
            )
            states.append(state)
        final = states[-1]
        t_final = final[..., 3:4]  # (1, gy, gx, NPIX, 1)

        # image cotangent -> tile-major layout (inverse of the assembly;
        # crop padding gets zero cotangent)
        gpad = jnp.zeros((gy * TILE_Y, gx * TILE_X, 3), jnp.float32)
        gpad = gpad.at[:h, :w].set(g_image[i])
        g_t = gpad.reshape(gy, TILE_Y, gx, TILE_X, 3).transpose(
            0, 2, 1, 3, 4
        ).reshape(1, gy, gx, _NPIX, 3)
        cot_tile = jnp.concatenate(
            [g_t, jnp.zeros((1, gy, gx, _NPIX, _OUTC - 3), jnp.float32)],
            axis=-1,
        )
        d_bg.append(jnp.sum(g_t * t_final, axis=(0, 1, 2, 3)))

        # seeds for the farthest group: ta = frozen final transmittance,
        # g_dot_ra = the background term (composited once, after all groups)
        gdr0 = (
            jnp.sum(
                g_t * bg_i[0][None, None, None, None, :],
                axis=-1, keepdims=True,
            )
            * t_final
        )
        carry = jnp.concatenate(
            [
                t_final, gdr0,
                jnp.zeros((1, gy, gx, _NPIX, _OUTC - 2), jnp.float32),
            ],
            axis=-1,
        )
        d_slot_parts: list = [None] * len(groups)
        for k in reversed(range(len(groups))):
            inst = groups[k]
            d_packed, carry = _composite_bwd_impl(
                inst.packed, inst.starts, inst.counts, bg_i, (1, gy, gx),
                states[k], cot_tile, cdt, carry_in=carry,
            )
            d_slot_parts[k] = (
                jnp.zeros((_N_DATA_ROWS, group_slots), jnp.float32)
                .at[:, aux["slot_safe"][k]]
                .add(d_packed[:_N_DATA_ROWS])
            )
        # groups are contiguous slices of global slot space: concatenate,
        # then ONE exact u16 permutation gather back to gaussian order
        d_slot_all = jnp.concatenate(d_slot_parts, axis=1)  # (9, Gp)
        iota = jnp.arange(aux["gp"], dtype=jnp.int32)
        _, inv_order = jax.lax.sort(
            (aux["order"], iota), num_keys=1, is_stable=True
        )
        d_rows = _from_u16(_to_u16(d_slot_all)[:, inv_order])[:, :g_count]

        de, dfv, dm, dc, ds_, do = vjp_fn(
            (
                jnp.stack([d_rows[0], d_rows[1]], axis=-1),
                jnp.stack([d_rows[2], d_rows[3], d_rows[4]], axis=-1),
                jnp.stack([d_rows[6], d_rows[7], d_rows[8]], axis=-1),
                d_rows[5],
            )
        )
        d_extr.append(de)
        d_fovs.append(dfv)
        d_means.append(dm)
        d_cov.append(dc)
        d_sh.append(ds_)
        d_opac.append(do)

    d_arrays = (
        jnp.stack(d_extr),
        jnp.stack(d_fovs),
        jnp.stack(d_means),
        jnp.stack(d_cov),
        jnp.stack(d_sh),
        jnp.stack(d_opac),
        jnp.stack(d_bg),
    )
    return (d_arrays,)


_render_grouped.defvjp(_render_grouped_fwd, _render_grouped_bwd)


def render_pallas(
    extrinsics: Array,
    intrinsics: Array,
    near: Array,
    far: Array,
    image_shape: tuple[int, int],
    background_color: Array,
    gaussian_means: Array,
    gaussian_covariances: Array,
    gaussian_sh_coefficients: Array,
    gaussian_opacities: Array,
    scale_invariant: bool = True,
    use_sh: bool = True,
    max_tiles_per_gaussian: int = 16,
    instance_budget: int | None = None,
    big_tile_cap: int | None = None,
    return_aux: bool = False,
    composite_dtype: str = "float32",
) -> Array:
    """Batched Pallas render, drop-in for render_oracle.

    The whole batch renders in ONE kernel launch: projection and instance
    binning are vmapped over the batch and the kernel grid gains a leading
    batch dimension — no per-view python loop, O(1) compile cost in batch.

    return_aux=True additionally returns {"num_dropped": int32 scalar} — the
    tile instances lost to the per-gaussian cap / big-slot cap / instance
    budget. The reference's CUDA rasterizer allocates dynamically and never
    drops, so a nonzero count is the signal to raise the budget.
    """
    if scale_invariant:
        extrinsics, near, far, gaussian_means, gaussian_covariances = (
            scale_invariant_normalization(
                extrinsics, near, far, gaussian_means, gaussian_covariances
            )
        )

    h, w = image_shape
    fovs = get_fov(intrinsics)  # (B, 2)

    # Huge-G grouped path: only when the group keys still pack into int32
    # at this tile grid (huge images shrink the available slot bits; below
    # 2^14 slots per group the grouping overhead wins and the flat path —
    # slower but correct at any size — takes over).
    _gy = (h + TILE_Y - 1) // TILE_Y
    _gx = (w + TILE_X - 1) // TILE_X
    _bits_avail = int(jnp.iinfo(jnp.int32).max // (_gy * _gx + 1)).bit_length() - 1
    if gaussian_means.shape[1] >= _CHAIN_MIN_G and _bits_avail >= 14:
        group_slots = min(_CHAIN_GROUP_SLOTS, 1 << _bits_avail)
        static = (
            image_shape, use_sh, max_tiles_per_gaussian, instance_budget,
            big_tile_cap, composite_dtype, group_slots,
        )
        image, dropped = _render_grouped(
            static,
            # intrinsics only matter through fovs (computed above), so
            # they stay OUTSIDE the custom-VJP boundary: intrinsics
            # gradients flow through get_fov's chain rule via d_fovs
            (
                extrinsics, fovs, gaussian_means,
                gaussian_covariances, gaussian_sh_coefficients,
                gaussian_opacities, background_color,
            ),
        )
        if return_aux:
            return image, {"num_dropped": dropped}
        return image

    def proj_one(e, k, fov, m, c, s, o):
        return project_gaussians(
            e, m, c, s, o,
            jnp.tan(0.5 * fov[0]), jnp.tan(0.5 * fov[1]),
            image_shape, use_sh,
        )

    sg = jax.vmap(proj_one)(
        extrinsics, intrinsics, fovs,
        gaussian_means, gaussian_covariances,
        gaussian_sh_coefficients, gaussian_opacities,
    )
    b = extrinsics.shape[0]
    g = gaussian_means.shape[1]

    # Group views so each group's scatter-add accumulator (the pack VJP's
    # (PACKED_ROWS, group*G) f32 table) stays <= ~16 MB: the measured v5e
    # scatter rate degrades ~7x (15 -> 100+ ns/index) once the accumulator
    # crosses that cache boundary. Groups are processed in a static python
    # loop (a batched/vmapped scatter hits the slow path regardless of size).
    group = max(1, min(b, _SCATTER_ACC_ROWS_FAST // max(g, 1)))
    if b % group != 0:
        group = 1
    if group == b:
        inst = build_tile_instances_batched(
            sg, image_shape, max_tiles_per_gaussian, CHUNK, instance_budget,
            big_tile_cap,
        )
    else:
        packed, gid, starts, counts = [], [], [], []
        dropped = jnp.zeros((), jnp.float32)
        offset = 0
        for v0 in range(0, b, group):
            sg_g = jax.tree.map(lambda x: x[v0 : v0 + group], sg)
            part = build_tile_instances_batched(
                sg_g, image_shape, max_tiles_per_gaussian, CHUNK,
                instance_budget, big_tile_cap,
            )
            packed.append(part.packed)
            gid.append(part.gaussian_id)
            starts.append(part.starts + offset)
            counts.append(part.counts)
            dropped = dropped + part.num_dropped
            offset += part.packed.shape[1]
        inst = TileInstances(
            packed=jnp.concatenate(packed, axis=1),
            gaussian_id=jnp.concatenate(gid),
            starts=jnp.concatenate(starts),
            counts=jnp.concatenate(counts),
            grid_hw=part.grid_hw,
            num_dropped=dropped,
        )
    gy, gx = (h + TILE_Y - 1) // TILE_Y, (w + TILE_X - 1) // TILE_X
    raw = composite_tiles(
        inst.packed, inst.starts, inst.counts, background_color, (b, gy, gx),
        composite_dtype,
    )
    image = raw[..., 0:3].reshape(b, gy, gx, TILE_Y, TILE_X, 3)
    image = image.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, gy * TILE_Y, gx * TILE_X, 3
    )
    image = image[:, :h, :w]
    if return_aux:
        return image, {"num_dropped": inst.num_dropped}
    return image
