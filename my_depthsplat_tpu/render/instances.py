"""Tile-instance construction for the Pallas rasterizer.

Replaces the CUDA pipeline's duplicate-with-keys + radix-sort + per-tile ranges
(the diff-gaussian-rasterization preprocessing the reference drives from
cuda_splatting.py) with static-shaped XLA ops + a Pallas expansion kernel,
laid out around the TPU cost model measured on v5e (device-profiler numbers,
not wall clock):

- gathers/scatters cost ~8-10 ns per INDEX in 32-bit dtypes regardless of row
  width, but 16-bit-dtype gathers run 3-4x faster — so every gather here
  round-trips through an exact f32 <-> 2xu16 bitcast, and gathers sharing an
  index set are COMBINED into one multi-row table gather (per-index cost is
  width-free);
- multi-operand sorts cost ~4-5x a single packed-int32-key sort;
- the per-instance "pack" gather and its scatter-add transpose are the
  dominant costs, so the layout avoids every *other* per-lane index gather:
  the kernel consumes the sorted candidate array's live prefix directly
  (per-lane slot ids are an elementwise mask of the sort keys, not a gather).

Pipeline:

1. gaussians are depth-sorted once globally (B*G elements, not B*G*R —
   per-view order is what matters and a tile belongs to exactly one view, so
   a global depth sort gives depth-ascending order within every tile);
2. per-gaussian rect/validity data AND the 16 packed screen rows move to
   depth-sorted ("slot") space with ONE combined u16-packed 38-row gather;
3. every slot spawns up to ``max_tiles_per_gaussian`` candidate (tile, slot)
   instances covering its screen rect, emitted as packed int32 sort keys by
   the Pallas expansion kernel (expand.py) in depth-sorted slot order, in
   three tiers (overflow beyond each tier cap is counted and dropped — the
   CUDA version has dynamic allocation);
4. candidates are sorted ONCE: when ``(n_tiles+1) * 2^slot_bits`` fits in
   int31 the (tile, slot) pair packs into a single int32 key (slot order =
   depth order, so the packed sort reproduces the CUDA radix sort over
   composite [tile | depth-bits] keys); otherwise a stable single-key sort
   with the slot as payload;
5. the kernel reads each tile's run of the sorted array IN PLACE (truncated
   to a static ``instance_budget`` prefix): runs are contiguous and ascending
   by tile, so the backward kernel's chunk windows overlap only LATER tiles'
   regions, which rewrite them afterwards — races cannot survive because TPU
   grid steps execute sequentially;
6. per-instance screen rows are packed with one u16 gather indexed by the
   prefix slots, wrapped in a custom VJP whose backward is a single f32
   scatter-add to slot space followed by a u16 inverse-permutation gather
   back to gaussian order.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from .camera import ALPHA_MIN, TILE_X, TILE_Y
from .expand import expand_keys, rect_quadratic_min
from .projection import ScreenGaussians

# Packed per-instance rows (f32): x, y, conic_a, conic_b, conic_c, opacity,
# r, g, b. Rows padded to 16 for clean sublane tiling.
PACKED_ROWS = 16
_N_DATA_ROWS = 9


class TileInstances(NamedTuple):
    packed: Array  # (PACKED_ROWS, L) f32
    gaussian_id: Array  # (L,) int32, == num_gaussians for padding lanes
    starts: Array  # (B*n_tiles,) int32 — run starts in the packed array
    counts: Array  # (B*n_tiles,) int32 — live instances per tile
    grid_hw: tuple[int, int]  # (grid_y, grid_x)
    num_dropped: Array  # () f32 — instances lost to cap/budget (f32: the
    # count exceeds int32 in giant-splat regimes)


def _to_u16(x: Array) -> Array:
    """(R, N) f32 -> (2R, N) u16, block layout [lo rows | hi rows]. Exact: a
    pure bitcast (little-endian pair per f32). 2-D tables keep the gather on
    the measured fast path (3-D tables with a leading batch dim gather ~3x
    slower), and the block layout means the inverse needs only contiguous
    slices (x[0::2]-style strided slices lower to per-row gathers)."""
    r, n = x.shape
    pairs = jax.lax.bitcast_convert_type(x, jnp.uint16)  # (R, N, 2)
    return pairs.transpose(2, 0, 1).reshape(2 * r, n)


def _from_u16_pair(lo: Array, hi: Array) -> Array:
    """(R, N) u16 lo rows + (R, N) u16 hi rows -> (R, N) f32 (exact)."""
    w = (hi.astype(jnp.uint32) << 16) | lo.astype(jnp.uint32)
    return jax.lax.bitcast_convert_type(w.astype(jnp.int32), jnp.float32)


def _from_u16(x: Array) -> Array:
    """(2R, N) u16 [lo rows | hi rows] -> (R, N) f32 (inverse of _to_u16)."""
    r = x.shape[0] // 2
    return _from_u16_pair(x[:r], x[r:])


@jax.custom_vjp
def _pack_lanes(rows_slot_u16: Array, rows: Array, slot_idx: Array, inv_order: Array):
    """Per-instance lane pack: rows_slot_u16 (2*PACKED_ROWS, BG) u16 [lo|hi]
    in depth-sorted slot space -> (PACKED_ROWS, L) f32, as one u16 gather.

    ``rows`` (the gaussian-order f32 source of rows_slot_u16) is the gradient
    carrier: packed == rows[:, order][:, slot_idx], so the VJP scatter-adds
    into slot space and applies the exact inverse permutation back to
    gaussian order (both as the measured-fast u16 forms)."""
    del rows, inv_order
    r2 = rows_slot_u16.shape[0] // 2
    g = rows_slot_u16[:, slot_idx]
    return _from_u16_pair(g[:r2], g[r2:])


def _pack_lanes_fwd(rows_slot_u16, rows, slot_idx, inv_order):
    out = _pack_lanes(rows_slot_u16, rows, slot_idx, inv_order)
    return out, (slot_idx, inv_order, rows.shape[1])


def _pack_lanes_bwd(res, g):
    slot_idx, inv_order, bg_count = res
    # f32 scatter-add per lane is the one unavoidable arithmetic reduction
    # (measured per-index-bound at ~12 ns regardless of accumulator size or
    # row count; see scripts/profile_scatter_variants.py).
    d_slot = jnp.zeros((g.shape[0], bg_count), g.dtype).at[:, slot_idx].add(g)
    d_rows = _from_u16(_to_u16(d_slot)[:, inv_order])
    return None, d_rows, None, None


_pack_lanes.defvjp(_pack_lanes_fwd, _pack_lanes_bwd)


def build_tile_instances_batched(
    sg: ScreenGaussians,  # every field has a leading batch dim (B, ...)
    image_shape: tuple[int, int],
    max_tiles_per_gaussian: int = 16,
    chunk: int = 256,
    instance_budget: int | None = None,
    big_tile_cap: int | None = None,
) -> TileInstances:
    """Batched layout in ONE flat (batch x tile) space — a single sort and a
    single gather pass instead of a vmap (which costs ~2x on TPU sorts).

    Returned starts/counts are (B*T,) with GLOBAL offsets into the single
    packed (PACKED_ROWS, L) array; the kernel grid supplies the batch index
    only for output-block and background selection. Runs are contiguous (NOT
    chunk-aligned); the packed array carries a ``chunk``-lane slack tail so
    kernel DMA windows that overrun a run stay in bounds.

    instance_budget caps the layout length per batch element (default: exact
    bound G*R). Typical scenes average ~3-4 tiles per gaussian, so a budget
    of ~8*G nearly halves the layout arrays with no drops; overflow is
    counted in num_dropped.
    """
    h, w = image_shape
    grid_x = (w + TILE_X - 1) // TILE_X
    grid_y = (h + TILE_Y - 1) // TILE_Y
    n_tiles = grid_x * grid_y
    b, g = sg.depth.shape
    r = max_tiles_per_gaussian
    bg_count = b * g
    n_tiles_total = b * n_tiles

    rect_w = sg.rect_max[..., 0] - sg.rect_min[..., 0]  # (B, G)
    rect_h = sg.rect_max[..., 1] - sg.rect_min[..., 1]
    area = rect_w * rect_h
    # f32 accumulator: the int32 sum overflows in giant-splat regimes
    # (5.9M gaussians clipped to a full tile grid exceed 2^31 dropped
    # candidates) and the diagnostic must stay monotone/readable
    num_dropped = jnp.sum(
        jnp.where(sg.valid, jnp.maximum(area - r, 0), 0),
        dtype=jnp.float32,
    )

    # ---- 1. depth-sort gaussians: one single-key sort over B*G elements
    # (NOT B*G*R). `order[slot]` is the original flat index; `inv_order` is
    # its inverse (for the pack VJP's exact permutation transpose). Views
    # need not be separated: each tile belongs to one view, and restricting a
    # globally depth-ascending order to one view's gaussians is still
    # depth-ascending.
    iota = jnp.arange(bg_count, dtype=jnp.int32)
    _, order = jax.lax.sort(
        (sg.depth.reshape(-1), iota), num_keys=1, is_stable=True
    )
    _, inv_order = jax.lax.sort((order, iota), num_keys=1, is_stable=True)

    # ---- 2. ONE combined u16 row gather moves everything to slot space:
    # rect/validity rows (6) + the 16 packed screen rows as u16 pairs (32).
    # Gather cost is per index and width-free, so combining the previously
    # separate rect and row gathers halves the layout's gather bill.
    # (8, BG)-rows-major so per-field access is a contiguous slice.
    vid = jnp.broadcast_to(
        jnp.arange(b, dtype=jnp.int32)[:, None], (b, g)
    ).reshape(-1)  # view id WITHOUT an iota//g divide (measured 0.4 ms)
    area_c = jnp.minimum(area.reshape(-1), r)
    rect_u16 = jnp.stack(
        [
            sg.rect_min[..., 0].reshape(-1),
            sg.rect_min[..., 1].reshape(-1),
            jnp.maximum(rect_w.reshape(-1), 1),
            area_c,
            sg.valid.reshape(-1).astype(jnp.int32),
            vid,
        ],
        axis=0,
    ).astype(jnp.uint16)  # (6, BG)

    rows = jnp.concatenate(
        [
            jnp.stack(
                [
                    sg.xy[..., 0].reshape(-1),
                    sg.xy[..., 1].reshape(-1),
                    sg.conic[..., 0].reshape(-1),
                    sg.conic[..., 1].reshape(-1),
                    sg.conic[..., 2].reshape(-1),
                    sg.opacity.reshape(-1),
                    sg.color[..., 0].reshape(-1),
                    sg.color[..., 1].reshape(-1),
                    sg.color[..., 2].reshape(-1),
                ]
            ),
            jnp.zeros((PACKED_ROWS - _N_DATA_ROWS, bg_count), jnp.float32),
        ]
    )  # (PACKED_ROWS, BG)

    table = jnp.concatenate([rect_u16, _to_u16(rows)], axis=0)  # (38, BG)
    table_s = table[:, order]  # ONE gather to slot space
    rect_s = table_s[:6].astype(jnp.int32)
    rmin_x_s, rmin_y_s = rect_s[0], rect_s[1]
    rw_s, area_s = jnp.maximum(rect_s[2], 1), rect_s[3]
    valid_s, vid_s = rect_s[4] > 0, rect_s[5]
    rows_slot_u16 = table_s[6:]  # (32, BG) u16 [lo 16 | hi 16]
    # screen columns needed by the cull/expansion: x, y, conic, opacity
    cull6 = _from_u16_pair(table_s[6:12], table_s[22:28])  # (6, BG) f32
    # tier sub-table: rect rows + cull u16 pairs, gathered once per tier
    sub_rows = jnp.concatenate(
        [table_s[:6], table_s[6:12], table_s[22:28]], axis=0
    )  # (18, BG) u16

    # ---- 3. expand candidate tiles in depth-sorted slot order, in three
    # tiers. Most gaussians touch <= 4 tiles, so expanding every slot to the
    # full per-gaussian cap R wastes ~R/avg_tiles of the candidate sort (its
    # cost is per element, live or not). Tier 1 expands ALL slots to their
    # first 4 bbox tiles; upper tiers compact the slots whose bbox area
    # exceeds the tier bound to a static-size prefix (one cheap BG-length
    # sort each) and expand only those over the tier's tile range. Tier
    # widths/caps follow the measured area distribution (typical trained
    # scenes: >90% of gaussians within 4 tiles, ~99% within 9). (tile, slot)
    # pairs stay unique across tiers, so one packed sort of the concatenated
    # candidates reproduces the same depth-ordered runs as a flat (BG, R)
    # expansion. Excess slots past a cap lose that tier's tiles (counted in
    # num_dropped, deepest-first by the stable depth order); big_tile_cap
    # raises the caps for large-splat regimes.
    t1 = min(4, r)
    all_slots = jnp.arange(bg_count, dtype=jnp.int32)
    base_cap = (
        min(bg_count, big_tile_cap)
        if big_tile_cap is not None
        else min(bg_count, max(128, bg_count // 8))
    )
    tiers = []
    if r > t1:
        mid = min(9, r)
        tiers.append((t1, mid, base_cap))
        if r > mid:
            tiers.append((mid, r, min(bg_count, max(128, base_cap // 8))))

    slot_bits = max(1, (bg_count - 1).bit_length())
    slot_mask = (1 << slot_bits) - 1
    fast = (n_tiles_total + 1) << slot_bits <= jnp.iinfo(jnp.int32).max
    from . import pallas_raster as _pr  # lazy: shares the INTERPRET switch

    def tier_compact(lo, hi, cap_k):
        is_small = jnp.where(valid_s & (area_s > lo), 0, 1).astype(jnp.int32)
        _, big_slots_full = jax.lax.sort(
            (is_small, all_slots), num_keys=1, is_stable=True
        )
        n_big = jnp.sum(1 - is_small)
        big_slots = big_slots_full[:cap_k]  # (cap_k,)
        big_live = jnp.arange(cap_k, dtype=jnp.int32) < n_big
        sub = sub_rows[:, big_slots]  # ONE u16 gather (18, cap_k)
        valid_row = (sub[4].astype(jnp.int32) * big_live).astype(jnp.uint16)
        rect_b_u16 = jnp.concatenate(
            [sub[:4], valid_row[None], sub[5:6]], axis=0
        )
        cull_b = _from_u16_pair(sub[6:12], sub[12:18])
        # capacity overflow: tiles [lo, min(area, hi)) of slots past the cap
        over = jnp.where(
            (1 - is_small) == 1, jnp.minimum(area_s, hi) - lo, 0
        )
        cum_big = jnp.cumsum(1 - is_small)  # rank of each big slot (1-based)
        dropped_k = jnp.sum(jnp.where(cum_big > cap_k, over, 0))
        return rect_b_u16, cull_b, big_slots, big_live, dropped_k

    if fast:
        # fast path: the Pallas expansion kernel emits packed (tile, slot)
        # int32 keys directly — ~4x faster than a two-operand sort downstream
        # AND no XLA int-op soup upstream. Slot ids of the live prefix come
        # back out of the keys elementwise (no gather).
        # slice the kernel's padding lanes (N padded to 4096 multiples) back
        # to the live slot count so sentinel keys don't inflate the sort
        key_parts = [
            expand_keys(
                table_s[:6], cull6, None, 0, t1,
                grid_x, n_tiles, n_tiles_total, slot_bits, _pr.INTERPRET,
            )[:, :bg_count].reshape(-1)
        ]
        for lo, hi, cap_k in tiers:
            rect_b_u16, cull_b, big_slots, big_live, dropped_k = tier_compact(
                lo, hi, cap_k
            )
            key_parts.append(
                expand_keys(
                    rect_b_u16, cull_b, big_slots, lo, hi,
                    grid_x, n_tiles, n_tiles_total, slot_bits, _pr.INTERPRET,
                )[:, :cap_k].reshape(-1)
            )
            num_dropped = num_dropped + dropped_k
        key = (
            jnp.concatenate(key_parts) if len(key_parts) > 1 else key_parts[0]
        )
        n_cand = key.shape[0]
        cap = (
            n_cand
            if instance_budget is None
            else min(b * instance_budget, n_cand)
        )
        total = cap + chunk  # static layout length (chunk slack for DMA)
        (sorted_key,) = jax.lax.sort((key,), num_keys=1)
        # one searchsorted over T+1 boundaries: end of tile t == start of
        # tile t+1 on packed keys (searchsorted lowers to a ~21-step while
        # loop of tiny ops, so one call beats two).
        bounds = jnp.searchsorted(
            sorted_key,
            jnp.arange(n_tiles_total + 1, dtype=jnp.int32) << slot_bits,
            side="left",
        ).astype(jnp.int32)
        run_starts = bounds[:-1]
        run_ends = bounds[1:]
        key_prefix = jnp.pad(
            sorted_key[:cap], (0, chunk),
            constant_values=jnp.iinfo(jnp.int32).max,
        )
        slot_prefix = key_prefix & slot_mask
        lane_dead = key_prefix >= (n_tiles_total << slot_bits)
    else:
        # slow path (only when (tile, slot) cannot pack into int32): XLA
        # expansion producing (tile, slot) pairs and a stable two-key sort —
        # the tiered candidate array is not generation-ordered by slot.
        def expand(j, jmax, slot_ids, rmin_x, rmin_y, rw, area_, valid,
                   vid_, xs_, ys_, ca_, cb_, cc_, pd_, thr_):
            """Candidate tiles j (J, 1) for slots (1, S) with their per-slot
            screen columns (1, S); returns (tile_id, slot) flattened to
            (J*S,). Everything is (J, S)-shaped — minor dim = slots. Culled
            and invalid candidates carry the sentinel tile id."""
            jdiv = jnp.zeros(
                jnp.broadcast_shapes(j.shape, rw.shape), jnp.int32
            )
            for k in range(1, jmax):
                jdiv = jdiv + (j >= k * rw).astype(jnp.int32)
            ty = rmin_y + jdiv
            tx = rmin_x + (j - jdiv * rw)
            ok = (j < area_) & valid
            x0 = (tx * TILE_X).astype(jnp.float32) - xs_
            y0 = (ty * TILE_Y).astype(jnp.float32) - ys_
            qmin = rect_quadratic_min(
                ca_, cb_, cc_,
                x0, x0 + float(TILE_X - 1), y0, y0 + float(TILE_Y - 1),
            )
            ok &= jnp.where(pd_, qmin <= thr_, True)
            tid = jnp.where(
                ok, ty * grid_x + tx + vid_ * n_tiles, n_tiles_total
            )
            slot = jnp.broadcast_to(slot_ids, tid.shape)
            return tid.astype(jnp.int32).reshape(-1), slot.reshape(-1)

        xs, ys = cull6[0], cull6[1]
        ca_q, cb_q, cc_q, op_q = cull6[2], cull6[3], cull6[4], cull6[5]
        pd = (ca_q > 0.0) & (cc_q > 0.0) & (ca_q * cc_q - cb_q * cb_q > 0.0)
        thr = 2.0 * jnp.log(jnp.maximum(op_q, 1e-12) / ALPHA_MIN) + 1e-3
        row = lambda x: x[None, :]
        j1 = jnp.arange(t1, dtype=jnp.int32)[:, None]
        tile_id_1, slot_1 = expand(
            j1, t1, row(all_slots),
            row(rmin_x_s), row(rmin_y_s), row(rw_s),
            row(area_s), row(valid_s), row(vid_s),
            row(xs), row(ys), row(ca_q), row(cb_q), row(cc_q),
            row(pd), row(thr),
        )
        tile_parts = [tile_id_1]
        slot_parts = [slot_1]
        for lo, hi, cap_k in tiers:
            rect_b_u16, cull_b, big_slots, big_live, dropped_k = tier_compact(
                lo, hi, cap_k
            )
            rect_b = rect_b_u16.astype(jnp.int32)
            xs_b, ys_b = cull_b[0], cull_b[1]
            ca_b, cb_b, cc_b, op_b = cull_b[2], cull_b[3], cull_b[4], cull_b[5]
            pd_b = (
                (ca_b > 0.0) & (cc_b > 0.0) & (ca_b * cc_b - cb_b * cb_b > 0.0)
            )
            thr_b = 2.0 * jnp.log(jnp.maximum(op_b, 1e-12) / ALPHA_MIN) + 1e-3
            j_k = jnp.arange(lo, hi, dtype=jnp.int32)[:, None]
            tile_id_k, slot_k = expand(
                j_k, hi, row(big_slots),
                row(rect_b[0]), row(rect_b[1]), row(jnp.maximum(rect_b[2], 1)),
                row(rect_b[3]), row(rect_b[4] > 0), row(rect_b[5]),
                row(xs_b), row(ys_b), row(ca_b), row(cb_b), row(cc_b),
                row(pd_b), row(thr_b),
            )
            tile_parts.append(tile_id_k)
            slot_parts.append(slot_k)
            num_dropped = num_dropped + dropped_k
        tile_id_flat = (
            jnp.concatenate(tile_parts) if len(tile_parts) > 1 else tile_parts[0]
        )
        slot_flat = (
            jnp.concatenate(slot_parts) if len(slot_parts) > 1 else slot_parts[0]
        )
        n_cand = tile_id_flat.shape[0]
        cap = (
            n_cand
            if instance_budget is None
            else min(b * instance_budget, n_cand)
        )
        total = cap + chunk
        tiles = jnp.arange(n_tiles_total, dtype=jnp.int32)
        sorted_tid, sorted_slot = jax.lax.sort(
            (tile_id_flat, slot_flat), num_keys=2, is_stable=True
        )
        run_starts = jnp.searchsorted(sorted_tid, tiles, side="left").astype(
            jnp.int32
        )
        run_ends = jnp.searchsorted(sorted_tid, tiles, side="right").astype(
            jnp.int32
        )
        slot_prefix = jnp.pad(sorted_slot[:cap], (0, chunk))
        lane_dead = (
            jnp.pad(sorted_tid[:cap], (0, chunk), constant_values=n_tiles_total)
            >= n_tiles_total
        )

    # ---- 5. truncate runs that exceed the budgeted prefix (counted dropped)
    counts = run_ends - run_starts
    avail = jnp.clip(cap - run_starts, 0, None)
    counts_kept = jnp.minimum(counts, avail)
    num_dropped = num_dropped + jnp.sum(counts - counts_kept)
    counts = counts_kept

    # ---- 6. pack per-instance screen rows: one u16 gather per lane with a
    # custom VJP (f32 scatter-add; the permutation back to gaussian order is
    # an exact u16 gather).
    slot_safe = jnp.where(lane_dead, 0, slot_prefix)
    # Dead lanes (sentinel candidates + slack tail) gather arbitrary rows —
    # harmless: no tile's count reaches them, so the kernels mask them and
    # their gradient chunks stay zero.
    packed = _pack_lanes(rows_slot_u16, rows, slot_safe, inv_order)

    # Only consumed by direct callers (tests/debug) — DCE'd in the render
    # path, where the kernel reads `packed` alone.
    gaussian_id = jnp.where(lane_dead, bg_count, order[slot_safe])

    return TileInstances(
        packed=packed,
        gaussian_id=gaussian_id,
        starts=run_starts,  # (B*T,) global offsets, NOT chunk-aligned
        counts=counts,
        grid_hw=(grid_y, grid_x),
        num_dropped=num_dropped,
    )


def grouped_prep(
    sg: ScreenGaussians,  # SINGLE view: fields without a batch dim
    group_slots: int,
    max_tiles_per_gaussian: int,
    gather: bool = True,
):
    """Global phase of the grouped layout: pad, depth-sort, move all rows to
    slot space with the ONE out-of-cache gather. Returns
    (table_s (24, Gp) u16, order (Gp,), gp, n_groups, base num_dropped).

    gather=False skips the slot-space gather and returns the GAUSSIAN-order
    table instead — the depth-sharded renderer (render/sharded.py) gathers
    only its own chips' slot slices, sharding the dominant out-of-cache
    gather's index count across the mesh."""
    g = sg.depth.shape[0]
    r = max_tiles_per_gaussian
    s = group_slots
    n_groups = -(-g // s)
    gp = n_groups * s

    def padg(x, fill=0):
        pad = gp - g
        if pad == 0:
            return x
        return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1),
                       constant_values=fill)

    depth = padg(sg.depth, fill=np.inf)  # padding sorts last, valid=0
    valid = padg(sg.valid)

    rect_w = padg(sg.rect_max[:, 0] - sg.rect_min[:, 0])
    rect_h = padg(sg.rect_max[:, 1] - sg.rect_min[:, 1])
    area = rect_w * rect_h
    num_dropped = jnp.sum(
        jnp.where(valid, jnp.maximum(area - r, 0), 0), dtype=jnp.float32
    )  # f32: int32 overflows in giant-splat regimes

    iota = jnp.arange(gp, dtype=jnp.int32)
    _, order = jax.lax.sort((depth, iota), num_keys=1, is_stable=True)

    area_c = jnp.minimum(area, r)
    rect_u16 = jnp.stack(
        [
            padg(sg.rect_min[:, 0]),
            padg(sg.rect_min[:, 1]),
            jnp.maximum(rect_w, 1),
            area_c,
            valid.astype(jnp.int32),
            jnp.zeros((gp,), jnp.int32),  # vid == 0 (single view)
        ],
        axis=0,
    ).astype(jnp.uint16)
    # only the 9 DATA rows travel through the gathers here (the flat builder
    # carries PACKED_ROWS=16 for sublane alignment; at huge G the 7 zero pad
    # rows would be 37% of the dominant slot-gather's bytes) — the pad rows
    # are re-attached after the per-group pack.
    rows = jnp.stack(
        [
            padg(sg.xy[:, 0]),
            padg(sg.xy[:, 1]),
            padg(sg.conic[:, 0]),
            padg(sg.conic[:, 1]),
            padg(sg.conic[:, 2]),
            padg(sg.opacity),
            padg(sg.color[:, 0]),
            padg(sg.color[:, 1]),
            padg(sg.color[:, 2]),
        ]
    )  # (9, Gp)
    table = jnp.concatenate([rect_u16, _to_u16(rows)], axis=0)  # (24, Gp)
    if not gather:
        return table, order, gp, n_groups, num_dropped
    # the one unavoidable out-of-cache gather: everything moves to globally
    # depth-sorted slot space ONCE; groups are contiguous slices of it
    table_s = table[:, order]
    return table_s, order, gp, n_groups, num_dropped


def grouped_group_layout(
    table_s,  # (24, Gp) u16 in slot space
    start_col,  # dynamic or static column offset (gi * group_slots)
    image_shape: tuple[int, int],
    group_slots: int,
    max_tiles_per_gaussian: int = 16,
    chunk: int = 256,
    budget_g: int | None = None,
    big_tile_cap: int | None = None,
    tier1_tiles: int = 2,
):
    """Layout for ONE depth group (a contiguous slot slice): expansion,
    tiered compaction, packed-key sort, pack gather. ``start_col`` may be a
    traced value — the whole body is shape-static, so the grouped render
    can run it inside a lax.while_loop with early termination. Returns
    (TileInstances, dropped_count, slot_safe)."""
    h, w = image_shape
    grid_x = (w + TILE_X - 1) // TILE_X
    grid_y = (h + TILE_Y - 1) // TILE_Y
    n_tiles = grid_x * grid_y
    r = max_tiles_per_gaussian
    s = group_slots
    slot_bits = max(1, (s - 1).bit_length())
    if (n_tiles + 1) << slot_bits > jnp.iinfo(jnp.int32).max:
        raise ValueError(
            f"group_slots={s} with {n_tiles} tiles does not pack into int32"
        )
    slot_mask = (1 << slot_bits) - 1
    num_dropped = jnp.zeros((), jnp.float32)

    from . import pallas_raster as _pr  # lazy: shares the INTERPRET switch

    t1 = min(tier1_tiles, r)
    sub = jax.lax.dynamic_slice_in_dim(table_s, start_col, s, axis=1)
    rect_g = sub[:6]
    rect_i = rect_g.astype(jnp.int32)
    area_s = rect_i[3]
    valid_s = rect_i[4] > 0
    # u16 layout: rows 6:15 = lo halves of the 9 data rows, 15:24 = hi
    cull6 = _from_u16_pair(sub[6:12], sub[15:21])
    rows_slot_u16 = sub[6:24]  # (18, s) pack table

    key_parts = [
        expand_keys(
            rect_g, cull6, None, 0, t1,
            grid_x, n_tiles, n_tiles, slot_bits, _pr.INTERPRET,
        )[:, :s].reshape(-1)
    ]
    if r > t1:
        mid = min(9, r)
        base_cap = (
            min(s, big_tile_cap) if big_tile_cap is not None
            else min(s, max(128, s // 8))
        )
        tiers = [(t1, mid, base_cap)]
        if r > mid:
            tiers.append((mid, r, min(s, max(128, base_cap // 8))))
        all_slots = jnp.arange(s, dtype=jnp.int32)
        sub_rows = jnp.concatenate(
            [sub[:6], sub[6:12], sub[15:21]], axis=0
        )  # (18, s) u16
        for lo, hi, cap_k in tiers:
            is_small = jnp.where(
                valid_s & (area_s > lo), 0, 1
            ).astype(jnp.int32)
            _, big_full = jax.lax.sort(
                (is_small, all_slots), num_keys=1, is_stable=True
            )
            n_big = jnp.sum(1 - is_small)
            big_slots = big_full[:cap_k]
            big_live = jnp.arange(cap_k, dtype=jnp.int32) < n_big
            subt = sub_rows[:, big_slots]
            valid_row = (
                subt[4].astype(jnp.int32) * big_live
            ).astype(jnp.uint16)
            rect_b_u16 = jnp.concatenate(
                [subt[:4], valid_row[None], subt[5:6]], axis=0
            )
            cull_b = _from_u16_pair(subt[6:12], subt[12:18])
            over = jnp.where(
                (1 - is_small) == 1, jnp.minimum(area_s, hi) - lo, 0
            )
            cum_big = jnp.cumsum(1 - is_small)
            num_dropped = num_dropped + jnp.sum(
                jnp.where(cum_big > cap_k, over, 0)
            )
            key_parts.append(
                expand_keys(
                    rect_b_u16, cull_b, big_slots, lo, hi,
                    grid_x, n_tiles, n_tiles, slot_bits, _pr.INTERPRET,
                )[:, :cap_k].reshape(-1)
            )
    key = (
        jnp.concatenate(key_parts) if len(key_parts) > 1 else key_parts[0]
    )
    n_cand = key.shape[0]
    cap = n_cand if budget_g is None else min(budget_g, n_cand)
    (sorted_key,) = jax.lax.sort((key,), num_keys=1)
    bounds = jnp.searchsorted(
        sorted_key,
        jnp.arange(n_tiles + 1, dtype=jnp.int32) << slot_bits,
        side="left",
    ).astype(jnp.int32)
    run_starts = bounds[:-1]
    run_ends = bounds[1:]
    key_prefix = jnp.pad(
        sorted_key[:cap], (0, chunk),
        constant_values=jnp.iinfo(jnp.int32).max,
    )
    slot_prefix = key_prefix & slot_mask
    lane_dead = key_prefix >= (n_tiles << slot_bits)

    counts = run_ends - run_starts
    avail = jnp.clip(cap - run_starts, 0, None)
    counts_kept = jnp.minimum(counts, avail)
    num_dropped = num_dropped + jnp.sum(counts - counts_kept)

    slot_safe = jnp.where(lane_dead, 0, slot_prefix)
    # plain u16 gather, no VJP here: the grouped render's custom VJP
    # (_render_grouped_bwd) reduces lane gradients to group-slot space
    # manually, with a cache-resident per-group scatter accumulator
    gathered = rows_slot_u16[:, slot_safe]  # (18, L)
    packed = jnp.concatenate(
        [
            _from_u16_pair(
                gathered[:_N_DATA_ROWS], gathered[_N_DATA_ROWS:]
            ),
            jnp.zeros(
                (PACKED_ROWS - _N_DATA_ROWS, gathered.shape[1]),
                jnp.float32,
            ),
        ]
    )
    inst = TileInstances(
        packed=packed,
        gaussian_id=jnp.zeros((0,), jnp.int32),  # debug-only field
        starts=run_starts,
        counts=counts_kept,
        grid_hw=(grid_y, grid_x),
        num_dropped=jnp.zeros((), jnp.int32),
    )
    return inst, num_dropped, slot_safe


def build_tile_instances_grouped(
    sg: ScreenGaussians,  # SINGLE view: fields without a batch dim
    image_shape: tuple[int, int],
    group_slots: int,  # power of two; depth-sorted slots per group
    max_tiles_per_gaussian: int = 16,
    chunk: int = 256,
    instance_budget: int | None = None,
    big_tile_cap: int | None = None,
    tier1_tiles: int = 2,
    with_aux: bool = False,
):
    """Depth-grouped layouts for the huge-G render path.

    At multi-million gaussian counts the single flat layout leaves the
    measured fast regimes twice over: the (tile, slot) key no longer packs
    into int32 (forcing the ~4-5x multi-operand sort), and the pack-gather
    table leaves cache (2^18-slot groups keep it resident: 2.47 vs
    11.27 ns/index measured, scripts/profile_gather_huge.py). This builder
    splits the GLOBALLY depth-sorted slots into contiguous groups of
    ``group_slots``: every group's keys pack into int32, its pack table is
    cache-resident, and because groups partition depth order, compositing
    group 0 then group 1 ... with chained kernel state matches the flat
    composite to float-associativity tolerance (group boundaries re-chunk
    the lane cumprod/scan, so the FP association order differs; measured
    parity ~1e-6 interpreter / 3e-7 TPU, not bit-exact).

    Both the forward (render/pallas_raster.py _render_grouped_impl) and
    the backward's replay use this static-unrolled python loop over groups;
    a lax.while_loop variant with early termination (possible because
    grouped_group_layout takes a dynamic slot-slice offset) was measured
    slower on the headline and rejected (PERF.md round-5).

    Returns (groups, num_dropped) where groups is a list of TileInstances
    with per-group packed arrays and LOCAL starts/counts over the same
    (grid_y, grid_x) tile grid. with_aux=True additionally returns the
    layout internals the grouped BACKWARD needs (render/pallas_raster.py
    _render_grouped_bwd): {"order": global depth permutation (Gp,),
    "slot_safe": per-group lane->group-slot index arrays, "gp": padded G}.
    """
    table_s, order, gp, n_groups, num_dropped = grouped_prep(
        sg, group_slots, max_tiles_per_gaussian
    )
    budget_g = (
        None if instance_budget is None else -(-instance_budget // n_groups)
    )
    groups = []
    aux_slots = []
    for gi in range(n_groups):
        inst, dropped_k, slot_safe = grouped_group_layout(
            table_s, gi * group_slots, image_shape, group_slots,
            max_tiles_per_gaussian, chunk, budget_g, big_tile_cap,
            tier1_tiles,
        )
        num_dropped = num_dropped + dropped_k
        groups.append(inst)
        aux_slots.append(slot_safe)
    if with_aux:
        return groups, num_dropped, {
            "order": order, "slot_safe": aux_slots, "gp": gp,
        }
    return groups, num_dropped

def build_tile_instances(
    sg: ScreenGaussians,
    image_shape: tuple[int, int],
    max_tiles_per_gaussian: int = 16,
    chunk: int = 256,
    instance_budget: int | None = None,
    big_tile_cap: int | None = None,
) -> TileInstances:
    """Single-view layout: the batched builder with B=1 (starts are global ==
    local offsets)."""
    sg_b = jax.tree.map(lambda x: x[None], sg)
    return build_tile_instances_batched(
        sg_b, image_shape, max_tiles_per_gaussian, chunk, instance_budget,
        big_tile_cap,
    )
