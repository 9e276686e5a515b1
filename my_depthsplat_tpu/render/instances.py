"""Tile-instance construction for the Pallas rasterizer.

Replaces the CUDA pipeline's duplicate-with-keys + radix-sort + per-tile ranges
(the diff-gaussian-rasterization preprocessing the reference drives from
cuda_splatting.py) with static-shaped XLA ops, laid out around the TPU cost
model measured on v5e (device-profiler numbers, not wall clock):

- gathers/scatters cost ~8-10 ns per INDEX in 32-bit dtypes regardless of row
  width, but 16-bit-dtype gathers run 3-4x faster — so every gather here
  round-trips through an exact f32 <-> 2xu16 bitcast;
- multi-operand sorts cost ~4-5x a single packed-int32-key sort;
- the per-instance "pack" gather and its scatter-add transpose are the
  dominant costs, so the layout avoids every *other* per-lane index gather:
  the kernel consumes the sorted candidate array's live prefix directly
  (per-lane slot ids are an elementwise mask of the sort keys, not a gather).

Pipeline:

1. gaussians are depth-sorted once globally (B*G elements, not B*G*R —
   per-view order is what matters and a tile belongs to exactly one view, so
   a global depth sort gives depth-ascending order within every tile);
2. per-gaussian rect/validity data moves to depth-sorted ("slot") space with
   one u16-packed row gather;
3. every slot spawns up to ``max_tiles_per_gaussian`` candidate (tile, slot)
   instances covering its screen rect (overflow beyond the cap is counted and
   dropped — the CUDA version has dynamic allocation);
4. candidates are sorted ONCE: when ``(n_tiles+1) * B*G`` fits in int31 the
   (tile, slot) pair packs into a single int32 key (slot order = depth order,
   so the packed sort reproduces the CUDA radix sort over composite
   [tile | depth-bits] keys); otherwise a stable single-key sort with the
   slot as payload;
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
from jax import Array

from .camera import ALPHA_MIN, TILE
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
    num_dropped: Array  # () int32 — instances lost to cap/budget


def _to_u16(x: Array) -> Array:
    """(R, N) f32 -> (2R, N) u16, block layout [lo rows | hi rows]. Exact: a
    pure bitcast (little-endian pair per f32). 2-D tables keep the gather on
    the measured fast path (3-D tables with a leading batch dim gather ~3x
    slower), and the block layout means the inverse needs only contiguous
    slices (x[0::2]-style strided slices lower to per-row gathers)."""
    r, n = x.shape
    pairs = jax.lax.bitcast_convert_type(x, jnp.uint16)  # (R, N, 2)
    return pairs.transpose(2, 0, 1).reshape(2 * r, n)


def _from_u16(x: Array) -> Array:
    """(2R, N) u16 [lo rows | hi rows] -> (R, N) f32 (inverse of _to_u16)."""
    r = x.shape[0] // 2
    lo = x[:r].astype(jnp.uint32)
    hi = x[r:].astype(jnp.uint32)
    w = (hi << 16) | lo
    return jax.lax.bitcast_convert_type(w.astype(jnp.int32), jnp.float32)


@jax.custom_vjp
def _permute_rows(rows: Array, order: Array, inv_order: Array):
    """rows (PACKED_ROWS, BG) f32 in gaussian order -> (PACKED_ROWS, BG) f32
    in depth-sorted slot space: rows[:, order], as one u16 gather. The VJP is
    the exact inverse permutation (another u16 gather — XLA's default
    transpose of a gather is a far slower scatter-add)."""
    return _from_u16(_to_u16(rows)[:, order])


def _permute_rows_fwd(rows, order, inv_order):
    return _permute_rows(rows, order, inv_order), (inv_order,)


def _permute_rows_bwd(res, g):
    (inv_order,) = res
    return _from_u16(_to_u16(g)[:, inv_order]), None, None


_permute_rows.defvjp(_permute_rows_fwd, _permute_rows_bwd)


@jax.custom_vjp
def _pack_lanes(rows_slot: Array, slot_idx: Array):
    """rows_slot (PACKED_ROWS, BG) f32 in slot space -> (PACKED_ROWS, L) f32
    per-instance lanes: rows_slot[:, slot_idx] as one u16 gather."""
    return _from_u16(_to_u16(rows_slot)[:, slot_idx])


def _pack_lanes_fwd(rows_slot, slot_idx):
    return _pack_lanes(rows_slot, slot_idx), (slot_idx, rows_slot.shape[1])


def _pack_lanes_bwd(res, g):
    slot_idx, bg_count = res
    # f32 scatter-add per lane is the one unavoidable arithmetic reduction.
    d_slot = jnp.zeros((g.shape[0], bg_count), g.dtype).at[:, slot_idx].add(g)
    return d_slot, None


_pack_lanes.defvjp(_pack_lanes_fwd, _pack_lanes_bwd)


def _rect_quadratic_min(ca, cb, cc, x0, x1, y0, y1):
    """Min of q(x, y) = ca*x^2 + 2*cb*x*y + cc*y^2 over the box
    [x0, x1] x [y0, y1], assuming the conic (ca, cb; cb, cc) is positive
    definite. Elementwise over any broadcastable shapes.

    If the origin is inside the box the min is 0; otherwise it lies on the
    boundary, and on each edge the 1-D quadratic has a closed-form clamped
    minimizer (e.g. on x = xe: y* = clip(-cb*xe/cc, y0, y1))."""
    inside = (x0 <= 0.0) & (x1 >= 0.0) & (y0 <= 0.0) & (y1 >= 0.0)
    ca_s = jnp.where(ca > 0.0, ca, 1.0)
    cc_s = jnp.where(cc > 0.0, cc, 1.0)

    def edge_x(xe):
        ye = jnp.clip(-cb * xe / cc_s, y0, y1)
        return ca * xe * xe + 2.0 * cb * xe * ye + cc * ye * ye

    def edge_y(ye):
        xe = jnp.clip(-cb * ye / ca_s, x0, x1)
        return ca * xe * xe + 2.0 * cb * xe * ye + cc * ye * ye

    q_edge = jnp.minimum(
        jnp.minimum(edge_x(x0), edge_x(x1)),
        jnp.minimum(edge_y(y0), edge_y(y1)),
    )
    return jnp.where(inside, 0.0, q_edge)


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
    grid_x = (w + TILE - 1) // TILE
    grid_y = (h + TILE - 1) // TILE
    n_tiles = grid_x * grid_y
    b, g = sg.depth.shape
    r = max_tiles_per_gaussian
    bg_count = b * g
    n_tiles_total = b * n_tiles

    rect_w = sg.rect_max[..., 0] - sg.rect_min[..., 0]  # (B, G)
    rect_h = sg.rect_max[..., 1] - sg.rect_min[..., 1]
    area = rect_w * rect_h
    num_dropped = jnp.sum(jnp.where(sg.valid, jnp.maximum(area - r, 0), 0))

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

    # ---- 2. rect/validity data to slot space with ONE u16 row gather
    # (fields are small integers; u16 gathers are 3-4x faster than i32).
    # (8, BG)-shaped — rows-major so per-field access is a contiguous slice;
    # a (BG, 8) table reads back through minor-dim-8 slices that pad the
    # 128-lane tile 16x.
    vid = iota // g
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
    rect_s_u16 = rect_u16[:, order]  # (6, BG) in slot space
    rect_s = rect_s_u16.astype(jnp.int32)
    rmin_x_s, rmin_y_s = rect_s[0], rect_s[1]
    rw_s, area_s = rect_s[2], rect_s[3]
    valid_s, vid_s = rect_s[4] > 0, rect_s[5]

    # ---- 2b. per-instance screen rows, permuted once to slot space (exact
    # u16 gather with an exact-gather VJP). Reused by the cull test below and
    # by the lane pack in step 6.
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
    rows_slot = _permute_rows(rows, order, inv_order)

    # ---- 3. expand candidate tiles in depth-sorted slot order, in two
    # tiers. Most gaussians touch <= T1 tiles, so expanding every slot to the
    # full per-gaussian cap R wastes ~R/avg_tiles of the candidate sort (its
    # cost is per element, live or not). Tier 1 expands ALL slots to their
    # first T1 bbox tiles; tier 2 compacts the slots whose bbox area exceeds
    # T1 to a static-size prefix (one cheap BG-length sort) and expands only
    # those to tiles [T1, R). (tile, slot) pairs stay unique across tiers, so
    # one packed sort of the concatenated candidates reproduces the same
    # depth-ordered runs as the flat (BG, R) expansion.
    cull = jax.lax.stop_gradient(rows_slot)
    xs, ys = cull[0], cull[1]
    ca_q, cb_q, cc_q, op_q = cull[2], cull[3], cull[4], cull[5]
    # exact ellipse-tile cull threshold. The compositing kernel gates every
    # contribution on alpha = min(0.99, op*exp(-q/2)) >= ALPHA_MIN, so a
    # candidate whose quadratic form q exceeds 2*ln(op/ALPHA_MIN) over the
    # WHOLE tile rect is an exact zero in both the forward and the backward
    # — dropping it is output-invariant. The min over the continuous rect
    # lower-bounds the min over pixel centers (conservative), and a small
    # slack on the threshold absorbs f32 rounding differences vs the
    # kernel's exp-based test. The CUDA pipeline bins by the circular-radius
    # bbox only; for anisotropic gaussians this cuts most corner tiles.
    pd = (ca_q > 0.0) & (cc_q > 0.0) & (ca_q * cc_q - cb_q * cb_q > 0.0)
    thr = 2.0 * jnp.log(jnp.maximum(op_q, 1e-12) / ALPHA_MIN) + 1e-3

    def expand(j, jmax, slot_ids, rmin_x, rmin_y, rw, area, valid, vid,
               xs_, ys_, ca_, cb_, cc_, pd_, thr_):
        """Candidate tiles j (J, 1) for slots (1, S) with their per-slot
        screen columns (1, S); returns (tile_id, slot) flattened to (J*S,).
        Everything is (J, S)-shaped — minor dim = slots — so the arrays tile
        the 128-lane registers densely ((S, J) with J ~ 4 pads 32x). Culled
        and invalid candidates carry the sentinel tile id."""
        # j // rw and j % rw as comparison sums: j < jmax is tiny, and
        # variable int32 div/rem lowers to a long VPU sequence.
        jdiv = jnp.zeros(jnp.broadcast_shapes(j.shape, rw.shape), jnp.int32)
        for k in range(1, jmax):
            jdiv = jdiv + (j >= k * rw).astype(jnp.int32)
        ty = rmin_y + jdiv
        tx = rmin_x + (j - jdiv * rw)
        ok = (j < area) & valid
        x0 = (tx * TILE).astype(jnp.float32) - xs_
        y0 = (ty * TILE).astype(jnp.float32) - ys_
        qmin = _rect_quadratic_min(
            ca_, cb_, cc_,
            x0, x0 + float(TILE - 1), y0, y0 + float(TILE - 1),
        )
        ok &= jnp.where(pd_, qmin <= thr_, True)
        tid = jnp.where(ok, ty * grid_x + tx + vid * n_tiles, n_tiles_total)
        slot = jnp.broadcast_to(slot_ids, tid.shape)
        return tid.astype(jnp.int32).reshape(-1), slot.reshape(-1)

    t1 = min(4, r)
    all_slots = jnp.arange(bg_count, dtype=jnp.int32)
    j1 = jnp.arange(t1, dtype=jnp.int32)[:, None]
    row = lambda x: x[None, :]
    tile_id_1, slot_1 = expand(
        j1, t1, row(all_slots),
        row(rmin_x_s), row(rmin_y_s), row(rw_s),
        row(area_s), row(valid_s), row(vid_s),
        row(xs), row(ys), row(ca_q), row(cb_q), row(cc_q), row(pd), row(thr),
    )
    tile_parts = [tile_id_1]
    slot_parts = [slot_1]

    # Upper tiers: slots whose bbox exceeds the tier's lower bound are
    # compacted to a static-size prefix (one cheap BG-length sort each) and
    # expanded only over that tier's tile range. Tier widths/caps follow the
    # measured area distribution (typical trained scenes: >90% of gaussians
    # within 4 tiles, ~99% within 9), so the candidate array — whose sort
    # and gather costs are per element, live or not — stays ~30% smaller
    # than a single wide tier. Excess slots past a cap lose that tier's
    # tiles (counted in num_dropped, deepest-first by the stable depth
    # order); big_tile_cap raises the caps for large-splat regimes.
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
    for lo, hi, cap_k in tiers:
        is_small = jnp.where(valid_s & (area_s > lo), 0, 1).astype(jnp.int32)
        _, big_slots_full = jax.lax.sort(
            (is_small, all_slots), num_keys=1, is_stable=True
        )
        n_big = jnp.sum(1 - is_small)
        big_slots = big_slots_full[:cap_k]  # (cap_k,)
        big_live = jnp.arange(cap_k, dtype=jnp.int32) < n_big
        rect_b = rect_s_u16[:, big_slots].astype(jnp.int32)
        # big-slot screen columns with ONE u16 gather (a per-column f32
        # gather costs 3-4x more per index)
        cull_b = _from_u16(_to_u16(cull)[:, big_slots])
        xs_b, ys_b = cull_b[0], cull_b[1]
        ca_b, cb_b, cc_b, op_b = cull_b[2], cull_b[3], cull_b[4], cull_b[5]
        pd_b = (ca_b > 0.0) & (cc_b > 0.0) & (ca_b * cc_b - cb_b * cb_b > 0.0)
        thr_b = 2.0 * jnp.log(jnp.maximum(op_b, 1e-12) / ALPHA_MIN) + 1e-3
        j_k = jnp.arange(lo, hi, dtype=jnp.int32)[:, None]
        tile_id_k, slot_k = expand(
            j_k, hi, row(big_slots),
            row(rect_b[0]), row(rect_b[1]),
            row(jnp.maximum(rect_b[2], 1)),
            row(rect_b[3]), row(big_live), row(rect_b[5]),
            row(xs_b), row(ys_b), row(ca_b), row(cb_b), row(cc_b),
            row(pd_b), row(thr_b),
        )
        tile_parts.append(tile_id_k)
        slot_parts.append(slot_k)
        # capacity overflow: tiles [lo, min(area, hi)) of slots past the cap
        over = jnp.where(
            (1 - is_small) == 1,
            jnp.minimum(area_s, hi) - lo,
            0,
        )
        cum_big = jnp.cumsum(1 - is_small)  # rank of each big slot (1-based)
        num_dropped = num_dropped + jnp.sum(
            jnp.where(cum_big > cap_k, over, 0)
        )
    tile_id_flat = (
        jnp.concatenate(tile_parts) if len(tile_parts) > 1 else tile_parts[0]
    )
    slot_flat = (
        jnp.concatenate(slot_parts) if len(slot_parts) > 1 else slot_parts[0]
    )
    n_cand = tile_id_flat.shape[0]

    # ---- 4. ONE sort by tile groups each tile's instances; within-tile
    # order = slot order = depth order (the CUDA [tile|depth] radix sort).
    # Invalid candidates carry the sentinel tile id and sort to the very end.
    cap = n_cand if instance_budget is None else min(b * instance_budget, n_cand)
    total = cap + chunk  # static layout length (chunk slack for DMA overrun)
    tiles = jnp.arange(n_tiles_total, dtype=jnp.int32)
    slot_bits = max(1, (bg_count - 1).bit_length())
    slot_mask = (1 << slot_bits) - 1
    if (n_tiles_total + 1) << slot_bits <= jnp.iinfo(jnp.int32).max:
        # fast path: pack (tile, slot) into one int32 key — ~4x faster than a
        # two-operand sort on TPU. Slot ids of the live prefix come back out
        # of the keys elementwise (no gather).
        key = (tile_id_flat << slot_bits) | slot_flat
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
        # slow path (only when (tile, slot) cannot pack into int32): the slot
        # must be a real second key — the tiered candidate array is not
        # generation-ordered by slot.
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
    # _permute_rows' exact u16 gather).
    slot_safe = jnp.where(lane_dead, 0, slot_prefix)
    # Dead lanes (sentinel candidates + slack tail) gather arbitrary rows —
    # harmless: no tile's count reaches them, so the kernels mask them and
    # their gradient chunks stay zero.
    packed = _pack_lanes(rows_slot, slot_safe)

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
