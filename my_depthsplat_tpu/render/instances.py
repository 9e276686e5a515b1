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

from .camera import TILE
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
    """(R, N) f32 -> (2R, N) u16, rows interleaved [lo0, hi0, lo1, hi1, ...].
    Exact: a pure bitcast (little-endian pair per f32)."""
    r, n = x.shape
    pairs = jax.lax.bitcast_convert_type(x, jnp.uint16)  # (R, N, 2)
    return pairs.transpose(0, 2, 1).reshape(2 * r, n)


def _from_u16(x: Array) -> Array:
    """(2R, N) u16 -> (R, N) f32 (inverse of _to_u16)."""
    lo = x[0::2].astype(jnp.uint32)
    hi = x[1::2].astype(jnp.uint32)
    w = (hi << 16) | lo
    return jax.lax.bitcast_convert_type(w.astype(jnp.int32), jnp.float32)


@jax.custom_vjp
def _pack_rows(rows: Array, slot_idx: Array, order: Array, inv_order: Array):
    """rows (PACKED_ROWS, BG) f32 in gaussian order -> (PACKED_ROWS, L) f32
    at depth-sorted slots ``slot_idx``: rows[:, order[slot_idx]], computed as
    two 16-bit gathers (permute to slot space, then pack lanes)."""
    rows_u16 = _to_u16(rows)  # (2R, BG)
    slot_u16 = rows_u16[:, order]  # (2R, BG) permute to slot space
    return _from_u16(slot_u16[:, slot_idx])  # (R, L)


def _pack_rows_fwd(rows, slot_idx, order, inv_order):
    return _pack_rows(rows, slot_idx, order, inv_order), (
        slot_idx,
        inv_order,
        rows.shape[1],
    )


def _pack_rows_bwd(res, g):
    slot_idx, inv_order, bg_count = res
    # f32 scatter-add per lane is the one unavoidable arithmetic reduction;
    # the permutation back to gaussian order is an exact u16 gather.
    d_slot = jnp.zeros((g.shape[0], bg_count), g.dtype).at[:, slot_idx].add(g)
    d_rows = _from_u16(_to_u16(d_slot)[:, inv_order])
    return d_rows, None, None, None


_pack_rows.defvjp(_pack_rows_fwd, _pack_rows_bwd)


def build_tile_instances_batched(
    sg: ScreenGaussians,  # every field has a leading batch dim (B, ...)
    image_shape: tuple[int, int],
    max_tiles_per_gaussian: int = 16,
    chunk: int = 256,
    instance_budget: int | None = None,
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
    n_cand = bg_count * r

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
            jnp.zeros((bg_count,), jnp.int32),
            jnp.zeros((bg_count,), jnp.int32),
        ],
        axis=1,
    ).astype(jnp.uint16)  # (BG, 8)
    rect_s = rect_u16[order].astype(jnp.int32)  # (BG, 8) in slot space
    rmin_x_s, rmin_y_s = rect_s[:, 0], rect_s[:, 1]
    rw_s, area_s = rect_s[:, 2], rect_s[:, 3]
    valid_s, vid_s = rect_s[:, 4] > 0, rect_s[:, 5]

    # ---- 3. expand candidate tiles in depth-sorted slot order
    j = jnp.arange(r, dtype=jnp.int32)
    tx = rmin_x_s[:, None] + j[None, :] % rw_s[:, None]  # (BG, R)
    ty = rmin_y_s[:, None] + j[None, :] // rw_s[:, None]
    inst_valid = (j[None, :] < area_s[:, None]) & valid_s[:, None]
    tile_id = jnp.where(
        inst_valid, ty * grid_x + tx + (vid_s * n_tiles)[:, None], n_tiles_total
    ).astype(jnp.int32)

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
        slot_flat = jnp.broadcast_to(
            jnp.arange(bg_count, dtype=jnp.int32)[:, None], (bg_count, r)
        ).reshape(-1)
        key = (tile_id.reshape(-1) << slot_bits) | slot_flat
        (sorted_key,) = jax.lax.sort((key,), num_keys=1)
        run_starts = jnp.searchsorted(
            sorted_key, tiles << slot_bits, side="left"
        ).astype(jnp.int32)
        run_ends = jnp.searchsorted(
            sorted_key, (tiles + 1) << slot_bits, side="left"
        ).astype(jnp.int32)
        key_prefix = jnp.pad(
            sorted_key[:cap], (0, chunk),
            constant_values=jnp.iinfo(jnp.int32).max,
        )
        slot_prefix = key_prefix & slot_mask
        lane_dead = key_prefix >= (n_tiles_total << slot_bits)
    else:
        slot_flat = jnp.broadcast_to(
            jnp.arange(bg_count, dtype=jnp.int32)[:, None], (bg_count, r)
        ).reshape(-1)
        sorted_tid, sorted_slot = jax.lax.sort(
            (tile_id.reshape(-1), slot_flat), num_keys=1, is_stable=True
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
    # custom VJP (f32 scatter-add + u16 inverse-permutation gather).
    slot_safe = jnp.where(lane_dead, 0, slot_prefix)
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
    # Dead lanes (sentinel candidates + slack tail) gather arbitrary rows —
    # harmless: no tile's count reaches them, so the kernels mask them and
    # their gradient chunks stay zero.
    packed = _pack_rows(rows, slot_safe, order, inv_order)

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
) -> TileInstances:
    """Single-view layout: the batched builder with B=1 (starts are global ==
    local offsets)."""
    sg_b = jax.tree.map(lambda x: x[None], sg)
    return build_tile_instances_batched(
        sg_b, image_shape, max_tiles_per_gaussian, chunk, instance_budget
    )
