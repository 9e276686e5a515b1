"""Tile-instance construction for the Pallas rasterizer.

Replaces the CUDA pipeline's duplicate-with-keys + radix-sort + per-tile ranges
(the diff-gaussian-rasterization preprocessing the reference drives from
cuda_splatting.py) with static-shaped XLA ops, laid out around the TPU cost
model measured on v5e:

- multi-operand / multi-key sorts cost ~4-5x a single packed-int32-key sort;
- gathers indexing a tiny (n_tiles,) table with millions of indices are ~5x
  slower than large-table gathers;
- scatters with millions of updates are ~20ms-class and must be avoided
  entirely (only tiny (n_tiles,)-sized scatters are used here).

Pipeline:

1. gaussians are depth-sorted once globally (B*G elements, not B*G*R —
   per-view order is what matters and a tile belongs to exactly one view, so
   a global depth sort gives depth-ascending order within every tile);
2. every sorted gaussian spawns up to ``max_tiles_per_gaussian`` candidate
   (tile, gaussian) instances covering its screen rect (overflow beyond the
   cap is counted and dropped — the CUDA version has dynamic allocation);
3. candidates are sorted ONCE by tile id: when ``(n_tiles+1) * B*G`` fits in
   int31 the (tile, slot) pair is packed into a single int32 key (slot order
   = depth order, so the packed sort reproduces the CUDA radix sort over
   composite [tile | depth-bits] keys); otherwise a stable single-key sort
   with the slot as payload;
4. each tile's run is scattered into a segment aligned to ``chunk`` so the
   kernel's DMAs are aligned and backward chunk writes are tile-exclusive.
   Per-lane tile metadata (source offset, liveness) is materialized with
   delta-scatter + cumsum over (n_tiles,)-sized updates rather than gathering
   from (n_tiles,) tables.

Everything except the integer index math is differentiable (gathers of the
per-gaussian screen data), so autodiff carries gradients from the packed
instance array back to means/covariances/SH/opacity.
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


class TileInstances(NamedTuple):
    packed: Array  # (PACKED_ROWS, L) f32
    gaussian_id: Array  # (L,) int32, == num_gaussians for padding lanes
    starts: Array  # (n_tiles,) int32, aligned segment starts
    counts: Array  # (n_tiles,) int32, live instances per tile
    grid_hw: tuple[int, int]  # (grid_y, grid_x)
    num_dropped: Array  # () int32 — instances lost to the per-gaussian cap


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
    packed (PACKED_ROWS, L_total) array; the kernel grid supplies the batch
    index only for output-block and background selection.

    instance_budget caps the layout length per batch element (default: exact
    bound G*R). Typical scenes average ~3-4 tiles per gaussian, so a budget
    of ~8*G halves the layout arrays with no drops; overflow is counted in
    num_dropped.
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
    # (NOT B*G*R). `order[slot]` is the original flat index. Views need not be
    # separated: each tile belongs to one view, and restricting a globally
    # depth-ascending order to one view's gaussians is still depth-ascending.
    _, order = jax.lax.sort(
        (sg.depth.reshape(-1), jnp.arange(bg_count, dtype=jnp.int32)),
        num_keys=1,
        is_stable=True,
    )

    # ---- 2. expand candidate tiles in depth-sorted slot order
    vid_s = order // g  # view of each sorted slot
    rect_min_s = sg.rect_min.reshape(bg_count, 2)[order]
    rw_s = rect_w.reshape(-1)[order]
    area_s = area.reshape(-1)[order]
    valid_s = sg.valid.reshape(-1)[order]
    j = jnp.arange(r, dtype=jnp.int32)
    rw_safe = jnp.maximum(rw_s, 1)[:, None]
    tx = rect_min_s[:, 0:1] + j[None, :] % rw_safe  # (BG, R)
    ty = rect_min_s[:, 1:2] + j[None, :] // rw_safe
    inst_valid = (
        j[None, :] < jnp.minimum(area_s, r)[:, None]
    ) & valid_s[:, None]
    tile_id = jnp.where(
        inst_valid, ty * grid_x + tx + (vid_s * n_tiles)[:, None], n_tiles_total
    ).astype(jnp.int32)

    # ---- 3. ONE sort by tile groups each tile's instances; within-tile
    # order = slot order = depth order (the CUDA [tile|depth] radix sort).
    slot_flat = jnp.broadcast_to(
        jnp.arange(bg_count, dtype=jnp.int32)[:, None], (bg_count, r)
    ).reshape(-1)
    slot_bits = max(1, (bg_count - 1).bit_length())
    if (n_tiles_total + 1) << slot_bits <= jnp.iinfo(jnp.int32).max:
        # fast path: pack (tile, slot) into one int32 key — ~4x faster than a
        # two-operand sort on TPU.
        key = (tile_id.reshape(-1) << slot_bits) | slot_flat
        (sorted_key,) = jax.lax.sort((key,), num_keys=1)
        sorted_slot = sorted_key & ((1 << slot_bits) - 1)
        tiles = jnp.arange(n_tiles_total, dtype=jnp.int32)
        run_starts = jnp.searchsorted(
            sorted_key, tiles << slot_bits, side="left"
        ).astype(jnp.int32)
        run_ends = jnp.searchsorted(
            sorted_key, (tiles + 1) << slot_bits, side="left"
        ).astype(jnp.int32)
    else:
        sorted_tid, sorted_slot = jax.lax.sort(
            (tile_id.reshape(-1), slot_flat), num_keys=1, is_stable=True
        )
        tiles = jnp.arange(n_tiles_total, dtype=jnp.int32)
        run_starts = jnp.searchsorted(sorted_tid, tiles, side="left").astype(
            jnp.int32
        )
        run_ends = jnp.searchsorted(sorted_tid, tiles, side="right").astype(
            jnp.int32
        )
    counts = run_ends - run_starts

    # ---- 4. aligned segment layout
    padded = ((counts + chunk - 1) // chunk) * chunk
    seg_starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded)[:-1].astype(jnp.int32)]
    )
    budget = (
        n_cand if instance_budget is None else min(b * instance_budget, n_cand)
    )
    total = budget + n_tiles_total * chunk  # static layout length
    # Truncate segments that exceed the budgeted layout (counted as dropped).
    avail = jnp.clip(total - seg_starts, 0, None)
    counts_kept = jnp.minimum(counts, avail)
    num_dropped = num_dropped + jnp.sum(counts - counts_kept)
    counts = counts_kept

    # ---- 5. per-lane metadata via delta-scatter + cumsum (a gather from the
    # (n_tiles,) tables with `total` indices is ~5x slower on TPU; all scatter
    # updates here are (n_tiles,)-sized). Duplicate seg_starts (empty tiles)
    # accumulate deltas, so each lane sees the LAST tile sharing its start —
    # exactly the tile that owns the segment.
    # Channel 0: base = run_start - seg_start, so src = lane + base.
    # Channel 1: +1/-1 live-range indicators, so live = cumsum > 0.
    base = run_starts - seg_starts
    delta_base = jnp.concatenate([base[:1], base[1:] - base[:-1]])
    chan = jnp.zeros((2 * total,), jnp.int32)
    chan = chan.at[seg_starts].add(delta_base, mode="drop")
    nonzero = jnp.where(counts > 0, 1, 0)
    chan = chan.at[total + seg_starts].add(nonzero, mode="drop")
    chan = chan.at[total + seg_starts + counts].add(-nonzero, mode="drop")
    chan = jnp.cumsum(chan.reshape(2, total), axis=1)
    lanes = jnp.arange(total, dtype=jnp.int32)
    lane_live = chan[1] > 0
    src = jnp.clip(lanes + chan[0], 0, n_cand - 1)
    slot_of_lane = jnp.where(lane_live, sorted_slot[src], bg_count)

    # ---- 6. map slots back to original gaussian ids, pack screen data
    slot_safe = jnp.minimum(slot_of_lane, bg_count - 1)
    lane_ok = slot_of_lane < bg_count
    gaussian_id = jnp.where(lane_ok, order[slot_safe], bg_count)
    gid_safe = jnp.minimum(gaussian_id, bg_count - 1)
    rows = jnp.stack(
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
    )  # (9, B*G)
    packed = jnp.where(lane_ok[None, :], rows[:, gid_safe], 0.0)
    packed = jnp.pad(packed, ((0, PACKED_ROWS - packed.shape[0]), (0, 0)))

    return TileInstances(
        packed=packed,
        gaussian_id=gaussian_id,
        starts=seg_starts,  # (B*T,) global offsets
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
