"""Tile-instance construction for the Pallas rasterizer.

Replaces the CUDA pipeline's duplicate-with-keys + radix-sort + per-tile ranges
(the diff-gaussian-rasterization preprocessing the reference drives from
cuda_splatting.py) with static-shaped XLA ops:

1. every gaussian spawns up to ``max_tiles_per_gaussian`` (tile, gaussian)
   instances covering its screen rect (overflow beyond the cap is counted and
   dropped — the CUDA version has dynamic allocation instead);
2. instances are sorted by a composite (tile_id, depth-bits) key — equivalent
   to the CUDA radix sort and stable for equal depths;
3. each tile's run is scattered into a segment aligned to ``chunk`` so the
   kernel's DMAs are aligned and backward chunk writes are tile-exclusive.

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


def build_tile_instances(
    sg: ScreenGaussians,
    image_shape: tuple[int, int],
    max_tiles_per_gaussian: int = 16,
    chunk: int = 256,
    instance_budget: int | None = None,
) -> TileInstances:
    """instance_budget caps the layout length (default: exact bound G*R).
    Typical scenes average ~3-4 tiles per gaussian, so a budget of ~8*G
    halves the layout arrays with no drops; overflow is counted."""
    h, w = image_shape
    grid_x = (w + TILE - 1) // TILE
    grid_y = (h + TILE - 1) // TILE
    n_tiles = grid_x * grid_y
    g = sg.depth.shape[0]
    r = max_tiles_per_gaussian

    rect_w = sg.rect_max[:, 0] - sg.rect_min[:, 0]  # (G,)
    rect_h = sg.rect_max[:, 1] - sg.rect_min[:, 1]
    area = rect_w * rect_h
    num_dropped = jnp.sum(jnp.where(sg.valid, jnp.maximum(area - r, 0), 0))

    j = jnp.arange(r, dtype=jnp.int32)  # (R,)
    rw_safe = jnp.maximum(rect_w, 1)
    tx = sg.rect_min[:, 0:1] + j[None, :] % rw_safe[:, None]  # (G, R)
    ty = sg.rect_min[:, 1:2] + j[None, :] // rw_safe[:, None]
    inst_valid = (j[None, :] < jnp.minimum(area, r)[:, None]) & sg.valid[:, None]
    tile_id = jnp.where(inst_valid, ty * grid_x + tx, n_tiles).astype(jnp.int32)

    # One stable lexicographic sort by (tile, depth), carrying the gaussian id
    # — the XLA analog of the CUDA radix sort over [tile | depth-bits] keys.
    depth_flat = jnp.broadcast_to(sg.depth[:, None], (g, r)).reshape(-1)
    gid_flat = jnp.broadcast_to(
        jnp.arange(g, dtype=jnp.int32)[:, None], (g, r)
    ).reshape(-1)
    sorted_tid, _, sorted_gid = jax.lax.sort(
        (tile_id.reshape(-1), depth_flat, gid_flat), num_keys=2, is_stable=True
    )

    # Per-tile runs in the sorted array.
    tiles = jnp.arange(n_tiles, dtype=jnp.int32)
    run_starts = jnp.searchsorted(sorted_tid, tiles, side="left").astype(jnp.int32)
    run_ends = jnp.searchsorted(sorted_tid, tiles, side="right").astype(jnp.int32)
    counts = run_ends - run_starts

    # Aligned segment layout.
    padded = ((counts + chunk - 1) // chunk) * chunk
    seg_starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded)[:-1].astype(jnp.int32)]
    )
    budget = g * r if instance_budget is None else min(instance_budget, g * r)
    total = budget + n_tiles * chunk  # static layout length
    # Truncate segments that exceed the budgeted layout (counted as dropped).
    avail = jnp.clip(total - seg_starts, 0, None)
    counts_kept = jnp.minimum(counts, avail)
    num_dropped = num_dropped + jnp.sum(counts - counts_kept)
    counts = counts_kept

    # Gather-based layout: for every OUTPUT lane, find its owning tile as
    # cumsum of a start-indicator (vectorized searchsorted over millions of
    # lanes is ~30x slower on TPU), then the source position in the sorted
    # array. Duplicate starts (empty tiles) accumulate, matching
    # searchsorted(..., side="right") - 1.
    lanes = jnp.arange(total, dtype=jnp.int32)
    indicator = jnp.zeros((total,), jnp.int32).at[seg_starts].add(1)
    tile_of_lane = jnp.minimum(jnp.cumsum(indicator) - 1, n_tiles - 1)
    off = lanes - seg_starts[tile_of_lane]
    lane_ok = off < counts[tile_of_lane]
    src = jnp.minimum(run_starts[tile_of_lane] + off, g * r - 1)
    gaussian_id = jnp.where(lane_ok, sorted_gid[src], g)

    # Pack per-gaussian screen data, then gather per instance (differentiable).
    gid_safe = jnp.minimum(gaussian_id, g - 1)
    lane_live = gaussian_id < g
    rows = jnp.stack(
        [
            sg.xy[:, 0],
            sg.xy[:, 1],
            sg.conic[:, 0],
            sg.conic[:, 1],
            sg.conic[:, 2],
            sg.opacity,
            sg.color[:, 0],
            sg.color[:, 1],
            sg.color[:, 2],
        ]
    )  # (9, G)
    packed = jnp.where(lane_live[None, :], rows[:, gid_safe], 0.0)
    packed = jnp.pad(packed, ((0, PACKED_ROWS - packed.shape[0]), (0, 0)))

    return TileInstances(
        packed=packed,
        gaussian_id=gaussian_id,
        starts=seg_starts,
        counts=counts,
        grid_hw=(grid_y, grid_x),
        num_dropped=num_dropped,
    )


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
    """
    h, w = image_shape
    grid_x = (w + TILE - 1) // TILE
    grid_y = (h + TILE - 1) // TILE
    n_tiles = grid_x * grid_y
    b, g = sg.depth.shape
    r = max_tiles_per_gaussian

    rect_w = sg.rect_max[..., 0] - sg.rect_min[..., 0]  # (B, G)
    rect_h = sg.rect_max[..., 1] - sg.rect_min[..., 1]
    area = rect_w * rect_h
    num_dropped = jnp.sum(
        jnp.where(sg.valid, jnp.maximum(area - r, 0), 0)
    )

    j = jnp.arange(r, dtype=jnp.int32)
    rw_safe = jnp.maximum(rect_w, 1)
    tx = sg.rect_min[..., 0:1] + j % rw_safe[..., None]  # (B, G, R)
    ty = sg.rect_min[..., 1:2] + j // rw_safe[..., None]
    inst_valid = (j < jnp.minimum(area, r)[..., None]) & sg.valid[..., None]
    batch_off = (jnp.arange(b, dtype=jnp.int32) * n_tiles)[:, None, None]
    n_tiles_total = b * n_tiles
    tile_id = jnp.where(
        inst_valid, ty * grid_x + tx + batch_off, n_tiles_total
    ).astype(jnp.int32)

    depth_flat = jnp.broadcast_to(sg.depth[..., None], (b, g, r)).reshape(-1)
    # global gaussian index b*G + g
    gid_flat = jnp.broadcast_to(
        (jnp.arange(b, dtype=jnp.int32) * g)[:, None, None]
        + jnp.arange(g, dtype=jnp.int32)[None, :, None],
        (b, g, r),
    ).reshape(-1)
    sorted_tid, _, sorted_gid = jax.lax.sort(
        (tile_id.reshape(-1), depth_flat, gid_flat), num_keys=2, is_stable=True
    )

    tiles = jnp.arange(n_tiles_total, dtype=jnp.int32)
    run_starts = jnp.searchsorted(sorted_tid, tiles, side="left").astype(jnp.int32)
    run_ends = jnp.searchsorted(sorted_tid, tiles, side="right").astype(jnp.int32)
    counts = run_ends - run_starts

    padded = ((counts + chunk - 1) // chunk) * chunk
    seg_starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded)[:-1].astype(jnp.int32)]
    )
    budget = (
        b * g * r if instance_budget is None else min(b * instance_budget, b * g * r)
    )
    total = budget + n_tiles_total * chunk
    avail = jnp.clip(total - seg_starts, 0, None)
    counts_kept = jnp.minimum(counts, avail)
    num_dropped = num_dropped + jnp.sum(counts - counts_kept)
    counts = counts_kept

    lanes = jnp.arange(total, dtype=jnp.int32)
    indicator = jnp.zeros((total,), jnp.int32).at[seg_starts].add(1)
    tile_of_lane = jnp.minimum(jnp.cumsum(indicator) - 1, n_tiles_total - 1)
    off = lanes - seg_starts[tile_of_lane]
    lane_ok = off < counts[tile_of_lane]
    src = jnp.minimum(run_starts[tile_of_lane] + off, b * g * r - 1)
    gaussian_id = jnp.where(lane_ok, sorted_gid[src], b * g)

    gid_safe = jnp.minimum(gaussian_id, b * g - 1)
    lane_live = gaussian_id < b * g
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
    packed = jnp.where(lane_live[None, :], rows[:, gid_safe], 0.0)
    packed = jnp.pad(packed, ((0, PACKED_ROWS - packed.shape[0]), (0, 0)))

    return TileInstances(
        packed=packed,
        gaussian_id=gaussian_id,
        starts=seg_starts,  # (B*T,) global offsets
        counts=counts,
        grid_hw=(grid_y, grid_x),
        num_dropped=num_dropped,
    )
