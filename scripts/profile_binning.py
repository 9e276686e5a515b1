"""Bisect build_tile_instances_batched stage by stage on the real TPU.

Development tool: copies of the binning pipeline truncated after each stage,
each jitted and timed, to locate the hot op. jnp.sum() on outputs forces
materialization without returning huge arrays to host.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from my_depthsplat_tpu.geometry import get_fov
from my_depthsplat_tpu.render.camera import (
    TILE_X,
    TILE_Y,
    scale_invariant_normalization,
)
from my_depthsplat_tpu.render.projection import project_gaussians


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - start) / iters * 1e3


def make_sg():
    h = w = 256
    n_views = 2
    g = n_views * h * w
    rng = np.random.default_rng(0)
    extr = np.broadcast_to(np.eye(4, dtype=np.float32), (n_views, 4, 4)).copy()
    extr[:, 0, 3] = 0.15 * np.arange(n_views)
    intr = np.broadcast_to(
        np.array([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1]], np.float32),
        (n_views, 3, 3),
    )
    near = np.full((n_views,), 1.0, np.float32)
    far = np.full((n_views,), 100.0, np.float32)
    means = rng.normal(size=(n_views, g, 3)).astype(np.float32) * np.array(
        [1.0, 1.0, 0.0], np.float32
    ) + np.array([0.0, 0.0, 4.0], np.float32)
    scales = rng.uniform(0.01, 0.05, size=(n_views, g, 3)).astype(np.float32)
    cov = np.zeros((n_views, g, 3, 3), np.float32)
    cov[..., 0, 0] = scales[..., 0] ** 2
    cov[..., 1, 1] = scales[..., 1] ** 2
    cov[..., 2, 2] = scales[..., 2] ** 2
    sh = rng.normal(size=(n_views, g, 3, 9)).astype(np.float32) * 0.3
    opac = rng.uniform(0.3, 1.0, size=(n_views, g)).astype(np.float32)

    e, n_, f_, m, c = scale_invariant_normalization(
        *map(jnp.asarray, (extr, near, far, means, cov))
    )
    fovs = get_fov(jnp.asarray(intr))

    def proj_one(e1, fov, m1, c1, s1, o1):
        return project_gaussians(
            e1, m1, c1, s1, o1,
            jnp.tan(0.5 * fov[0]), jnp.tan(0.5 * fov[1]), (h, w), True,
        )

    sg = jax.jit(
        lambda: jax.vmap(proj_one)(
            e, fovs, m, c, jnp.asarray(sh), jnp.asarray(opac)
        )
    )()
    return jax.block_until_ready(sg), (h, w)


def stages(sg, image_shape, upto, max_tiles_per_gaussian=16, chunk=256,
           instance_budget=8 * 256 * 256):
    h, w = image_shape
    grid_x = (w + TILE_X - 1) // TILE_X
    grid_y = (h + TILE_Y - 1) // TILE_Y
    n_tiles = grid_x * grid_y
    b, g = sg.depth.shape
    r = max_tiles_per_gaussian
    bg_count = b * g
    n_tiles_total = b * n_tiles
    n_cand = bg_count * r

    rect_w = sg.rect_max[..., 0] - sg.rect_min[..., 0]
    rect_h = sg.rect_max[..., 1] - sg.rect_min[..., 1]
    area = rect_w * rect_h
    num_dropped = jnp.sum(jnp.where(sg.valid, jnp.maximum(area - r, 0), 0))
    if upto == "rects":
        return num_dropped

    _, order = jax.lax.sort(
        (sg.depth.reshape(-1), jnp.arange(bg_count, dtype=jnp.int32)),
        num_keys=1, is_stable=True,
    )
    if upto == "depth_sort":
        return jnp.sum(order)

    vid_s = order // g
    rect_min_s = sg.rect_min.reshape(bg_count, 2)[order]
    rw_s = rect_w.reshape(-1)[order]
    area_s = area.reshape(-1)[order]
    valid_s = sg.valid.reshape(-1)[order]
    if upto == "gather_sorted":
        return jnp.sum(rect_min_s) + jnp.sum(rw_s) + jnp.sum(area_s)

    j = jnp.arange(r, dtype=jnp.int32)
    rw_safe = jnp.maximum(rw_s, 1)[:, None]
    tx = rect_min_s[:, 0:1] + j[None, :] % rw_safe
    ty = rect_min_s[:, 1:2] + j[None, :] // rw_safe
    inst_valid = (j[None, :] < jnp.minimum(area_s, r)[:, None]) & valid_s[:, None]
    tile_id = jnp.where(
        inst_valid, ty * grid_x + tx + (vid_s * n_tiles)[:, None], n_tiles_total
    ).astype(jnp.int32)
    if upto == "candidates":
        return jnp.sum(tile_id)

    slot_flat = jnp.broadcast_to(
        jnp.arange(bg_count, dtype=jnp.int32)[:, None], (bg_count, r)
    ).reshape(-1)
    slot_bits = max(1, (bg_count - 1).bit_length())
    assert (n_tiles_total + 1) << slot_bits <= jnp.iinfo(jnp.int32).max
    key = (tile_id.reshape(-1) << slot_bits) | slot_flat
    (sorted_key,) = jax.lax.sort((key,), num_keys=1)
    sorted_slot = sorted_key & ((1 << slot_bits) - 1)
    if upto == "tile_sort":
        return sorted_key[::65536].sum()

    tiles = jnp.arange(n_tiles_total, dtype=jnp.int32)
    run_starts = jnp.searchsorted(
        sorted_key, tiles << slot_bits, side="left"
    ).astype(jnp.int32)
    run_ends = jnp.searchsorted(
        sorted_key, (tiles + 1) << slot_bits, side="left"
    ).astype(jnp.int32)
    counts = run_ends - run_starts
    if upto == "searchsorted":
        return jnp.sum(counts)

    padded = ((counts + chunk - 1) // chunk) * chunk
    seg_starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded)[:-1].astype(jnp.int32)]
    )
    budget = n_cand if instance_budget is None else min(b * instance_budget, n_cand)
    total = budget + n_tiles_total * chunk
    avail = jnp.clip(total - seg_starts, 0, None)
    counts_kept = jnp.minimum(counts, avail)
    num_dropped = num_dropped + jnp.sum(counts - counts_kept)
    counts = counts_kept
    if upto == "segments":
        return jnp.sum(counts) + jnp.sum(seg_starts)

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
    if upto == "lane_meta":
        return jnp.sum(src) + jnp.sum(lane_live)

    slot_of_lane = jnp.where(lane_live, sorted_slot[src], bg_count)
    if upto == "lane_gather":
        return jnp.sum(slot_of_lane)

    slot_safe = jnp.minimum(slot_of_lane, bg_count - 1)
    lane_ok = slot_of_lane < bg_count
    gaussian_id = jnp.where(lane_ok, order[slot_safe], bg_count)
    gid_safe = jnp.minimum(gaussian_id, bg_count - 1)
    rows = jnp.stack(
        [
            sg.xy[..., 0].reshape(-1), sg.xy[..., 1].reshape(-1),
            sg.conic[..., 0].reshape(-1), sg.conic[..., 1].reshape(-1),
            sg.conic[..., 2].reshape(-1), sg.opacity.reshape(-1),
            sg.color[..., 0].reshape(-1), sg.color[..., 1].reshape(-1),
            sg.color[..., 2].reshape(-1),
        ]
    )
    packed = jnp.where(lane_ok[None, :], rows[:, gid_safe], 0.0)
    if upto == "pack":
        return jnp.sum(packed)
    raise ValueError(upto)


def main() -> None:
    sg, image_shape = make_sg()
    prev = 0.0
    for name in [
        "rects", "depth_sort", "gather_sorted", "candidates", "tile_sort",
        "searchsorted", "segments", "lane_meta", "lane_gather", "pack",
    ]:
        fn = jax.jit(lambda s, n=name: stages(s, image_shape, n))
        t = timeit(fn, sg)
        print(f"{name:15s} cumulative {t:8.2f} ms   (+{t - prev:7.2f})")
        prev = t


if __name__ == "__main__":
    main()
