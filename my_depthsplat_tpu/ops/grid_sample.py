"""Bilinear grid sampling + plane-sweep warping in pure jnp.

Replaces the reference's cuDNN F.grid_sample path (matching.py:24-90) — the
single hottest data-movement op in the depth branch. The cuDNN disable-flag
workaround (mv_unimatch.py:34,204) disappears entirely.

Semantics: torch F.grid_sample(mode='bilinear', padding_mode='zeros',
align_corners=True). Layout is channels-last.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array


def take_rows(table: Array, idx: Array) -> Array:
    """Batched row gather: (B, N, C) f32 table, (B, M) int32 indices ->
    (B, M, C).

    Implemented as ONE flat feature-major column gather (_gather_cols,
    ~6.5 ns/index) with the batch folded into the indices. The previous
    vmap-batched u16 ROW gather ran ~33 ns/row and materialized a (B*M, 2C)
    u32 intermediate (24 GB at 12-view 512x960 plane-sweep scale). Gradients
    flow to `table` only (idx is integer); the gather's VJP is the f32
    scatter-add transpose."""
    b, n, c = table.shape
    m = idx.shape[1]
    table_maj = table.reshape(b * n, c).T  # (C, B*N)
    gidx = (
        jnp.arange(b, dtype=jnp.int32)[:, None] * n + idx
    ).reshape(-1)
    gather = _gather_cols_bf16 if table.dtype == jnp.bfloat16 else _gather_cols
    out = gather(table_maj, gidx)  # (C, B*M)
    return out.T.reshape(b, m, c)


def grid_sample_bilinear(feature: Array, grid: Array) -> Array:
    """Sample (B, H, W, C) at normalized coords grid (B, Ho, Wo, 2) in [-1, 1].

    align_corners=True: -1 maps to pixel center 0, +1 to center (n-1).
    padding_mode='zeros': out-of-bounds taps contribute zero.
    Returns (B, Ho, Wo, C).
    """
    b, h, w, c = feature.shape
    gx = (grid[..., 0] + 1.0) * 0.5 * (w - 1)
    gy = (grid[..., 1] + 1.0) * 0.5 * (h - 1)

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wx1 = gx - x0
    wy1 = gy - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    flat = feature.reshape(b, h * w, c)

    def tap(xi: Array, yi: Array, wgt: Array) -> Array:
        inb = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        idx = (yi_c * w + xi_c).reshape(b, -1)  # (B, Ho*Wo)
        vals = take_rows(flat, idx).reshape(xi.shape + (c,))
        return vals * (wgt * inb)[..., None]

    out = (
        tap(x0, y0, wx0 * wy0)
        + tap(x1, y0, wx1 * wy0)
        + tap(x0, y1, wx0 * wy1)
        + tap(x1, y1, wx1 * wy1)
    )
    return out


@jax.custom_vjp
def _gather_cols(table: Array, idx: Array) -> Array:
    """Feature-major column gather: (C, N) f32 table, (M,) int32 -> (C, M).

    The fast TPU form: one flat (no batch dim) gather along the minor axis of
    a 16-bit table — measured ~6 ns/index at C=128 vs ~33 ns/row for a
    vmap-batched row gather of the same data (which also materializes a
    (M, 2C) u32 intermediate: 24 GB at 12-view 512x960 scale). The table
    round-trips an exact f32 <-> 2xu16 bitcast; the VJP is the f32
    scatter-add transpose."""
    c, n = table.shape
    pairs = jax.lax.bitcast_convert_type(table, jnp.uint16)  # (C, N, 2)
    u16 = pairs.transpose(2, 0, 1).reshape(2 * c, n)  # [lo rows | hi rows]
    g = u16[:, idx]  # (2C, M)
    lo = g[:c].astype(jnp.uint32)
    hi = g[c:].astype(jnp.uint32)
    return jax.lax.bitcast_convert_type(
        ((hi << 16) | lo).astype(jnp.int32), jnp.float32
    )


def _gather_cols_fwd(table, idx):
    return _gather_cols(table, idx), (idx, table.shape)


def _gather_cols_bwd(res, g):
    idx, (c, n) = res
    return jnp.zeros((c, n), g.dtype).at[:, idx].add(g), None


_gather_cols.defvjp(_gather_cols_fwd, _gather_cols_bwd)


@jax.custom_vjp
def _gather_cols_bf16(table: Array, idx: Array) -> Array:
    """(C, N) bf16 table, (M,) int32 -> (C, M) bf16: half the gather bytes of
    the f32 path (the vector gather is byte-bound at ~73 GB/s on v5e). The
    VJP accumulates in f32 and casts back."""
    u16 = jax.lax.bitcast_convert_type(table, jnp.uint16)
    return jax.lax.bitcast_convert_type(u16[:, idx], jnp.bfloat16)


def _gather_cols_bf16_fwd(table, idx):
    return _gather_cols_bf16(table, idx), (idx, table.shape)


def _gather_cols_bf16_bwd(res, g):
    idx, (c, n) = res
    d = jnp.zeros((c, n), jnp.float32).at[:, idx].add(g.astype(jnp.float32))
    return d.astype(jnp.bfloat16), None


_gather_cols_bf16.defvjp(_gather_cols_bf16_fwd, _gather_cols_bf16_bwd)


def plane_sweep_correlation(
    src: Array,  # (B, H, W, C) source-view features
    ref: Array,  # (B, H, W, C) reference-view features
    intrinsics: Array,  # (B, 3, 3) pixel intrinsics
    pose: Array,  # (B, 4, 4) relative pose (source_w2c @ ref_c2w)
    depth: Array,  # (B, D, H, W) depth candidates per ref pixel
    clamp_min_depth: float = 1e-3,
    gather_dtype: jnp.dtype | None = None,
) -> Array:
    """Fused plane-sweep warp + correlation: sum_c ref[p, c] *
    bilinear(src)[warp_d(p), c], returned as (B, D, H, W). NOT divided by
    sqrt(C) — callers apply their own normalization.

    Equivalent to warp_with_pose_depth_candidates followed by an einsum with
    ref, but feature-major throughout: the (B, D, H, W, C) warped tensor is
    never materialized (it is ~12 GB at 12-view 512x960), and each bilinear
    tap is one flat 16-bit column gather (the measured fast path).

    gather_dtype=jnp.bfloat16 rounds the FEATURES to bf16 before the gather
    and dot (interpolation weights and accumulation stay f32), halving the
    byte-bound gather cost; ~1e-3 relative error on the cost volume."""
    b, d, h, w = depth.shape
    c = src.shape[-1]
    # bf16 network compute (encoder.compute_dtype) delivers bf16 features;
    # gather them as bf16 regardless of the sweep knob
    bf16 = gather_dtype == jnp.bfloat16 or src.dtype == jnp.bfloat16
    gx, gy, inb_template = _warp_pixel_coords(
        intrinsics, pose, depth, h, w, clamp_min_depth
    )  # (B, D, HW) pixel coords

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    wx1 = gx - x0
    wy1 = gy - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    src_maj = src.reshape(b * h * w, c).T  # (C, B*HW)
    # ref in feature-major, broadcast over D inside the tap loop
    ref_maj = ref.reshape(b, h * w, c).transpose(2, 0, 1)  # (C, B, HW)
    if bf16:
        src_maj = src_maj.astype(jnp.bfloat16)
        ref_maj = ref_maj.astype(jnp.bfloat16)
    gather = _gather_cols_bf16 if bf16 else _gather_cols

    base = (jnp.arange(b, dtype=jnp.int32) * (h * w))[:, None, None]
    cost = jnp.zeros((b, d, h * w), jnp.float32)
    for xi, yi, wgt in (
        (x0, y0, wx0 * wy0),
        (x0 + 1.0, y0, wx1 * wy0),
        (x0, y0 + 1.0, wx0 * wy1),
        (x0 + 1.0, y0 + 1.0, wx1 * wy1),
    ):
        inb = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        idx = (base + yi_c * w + xi_c).reshape(-1)  # (B*D*HW,)
        vals = gather(src_maj, idx).reshape(c, b, d, h * w)
        dot = jnp.einsum(
            "cbp,cbdp->bdp", ref_maj, vals,
            preferred_element_type=jnp.float32,
        )
        cost = cost + dot * (wgt * inb)
    return cost.reshape(b, d, h, w).astype(src.dtype)


def plane_sweep_correlation_window(
    src: Array,  # (B, H, W, C) source-view features
    ref: Array,  # (B, H, W, C) reference-view features
    intrinsics: Array,  # (B, 3, 3) pixel intrinsics
    pose: Array,  # (B, 4, 4) relative pose (source_w2c @ ref_c2w)
    depth: Array,  # (B, D, H, W) depth candidates per ref pixel
    window: int = 6,
    clamp_min_depth: float = 1e-3,
    gather_dtype: jnp.dtype | None = None,
) -> tuple[Array, Array]:
    """Window-correlation plane sweep for BANDED candidates (coarse-to-fine
    scales where all D candidates of a pixel warp within a few pixels of each
    other): gather the source features on a window x window integer lattice
    anchored at each ref pixel's band center ONCE, dot each lattice cell with
    the ref features immediately, then evaluate every depth candidate as a
    dense separable-hat combination of the per-cell correlations.

    EXACT relative to the tap-gather sweep while every candidate's bilinear
    taps stay inside the window (bilinear interpolation is linear in the
    image, so interpolating pre-computed integer-shift correlations IS the
    correlation of the interpolated image); taps that fall outside contribute
    zero and are counted in the returned overflow scalar. Cost: window^2
    feature gathers per pixel instead of 4*D — at D=32 and window=6 that is
    3.5x fewer gather bytes, and the per-candidate work becomes VPU-dense.

    Returns (cost (B, D, H, W) un-normalized, overflow () int32).
    """
    b, d, h, w = depth.shape
    c = src.shape[-1]
    k = window
    bf16 = gather_dtype == jnp.bfloat16 or src.dtype == jnp.bfloat16
    gx, gy, _ = _warp_pixel_coords(intrinsics, pose, depth, h, w, clamp_min_depth)

    # Band-center window origin (no gradient: a shifted window with in-window
    # taps is the same function). gx/gy are monotone in d, so the band's
    # endpoints bracket every candidate.
    cx = 0.5 * (gx[:, 0] + gx[:, -1])  # (B, HW)
    cy = 0.5 * (gy[:, 0] + gy[:, -1])
    ox = jax.lax.stop_gradient(jnp.floor(cx) - (k // 2 - 1)).astype(jnp.int32)
    oy = jax.lax.stop_gradient(jnp.floor(cy) - (k // 2 - 1)).astype(jnp.int32)

    src_maj = src.reshape(b * h * w, c).T  # (C, B*HW)
    ref_maj = ref.reshape(b, h * w, c).transpose(2, 0, 1)  # (C, B, HW)
    if bf16:
        src_maj = src_maj.astype(jnp.bfloat16)
        ref_maj = ref_maj.astype(jnp.bfloat16)
    gather = _gather_cols_bf16 if bf16 else _gather_cols
    base = (jnp.arange(b, dtype=jnp.int32) * (h * w))[:, None, None, None]

    # window-cell correlations in ONE gather: idx (B, k, k, HW) over (j, i)
    cells = jnp.arange(k, dtype=jnp.int32)
    yi = oy[:, None, None, :] + cells[None, :, None, None]  # (B, k, 1, HW)
    xi = ox[:, None, None, :] + cells[None, None, :, None]  # (B, 1, k, HW)
    inb = (yi >= 0) & (yi <= h - 1) & (xi >= 0) & (xi <= w - 1)  # (B,k,k,HW)
    idx = (
        base + jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
    )  # (B, k, k, HW)
    vals = gather(src_maj, idx.reshape(-1)).reshape(c, b, k * k, h * w)
    wcorr = jnp.einsum(
        "cbp,cbep->bep", ref_maj, vals, preferred_element_type=jnp.float32,
    ) * inb.reshape(b, k * k, h * w)  # (B, k*k, HW) f32

    # dense per-candidate recombination with exact separable hat weights:
    # u_i = max(0, 1 - |fx - i|) equals the bilinear x-weight of cell i for
    # the two bracketing cells and 0 elsewhere (and v_j likewise).
    fx = gx - ox[:, None].astype(gx.dtype)  # (B, D, HW)
    fy = gy - oy[:, None].astype(gy.dtype)
    overflow = jnp.sum(
        ((fx < 0.0) | (fx > k - 1) | (fy < 0.0) | (fy > k - 1)).astype(jnp.int32)
    )
    cf = cells.astype(gx.dtype)
    u = jnp.maximum(0.0, 1.0 - jnp.abs(fx[:, None] - cf[None, :, None, None]))
    v = jnp.maximum(0.0, 1.0 - jnp.abs(fy[:, None] - cf[None, :, None, None]))
    # (B, k[i], D, HW) x (B, k[j], k[i], HW) -> contracted over (i, j)
    wc = wcorr.reshape(b, k, k, h * w)
    t = jnp.einsum("bjdp,bjip->bidp", v, wc)
    cost = jnp.einsum("bidp,bidp->bdp", u, t)
    return cost.reshape(b, d, h, w).astype(src.dtype), overflow


def _warp_pixel_coords(intrinsics, pose, depth, h, w, clamp_min_depth):
    """Shared plane-sweep projection: returns source-view pixel coords
    gx, gy of shape (B, D, HW) (plus None placeholder for symmetry)."""
    b, d = depth.shape[:2]
    dtype = depth.dtype
    xs = jnp.arange(w, dtype=dtype)
    ys = jnp.arange(h, dtype=dtype)
    mx, my = jnp.meshgrid(xs, ys)
    grid = jnp.stack([mx, my, jnp.ones_like(mx)], axis=0).reshape(3, h * w)

    k_inv = jnp.linalg.inv(intrinsics)
    points = jnp.einsum("bij,jn->bin", k_inv, grid)
    points = jnp.einsum("bij,bjn->bin", pose[:, :3, :3], points)
    points = points[:, :, None, :] * depth.reshape(b, 1, d, h * w)
    points = points + pose[:, :3, 3][:, :, None, None]
    points = jnp.einsum("bij,bjn->bin", intrinsics, points.reshape(b, 3, -1))
    points = points.reshape(b, 3, d, h * w)
    pixel = points[:, :2] / jnp.maximum(points[:, 2:3], clamp_min_depth)
    return pixel[:, 0], pixel[:, 1], None


def warp_with_pose_depth_candidates(
    feature: Array,  # (B, H, W, C) source-view features
    intrinsics: Array,  # (B, 3, 3) PIXEL-unit intrinsics (like the reference here)
    pose: Array,  # (B, 4, 4) relative pose (source_w2c @ ref_c2w)
    depth: Array,  # (B, D, H, W) depth candidates per ref pixel
    clamp_min_depth: float = 1e-3,
) -> Array:
    """Plane-sweep warp: back-project the ref pixel grid at D depths, transform
    into the source view, reproject, and bilinearly sample source features.

    Matches matching.py:24-90 (integer pixel grid, [-1,1] normalization with
    align_corners=True). Returns (B, D, H, W, C).
    """
    b, d, h, w = depth.shape

    xs = jnp.arange(w, dtype=feature.dtype)
    ys = jnp.arange(h, dtype=feature.dtype)
    gx, gy = jnp.meshgrid(xs, ys)  # (H, W)
    ones = jnp.ones_like(gx)
    grid = jnp.stack([gx, gy, ones], axis=0).reshape(3, h * w)  # (3, HW)

    k_inv = jnp.linalg.inv(intrinsics)
    points = jnp.einsum("bij,jn->bin", k_inv, grid)  # (B, 3, HW)
    points = jnp.einsum("bij,bjn->bin", pose[:, :3, :3], points)  # rotate
    points = points[:, :, None, :] * depth.reshape(b, 1, d, h * w)  # (B,3,D,HW)
    points = points + pose[:, :3, 3][:, :, None, None]
    points = jnp.einsum("bij,bjn->bin", intrinsics, points.reshape(b, 3, -1))
    points = points.reshape(b, 3, d, h * w)
    pixel = points[:, :2] / jnp.maximum(points[:, 2:3], clamp_min_depth)

    x_grid = 2.0 * pixel[:, 0] / (w - 1) - 1.0  # (B, D, HW)
    y_grid = 2.0 * pixel[:, 1] / (h - 1) - 1.0
    grid_n = jnp.stack([x_grid, y_grid], axis=-1)  # (B, D, HW, 2)

    sampled = grid_sample_bilinear(
        feature, grid_n.reshape(b, d * h, w, 2)
    )  # (B, D*H, W, C)
    return sampled.reshape(b, d, h, w, -1)
