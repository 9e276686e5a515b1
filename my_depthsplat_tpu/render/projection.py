"""Shared screen-space gaussian preparation (projection + EWA covariance).

Replicates the per-gaussian preprocessing of the 3DGS CUDA rasterizer that the
reference drives through cuda_splatting.py:98-126: view transform, near cull,
perspective projection to pixel coordinates, EWA 2D covariance with diagonal
dilation, conic/radius computation, tile-rect bounds, and SH -> clamped color.

Used by both the XLA oracle renderer and the Pallas tile kernels so the two
paths share one definition of the math.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import Array

from ..gaussians.sh import eval_sh
from .camera import COV2D_DILATION, NEAR_CULL_Z, TILE


class ScreenGaussians(NamedTuple):
    """Per-gaussian screen-space quantities (all shape (G, ...))."""

    xy: Array  # (G, 2) pixel coords of the projected mean
    depth: Array  # (G,) view-space z (sort key); +inf for culled
    conic: Array  # (G, 3) inverse 2D covariance (a, b, c) for [[a,b],[b,c]]
    color: Array  # (G, 3)
    opacity: Array  # (G,)
    valid: Array  # (G,) bool
    rect_min: Array  # (G, 2) inclusive tile bounds (x, y)
    rect_max: Array  # (G, 2) exclusive tile bounds
    radius: Array  # (G,) float pixel radius (3 sigma)


def project_gaussians(
    extrinsics: Array,  # (4, 4) c2w, already scale-normalized if desired
    means: Array,  # (G, 3)
    covariances: Array,  # (G, 3, 3)
    sh: Array,  # (G, 3, d_sh)
    opacities: Array,  # (G,)
    tan_fov_x: Array,
    tan_fov_y: Array,
    image_shape: tuple[int, int],
    use_sh: bool,
) -> ScreenGaussians:
    h, w = image_shape
    focal_x = w / (2.0 * tan_fov_x)
    focal_y = h / (2.0 * tan_fov_y)

    w2c = jnp.linalg.inv(extrinsics)
    rot = w2c[:3, :3]

    # View-space position + near cull.
    t = jnp.einsum('gi,ji->gj', means, rot,
                   precision=jax.lax.Precision.HIGHEST) + w2c[:3, 3]
    tz = t[:, 2]
    in_front = tz > NEAR_CULL_Z
    tz_safe = jnp.where(in_front, tz, 1.0)

    # Perspective projection to pixel coordinates. The CUDA path goes through
    # NDC with the GL-style matrix then ndc2Pix(v, S) = ((v+1)*S - 1)/2; for
    # points with w!=0 this equals the direct pinhole mapping below (the 1e-7
    # w-guard only matters for culled points).
    ndc_x = t[:, 0] / tz_safe / tan_fov_x
    ndc_y = t[:, 1] / tz_safe / tan_fov_y
    pix_x = ((ndc_x + 1.0) * w - 1.0) * 0.5
    pix_y = ((ndc_y + 1.0) * h - 1.0) * 0.5
    xy = jnp.stack([pix_x, pix_y], axis=-1)

    # EWA 2D covariance: J R Sigma R^T J^T + dilation, with the CUDA frustum
    # clamp of the view-space tangent at 1.3x the half-fov.
    lim_x = 1.3 * tan_fov_x
    lim_y = 1.3 * tan_fov_y
    txz = jnp.clip(t[:, 0] / tz_safe, -lim_x, lim_x)
    tyz = jnp.clip(t[:, 1] / tz_safe, -lim_y, lim_y)
    # J rows: [fx/z, 0, -fx*x/z^2], [0, fy/z, -fy*y/z^2]
    j00 = focal_x / tz_safe
    j02 = -focal_x * txz / tz_safe
    j11 = focal_y / tz_safe
    j12 = -focal_y * tyz / tz_safe
    zeros = jnp.zeros_like(j00)
    J = jnp.stack(
        [
            jnp.stack([j00, zeros, j02], axis=-1),
            jnp.stack([zeros, j11, j12], axis=-1),
        ],
        axis=-2,
    )  # (G, 2, 3)
    JR = jnp.einsum('gij,jk->gik', J, rot,
                    precision=jax.lax.Precision.HIGHEST)  # (G, 2, 3)
    cov2d = jnp.einsum('gij,gjk,glk->gil', JR, covariances, JR,
                       precision=jax.lax.Precision.HIGHEST)  # (G, 2, 2)
    a = cov2d[:, 0, 0] + COV2D_DILATION
    b = cov2d[:, 0, 1]
    c = cov2d[:, 1, 1] + COV2D_DILATION

    det = a * c - b * b
    det_ok = det != 0.0
    det_safe = jnp.where(det_ok, det, 1.0)
    conic = jnp.stack([c / det_safe, -b / det_safe, a / det_safe], axis=-1)

    # Screen radius: 3 sigma of the larger eigenvalue (CUDA: ceil).
    mid = 0.5 * (a + c)
    lam1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(lam1))

    # Tile rect [min, max) the gaussian touches (CUDA getRect).
    grid_x = (w + TILE - 1) // TILE
    grid_y = (h + TILE - 1) // TILE
    rmin = jnp.stack(
        [
            jnp.clip(jnp.floor((pix_x - radius) / TILE).astype(jnp.int32), 0, grid_x),
            jnp.clip(jnp.floor((pix_y - radius) / TILE).astype(jnp.int32), 0, grid_y),
        ],
        axis=-1,
    )
    rmax = jnp.stack(
        [
            jnp.clip(
                jnp.floor((pix_x + radius + TILE - 1) / TILE).astype(jnp.int32),
                0,
                grid_x,
            ),
            jnp.clip(
                jnp.floor((pix_y + radius + TILE - 1) / TILE).astype(jnp.int32),
                0,
                grid_y,
            ),
        ],
        axis=-1,
    )
    touches_tiles = (rmax[:, 0] > rmin[:, 0]) & (rmax[:, 1] > rmin[:, 1])

    valid = in_front & det_ok & (radius > 0) & touches_tiles

    # Color: SH evaluated along the camera->gaussian direction, shifted by 0.5
    # and clamped at 0 (the CUDA rasterizer's convention). With use_sh=False the
    # DC slot is a precomputed color used raw.
    if use_sh:
        campos = extrinsics[:3, 3]
        dirs = means - campos
        dirs = dirs / jnp.maximum(
            jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12
        )
        degree = int(round(sh.shape[-1] ** 0.5)) - 1
        color = jnp.maximum(eval_sh(sh, dirs, degree) + 0.5, 0.0)
    else:
        color = sh[..., 0]

    depth = jnp.where(valid, tz, jnp.inf)
    return ScreenGaussians(
        xy=xy,
        depth=depth,
        conic=conic,
        color=color,
        opacity=opacities,
        valid=valid,
        rect_min=rmin,
        rect_max=rmax,
        radius=jnp.where(valid, radius, 0.0),
    )
