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
from .camera import COV2D_DILATION, NEAR_CULL_Z, TILE_X, TILE_Y


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

    # View-space position + near cull. All per-gaussian math below is written
    # as scalar arithmetic on (G,) vectors: (G, 2, 3)-shaped dot_generals pad
    # their minor dims to the 128-lane tile and run ~6x slower on TPU than
    # the equivalent fused elementwise ops.
    mx, my, mz = means[:, 0], means[:, 1], means[:, 2]
    tx_ = rot[0, 0] * mx + rot[0, 1] * my + rot[0, 2] * mz + w2c[0, 3]
    ty_ = rot[1, 0] * mx + rot[1, 1] * my + rot[1, 2] * mz + w2c[1, 3]
    tz = rot[2, 0] * mx + rot[2, 1] * my + rot[2, 2] * mz + w2c[2, 3]
    in_front = tz > NEAR_CULL_Z
    tz_safe = jnp.where(in_front, tz, 1.0)

    # Perspective projection to pixel coordinates. The CUDA path goes through
    # NDC with the GL-style matrix then ndc2Pix(v, S) = ((v+1)*S - 1)/2; for
    # points with w!=0 this equals the direct pinhole mapping below (the 1e-7
    # w-guard only matters for culled points).
    ndc_x = tx_ / tz_safe / tan_fov_x
    ndc_y = ty_ / tz_safe / tan_fov_y
    pix_x = ((ndc_x + 1.0) * w - 1.0) * 0.5
    pix_y = ((ndc_y + 1.0) * h - 1.0) * 0.5
    xy = jnp.stack([pix_x, pix_y], axis=-1)

    # EWA 2D covariance: J R Sigma R^T J^T + dilation, with the CUDA frustum
    # clamp of the view-space tangent at 1.3x the half-fov. Expanded to
    # scalar form: with J = [[j00, 0, j02], [0, j11, j12]] the two JR rows
    # are u_k = j00*rot[0,k] + j02*rot[2,k] and v_k = j11*rot[1,k] +
    # j12*rot[2,k], and cov2d = [[u S u, u S v], [., v S v]].
    lim_x = 1.3 * tan_fov_x
    lim_y = 1.3 * tan_fov_y
    txz = jnp.clip(tx_ / tz_safe, -lim_x, lim_x)
    tyz = jnp.clip(ty_ / tz_safe, -lim_y, lim_y)
    j00 = focal_x / tz_safe
    j02 = -focal_x * txz / tz_safe
    j11 = focal_y / tz_safe
    j12 = -focal_y * tyz / tz_safe
    u0 = j00 * rot[0, 0] + j02 * rot[2, 0]
    u1 = j00 * rot[0, 1] + j02 * rot[2, 1]
    u2 = j00 * rot[0, 2] + j02 * rot[2, 2]
    v0 = j11 * rot[1, 0] + j12 * rot[2, 0]
    v1 = j11 * rot[1, 1] + j12 * rot[2, 1]
    v2 = j11 * rot[1, 2] + j12 * rot[2, 2]
    s00 = covariances[:, 0, 0]
    s01 = covariances[:, 0, 1]
    s02 = covariances[:, 0, 2]
    s11 = covariances[:, 1, 1]
    s12 = covariances[:, 1, 2]
    s22 = covariances[:, 2, 2]
    su0 = s00 * u0 + s01 * u1 + s02 * u2  # (S u)_k
    su1 = s01 * u0 + s11 * u1 + s12 * u2
    su2 = s02 * u0 + s12 * u1 + s22 * u2
    sv0 = s00 * v0 + s01 * v1 + s02 * v2  # (S v)_k
    sv1 = s01 * v0 + s11 * v1 + s12 * v2
    sv2 = s02 * v0 + s12 * v1 + s22 * v2
    a = u0 * su0 + u1 * su1 + u2 * su2 + COV2D_DILATION
    b = u0 * sv0 + u1 * sv1 + u2 * sv2
    c = v0 * sv0 + v1 * sv1 + v2 * sv2 + COV2D_DILATION

    det = a * c - b * b
    det_ok = det != 0.0
    det_safe = jnp.where(det_ok, det, 1.0)
    conic = jnp.stack([c / det_safe, -b / det_safe, a / det_safe], axis=-1)

    # Screen radius: 3 sigma of the larger eigenvalue (CUDA: ceil).
    mid = 0.5 * (a + c)
    lam1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(lam1))

    # Tile rect [min, max) the gaussian touches (CUDA getRect).
    grid_x = (w + TILE_X - 1) // TILE_X
    grid_y = (h + TILE_Y - 1) // TILE_Y
    rmin = jnp.stack(
        [
            jnp.clip(jnp.floor((pix_x - radius) / TILE_X).astype(jnp.int32), 0, grid_x),
            jnp.clip(jnp.floor((pix_y - radius) / TILE_Y).astype(jnp.int32), 0, grid_y),
        ],
        axis=-1,
    )
    rmax = jnp.stack(
        [
            jnp.clip(
                jnp.floor((pix_x + radius + TILE_X - 1) / TILE_X).astype(jnp.int32),
                0,
                grid_x,
            ),
            jnp.clip(
                jnp.floor((pix_y + radius + TILE_Y - 1) / TILE_Y).astype(jnp.int32),
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
