"""Epipolar ray-segment projection (exact).

Jittable, branch-free re-derivation of the reference's epipolar_lines.py:
- ray -> image-frame intersections (`_intersect_image_coordinate` :55-104),
- min/max reduction over the four frame edges (`_compare_projections`
  :107-131),
- projections at zero/near and infinity/far depth (:185-229),
- the four-case overlap combination (:231-252), expressed with jnp.where
  instead of boolean-mask assignment,
- `lift_to_3d` / `get_depth` (:265-292).

Used by the evaluation index generator (the reference drives it from
evaluation_index_generator.py:77-90) to pick context pairs by exact
ray-overlap fractions.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from .projection import (
    get_world_rays,
    homogenize_points,
    intersect_rays,
    sample_image_grid,
)

_EPS = 1e-6


def _is_in_bounds(xy: Array) -> Array:
    return jnp.all((xy >= -_EPS) & (xy <= 1.0 + _EPS), axis=-1)


def _project_camera_space(xyz: Array, intrinsics: Array) -> Array:
    # Matches reference projection.py:47-56: divide by (z + machine-eps),
    # clamp non-finites to +-1e8, then apply the intrinsics.
    uv = xyz[..., :2] / (xyz[..., 2:3] + jnp.finfo(jnp.float32).eps)
    uv = jnp.nan_to_num(uv, posinf=1e8, neginf=-1e8)
    fx = intrinsics[..., 0, 0]
    fy = intrinsics[..., 1, 1]
    cx = intrinsics[..., 0, 2]
    cy = intrinsics[..., 1, 2]
    return jnp.stack(
        [uv[..., 0] * fx + cx, uv[..., 1] * fy + cy], axis=-1
    )


def _point_projection(xyz: Array, t: Array, intrinsics: Array):
    xy = _project_camera_space(xyz, intrinsics)
    valid = _is_in_bounds(xy) & (xyz[..., 2] > -_EPS) & (t > -_EPS)
    return t, xy, valid


def _intersect_image_coordinate(
    intrinsics: Array, origins: Array, directions: Array, dim: int, value: float
):
    """Intersection of the ray's projection with the image-frame line
    {coordinate[dim] == value} (reference epipolar_lines.py:55-104)."""
    other = 1 - dim
    fs = intrinsics[..., dim, dim]
    fo = intrinsics[..., other, other]
    cs = intrinsics[..., dim, 2]
    co = intrinsics[..., other, 2]
    os_ = origins[..., dim]
    oo = origins[..., other]
    ds = directions[..., dim]
    do = directions[..., other]
    oz = origins[..., 2]
    dz = directions[..., 2]
    c = (value - cs) / fs

    t = (c * oz - os_) / (ds - c * dz)
    coord_other = co + (fo * (oo * (c * dz - ds) + do * (os_ - c * oz))) / (
        dz * os_ - ds * oz
    )
    coord_same = jnp.full_like(coord_other, value)
    parts = [coord_same]
    parts.insert(other, coord_other)
    xy = jnp.stack(parts, axis=-1)
    xyz = origins + t[..., None] * directions
    valid = _is_in_bounds(xy) & (xyz[..., 2] > -_EPS) & (t > -_EPS)
    # NaNs (degenerate denominators) must never be selected.
    t = jnp.where(jnp.isfinite(t) & valid, t, jnp.nan)
    return t, xy, valid


def _reduce_projections(intersections, reduction: str):
    ts = jnp.stack([i[0] for i in intersections])  # (4, N)
    xys = jnp.stack([i[1] for i in intersections])
    valids = jnp.stack([i[2] for i in intersections])
    worst = jnp.inf if reduction == "min" else -jnp.inf
    keyed = jnp.where(valids & jnp.isfinite(ts), ts, worst)
    sel = jnp.argmin(keyed, axis=0) if reduction == "min" else jnp.argmax(
        keyed, axis=0
    )
    take = lambda a: jnp.take_along_axis(a, sel[None], axis=0)[0]
    return (
        take(keyed),
        jnp.take_along_axis(xys, sel[None, ..., None], axis=0)[0],
        take(valids),
    )


def project_rays(
    origins: Array,  # (N, 3) world space
    directions: Array,  # (N, 3)
    extrinsics: Array,  # (4, 4) target camera c2w
    intrinsics: Array,  # (3, 3) normalized
    near: Array | None = None,
    far: Array | None = None,
) -> dict[str, Array]:
    """Exact projection of each ray's visible segment onto the target image.

    Returns {"t_min", "t_max", "xy_min", "xy_max", "overlaps_image"}; the
    segment values are meaningless where overlaps_image is False (as in the
    reference)."""
    w2c = jnp.linalg.inv(extrinsics)
    o = jnp.einsum("ij,nj->ni", w2c, homogenize_points(origins))[..., :3]
    d = jnp.einsum("ij,nj->ni", w2c[:3, :3], directions)

    frame = [
        _intersect_image_coordinate(intrinsics, o, d, 0, 0.0),
        _intersect_image_coordinate(intrinsics, o, d, 0, 1.0),
        _intersect_image_coordinate(intrinsics, o, d, 1, 0.0),
        _intersect_image_coordinate(intrinsics, o, d, 1, 1.0),
    ]
    fmin_t, fmin_xy, fmin_valid = _reduce_projections(frame, "min")
    fmax_t, fmax_xy, fmax_valid = _reduce_projections(frame, "max")

    if near is None:
        # Projection at zero depth; rays starting at the camera use their
        # direction instead (reference :185-197).
        mask_depth_zero = o[..., 2] < _EPS
        mask_at_camera = jnp.linalg.norm(o, axis=-1) < _EPS
        o_proj = jnp.where(mask_at_camera[..., None], d, o)
        z_t, z_xy, z_valid = _point_projection(
            o_proj, jnp.zeros_like(fmin_t), intrinsics
        )
        z_valid = z_valid & ~(mask_depth_zero & ~mask_at_camera)
    else:
        near = jnp.broadcast_to(jnp.asarray(near), fmin_t.shape)
        z_t, z_xy, z_valid = _point_projection(
            o + near[..., None] * d, near, intrinsics
        )

    if far is None:
        i_t, i_xy, i_valid = _point_projection(
            d, jnp.full_like(fmax_t, jnp.inf), intrinsics
        )
    else:
        far = jnp.broadcast_to(jnp.asarray(far), fmax_t.shape)
        i_t, i_xy, i_valid = _point_projection(
            o + far[..., None] * d, far, intrinsics
        )

    # Case combination (reference :231-252): endpoints use the zero/infinity
    # projection when it's valid, else the frame intersection.
    pick = lambda c, a, b: jnp.where(c, a, b)
    t_min = pick(z_valid, z_t, fmin_t)
    xy_min = pick(z_valid[..., None], z_xy, fmin_xy)
    min_valid = pick(z_valid, z_valid, fmin_valid)
    t_max = pick(i_valid, i_t, fmax_t)
    xy_max = pick(i_valid[..., None], i_xy, fmax_xy)
    max_valid = pick(i_valid, i_valid, fmax_valid)

    return {
        "t_min": t_min,
        "t_max": t_max,
        "xy_min": xy_min,
        "xy_max": xy_max,
        "overlaps_image": min_valid & max_valid,
    }


def lift_to_3d(
    origins: Array, directions: Array, xy: Array, extrinsics: Array,
    intrinsics: Array,
) -> Array:
    """3D points on the epipolar line corresponding to image points xy
    (reference epipolar_lines.py:265-278)."""
    xy_origins, xy_directions = get_world_rays(xy, extrinsics, intrinsics)
    return intersect_rays(origins, directions, xy_origins, xy_directions)


def get_depth(
    origins: Array, directions: Array, xy: Array, extrinsics: Array,
    intrinsics: Array,
) -> Array:
    """Depths along the source rays for image points xy on the epipolar line
    (reference epipolar_lines.py:281-292)."""
    xyz = lift_to_3d(origins, directions, xy, extrinsics, intrinsics)
    return jnp.linalg.norm(xyz - origins, axis=-1)


def view_overlap(
    extrinsics_a: Array,
    intrinsics_a: Array,
    extrinsics_b: Array,
    intrinsics_b: Array,
    grid_hw: tuple[int, int] = (32, 32),
) -> Array:
    """Fraction of view A's pixel rays whose visible segment projects into
    view B (the overlap statistic the evaluation index generator thresholds,
    reference evaluation_index_generator.py:79-94)."""
    xy, _ = sample_image_grid(grid_hw)
    origins, dirs = get_world_rays(
        xy.reshape(-1, 2), extrinsics_a, intrinsics_a
    )
    out = project_rays(origins, dirs, extrinsics_b, intrinsics_b)
    return out["overlaps_image"].mean()
