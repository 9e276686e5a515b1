"""Camera projection / ray geometry in pure jnp.

Conventions (match the reference, src/geometry/projection.py:59-247):
- intrinsics are 3x3 and *normalized* by image width/height (fx, cx in units of
  image width; fy, cy in units of image height), OpenCV axes (+x right, +y down,
  +z into the screen).
- extrinsics are 4x4 camera-to-world (c2w) matrices.
- image-plane coordinates are in [0, 1]^2 with pixel centers at (i + 0.5)/n.

Everything is batched over arbitrary leading dimensions and differentiable.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import Array

_EPS = float(np.finfo(np.float32).eps)


def homogenize_points(points: Array) -> Array:
    """(..., d) xyz -> (..., d+1) xyz1."""
    return jnp.concatenate([points, jnp.ones_like(points[..., :1])], axis=-1)


def homogenize_vectors(vectors: Array) -> Array:
    """(..., d) xyz -> (..., d+1) xyz0."""
    return jnp.concatenate([vectors, jnp.zeros_like(vectors[..., :1])], axis=-1)


def transform_rigid(homogeneous: Array, transformation: Array) -> Array:
    """Apply a rigid transform: (..., i, j) @ (..., j)."""
    return jnp.einsum("...ij,...j->...i", transformation, homogeneous)


def transform_cam2world(homogeneous: Array, extrinsics: Array) -> Array:
    return transform_rigid(homogeneous, extrinsics)


def transform_world2cam(homogeneous: Array, extrinsics: Array) -> Array:
    return transform_rigid(homogeneous, jnp.linalg.inv(extrinsics))


def project_camera_space(
    points: Array,
    intrinsics: Array,
    epsilon: float = _EPS,
    infinity: float = 1e8,
) -> Array:
    """Perspective-divide camera-space points then apply intrinsics.

    Matches reference project_camera_space (projection.py:47-56), including its
    nan_to_num clamping of the post-divide values.
    """
    points = points / (points[..., -1:] + epsilon)
    points = jnp.nan_to_num(points, posinf=infinity, neginf=-infinity)
    points = jnp.einsum("...ij,...j->...i", intrinsics, points)
    return points[..., :-1]


def project(
    points: Array,
    extrinsics: Array,
    intrinsics: Array,
    epsilon: float = _EPS,
) -> tuple[Array, Array]:
    """World points -> normalized image xy + in-front-of-camera mask."""
    points = homogenize_points(points)
    points = transform_world2cam(points, extrinsics)[..., :-1]
    in_front = points[..., -1] >= 0
    return project_camera_space(points, intrinsics, epsilon=epsilon), in_front


def unproject(coordinates: Array, z: Array, intrinsics: Array) -> Array:
    """Normalized image xy + depth (along +z) -> camera-space xyz."""
    coordinates = homogenize_points(coordinates)
    directions = jnp.einsum(
        "...ij,...j->...i", jnp.linalg.inv(intrinsics), coordinates
    )
    return directions * z[..., None]


def get_world_rays(
    coordinates: Array,
    extrinsics: Array,
    intrinsics: Array,
) -> tuple[Array, Array]:
    """Normalized image xy -> world-space ray (origins, directions).

    Directions are scaled so camera-space z == 1 (NOT unit norm), matching the
    reference (projection.py:91-114) so that ``origin + direction * depth`` places
    a point at camera-space depth ``depth`` along +z.
    """
    directions = unproject(
        coordinates, jnp.ones_like(coordinates[..., 0]), intrinsics
    )
    directions = directions / directions[..., -1:]
    directions = homogenize_vectors(directions)
    directions = transform_cam2world(directions, extrinsics)[..., :-1]
    origins = jnp.broadcast_to(extrinsics[..., :-1, -1], directions.shape)
    return origins, directions


def sample_image_grid(
    shape: tuple[int, ...],
    dtype=jnp.float32,
) -> tuple[Array, Array]:
    """Pixel-center normalized coordinates + integer indices for an image grid.

    Returns (coordinates, indices):
    - coordinates: (*shape, dim) float xy-ordered, each in (0, 1), value
      (i + 0.5)/n per axis (reference projection.py:117-137).
    - indices: (*shape, dim) int ij-ordered.
    """
    indices = [jnp.arange(length) for length in shape]
    stacked_indices = jnp.stack(jnp.meshgrid(*indices, indexing="ij"), axis=-1)

    coordinates = [
        (idx.astype(dtype) + 0.5) / length for idx, length in zip(indices, shape)
    ]
    coordinates = list(reversed(coordinates))
    coordinates = jnp.stack(jnp.meshgrid(*coordinates, indexing="xy"), axis=-1)
    return coordinates, stacked_indices


def intersect_rays(
    origins_x: Array,
    directions_x: Array,
    origins_y: Array,
    directions_y: Array,
    eps: float = 1e-5,
    inf: float = 1e10,
) -> Array:
    """Least-squares intersection point of two ray bundles.

    Matches reference projection.py:176-230 but stays fully vectorized (no boolean
    gather) so it is jittable: parallel pairs yield +inf instead of being dropped.
    """
    shape = jnp.broadcast_shapes(
        origins_x.shape, directions_x.shape, origins_y.shape, directions_y.shape
    )
    origins = jnp.stack(
        [jnp.broadcast_to(origins_x, shape), jnp.broadcast_to(origins_y, shape)]
    )
    directions = jnp.stack(
        [
            jnp.broadcast_to(directions_x, shape),
            jnp.broadcast_to(directions_y, shape),
        ]
    )
    parallel = (
        jnp.einsum("...i,...i->...", directions[0], directions[1]) > 1 - eps
    )

    n = jnp.einsum("r...i,r...j->r...ij", directions, directions)
    n = n - jnp.eye(3, dtype=origins.dtype)
    lhs = n.sum(axis=0)
    rhs = jnp.einsum("r...ij,r...j->r...i", n, origins).sum(axis=0)
    # Solve via pseudo-inverse for robustness (reference uses lstsq).
    solution = jnp.einsum("...ij,...j->...i", jnp.linalg.pinv(lhs), rhs)
    return jnp.where(parallel[..., None], jnp.full_like(solution, inf), solution)


def get_fov(intrinsics: Array) -> Array:
    """Horizontal/vertical field of view from normalized intrinsics.

    Matches reference projection.py:233-247: angle between the rays through the
    midpoints of opposite image edges. Returns (..., 2) = (fov_x, fov_y).
    """
    intrinsics_inv = jnp.linalg.inv(intrinsics)

    def process(vector):
        vec = jnp.asarray(vector, dtype=intrinsics.dtype)
        vec = jnp.einsum("...ij,j->...i", intrinsics_inv, vec)
        return vec / jnp.linalg.norm(vec, axis=-1, keepdims=True)

    left = process([0.0, 0.5, 1.0])
    right = process([1.0, 0.5, 1.0])
    top = process([0.5, 0.0, 1.0])
    bottom = process([0.5, 1.0, 1.0])
    fov_x = jnp.arccos(jnp.clip((left * right).sum(axis=-1), -1.0, 1.0))
    fov_y = jnp.arccos(jnp.clip((top * bottom).sum(axis=-1), -1.0, 1.0))
    return jnp.stack([fov_x, fov_y], axis=-1)
