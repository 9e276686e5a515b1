"""Epipolar ray-overlap utilities.

The reference's epipolar_lines.py:55-292 computes exact ray/image-frame
intersections to decide whether a ray drawn from one camera lands inside
another camera's image ("overlaps_image"), used by the evaluation index
generator (evaluation_index_generator.py:79-90). Here the overlap test is
computed by dense sampling along each ray (log-spaced depths), which converges
to the same overlap statistics and is trivially jittable/vmappable.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from .projection import project


def project_rays(
    origins: Array,  # (N, 3)
    directions: Array,  # (N, 3)
    extrinsics: Array,  # (4, 4) target camera c2w
    intrinsics: Array,  # (3, 3)
    near: float = 1e-2,
    far: float = 1e3,
    num_samples: int = 64,
) -> dict[str, Array]:
    """Returns {"overlaps_image": (N,) bool} — whether each ray's visible
    extent projects into the target image."""
    t = jnp.logspace(jnp.log10(near), jnp.log10(far), num_samples)
    points = origins[:, None, :] + directions[:, None, :] * t[None, :, None]
    xy, in_front = project(points, extrinsics, intrinsics)
    inside = (
        in_front
        & (xy[..., 0] >= 0.0)
        & (xy[..., 0] <= 1.0)
        & (xy[..., 1] >= 0.0)
        & (xy[..., 1] <= 1.0)
    )
    return {"overlaps_image": inside.any(axis=-1)}


def view_overlap(
    extrinsics_a: Array,
    intrinsics_a: Array,
    extrinsics_b: Array,
    intrinsics_b: Array,
    grid_hw: tuple[int, int] = (32, 32),
) -> Array:
    """Fraction of view A's pixel rays that are visible in view B."""
    from .projection import get_world_rays, sample_image_grid

    xy, _ = sample_image_grid(grid_hw)
    origins, dirs = get_world_rays(
        xy.reshape(-1, 2), extrinsics_a, intrinsics_a
    )
    out = project_rays(origins, dirs, extrinsics_b, intrinsics_b)
    return out["overlaps_image"].mean()
