"""Validation visualizations: 3-axis orthographic gaussian projections.

Reference: src/visualization/validation_in_3d.py:25-115 — renders the gaussian
set from three orthographic axes for wandb panels, using the fake-orthographic
trick of the renderer.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..gaussians.types import Gaussians
from ..render import render_orthographic


def _pose(look: np.ndarray, up: np.ndarray, center: np.ndarray) -> np.ndarray:
    right = np.cross(up, look)
    right = right / np.linalg.norm(right)
    down = np.cross(look, right)
    m = np.eye(4, dtype=np.float32)
    m[:3, 0] = right
    m[:3, 1] = down
    m[:3, 2] = look
    m[:3, 3] = center - look  # step back along the view axis
    return m


def render_projections(
    gaussians: Gaussians,
    resolution: int = 256,
    margin: float = 0.1,
    backend: str = "auto",
) -> np.ndarray:
    """(3, res, res, 3) orthographic projections along +z, +x, +y axes."""
    means = np.asarray(gaussians.means[0])
    lo = means.min(axis=0)
    hi = means.max(axis=0)
    center = (lo + hi) / 2
    extent = float((hi - lo).max()) * (1 + margin) + 1e-3

    axes = [
        (np.array([0.0, 0, 1]), np.array([0.0, -1, 0])),  # front
        (np.array([1.0, 0, 0]), np.array([0.0, -1, 0])),  # side
        (np.array([0.0, 1, 0]), np.array([0.0, 0, 1])),  # top
    ]
    views = []
    for look, up in axes:
        extr = jnp.asarray(_pose(look, up, center))[None]
        img = render_orthographic(
            extr,
            jnp.full((1,), extent),
            jnp.full((1,), extent),
            jnp.full((1,), 0.0),
            jnp.full((1,), 2 * extent),
            (resolution, resolution),
            jnp.zeros((1, 3)),
            gaussians.means,
            gaussians.covariances,
            gaussians.harmonics,
            gaussians.opacities,
            backend=backend,
        )
        views.append(np.asarray(img[0]))
    return np.stack(views)
