"""Quaternion -> rotation and scale/rotation -> covariance.

Reference: src/model/encoder/common/gaussians.py:8-45.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def quaternion_to_matrix(quaternions: Array, eps: float = 1e-8) -> Array:
    """xyzw quaternion (scipy order, like the reference) -> (..., 3, 3) rotation."""
    i, j, k, r = jnp.moveaxis(quaternions, -1, 0)
    two_s = 2.0 / ((quaternions * quaternions).sum(axis=-1) + eps)
    o = jnp.stack(
        [
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * r),
            two_s * (i * k + j * r),
            two_s * (i * j + k * r),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * r),
            two_s * (i * k - j * r),
            two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j),
        ],
        axis=-1,
    )
    return o.reshape(o.shape[:-1] + (3, 3))


def build_covariance(scale: Array, rotation_xyzw: Array) -> Array:
    """Sigma = R diag(s)^2 R^T for per-gaussian scale (..., 3) and quat (..., 4)."""
    rotation = quaternion_to_matrix(rotation_xyzw)
    rs = rotation * scale[..., None, :]  # R @ diag(s)
    return rs @ jnp.swapaxes(rs, -1, -2)
