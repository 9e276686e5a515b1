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


def build_covariance(scale: Array, rotation_xyzw: Array, eps: float = 1e-8) -> Array:
    """Sigma = R diag(s)^2 R^T for per-gaussian scale (..., 3) and quat (..., 4).

    Written as scalar arithmetic on (...,) component vectors: a (G, 3, 3)
    batched matmul pads its minor dims to the 128-lane tile and runs ~6x
    slower on TPU than the equivalent fused elementwise ops (PERF.md)."""
    i, j, k, r = jnp.moveaxis(rotation_xyzw, -1, 0)
    two_s = 2.0 / ((rotation_xyzw * rotation_xyzw).sum(axis=-1) + eps)
    r00 = 1 - two_s * (j * j + k * k)
    r01 = two_s * (i * j - k * r)
    r02 = two_s * (i * k + j * r)
    r10 = two_s * (i * j + k * r)
    r11 = 1 - two_s * (i * i + k * k)
    r12 = two_s * (j * k - i * r)
    r20 = two_s * (i * k - j * r)
    r21 = two_s * (j * k + i * r)
    r22 = 1 - two_s * (i * i + j * j)
    s0, s1, s2 = (scale[..., n] for n in range(3))
    m00, m01, m02 = r00 * s0, r01 * s1, r02 * s2  # rows of R @ diag(s)
    m10, m11, m12 = r10 * s0, r11 * s1, r12 * s2
    m20, m21, m22 = r20 * s0, r21 * s1, r22 * s2
    c00 = m00 * m00 + m01 * m01 + m02 * m02
    c01 = m00 * m10 + m01 * m11 + m02 * m12
    c02 = m00 * m20 + m01 * m21 + m02 * m22
    c11 = m10 * m10 + m11 * m11 + m12 * m12
    c12 = m10 * m20 + m11 * m21 + m12 * m22
    c22 = m20 * m20 + m21 * m21 + m22 * m22
    out = jnp.stack([c00, c01, c02, c01, c11, c12, c02, c12, c22], axis=-1)
    return out.reshape(out.shape[:-1] + (3, 3))
