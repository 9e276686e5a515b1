"""Rasterizer camera setup.

Reference: src/model/decoder/cuda_splatting.py:16-43 (projection matrix) and
:63-86 (scale-invariant renorm + matrix assembly). We keep column-vector
convention throughout (p' = M @ p); the reference's transposes exist only
because the CUDA rasterizer consumes row-vector matrices.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
from jax import Array

# The CUDA rasterizer composites on pixels whose 16x16 tile intersects the
# gaussian's screen-space bounding rect. Tile size is output-invariant up to
# floating-point ordering: a larger tile only ADDS candidate instances, and
# each addition is zeroed by the kernel's alpha >= 1/255 gate (see
# expand.py's exact ellipse-tile cull note). It is therefore a pure
# performance knob: bigger tiles -> fewer instances (smaller pack-VJP
# scatter, the #1 render cost) but more per-pixel compositing work.
# Env-overridable for experiments (MDS_TILE, or MDS_TILE_X/MDS_TILE_Y for
# rectangular tiles); the default 16x16 matches the CUDA reference and the
# measured v5e optimum (PERF.md round-4 tile-size table).
def _parse_tile(name: str, fallback: str) -> int:
    raw = os.environ.get(name, os.environ.get("MDS_TILE", fallback))
    try:
        v = int(raw)
    except ValueError as e:
        raise ValueError(f"{name}={raw!r} is not an integer") from e
    # The composite kernel's pixel lanes are TILE_X*TILE_Y wide; Mosaic
    # needs that to be a multiple of the 8x128 vreg (and the CHUNK floor in
    # pallas_raster assumes it). 16x16 and 32x32 are the measured/tested
    # set; other multiple-of-8 values in [8, 64] trace but are unvalidated.
    if v < 8 or v > 64 or v % 8 != 0:
        raise ValueError(
            f"{name}={v} unsupported: tile sides must be multiples of 8 in "
            "[8, 64] (16x16 is the measured v5e optimum; 32x32 also tested)"
        )
    return v


TILE_X = _parse_tile("MDS_TILE_X", "16")
TILE_Y = _parse_tile("MDS_TILE_Y", "16")
if TILE_X * TILE_Y % 128 != 0:
    raise ValueError(
        f"MDS_TILE_X*MDS_TILE_Y = {TILE_X}*{TILE_Y} = {TILE_X * TILE_Y} "
        "must be a multiple of the 128-lane vreg width"
    )
TILE = TILE_X  # legacy alias for square-tile dev scripts
# Low-pass dilation added to the projected 2D covariance diagonal.
COV2D_DILATION = 0.3
# View-space near-culling threshold.
NEAR_CULL_Z = 0.2
ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
TRANSMITTANCE_EPS = 1e-4


def get_projection_matrix(
    near: Array, far: Array, fov_x: Array, fov_y: Array
) -> Array:
    """OpenCV-style perspective matrix: X/Y -> (-1,1), Z -> (0,1), +Z forward."""
    tan_x = jnp.tan(0.5 * fov_x)
    tan_y = jnp.tan(0.5 * fov_y)
    top = tan_y * near
    right = tan_x * near

    zeros = jnp.zeros_like(near)
    ones = jnp.ones_like(near)
    row0 = jnp.stack([near / right, zeros, zeros, zeros], axis=-1)
    row1 = jnp.stack([zeros, near / top, zeros, zeros], axis=-1)
    row2 = jnp.stack(
        [zeros, zeros, far / (far - near), -(far * near) / (far - near)], axis=-1
    )
    row3 = jnp.stack([zeros, zeros, ones, zeros], axis=-1)
    return jnp.stack([row0, row1, row2, row3], axis=-2)


def scale_invariant_normalization(
    extrinsics: Array,
    near: Array,
    far: Array,
    means: Array,
    covariances: Array,
):
    """Rescale the scene by 1/near so near becomes 1 (cuda_splatting.py:63-69)."""
    scale = 1.0 / near
    extrinsics = extrinsics.at[..., :3, 3].multiply(scale[..., None])
    covariances = covariances * (scale[..., None, None, None] ** 2)
    means = means * scale[..., None, None]
    return extrinsics, near * scale, far * scale, means, covariances
