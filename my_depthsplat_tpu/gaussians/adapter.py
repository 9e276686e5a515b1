"""Raw per-pixel features -> world-space Gaussians.

Reference: src/model/encoder/common/gaussian_adapter.py:31-128. Functional (no
module state); all shape layout follows the reference's broadcast scheme:
leading dims are (b, v, rays, surfaces, samples-per-pixel).

Note: this framework is channels-last (NHWC) throughout — images arrive as
(b, v, h, w, 3).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax import Array

from ..geometry import get_world_rays
from .covariance import build_covariance
from .sh import RGB2SH, rotate_sh, sh_mask
from .types import PerViewGaussians


@dataclass(frozen=True)
class GaussianAdapterCfg:
    gaussian_scale_min: float
    gaussian_scale_max: float
    sh_degree: int


def d_sh(cfg: GaussianAdapterCfg) -> int:
    return (cfg.sh_degree + 1) ** 2


def d_in(cfg: GaussianAdapterCfg) -> int:
    """Raw feature width: 3 scale + 4 quat + 3*d_sh."""
    return 7 + 3 * d_sh(cfg)


def adapt_gaussians(
    cfg: GaussianAdapterCfg,
    extrinsics: Array,  # (*#batch, 4, 4) c2w
    intrinsics: Array,  # (*#batch, 3, 3) normalized
    coordinates: Array,  # (*#batch, 2) normalized image xy
    depths: Array,  # (*#batch,)
    opacities: Array,  # (*#batch,)
    raw_gaussians: Array,  # (*#batch, d_in)
    input_images: Array | None = None,  # (b, v, h, w, 3)
    eps: float = 1e-8,
) -> PerViewGaussians:
    n_sh = d_sh(cfg)
    scales = raw_gaussians[..., 0:3]
    rotations = raw_gaussians[..., 3:7]
    sh = raw_gaussians[..., 7 : 7 + 3 * n_sh]

    # Scale activation: clamp(softplus(x - 4), min, max)  (reference :62-67).
    scales = jnp.clip(
        jax.nn.softplus(scales - 4.0),
        cfg.gaussian_scale_min,
        cfg.gaussian_scale_max,
    )

    # Normalized xyzw quaternion (reference :72).
    rotations = rotations / (
        jnp.linalg.norm(rotations, axis=-1, keepdims=True) + eps
    )

    # SH masked per degree, DC seeded from the input RGB (reference :75-82).
    sh = sh.reshape(sh.shape[:-1] + (3, n_sh))
    sh = jnp.broadcast_to(sh, opacities.shape + (3, n_sh)) * sh_mask(
        cfg.sh_degree, dtype=sh.dtype
    )
    if input_images is not None:
        b, v, h, w, _ = input_images.shape
        imgs = input_images.reshape(b, v, h * w, 1, 1, 3)
        sh = sh.at[..., 0].add(RGB2SH(imgs))

    # World-space covariance (reference :84-87).
    covariances = build_covariance(scales, rotations)
    c2w_rot = extrinsics[..., :3, :3]
    covariances = c2w_rot @ covariances @ jnp.swapaxes(c2w_rot, -1, -2)

    # Means along the pixel rays (reference :89-91).
    origins, directions = get_world_rays(coordinates, extrinsics, intrinsics)
    means = origins + directions * depths[..., None]

    return PerViewGaussians(
        means=means,
        covariances=covariances,
        harmonics=rotate_sh(sh, c2w_rot[..., None, :, :]),
        opacities=opacities,
        scales=scales,
        rotations=jnp.broadcast_to(rotations, scales.shape[:-1] + (4,)),
    )
