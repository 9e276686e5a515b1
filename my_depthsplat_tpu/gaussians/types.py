"""Gaussian set containers (registered JAX pytrees).

Reference analogs: src/model/types.py (Gaussians) and
src/model/encoder/common/gaussian_adapter.py:14-21 (per-view Gaussians with
scales/rotations kept for ply export).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
from jax import Array


@jax.tree_util.register_dataclass
@dataclass
class Gaussians:
    """A flat, batched set of 3D Gaussians.

    Shapes (g = number of gaussians per batch element):
    - means:       (b, g, 3) world-space centers
    - covariances: (b, g, 3, 3) world-space covariance matrices
    - harmonics:   (b, g, 3, d_sh) RGB spherical-harmonic coefficients
    - opacities:   (b, g)
    """

    means: Array
    covariances: Array
    harmonics: Array
    opacities: Array


@jax.tree_util.register_dataclass
@dataclass
class PerViewGaussians:
    """Gaussians still organized per context view, plus raw scale/rotation.

    Shapes carry the encoder's (b, v, r, srf, spp, ...) layout; scales and
    rotations are camera-frame (only used for ply export, like the reference).
    """

    means: Array
    covariances: Array
    harmonics: Array
    opacities: Array
    scales: Array
    rotations: Array

    def flattened(self) -> Gaussians:
        """Flatten (b, v, r, srf, spp, ...) -> (b, v*r*srf*spp, ...).

        Mirrors encoder_depthsplat.py:329-346.
        """
        def flat(x: Array, trailing: int) -> Array:
            lead = x.shape[: x.ndim - trailing]
            b = lead[0]
            rest = 1
            for s in lead[1:]:
                rest *= s
            return x.reshape((b, rest) + x.shape[x.ndim - trailing :])

        return Gaussians(
            means=flat(self.means, 1),
            covariances=flat(self.covariances, 2),
            harmonics=flat(self.harmonics, 2),
            opacities=flat(self.opacities, 0),
        )
