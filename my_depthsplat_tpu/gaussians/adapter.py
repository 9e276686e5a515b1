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
import numpy as np
from jax import Array

from ..geometry import get_world_rays
from .covariance import build_covariance
from .sh import RGB2SH, rotate_sh, sh_mask, sh_rotation_matrices
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
    """Scalarized TPU layout: all per-gaussian math runs on (B, V, P)
    component arrays (P = pixels*surfaces*samples, the minor/lane axis) —
    arrays with small trailing dims like (..., 4) quats or (..., 3, 3)
    covariance matmuls pad their minor dim to the 128-lane tile and move up
    to 32x the bytes per elementwise op (measured ~250 ms of the 12-view
    512x960 headline before this rewrite; PERF.md round-5). Camera
    matrices, K^-1 and the per-degree SH Wigner blocks are per-VIEW scalars
    broadcast over the pixel axis. Semantics identical to
    adapt_gaussians_reference (equivalence-tested)."""
    n_sh = d_sh(cfg)
    lead = opacities.shape  # (B, V, *pixel_dims)
    b_, v_ = int(lead[0]), int(lead[1])
    p = 1
    for d in lead[2:]:
        p *= int(d)

    def fp(x: Array) -> Array:  # broadcast pixel dims -> (B, V, P)
        return jnp.broadcast_to(x, lead).reshape(b_, v_, p)

    def pv(x: Array) -> Array:  # per-view scalar (B, V) -> (B, V, 1)
        return x[..., None]

    # cameras must be per-view constants (they are: the encoder passes them
    # broadcast over singleton pixel dims) — the whole point of the
    # scalarized layout is hoisting them out of the pixel axis
    if int(np.prod(extrinsics.shape[:-2])) != b_ * v_:
        raise ValueError(
            f"adapt_gaussians expects per-view extrinsics; got "
            f"{extrinsics.shape} for batch {lead}"
        )
    if int(np.prod(intrinsics.shape[:-2])) != b_ * v_:
        raise ValueError(
            f"adapt_gaussians expects per-view intrinsics; got "
            f"{intrinsics.shape} for batch {lead}"
        )
    E = extrinsics.reshape(b_, v_, 4, 4)
    K = intrinsics.reshape(b_, v_, 3, 3)

    def raw_c(c: int) -> Array:
        return fp(jnp.broadcast_to(raw_gaussians[..., c], lead))

    # Scale activation: clamp(softplus(x - 4), min, max)  (reference :62-67).
    s0, s1, s2 = (
        jnp.clip(
            jax.nn.softplus(raw_c(c) - 4.0),
            cfg.gaussian_scale_min,
            cfg.gaussian_scale_max,
        )
        for c in range(3)
    )

    # Normalized xyzw quaternion (reference :72).
    qi, qj, qk, qr = (raw_c(3 + c) for c in range(4))
    qn = jnp.sqrt(qi * qi + qj * qj + qk * qk + qr * qr) + eps
    qi, qj, qk, qr = qi / qn, qj / qn, qk / qn, qr / qn

    # SH masked per degree, DC seeded from the input RGB (reference :75-82).
    mask_np = np.ones((n_sh,), np.float32)
    for degree in range(1, cfg.sh_degree + 1):
        mask_np[degree**2 : (degree + 1) ** 2] = 0.1 * 0.25**degree
    sh_c = [
        [raw_c(7 + ch * n_sh + m) * float(mask_np[m]) for m in range(n_sh)]
        for ch in range(3)
    ]
    if input_images is not None:
        bi, vi, hi, wi, _ = input_images.shape
        hw = hi * wi
        rep_f = p // hw
        for ch in range(3):
            a = input_images[..., ch].reshape(bi, vi, hw)
            if (bi, vi) != (b_, v_):
                a = jnp.broadcast_to(a, (b_, v_, hw))
            if rep_f > 1:
                a = jnp.repeat(a[..., None], rep_f, axis=-1).reshape(b_, v_, p)
            sh_c[ch][0] = sh_c[ch][0] + RGB2SH(a)

    # Camera-space covariance Sigma = R diag(s)^2 R^T, fused with the
    # world-frame rotation C Sigma C^T (reference :84-87 + gaussians.py:34-45)
    # as pure scalar arithmetic; symmetric by construction.
    two_s = 2.0 / (qi * qi + qj * qj + qk * qk + qr * qr + eps)
    r00 = 1 - two_s * (qj * qj + qk * qk)
    r01 = two_s * (qi * qj - qk * qr)
    r02 = two_s * (qi * qk + qj * qr)
    r10 = two_s * (qi * qj + qk * qr)
    r11 = 1 - two_s * (qi * qi + qk * qk)
    r12 = two_s * (qj * qk - qi * qr)
    r20 = two_s * (qi * qk - qj * qr)
    r21 = two_s * (qj * qk + qi * qr)
    r22 = 1 - two_s * (qi * qi + qj * qj)
    m00, m01, m02 = r00 * s0, r01 * s1, r02 * s2
    m10, m11, m12 = r10 * s0, r11 * s1, r12 * s2
    m20, m21, m22 = r20 * s0, r21 * s1, r22 * s2
    c00 = m00 * m00 + m01 * m01 + m02 * m02
    c01 = m00 * m10 + m01 * m11 + m02 * m12
    c02 = m00 * m20 + m01 * m21 + m02 * m22
    c11 = m10 * m10 + m11 * m11 + m12 * m12
    c12 = m10 * m20 + m11 * m21 + m12 * m22
    c22 = m20 * m20 + m21 * m21 + m22 * m22
    cam_cov = [[c00, c01, c02], [c01, c11, c12], [c02, c12, c22]]
    C = E[..., :3, :3]
    Cs = [[pv(C[..., i, j]) for j in range(3)] for i in range(3)]
    t = [
        [
            Cs[i][0] * cam_cov[0][k] + Cs[i][1] * cam_cov[1][k]
            + Cs[i][2] * cam_cov[2][k]
            for k in range(3)
        ]
        for i in range(3)
    ]
    w_cov = [
        [
            t[i][0] * Cs[l][0] + t[i][1] * Cs[l][1] + t[i][2] * Cs[l][2]
            for l in range(3)
        ]
        for i in range(3)
    ]

    # Means along the pixel rays (reference :89-91): K^-1 [x y 1] scaled to
    # camera z == 1, rotated to world, origin + dir * depth.
    kinv = jnp.linalg.inv(K)  # per-view (B, V, 3, 3)
    cx = fp(jnp.broadcast_to(coordinates[..., 0], lead))
    cy = fp(jnp.broadcast_to(coordinates[..., 1], lead))
    d0 = pv(kinv[..., 0, 0]) * cx + pv(kinv[..., 0, 1]) * cy + pv(kinv[..., 0, 2])
    d1 = pv(kinv[..., 1, 0]) * cx + pv(kinv[..., 1, 1]) * cy + pv(kinv[..., 1, 2])
    d2 = pv(kinv[..., 2, 0]) * cx + pv(kinv[..., 2, 1]) * cy + pv(kinv[..., 2, 2])
    dx, dy, dz = d0 / d2, d1 / d2, d2 / d2
    depth_f = fp(depths)
    mean_c = []
    for i in range(3):
        wd = (
            pv(E[..., i, 0]) * dx + pv(E[..., i, 1]) * dy
            + pv(E[..., i, 2]) * dz
        )
        mean_c.append(pv(E[..., i, 3]) + wd * depth_f)

    # SH rotation to the world frame: per-view Wigner-D blocks applied as
    # scalar multiply-adds (reference :96 + sh_rotation.py:10-31).
    blocks = sh_rotation_matrices(C, cfg.sh_degree)
    rot_sh = [[None] * n_sh for _ in range(3)]
    for ch in range(3):
        for ell in range(cfg.sh_degree + 1):
            d_ = 2 * ell + 1
            dmat = blocks[ell]
            for li in range(d_):
                acc = None
                for lj in range(d_):
                    term = pv(dmat[..., li, lj]) * sh_c[ch][ell * ell + lj]
                    acc = term if acc is None else acc + term
                rot_sh[ch][ell * ell + li] = acc

    def unflat(x: Array) -> Array:
        return x.reshape(lead)

    means = jnp.stack([unflat(m) for m in mean_c], axis=-1)
    covariances = jnp.stack(
        [unflat(w_cov[i][j]) for i in range(3) for j in range(3)], axis=-1
    ).reshape(lead + (3, 3))
    harmonics = jnp.stack(
        [
            jnp.stack([unflat(rot_sh[ch][m]) for m in range(n_sh)], axis=-1)
            for ch in range(3)
        ],
        axis=-2,
    )
    scales_out = jnp.stack([unflat(s) for s in (s0, s1, s2)], axis=-1)
    rotations_out = jnp.stack(
        [unflat(q) for q in (qi, qj, qk, qr)], axis=-1
    )
    return PerViewGaussians(
        means=means,
        covariances=covariances,
        harmonics=harmonics,
        opacities=opacities,
        scales=scales_out,
        rotations=rotations_out,
    )


def adapt_gaussians_reference(
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
    """Direct broadcast-layout transcription of the reference (the oracle
    the scalarized adapt_gaussians is equivalence-tested against)."""
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
