"""Pure-XLA reference renderer ("stage A" oracle).

Per-pixel alpha compositing over ALL gaussians in exact front-to-back depth
order, replicating the tile rasterizer's semantics (alpha cutoffs, 0.99 clamp,
1e-4 transmittance termination, tile-rect culling) without tiles. Memory is
bounded by scanning gaussian blocks per pixel chunk with a carried
transmittance, so it runs at any scene size — slowly. It is the correctness
oracle for the Pallas kernels and fully differentiable by autodiff.

Reference behavior being replicated: the external diff-gaussian-rasterization
CUDA kernels driven from src/model/decoder/cuda_splatting.py:46-126.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

from ..geometry import get_fov
from .camera import (
    ALPHA_MAX,
    ALPHA_MIN,
    TILE_X,
    TILE_Y,
    TRANSMITTANCE_EPS,
    scale_invariant_normalization,
)
from .projection import ScreenGaussians, project_gaussians


def _composite_chunk(
    pix_xy: Array,  # (P, 2) float pixel coords (integer centers, CUDA style)
    sg: ScreenGaussians,  # depth-sorted, padded to a multiple of block
    background: Array,  # (3,)
    block: int,
) -> Array:
    p = pix_xy.shape[0]
    g = sg.depth.shape[0]
    n_blocks = g // block

    tile_xy = (
        pix_xy // jnp.asarray([TILE_X, TILE_Y], pix_xy.dtype)
    ).astype(jnp.int32)  # (P, 2)

    def body(carry, blk):
        # p_raw: unfrozen running product (sticky termination across blocks,
        # matching CUDA's per-pixel done flag); t_frozen: transmittance at the
        # last included gaussian (background compositing).
        p_raw, t_frozen, rgb = carry  # (P,), (P,), (P, 3)
        xy, conic, color, opacity, rmin, rmax, valid = blk

        d = pix_xy[:, None, :] - xy[None, :, :]  # (P, Gb, 2)
        power = (
            -0.5
            * (conic[None, :, 0] * d[..., 0] ** 2 + conic[None, :, 2] * d[..., 1] ** 2)
            - conic[None, :, 1] * d[..., 0] * d[..., 1]
        )
        alpha = jnp.minimum(ALPHA_MAX, opacity[None, :] * jnp.exp(power))

        in_rect = (
            (tile_xy[:, None, 0] >= rmin[None, :, 0])
            & (tile_xy[:, None, 0] < rmax[None, :, 0])
            & (tile_xy[:, None, 1] >= rmin[None, :, 1])
            & (tile_xy[:, None, 1] < rmax[None, :, 1])
        )
        gate = valid[None, :] & in_rect & (power <= 0.0) & (alpha >= ALPHA_MIN)
        a = jnp.where(gate, alpha, 0.0)

        # Running transmittance with the 1e-4 early-termination rule:
        # a gaussian is composited iff the raw product *after* it stays
        # >= eps; the raw product is monotone, so termination is sticky.
        p_within = jnp.cumprod(1.0 - a, axis=1)  # (P, Gb)
        p_full = p_raw[:, None] * p_within
        p_prev = p_raw[:, None] * jnp.concatenate(
            [jnp.ones((p, 1), a.dtype), p_within[:, :-1]], axis=1
        )
        include = p_full >= TRANSMITTANCE_EPS
        weight = jnp.where(include, a * p_prev, 0.0)
        rgb = rgb + weight @ color  # (P, 3)
        # Frozen transmittance = last included p_full (non-increasing).
        t_frozen = jnp.min(
            jnp.where(include, p_full, t_frozen[:, None]), axis=1
        )
        return (p_full[:, -1], t_frozen, rgb), None

    blocks = jax.tree.map(
        lambda x: x.reshape((n_blocks, block) + x.shape[1:]),
        (sg.xy, sg.conic, sg.color, sg.opacity, sg.rect_min, sg.rect_max, sg.valid),
    )
    init = (
        jnp.ones((p,), pix_xy.dtype),
        jnp.ones((p,), pix_xy.dtype),
        jnp.zeros((p, 3), pix_xy.dtype),
    )
    (_, transmittance, rgb), _ = jax.lax.scan(body, init, blocks)
    return rgb + transmittance[:, None] * background[None, :]


def _render_single(
    extrinsics: Array,
    intrinsics: Array,
    near: Array,
    far: Array,
    background: Array,
    means: Array,
    covariances: Array,
    sh: Array,
    opacities: Array,
    image_shape: tuple[int, int],
    use_sh: bool,
    pixel_chunk: int,
    gaussian_block: int,
) -> Array:
    h, w = image_shape
    fov = get_fov(intrinsics[None])[0]
    tan_fov_x = jnp.tan(0.5 * fov[0])
    tan_fov_y = jnp.tan(0.5 * fov[1])

    sg = project_gaussians(
        extrinsics,
        means,
        covariances,
        sh,
        opacities,
        tan_fov_x,
        tan_fov_y,
        image_shape,
        use_sh,
    )

    # Depth sort (stable -> ties keep gaussian order, like the CUDA radix sort).
    order = jnp.argsort(sg.depth, stable=True)
    sg = jax.tree.map(lambda x: x[order], sg)

    # Pad gaussians to a block multiple with inert entries.
    g = sg.depth.shape[0]
    pad_g = (-g) % gaussian_block
    if pad_g:
        def pad(x):
            widths = [(0, pad_g)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, widths)

        sg = ScreenGaussians(
            xy=pad(sg.xy),
            depth=jnp.pad(sg.depth, (0, pad_g), constant_values=jnp.inf),
            conic=pad(sg.conic),
            color=pad(sg.color),
            opacity=pad(sg.opacity),
            valid=jnp.pad(sg.valid, (0, pad_g), constant_values=False),
            rect_min=pad(sg.rect_min),
            rect_max=pad(sg.rect_max),
            radius=pad(sg.radius),
        )

    # Pixel grid with integer-coordinate sample positions (CUDA convention).
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)  # (h, w)
    pix = jnp.stack([gx.ravel(), gy.ravel()], axis=-1)  # (h*w, 2)

    n = pix.shape[0]
    pad_p = (-n) % pixel_chunk
    if pad_p:
        pix = jnp.pad(pix, ((0, pad_p), (0, 0)))
    chunks = pix.reshape(-1, pixel_chunk, 2)

    rgb = jax.lax.map(
        lambda c: _composite_chunk(c, sg, background, gaussian_block), chunks
    )
    rgb = rgb.reshape(-1, 3)[:n]
    return rgb.reshape(h, w, 3)


def render_oracle(
    extrinsics: Array,  # (B, 4, 4) c2w
    intrinsics: Array,  # (B, 3, 3) normalized
    near: Array,  # (B,)
    far: Array,  # (B,)
    image_shape: tuple[int, int],
    background: Array,  # (B, 3)
    means: Array,  # (B, G, 3)
    covariances: Array,  # (B, G, 3, 3)
    sh: Array,  # (B, G, 3, d_sh)
    opacities: Array,  # (B, G)
    scale_invariant: bool = True,
    use_sh: bool = True,
    pixel_chunk: int = 1024,
    gaussian_block: int = 2048,
    return_aux: bool = False,
) -> Array:
    """Render (B, h, w, 3) images. Differentiable w.r.t. all gaussian inputs.

    The oracle composites every gaussian for every pixel — nothing is ever
    dropped, so return_aux reports num_dropped == 0 (API parity with the
    Pallas backend's instance-budget accounting)."""
    if scale_invariant:
        extrinsics, near, far, means, covariances = scale_invariant_normalization(
            extrinsics, near, far, means, covariances
        )
    gaussian_block = min(gaussian_block, means.shape[1])

    def one(e, k, n, f, bg, m, c, s, o):
        return _render_single(
            e, k, n, f, bg, m, c, s, o,
            image_shape, use_sh, pixel_chunk, gaussian_block,
        )

    image = jax.vmap(one)(
        extrinsics, intrinsics, near, far, background,
        means, covariances, sh, opacities,
    )
    if return_aux:
        return image, {"num_dropped": jnp.zeros((), jnp.int32)}
    return image
