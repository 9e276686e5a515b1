"""DINOv2-style vision transformer (monodepth backbone) in flax.

Re-design of the vendored torchhub DINOv2
(torchhub/facebookresearch_dinov2_main/vision_transformer.py:44-340): patch-14
embedding, cls token, bicubic pos-embed interpolation with the 0.1 offset
trick, pre-norm blocks with LayerScale (init 1.0, hubconf.py:29), and
``get_intermediate_layers`` with final-norm applied.

Weights are convertible 1:1 from torch checkpoints (see convert/).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import flax.linen as nn
import jax.numpy as jnp
from jax import Array

from ..ops.interpolate import resize_bicubic


@dataclass(frozen=True)
class ViTConfig:
    embed_dim: int
    depth: int
    num_heads: int
    patch_size: int = 14
    mlp_ratio: float = 4.0
    base_img_size: int = 518  # pos-embed training resolution
    layerscale_init: float = 1.0
    interpolate_offset: float = 0.1


VIT_CONFIGS: dict[str, ViTConfig] = {
    "vits": ViTConfig(embed_dim=384, depth=12, num_heads=6),
    "vitb": ViTConfig(embed_dim=768, depth=12, num_heads=12),
    "vitl": ViTConfig(embed_dim=1024, depth=24, num_heads=16),
    "vitg": ViTConfig(embed_dim=1536, depth=40, num_heads=24),
}

# Which blocks feed the DPT heads (promptda.py:10-13 / mv_unimatch.py:312-316).
INTERMEDIATE_LAYER_IDX = {
    "vits": [2, 5, 8, 11],
    "vitb": [2, 5, 8, 11],
    "vitl": [4, 11, 17, 23],
    "vitg": [9, 19, 29, 39],
}


class Attention(nn.Module):
    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, n, c = x.shape
        head_dim = c // self.num_heads
        qkv = nn.Dense(3 * c, use_bias=True, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        out = jnp.einsum(
            "bhts,bshc->bthc",
            nn.softmax(
                jnp.einsum("bthc,bshc->bhts", q, k) / head_dim**0.5, axis=-1
            ),
            v,
        )
        out = out.reshape(b, n, c)
        return nn.Dense(c, name="proj")(out)


class Block(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = self.cfg.embed_dim
        ls1 = self.param(
            "ls1", nn.initializers.constant(self.cfg.layerscale_init), (c,)
        )
        ls2 = self.param(
            "ls2", nn.initializers.constant(self.cfg.layerscale_init), (c,)
        )
        y = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        x = x + ls1 * Attention(c, self.cfg.num_heads, name="attn")(y)
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        h = nn.Dense(int(c * self.cfg.mlp_ratio), name="mlp_fc1")(y)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(c, name="mlp_fc2")(h)
        return x + ls2 * h


class DinoViT(nn.Module):
    """Forward returns selected intermediate layers (patch tokens + cls)."""

    cfg: ViTConfig

    @nn.compact
    def __call__(
        self, images: Array, layer_idx: list[int]
    ) -> list[tuple[Array, Array]]:
        """images: (B, H, W, 3) with H, W multiples of patch_size.

        Returns [(patch_tokens (B, h*w, C), cls_token (B, C)), ...] per index,
        all passed through the final LayerNorm (get_intermediate_layers
        norm=True default).
        """
        cfg = self.cfg
        b, h, w, _ = images.shape
        p = cfg.patch_size
        gh, gw = h // p, w // p

        x = nn.Conv(
            cfg.embed_dim, (p, p), strides=(p, p), padding="VALID",
            name="patch_embed",
        )(images)
        x = x.reshape(b, gh * gw, cfg.embed_dim)

        cls_token = self.param(
            "cls_token", nn.initializers.normal(1e-6), (1, 1, cfg.embed_dim)
        )
        base_grid = cfg.base_img_size // p
        pos_embed = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, base_grid * base_grid + 1, cfg.embed_dim),
        )
        x = jnp.concatenate([jnp.broadcast_to(cls_token, (b, 1, cfg.embed_dim)), x], 1)
        x = x + self._interp_pos(pos_embed, gh, gw)

        final_norm = nn.LayerNorm(epsilon=1e-6, name="norm")
        outputs = []
        want = set(layer_idx)
        for i in range(cfg.depth):
            x = Block(cfg, name=f"block_{i}")(x)
            if i in want:
                outputs.append(x)
        result = []
        for out in outputs:
            out = final_norm(out)
            result.append((out[:, 1:], out[:, 0]))
        return result

    def _interp_pos(self, pos_embed: Array, gh: int, gw: int) -> Array:
        cfg = self.cfg
        base = cfg.base_img_size // cfg.patch_size
        if (gh, gw) == (base, base):
            return pos_embed
        cls_pos = pos_embed[:, :1]
        patch_pos = pos_embed[:, 1:].reshape(1, base, base, cfg.embed_dim)
        # torch scale_factor semantics with the 0.1 anti-rounding offset
        # (vision_transformer.py:179-210; note their (w, h) axis order maps
        # h-scale to the first spatial dim here).
        sh = (gh + cfg.interpolate_offset) / base
        sw = (gw + cfg.interpolate_offset) / base
        patch_pos = resize_bicubic(patch_pos, (gh, gw), scale=(sh, sw))
        patch_pos = patch_pos.reshape(1, gh * gw, cfg.embed_dim)
        return jnp.concatenate([cls_pos, patch_pos], axis=1)


IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406])
IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225])


def normalize_imagenet(images: Array) -> Array:
    """ImageNet normalization (mv_unimatch.py:206-214, promptda.py:107).
    Dtype-preserving: the constants follow the image dtype so bf16 network
    compute (encoder.compute_dtype) isn't promoted back to f32 here."""
    return (images - IMAGENET_MEAN.astype(images.dtype)) / IMAGENET_STD.astype(
        images.dtype
    )
