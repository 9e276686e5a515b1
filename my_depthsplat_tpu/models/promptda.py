"""PromptDA-style prompt-depth network (the fork's active depth branch).

Re-design of src/model/encoder/unimatch/promptda.py:16-163: a frozen-DINOv2
backbone feeds a DPT decoder that fuses a low-res LiDAR depth prompt at every
fusion stage. The prompt is min-max normalized per view and the prediction is
denormalized back (promptda.py:153-163). Images are padded to a multiple of 14
with reflect padding (promptda.py:103-107).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
from jax import Array

from ..ops import resize_bilinear
from .dpt import PromptDPTHead
from .vit import INTERMEDIATE_LAYER_IDX, VIT_CONFIGS, DinoViT, normalize_imagenet

PROMPTDA_MODEL_CONFIGS = {
    # promptda.py:9-14
    "vits": {"features": 64, "out_channels": (48, 96, 192, 384)},
    "vitb": {"features": 128, "out_channels": (96, 192, 384, 768)},
    "vitl": {"features": 256, "out_channels": (256, 512, 1024, 1024)},
}


class PromptDA(nn.Module):
    vit_type: str = "vits"
    patch_size: int = 14

    @property
    def feature_out_channels(self) -> int:
        return VIT_CONFIGS[self.vit_type].embed_dim

    @nn.compact
    def __call__(
        self,
        images: Array,  # (B, V, H, W, 3) in [0, 1]
        prompt_depth: Array,  # (B, V, hp, wp) metric depth
    ) -> dict[str, Any]:
        b, v, h, w, _ = images.shape
        n = b * v
        flat = images.reshape(n, h, w, 3)
        prompt = prompt_depth.reshape(n, *prompt_depth.shape[2:], 1)

        # min-max normalize the prompt per view (promptda.py:153-160)
        mn = prompt.min(axis=(1, 2, 3), keepdims=True)
        mx = prompt.max(axis=(1, 2, 3), keepdims=True)
        prompt_n = (prompt - mn) / jnp.maximum(mx - mn, 1e-8)

        # pad to a multiple of the patch size (reflect)
        pad_h = (-h) % self.patch_size
        pad_w = (-w) % self.patch_size
        x = jnp.pad(
            flat, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode="reflect"
        )
        x = normalize_imagenet(x)
        hp, wp = h + pad_h, w + pad_w
        gh, gw = hp // self.patch_size, wp // self.patch_size

        vit_cfg = VIT_CONFIGS[self.vit_type]
        vit_layers = DinoViT(vit_cfg, name="pretrained")(
            x, INTERMEDIATE_LAYER_IDX[self.vit_type]
        )
        stage_maps = [
            tokens.reshape(n, gh, gw, -1) for tokens, _cls in vit_layers
        ]

        depth = PromptDPTHead(
            out_channels=PROMPTDA_MODEL_CONFIGS[self.vit_type]["out_channels"],
            features=PROMPTDA_MODEL_CONFIGS[self.vit_type]["features"],
            patch_size=self.patch_size,
            name="depth_head",
        )(stage_maps, prompt_n)  # (N, hp*ps, wp*ps, 1) in [0, 1]

        depth = depth * (mx - mn) + mn
        depth = depth[:, :h, :w, 0].reshape(b, v, h, w)

        # intermediate ViT features resized to FULL resolution
        # (promptda.py:122-138 — note: full res, unlike mv_unimatch's 1/8)
        feats_int = [
            resize_bilinear(f, (h, w), align_corners=True) for f in stage_maps
        ]

        return {
            "features_mono_intermediate": feats_int,  # list of (BV, H, W, C)
            "depth_preds": [depth],  # list of (B, V, H, W) metric depth
            "match_probs": None,
        }
