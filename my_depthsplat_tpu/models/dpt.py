"""DPT decoder heads.

Two variants, mirroring the reference:
- ``DPTUpsamplerHead`` — the MultiViewUniMatch learned depth upsampler that
  fuses ViT stages with CNN/MV features and outputs a zero-init residual depth
  (src/model/encoder/unimatch/dpt_head.py:221-571).
- ``PromptDPTHead`` — the PromptDA head that injects a resized LiDAR prompt
  depth at every fusion stage through zero-init conv stacks
  (src/model/encoder/unimatch/promptda_dpt.py:230-444).

All feature maps are channels-last.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
from jax import Array

from ..ops import resize_bilinear
from .layers import Conv, ConvTranspose


class ResidualConvUnit(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        out = nn.relu(x)
        out = Conv(self.features, 3, name="conv1")(out)
        out = nn.relu(out)
        out = Conv(self.features, 3, name="conv2")(out)
        return out + x


class FeatureFusionBlock(nn.Module):
    """RefineNet-style fusion: add skip, residual conv, upsample, 1x1 out."""

    features: int

    @nn.compact
    def __call__(
        self,
        x: Array,
        skip: Array | None = None,
        size: tuple[int, int] | None = None,
        prompt_depth: Array | None = None,
    ) -> Array:
        out = x
        if skip is not None:
            out = out + ResidualConvUnit(self.features, name="res1")(skip)
        out = ResidualConvUnit(self.features, name="res2")(out)
        if prompt_depth is not None:
            # PromptDA: fuse the resized prompt via a zero-init conv stack
            # (promptda_dpt.py:257-268,286-290; align_corners=False resize).
            pd = resize_bilinear(
                prompt_depth, out.shape[-3:-1], align_corners=False
            )
            res = Conv(self.features, 3, name="depth_conv1")(pd)
            res = nn.relu(res)
            res = Conv(self.features, 3, name="depth_conv2")(res)
            res = nn.relu(res)
            res = Conv(self.features, 3, zero_init=True, name="depth_conv3")(res)
            out = out + res
        h, w = out.shape[-3:-1]
        target = (h * 2, w * 2) if size is None else size
        out = resize_bilinear(out, target, align_corners=True)
        return Conv(self.features, 1, padding=0, name="out_conv")(out)


class _Stem(nn.Module):
    """projects + resize_layers + scratch layer_rn for the 4 ViT stages."""

    out_channels: Sequence[int]
    features: int

    @nn.compact
    def __call__(self, stage_features: list[Array]) -> list[Array]:
        assert len(stage_features) == 4
        out = []
        for i, x in enumerate(stage_features):
            x = Conv(self.out_channels[i], 1, padding=0, name=f"project{i}")(x)
            if i == 0:
                x = ConvTranspose(self.out_channels[0], 4, 4, name="resize0")(x)
            elif i == 1:
                x = ConvTranspose(self.out_channels[1], 2, 2, name="resize1")(x)
            elif i == 3:
                x = Conv(self.out_channels[3], 3, stride=2, name="resize3")(x)
            out.append(x)
        return out


class DPTUpsamplerHead(nn.Module):
    """Learned depth upsampler fusing ViT/CNN/MV features + low-res depth.

    Inputs (all (B, H_s, W_s, C), channels-last):
    - vit_features: 4 stages, each at 1/8 of full resolution
    - cnn_features: [1/2, 1/4-ish, 1/8-ish] resolution high -> low
    - mv_features: single map or list (multi-scale), lowest-res transformer out
    - depth: (B, h, w, 1) at the lowest cost-volume resolution
    Output: (B, H, W, 1) residual depth at full resolution (zero-init head).
    """

    out_channels: Sequence[int]
    features: int
    downsample_factor: int = 8
    num_scales: int = 1

    @nn.compact
    def __call__(
        self,
        vit_features: list[Array],
        cnn_features: list[Array],
        mv_features: Array | list[Array],
        depth: Array,
    ) -> Array:
        layers = _Stem(self.out_channels, self.features, name="stem")(vit_features)
        layer_1, layer_2, layer_3, layer_4 = layers

        df, ns = self.downsample_factor, self.num_scales
        # Stage-wise concat+project combos (dpt_head.py:248-339,464-533).
        if df == 4 and ns == 2:
            c1 = jnp.concatenate([cnn_features[0], layer_1], -1)
            c2 = jnp.concatenate(
                [cnn_features[1], layer_2, mv_features[0], depth], -1
            )
            c3 = jnp.concatenate([cnn_features[2], layer_3, mv_features[1]], -1)
        elif df == 2 and ns == 2:
            c1 = jnp.concatenate(
                [cnn_features[0], cnn_features[1], mv_features[0], depth, layer_1],
                -1,
            )
            c2 = jnp.concatenate([cnn_features[2], layer_2, mv_features[1]], -1)
            c3 = layer_3
        elif df == 4 and ns == 1:
            c1 = jnp.concatenate([cnn_features[0], cnn_features[1], layer_1], -1)
            c2 = jnp.concatenate([cnn_features[2], layer_2, mv_features, depth], -1)
            c3 = layer_3
        else:  # df == 8, ns == 1
            c1 = jnp.concatenate([cnn_features[0], layer_1], -1)
            c2 = jnp.concatenate([cnn_features[1], layer_2], -1)
            c3 = jnp.concatenate([cnn_features[2], layer_3, mv_features, depth], -1)
        layer_1 = Conv(self.out_channels[0], 1, padding=0, name="concat_project0")(c1)
        layer_2 = Conv(self.out_channels[1], 1, padding=0, name="concat_project1")(c2)
        layer_3 = Conv(self.out_channels[2], 1, padding=0, name="concat_project2")(c3)

        l1 = Conv(self.features, 3, use_bias=False, name="layer1_rn")(layer_1)
        l2 = Conv(self.features, 3, use_bias=False, name="layer2_rn")(layer_2)
        l3 = Conv(self.features, 3, use_bias=False, name="layer3_rn")(layer_3)
        l4 = Conv(self.features, 3, use_bias=False, name="layer4_rn")(layer_4)

        p4 = FeatureFusionBlock(self.features, name="refine4")(l4, size=l3.shape[-3:-1])
        p3 = FeatureFusionBlock(self.features, name="refine3")(p4, l3, size=l2.shape[-3:-1])
        p2 = FeatureFusionBlock(self.features, name="refine2")(p3, l2, size=l1.shape[-3:-1])
        p1 = FeatureFusionBlock(self.features, name="refine1")(p2, l1)

        out = Conv(self.features // 2, 3, padding_mode="replicate", name="head0")(p1)
        out = nn.gelu(out, approximate=False)
        out = Conv(16, 3, padding_mode="replicate", name="head1")(out)
        out = nn.gelu(out, approximate=False)
        return Conv(1, 1, padding=0, zero_init=True, name="head2")(out)


class PromptDPTHead(nn.Module):
    """PromptDA depth head: prompt-depth fusion at every refinenet stage,
    sigmoid-normalized output at full (patch-padded) resolution."""

    out_channels: Sequence[int]
    features: int
    patch_size: int = 14

    @nn.compact
    def __call__(
        self,
        vit_features: list[Array],  # 4 stages at 1/patch_size resolution
        prompt_depth: Array,  # (B, hp, wp, 1) normalized to [0, 1]
    ) -> Array:
        layers = _Stem(self.out_channels, self.features, name="stem")(vit_features)
        layer_1, layer_2, layer_3, layer_4 = layers

        l1 = Conv(self.features, 3, use_bias=False, name="layer1_rn")(layer_1)
        l2 = Conv(self.features, 3, use_bias=False, name="layer2_rn")(layer_2)
        l3 = Conv(self.features, 3, use_bias=False, name="layer3_rn")(layer_3)
        l4 = Conv(self.features, 3, use_bias=False, name="layer4_rn")(layer_4)

        p4 = FeatureFusionBlock(self.features, name="refine4")(
            l4, size=l3.shape[-3:-1], prompt_depth=prompt_depth
        )
        p3 = FeatureFusionBlock(self.features, name="refine3")(
            p4, l3, size=l2.shape[-3:-1], prompt_depth=prompt_depth
        )
        p2 = FeatureFusionBlock(self.features, name="refine2")(
            p3, l2, size=l1.shape[-3:-1], prompt_depth=prompt_depth
        )
        p1 = FeatureFusionBlock(self.features, name="refine1")(
            p2, l1, prompt_depth=prompt_depth
        )

        out = Conv(self.features // 2, 3, name="out_conv1")(p1)
        gh, gw = vit_features[0].shape[-3:-1]
        out = resize_bilinear(
            out, (gh * self.patch_size, gw * self.patch_size), align_corners=True
        )
        out = Conv(32, 3, name="out_conv2_0")(out)
        out = nn.relu(out)
        out = Conv(1, 1, padding=0, name="out_conv2_1")(out)
        return nn.sigmoid(out)
