"""Diffusion-style UNet used as the cost-volume regressor.

Re-design of reference src/model/encoder/unimatch/ldm_unet/unet.py:610-1156 in
the configuration DepthSplat actually uses (dims=2, no time embedding —
emb=None at :1105 — prenorm, conv up/downsample, cross-view self-attention at
the configured downsampling rates). Input/outputs are (B, V, H, W, C): convs
fold views into batch; attention concatenates all views' tokens
(QKVAttentionLegacy with use_cross_view_self_attn, unet.py:541-569), which is
where the views exchange information.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
from jax import Array

from ..ops import resize_nearest
from .layers import Conv, GroupNorm32


class ResBlock(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = GroupNorm32(name="in_norm")(x)
        h = nn.silu(h)
        h = Conv(self.out_channels, 3, name="in_conv")(h)
        h = GroupNorm32(name="out_norm")(h)
        h = nn.silu(h)
        h = Conv(self.out_channels, 3, zero_init=True, name="out_conv")(h)
        if x.shape[-1] != self.out_channels:
            x = Conv(self.out_channels, 1, padding=0, name="skip")(x)
        return x + h


class CrossViewAttentionBlock(nn.Module):
    """Self-attention over the concatenated tokens of all views."""

    num_head_channels: int = 32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, v, h, w, c = x.shape
        heads = max(c // self.num_head_channels, 1)
        ch = c // heads

        y = GroupNorm32(name="norm")(x)
        qkv = Conv(3 * c, 1, padding=0, name="qkv")(y)  # (B, V, H, W, 3C)
        # tokens: all views concatenated -> (B, heads, V*H*W, 3ch)
        qkv = qkv.reshape(b, v * h * w, 3, heads, ch)
        q = qkv[:, :, 0].transpose(0, 2, 1, 3)  # (B, heads, T, ch)
        k = qkv[:, :, 1].transpose(0, 2, 1, 3)
        vv = qkv[:, :, 2].transpose(0, 2, 1, 3)
        scale = 1.0 / jnp.sqrt(jnp.sqrt(jnp.asarray(ch, x.dtype)))
        scores = jnp.einsum("bhtc,bhsc->bhts", q * scale, k * scale)
        attn = nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhts,bhsc->bhtc", attn, vv)
        out = out.transpose(0, 2, 1, 3).reshape(b, v, h, w, c)
        out = Conv(c, 1, padding=0, zero_init=True, name="proj_out")(out)
        return x + out


class ConditionCrossAttentionBlock(nn.Module):
    """External-conditioning block (reference ldm_unet/cross_attention.py:
    CrossAttention :23-61 + UNetCrossAttentionBlock :64-160): per-view
    cross-attention from the UNet's spatial tokens (queries) to a condition
    token sequence (keys/values), added residually. ``concat_condition``
    selects the reference's no_cross_attn path: bilinear-resize the condition
    map and fuse with a 1x1 (or 3x3) conv. The reference runs the attention
    through xformers memory_efficient_attention; here it is a fused jnp
    attention (same math)."""

    dim: int = 256
    num_heads: int = 4
    concat_condition: bool = False
    concat_conv3x3: bool = False
    with_norm: bool = False

    @nn.compact
    def __call__(self, x: Array, cond: Array) -> Array:
        b, v, hh, ww, c = x.shape
        if self.concat_condition:
            # cond: (B, V, Hc, Wc, Cc) map, resized to the feature resolution
            from ..ops import resize_bilinear

            if cond.shape[2:4] != (hh, ww):
                cond = resize_bilinear(cond, (hh, ww), align_corners=True)
            fused = jnp.concatenate([x, cond], axis=-1)
            k = 3 if self.concat_conv3x3 else 1
            return Conv(c, k, padding=k // 2, name="proj")(fused)

        # cond: (B, V, T, Cc) token sequence
        tokens = x.reshape(b * v, hh * ww, c)
        cond_t = cond.reshape(b * v, cond.shape[-2], cond.shape[-1])
        ch = self.dim // self.num_heads
        q = nn.Dense(self.dim, use_bias=False, name="q")(tokens)
        kv = nn.Dense(2 * self.dim, use_bias=False, name="kv")(cond_t)
        q = q.reshape(b * v, -1, self.num_heads, ch)
        kv = kv.reshape(b * v, -1, 2, self.num_heads, ch)
        k, vv = kv[:, :, 0], kv[:, :, 1]
        scores = jnp.einsum("bthc,bshc->bhts", q, k) / jnp.sqrt(
            jnp.asarray(ch, x.dtype)
        )
        attn = nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhts,bshc->bthc", attn, vv).reshape(
            b * v, -1, self.dim
        )
        out = nn.Dense(c, use_bias=False, name="proj")(out)
        if self.with_norm:
            out = nn.LayerNorm(name="norm1")(out)
        return x + out.reshape(b, v, hh, ww, c)


class UNetModel(nn.Module):
    model_channels: int
    out_channels: int
    num_res_blocks: int = 1
    attention_resolutions: Sequence[int] = (4,)
    channel_mult: Sequence[int] = (1, 1, 1)
    num_head_channels: int = 32
    use_cross_view_self_attn: bool = True
    # External-conditioning path (reference unet.py:673-683,797-803): a
    # ConditionCrossAttentionBlock after every attention site when a
    # ``context`` is passed.
    cross_attn_condition: bool = False
    concat_condition: bool = False
    cross_attn_dim: int = 256
    cross_attn_with_norm: bool = False

    @nn.compact
    def __call__(self, x: Array, context: Array | None = None) -> Array:
        """x: (B, V, H, W, C_in) -> (B, V, H, W, out_channels).

        context: optional condition for ``cross_attn_condition`` — token
        sequence (B, V, T, Cc), or a spatial map (B, V, Hc, Wc, Cc) with
        ``concat_condition``."""
        attn_res = set(self.attention_resolutions)
        assert (context is not None) == self.cross_attn_condition

        def maybe_attn(h, ds, name):
            if ds in attn_res and self.use_cross_view_self_attn:
                h = CrossViewAttentionBlock(
                    self.num_head_channels, name=name
                )(h)
            elif ds in attn_res:
                # per-view attention (views folded in batch)
                b, v, hh, ww, c = h.shape
                out = CrossViewAttentionBlock(self.num_head_channels, name=name)(
                    h.reshape(b * v, 1, hh, ww, c)
                )
                h = out.reshape(b, v, hh, ww, c)
            if ds in attn_res and self.cross_attn_condition:
                h = ConditionCrossAttentionBlock(
                    dim=self.cross_attn_dim,
                    concat_condition=self.concat_condition,
                    with_norm=self.cross_attn_with_norm,
                    name=f"{name}_cond",
                )(h, context)
            return h

        hs = []
        h = Conv(self.model_channels, 3, name="conv_in")(x)
        hs.append(h)
        ds = 1
        blk = 0
        for level, mult in enumerate(self.channel_mult):
            for _ in range(self.num_res_blocks):
                h = ResBlock(mult * self.model_channels, name=f"in_res{blk}")(h)
                h = maybe_attn(h, ds, f"in_attn{blk}")
                hs.append(h)
                blk += 1
            if level != len(self.channel_mult) - 1:
                h = Conv(h.shape[-1], 3, stride=2, name=f"down{level}")(h)
                hs.append(h)
                ds *= 2

        h = ResBlock(h.shape[-1], name="mid_res0")(h)
        h = ResBlock(h.shape[-1], name="mid_res1")(h)

        blk = 0
        for level, mult in reversed(list(enumerate(self.channel_mult))):
            for i in range(self.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                h = ResBlock(mult * self.model_channels, name=f"out_res{blk}")(h)
                h = maybe_attn(h, ds, f"out_attn{blk}")
                if level and i == self.num_res_blocks:
                    b, v, hh, ww, c = h.shape
                    h = resize_nearest(h, (hh * 2, ww * 2))
                    h = Conv(c, 3, name=f"up{level}")(h)
                    ds //= 2
                blk += 1

        h = GroupNorm32(name="out_norm")(h)
        h = nn.silu(h)
        return Conv(self.out_channels, 3, zero_init=True, name="out_conv")(h)
