"""Shared flax building blocks with torch-equivalent semantics.

Everything is channels-last (B, H, W, C).
"""

from __future__ import annotations

from typing import Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array


def instance_norm(x: Array, eps: float = 1e-5) -> Array:
    """torch nn.InstanceNorm2d defaults: no affine, no running stats.

    x: (B, H, W, C); normalize over the spatial dims per (batch, channel).
    """
    mean = x.mean(axis=(-3, -2), keepdims=True)
    var = x.var(axis=(-3, -2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


class Conv(nn.Module):
    """Conv2d with torch-style integer padding and optional replicate mode."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int | None = None  # default: same as kernel//2 when None
    dilation: int = 1
    use_bias: bool = True
    padding_mode: str = "zeros"  # or "replicate"
    zero_init: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        pad = (self.kernel_size - 1) // 2 * self.dilation if self.padding is None else self.padding
        if self.padding_mode == "replicate" and pad > 0:
            widths = [(0, 0)] * (x.ndim - 3) + [(pad, pad), (pad, pad), (0, 0)]
            x = jnp.pad(x, widths, mode="edge")
            padding = "VALID"
        else:
            padding = [(pad, pad), (pad, pad)]
        init = nn.initializers.zeros if self.zero_init else nn.initializers.lecun_normal()
        return nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=padding,
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=self.use_bias,
            kernel_init=init,
            bias_init=nn.initializers.zeros,
        )(x)


class ConvTranspose(nn.Module):
    """torch ConvTranspose2d(kernel=stride, padding=0) as used by DPT resize."""

    features: int
    kernel_size: int
    stride: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.ConvTranspose(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding="VALID",
        )(x)


class GroupNorm32(nn.Module):
    """LDM UNet 'normalization' (GroupNorm with 32 groups, eps 1e-5)."""

    channels_per_group: int | None = None
    zero_init: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        groups = (
            32 if self.channels_per_group is None else c // self.channels_per_group
        )
        groups = min(groups, c)
        scale_init = nn.initializers.zeros if self.zero_init else nn.initializers.ones
        return nn.GroupNorm(num_groups=groups, epsilon=1e-5, scale_init=scale_init)(x)


class LayerNorm(nn.Module):
    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.LayerNorm(epsilon=1e-5)(x)


class Dense(nn.Module):
    features: int
    use_bias: bool = True
    zero_init: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        init = nn.initializers.zeros if self.zero_init else nn.initializers.lecun_normal()
        return nn.Dense(self.features, use_bias=self.use_bias, kernel_init=init)(x)


class MLP(nn.Module):
    hidden: int
    out: int
    act: Callable = nn.gelu
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = Dense(self.hidden, use_bias=self.use_bias)(x)
        x = self.act(x)
        return Dense(self.out, use_bias=self.use_bias)(x)
