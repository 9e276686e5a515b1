"""CNN feature pyramid (reference: src/model/encoder/unimatch/backbone.py:57-170).

3-stage residual encoder with instance norm. Stage strides give 1/2, 1/4, 1/8
resolution (or 1/2, 1/2, 1/4 when lowest_scale == 4). Channels-last.
"""

from __future__ import annotations

import flax.linen as nn
from jax import Array

from .layers import Conv, instance_norm


class ResidualBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x: Array) -> Array:
        y = Conv(self.planes, 3, self.stride, dilation=self.dilation, use_bias=False)(x)
        y = nn.relu(instance_norm(y))
        y = Conv(self.planes, 3, 1, dilation=self.dilation, use_bias=False)(y)
        y = nn.relu(instance_norm(y))
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = Conv(self.planes, 1, self.stride, padding=0)(x)
            x = instance_norm(x)
        return nn.relu(x + y)


class CNNEncoder(nn.Module):
    """Returns features at ALL three stages, resolution high -> low."""

    output_dim: int = 128
    lowest_scale: int = 8  # 8 -> strides (2,2,2); 4 -> strides (2,1,2)

    @nn.compact
    def __call__(self, x: Array) -> list[Array]:
        feature_dims = (64, 96, 128)
        out_all = []

        x = Conv(feature_dims[0], 7, 2, padding=3, use_bias=False)(x)
        x = nn.relu(instance_norm(x))

        # layer1: two residual blocks at 1/2
        x = ResidualBlock(feature_dims[0], 1)(x)
        x = ResidualBlock(feature_dims[0], 1)(x)
        out_all.append(x)

        # layer2
        stride2 = 1 if self.lowest_scale == 4 else 2
        x = ResidualBlock(feature_dims[1], stride2)(x)
        x = ResidualBlock(feature_dims[1], 1)(x)
        out_all.append(x)

        # layer3 + projection
        x = ResidualBlock(feature_dims[2], 2)(x)
        x = ResidualBlock(feature_dims[2], 1)(x)
        x = Conv(self.output_dim, 1, 1, padding=0)(x)
        out_all.append(x)

        return out_all
