"""ViTDet-style feature pyramid from a single feature map.

Reference: src/model/encoder/unimatch/vit_fpn.py:9-66. Note mv_unimatch builds
it with scale_factors=[2**i for i in range(num_scales)], i.e. [1, 2, ...] with
resolution low -> high in the returned list.
"""

from __future__ import annotations

import flax.linen as nn
from jax import Array

from .layers import Conv, ConvTranspose


class ViTFeaturePyramid(nn.Module):
    scale_factors: tuple[float, ...]

    @nn.compact
    def __call__(self, x: Array) -> list[Array]:
        dim = x.shape[-1]
        results = []
        for idx, scale in enumerate(self.scale_factors):
            y = x
            if scale == 4.0:
                y = ConvTranspose(dim // 2, 2, 2, name=f"s{idx}_up0")(y)
                y = nn.gelu(y, approximate=False)
                y = ConvTranspose(dim // 4, 2, 2, name=f"s{idx}_up1")(y)
                out_dim = dim // 4
            elif scale == 2.0:
                y = ConvTranspose(dim // 2, 2, 2, name=f"s{idx}_up0")(y)
                out_dim = dim // 2
            elif scale == 1.0:
                out_dim = dim
            elif scale == 0.5:
                y = nn.max_pool(y, (2, 2), strides=(2, 2))
                out_dim = dim
            else:
                raise NotImplementedError(f"scale_factor={scale}")
            if scale != 1.0:
                y = nn.gelu(y, approximate=False)
                y = Conv(out_dim, 3, name=f"s{idx}_conv")(y)
            results.append(y)
        return results
