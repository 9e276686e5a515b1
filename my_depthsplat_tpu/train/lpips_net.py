"""LPIPS perceptual metric (VGG-16 backbone + learned linear heads) in flax.

Re-implementation of the ``lpips`` package's LPIPS(net='vgg') used by the
reference (src/loss/loss_lpips.py:27-59, src/evaluation/metrics.py:22-35):
- inputs in [-1, 1], shifted/scaled by the LPIPS normalization constants
- VGG16 features at relu1_2, relu2_2, relu3_3, relu4_3, relu5_3
- channelwise unit-normalization, squared difference, 1x1 non-negative linear
  head per layer, spatial mean, summed over layers

Pretrained VGG + lpips weights are not shipped in this environment; the param
tree is 1:1 convertible from the torch package via convert/torch_weights.py.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
from jax import Array

# LPIPS input normalization buffers (lpips.LPIPS.scaling_layer).
_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)

# VGG16 conv plan: (channels, convs-per-stage); maxpool between stages.
_VGG_STAGES = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))


class _VGG16Features(nn.Module):
    @nn.compact
    def __call__(self, x: Array) -> list[Array]:
        feats = []
        for si, (c, n) in enumerate(_VGG_STAGES):
            if si > 0:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            for ci in range(n):
                x = nn.Conv(c, (3, 3), padding=[(1, 1), (1, 1)],
                            name=f"conv{si}_{ci}")(x)
                x = nn.relu(x)
            feats.append(x)
        return feats


def _unit_normalize(x: Array, eps: float = 1e-10) -> Array:
    norm = jnp.sqrt(jnp.sum(x**2, axis=-1, keepdims=True))
    return x / (norm + eps)


class LPIPS(nn.Module):
    """Returns per-image LPIPS distance. Inputs (B, H, W, 3) in [0, 1] when
    normalize=True (matching lpips forward(normalize=True)), else [-1, 1]."""

    @nn.compact
    def __call__(self, img0: Array, img1: Array, normalize: bool = True) -> Array:
        if normalize:
            img0 = img0 * 2.0 - 1.0
            img1 = img1 * 2.0 - 1.0
        shift = jnp.asarray(_SHIFT, img0.dtype)
        scale = jnp.asarray(_SCALE, img0.dtype)
        vgg = _VGG16Features(name="vgg")
        f0 = vgg((img0 - shift) / scale)
        f1 = vgg((img1 - shift) / scale)

        total = jnp.zeros(img0.shape[0], img0.dtype)
        for i, (a, b) in enumerate(zip(f0, f1)):
            d = (_unit_normalize(a) - _unit_normalize(b)) ** 2
            # 1x1 linear head with non-negative weights (lpips NetLinLayer)
            w = self.param(
                f"lin{i}",
                nn.initializers.uniform(scale=0.1),
                (d.shape[-1], 1),
            )
            dist = d @ jnp.abs(w)  # (B, H, W, 1)
            total = total + dist.mean(axis=(1, 2, 3))
        return total
