"""Evaluation metrics (reference: src/evaluation/metrics.py:12-52).

- PSNR: clip to [0,1], mean-squared error, -10 log10.
- SSIM: skimage structural_similarity semantics (win_size=11,
  gaussian_weights=True => sigma=1.5, data_range=1, sample covariance N-1,
  'nearest' boundary handling, border crop before averaging), computed
  per-channel and averaged. skimage itself is not available in this image, so
  the implementation follows the published algorithm directly.
- LPIPS lives in train/lpips_net.py (needs converted weights).

All images are channels-last (B, H, W, C) in [0, 1].
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np
from jax import Array


def compute_psnr(ground_truth: Array, predicted: Array) -> Array:
    gt = jnp.clip(ground_truth, 0.0, 1.0)
    pr = jnp.clip(predicted, 0.0, 1.0)
    mse = jnp.mean((gt - pr) ** 2, axis=tuple(range(1, gt.ndim)))
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))


@lru_cache(maxsize=None)
def _gaussian_kernel(win_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    r = (win_size - 1) // 2
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _filter2d_nearest(x: Array, kernel: np.ndarray) -> Array:
    """Separable 2-D filter with edge ('nearest') padding on (B, H, W, C)."""
    k = jnp.asarray(kernel)
    r = (kernel.shape[0] - 1) // 2
    x = jnp.pad(x, ((0, 0), (r, r), (r, r), (0, 0)), mode="edge")
    # filter H
    x = jnp.moveaxis(x, 1, -1)  # (B, W', C, H')
    x = _conv_last(x, k)
    x = jnp.moveaxis(x, -1, 1)
    # filter W
    x = jnp.moveaxis(x, 2, -1)
    x = _conv_last(x, k)
    return jnp.moveaxis(x, -1, 2)


def _conv_last(x: Array, k: Array) -> Array:
    """Valid 1-D correlation along the last axis via strided windows."""
    n = k.shape[0]
    out_len = x.shape[-1] - n + 1
    idx = jnp.arange(out_len)[:, None] + jnp.arange(n)[None, :]
    windows = x[..., idx]  # (..., out_len, n)
    return jnp.einsum("...ln,n->...l", windows, k)


def compute_ssim(
    ground_truth: Array,
    predicted: Array,
    win_size: int = 11,
    sigma: float = 1.5,
    data_range: float = 1.0,
    k1: float = 0.01,
    k2: float = 0.03,
) -> Array:
    """(B, H, W, C) -> (B,) mean SSIM (skimage-compatible)."""
    kernel = _gaussian_kernel(win_size, sigma)

    x, y = ground_truth, predicted
    ux = _filter2d_nearest(x, kernel)
    uy = _filter2d_nearest(y, kernel)
    uxx = _filter2d_nearest(x * x, kernel)
    uyy = _filter2d_nearest(y * y, kernel)
    uxy = _filter2d_nearest(x * y, kernel)

    # sample-covariance normalization (skimage use_sample_covariance=True)
    npts = win_size**2
    cov_norm = npts / (npts - 1)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / (
        (ux**2 + uy**2 + c1) * (vx + vy + c2)
    )
    pad = (win_size - 1) // 2
    s = s[:, pad:-pad, pad:-pad, :]
    return s.mean(axis=(1, 2, 3))
