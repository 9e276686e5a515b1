"""Torch-exact image resizing as static interpolation matrices.

The reference leans on F.interpolate with align_corners=True everywhere
(e.g. mv_unimatch.py:307-337,535-560, dpt_head fusion blocks) and
align_corners=False for the prompt-depth resize (promptda_dpt.py:287-288), plus
'nearest' in the LDM UNet up/down sampling. Exact parity of these semantics is
one of the ranked hard parts (SURVEY.md §7).

TPU-first design: output sizes are static under jit, so each 1-D resample is a
constant (out, in) interpolation matrix applied with einsum — the whole resize
becomes two small matmuls that XLA fuses and runs on the MXU, instead of
gather chains.

Layout: channels-last (..., H, W, C).
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np
from jax import Array


@lru_cache(maxsize=None)
def _linear_matrix(n_in: int, n_out: int, align_corners: bool) -> np.ndarray:
    """(n_out, n_in) bilinear resample matrix with torch semantics."""
    m = np.zeros((n_out, n_in), dtype=np.float32)
    if n_in == 1:
        m[:, 0] = 1.0
        return m
    for i in range(n_out):
        if align_corners:
            src = i * (n_in - 1) / (n_out - 1) if n_out > 1 else 0.0
        else:
            src = (i + 0.5) * n_in / n_out - 0.5
        src = min(max(src, 0.0), n_in - 1)
        lo = int(np.floor(src))
        hi = min(lo + 1, n_in - 1)
        w_hi = src - lo
        m[i, lo] += 1.0 - w_hi
        m[i, hi] += w_hi
    return m


@lru_cache(maxsize=None)
def _cubic_matrix(n_in: int, n_out: int, scale: float | None = None) -> np.ndarray:
    """(n_out, n_in) bicubic matrix, torch align_corners=False, a=-0.75.

    When ``scale`` is given, mimics torch's scale_factor semantics
    (src = (dst + 0.5)/scale - 0.5 with the given scale, used by DINOv2's
    pos-embed interpolation); otherwise scale = n_out / n_in.
    """
    a = -0.75

    def kernel(t: np.ndarray) -> np.ndarray:
        t = np.abs(t)
        return np.where(
            t <= 1,
            (a + 2) * t**3 - (a + 3) * t**2 + 1,
            np.where(t < 2, a * t**3 - 5 * a * t**2 + 8 * a * t - 4 * a, 0.0),
        )

    s = (n_out / n_in) if scale is None else scale
    m = np.zeros((n_out, n_in), dtype=np.float64)
    for i in range(n_out):
        src = (i + 0.5) / s - 0.5
        base = int(np.floor(src))
        for k in range(-1, 3):
            idx = base + k
            w = kernel(src - idx)
            m[i, int(np.clip(idx, 0, n_in - 1))] += w
    return m.astype(np.float32)


@lru_cache(maxsize=None)
def _nearest_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) nearest resample matrix (torch 'nearest': floor(i*in/out))."""
    m = np.zeros((n_out, n_in), dtype=np.float32)
    idx = np.minimum((np.arange(n_out) * n_in // n_out), n_in - 1)
    m[np.arange(n_out), idx] = 1.0
    return m


def _apply_separable(x: Array, mh: np.ndarray, mw: np.ndarray) -> Array:
    mh = jnp.asarray(mh, dtype=x.dtype)
    mw = jnp.asarray(mw, dtype=x.dtype)
    x = jnp.einsum("oh,...hwc->...owc", mh, x)
    return jnp.einsum("ow,...hwc->...hoc", mw, x)


def resize_bilinear(
    x: Array, size: tuple[int, int], align_corners: bool = True
) -> Array:
    """Resize (..., H, W, C) to (..., size[0], size[1], C), torch-bilinear."""
    h_in, w_in = x.shape[-3], x.shape[-2]
    h_out, w_out = size
    if (h_in, w_in) == (h_out, w_out):
        return x
    return _apply_separable(
        x,
        _linear_matrix(h_in, h_out, align_corners),
        _linear_matrix(w_in, w_out, align_corners),
    )


def resize_bicubic(
    x: Array,
    size: tuple[int, int],
    scale: tuple[float, float] | None = None,
) -> Array:
    """Resize (..., H, W, C) with torch bicubic (align_corners=False) semantics.

    ``scale`` overrides the implied scale factors (DINOv2 pos-embed
    interpolation passes explicit scale_factor, vision_transformer.py:179-210).
    """
    h_in, w_in = x.shape[-3], x.shape[-2]
    h_out, w_out = size
    return _apply_separable(
        x,
        _cubic_matrix(h_in, h_out, None if scale is None else scale[0]),
        _cubic_matrix(w_in, w_out, None if scale is None else scale[1]),
    )


def resize_nearest(x: Array, size: tuple[int, int]) -> Array:
    """Resize (..., H, W, C), torch 'nearest' semantics (UNet up/downsample)."""
    h_in, w_in = x.shape[-3], x.shape[-2]
    h_out, w_out = size
    if (h_in, w_in) == (h_out, w_out):
        return x
    return _apply_separable(
        x, _nearest_matrix(h_in, h_out), _nearest_matrix(w_in, w_out)
    )
