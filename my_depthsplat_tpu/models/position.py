"""Sine-cosine 2D positional encoding (reference: unimatch/position.py:9-50,
utils.py:165-179). Computed statically per (h, w, c); added inside attention
windows when attn_splits > 1."""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np
from jax import Array


@lru_cache(maxsize=None)
def _position_embedding_np(h: int, w: int, num_pos_feats: int) -> np.ndarray:
    """(h, w, 2*num_pos_feats) with channel order [pos_y, pos_x]."""
    temperature = 10000.0
    scale = 2 * np.pi
    eps = 1e-6
    y_embed = np.cumsum(np.ones((h, w), np.float32), axis=0)
    x_embed = np.cumsum(np.ones((h, w), np.float32), axis=1)
    y_embed = y_embed / (y_embed[-1:, :] + eps) * scale
    x_embed = x_embed / (x_embed[:, -1:] + eps) * scale

    dim_t = np.arange(num_pos_feats, dtype=np.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)

    pos_x = x_embed[:, :, None] / dim_t
    pos_y = y_embed[:, :, None] / dim_t

    def interleave(p):
        return np.stack([np.sin(p[..., 0::2]), np.cos(p[..., 1::2])], axis=-1).reshape(
            h, w, -1
        )

    return np.concatenate([interleave(pos_y), interleave(pos_x)], axis=-1)


def add_position_in_windows(
    features: Array, attn_splits: int
) -> Array:
    """features: (..., H, W, C). Adds positional encoding per window."""
    h, w, c = features.shape[-3:]
    if attn_splits > 1:
        wh, ww = h // attn_splits, w // attn_splits
        pos = jnp.asarray(
            _position_embedding_np(wh, ww, c // 2), dtype=features.dtype
        )
        # tile on DEVICE: a host tile would inline an attn_splits^2-times
        # larger literal into the program
        pos = jnp.tile(pos, (attn_splits, attn_splits, 1))
    else:
        pos = jnp.asarray(
            _position_embedding_np(h, w, c // 2), dtype=features.dtype
        )
    return features + pos
