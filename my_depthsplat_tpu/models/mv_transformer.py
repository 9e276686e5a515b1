"""Multi-view feature transformer with swin-style split-window attention.

Re-design of reference src/model/encoder/unimatch/mv_transformer.py:
- features stay (B, V, H, W, C); no list-of-views / cat-along-batch shuffling
- window split/merge are reshapes; shifted windows via jnp.roll
- cross-view attention: each view's queries attend to the other views' tokens
  (or a kNN subset through nn_idx), stacked along the key axis
- the shifted-window mask derives from a small static region-id table; the
  (L, L) additive mask itself is built on device (a host literal is multi-GB
  at large resolutions)

Semantics match the reference layer math: single-head q/k/v (no bias) + merge
+ post-LayerNorm, FFN on concat(source, message), residual adds.
"""

from __future__ import annotations

from functools import lru_cache

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
from jax import Array

from .layers import Dense


@lru_cache(maxsize=None)
def shifted_window_regions(h: int, w: int, splits: int) -> np.ndarray:
    """(K*K, L) int32 region ids per window token for shifted-window
    attention. Kept SMALL on purpose: the (K*K, L, L) additive mask is built
    on device by a traced comparison — materializing it as a host literal
    inlines a multi-GB mostly-zero constant into the program at large
    resolutions (it broke remote compiles at 512x960)."""
    wh, ww = h // splits, w // splits
    sh, sw = wh // 2, ww // 2
    img = np.zeros((h, w), np.int32)
    cnt = 0
    for hs in (slice(0, -wh), slice(-wh, -sh), slice(-sh, None)):
        for ws in (slice(0, -ww), slice(-ww, -sw), slice(-sw, None)):
            img[hs, ws] = cnt
            cnt += 1
    # split into windows: (K, wh, K, ww) -> (K*K, wh*ww)
    return img.reshape(splits, wh, splits, ww).transpose(0, 2, 1, 3).reshape(
        splits * splits, wh * ww
    )


def shifted_window_mask(h: int, w: int, splits: int, m: int = 1) -> Array:
    """(K*K, L, m*L) additive mask (0 / -100), built on device. The kv tokens
    are tiled VIEW-major (matching the reference's `attn_mask.repeat(b,1,m)`,
    mv_transformer.py:134)."""
    win = jnp.asarray(shifted_window_regions(h, w, splits))  # (KK, L)
    diff = win[:, :, None] != win[:, None, :]  # (KK, L, L) traced
    if m > 1:
        diff = jnp.tile(diff, (1, 1, m))
    return jnp.where(diff, -100.0, 0.0)


def _split_windows(x: Array, splits: int) -> Array:
    """(..., H, W, C) -> (..., K*K, wh*ww, C)."""
    *lead, h, w, c = x.shape
    wh, ww = h // splits, w // splits
    x = x.reshape(*lead, splits, wh, splits, ww, c)
    x = jnp.moveaxis(x, -3, -4)  # (..., K, K, wh, ww, C)
    return x.reshape(*lead, splits * splits, wh * ww, c)


def _merge_windows(x: Array, splits: int, h: int, w: int) -> Array:
    """(..., K*K, wh*ww, C) -> (..., H, W, C)."""
    *lead, _, _, c = x.shape
    wh, ww = h // splits, w // splits
    x = x.reshape(*lead, splits, splits, wh, ww, c)
    x = jnp.moveaxis(x, -3, -4)  # (..., K, wh, K, ww, C)
    return x.reshape(*lead, h, w, c)


def _window_attention(
    q: Array,  # (..., H, W, C)
    k: Array,  # (..., M, H, W, C)  M = number of kv views (1 for self)
    v: Array,
    splits: int,
    with_shift: bool,
) -> Array:
    *lead, h, w, c = q.shape
    m = k.shape[-4]
    if with_shift:
        wh, ww = h // splits, w // splits
        sh, sw = wh // 2, ww // 2
        q = jnp.roll(q, (-sh, -sw), axis=(-3, -2))
        k = jnp.roll(k, (-sh, -sw), axis=(-3, -2))
        v = jnp.roll(v, (-sh, -sw), axis=(-3, -2))

    qw = _split_windows(q, splits)  # (..., KK, L, C)
    kw = _split_windows(k, splits)  # (..., M, KK, L, C)
    vw = _split_windows(v, splits)
    # kv token order is (pixel-major, view-minor) — matching the reference's
    # reshape chain (mv_transformer.py:104-127). Crucially the shifted-window
    # mask is tiled VIEW-major there (`attn_mask.repeat(b, 1, m)`,
    # mv_transformer.py:134), i.e. misaligned with the kv order for m > 1; the
    # published multi-view weights were trained with exactly this layout, so
    # it is replicated bit-for-bit rather than "fixed".
    kw = jnp.moveaxis(kw, -4, -2)  # (..., KK, L, M, C)
    vw = jnp.moveaxis(vw, -4, -2)
    kk, l = qw.shape[-3], qw.shape[-2]
    kw = kw.reshape(*kw.shape[:-4], kk, m * l, c)
    vw = vw.reshape(*vw.shape[:-4], kk, m * l, c)

    scores = jnp.einsum("...lc,...sc->...ls", qw, kw) / (c**0.5)
    if with_shift:
        scores = scores + shifted_window_mask(h, w, splits, m).astype(
            scores.dtype
        )
    attn = nn.softmax(scores, axis=-1)
    out = jnp.einsum("...ls,...sc->...lc", attn, vw)
    return _merge_windows_roll_back(out, splits, h, w, with_shift)


def _merge_windows_roll_back(out, splits, h, w, with_shift):
    out = _merge_windows(out, splits, h, w)
    if with_shift:
        wh, ww = h // splits, w // splits
        out = jnp.roll(out, (wh // 2, ww // 2), axis=(-3, -2))
    return out


def _full_attention(q: Array, k: Array, v: Array) -> Array:
    """q: (..., H, W, C); k, v: (..., M, H, W, C) -> (..., H, W, C)."""
    *lead, h, w, c = q.shape
    m = k.shape[-4]
    qf = q.reshape(*lead, h * w, c)
    kf = k.reshape(*lead, m * h * w, c)
    vf = v.reshape(*lead, m * h * w, c)
    scores = jnp.einsum("...lc,...sc->...ls", qf, kf) / (c**0.5)
    attn = nn.softmax(scores, axis=-1)
    out = jnp.einsum("...ls,...sc->...lc", attn, vf)
    return out.reshape(*lead, h, w, c)


class AttentionLayer(nn.Module):
    """q/k/v projection + windowed attention + merge/norm (+ optional FFN).

    With ``ring_axis`` set, ``target`` is the full per-view feature map
    (B, V, H, W, C) — no (V, V-1) gather — and the attention core runs as a
    ring over the view-sharded mesh axis (parallel/ring.py); k/v are
    projected once per view instead of V-1 times."""

    d_model: int
    no_ffn: bool = False
    ffn_dim_expansion: int = 4
    with_shift: bool = False
    ring_axis: str | None = None

    @nn.compact
    def __call__(
        self,
        source: Array,  # (..., H, W, C)
        target: Array,  # (..., M, H, W, C); (B, V, H, W, C) if ring_axis
        attn_splits: int = 1,
    ) -> Array:
        q = Dense(self.d_model, use_bias=False, name="q_proj")(source)
        k = Dense(self.d_model, use_bias=False, name="k_proj")(target)
        v = Dense(self.d_model, use_bias=False, name="v_proj")(target)

        if self.ring_axis is not None:
            from ..parallel.ring import ring_cross_view_attention

            splits = attn_splits if attn_splits > 1 else 1
            message = ring_cross_view_attention(
                q, k, v, self.ring_axis,
                splits=splits,
                with_shift=self.with_shift and splits > 1,
            )
        elif attn_splits > 1:
            message = _window_attention(q, k, v, attn_splits, self.with_shift)
        else:
            message = _full_attention(q, k, v)

        message = Dense(self.d_model, use_bias=False, name="merge")(message)
        message = nn.LayerNorm(epsilon=1e-5, name="norm1")(message)

        if not self.no_ffn:
            message = jnp.concatenate([source, message], axis=-1)
            hidden = self.d_model * 2 * self.ffn_dim_expansion
            message = Dense(hidden, use_bias=False, name="mlp_0")(message)
            message = nn.gelu(message, approximate=False)
            message = Dense(self.d_model, use_bias=False, name="mlp_1")(message)
            message = nn.LayerNorm(epsilon=1e-5, name="norm2")(message)

        return source + message


class MultiViewTransformerBlock(nn.Module):
    d_model: int
    ffn_dim_expansion: int = 4
    with_shift: bool = False
    view_shard_axis: str | None = None

    @nn.compact
    def __call__(self, x: Array, kv_idx: Array | None, attn_splits: int) -> Array:
        """x: (B, V, H, W, C); kv_idx: (B, V, M) int gather indices or None."""
        b, v, h, w, c = x.shape

        # Cross-attention keys/values come from the other views BEFORE this
        # block's self-attention (the reference builds (q, kv) pairs per layer
        # and feeds the ORIGINAL target into cross_attn_ffn,
        # mv_transformer.py:463-499,629-643).
        x_pre = x

        # Self-attention: each view attends within itself.
        x = AttentionLayer(
            self.d_model,
            no_ffn=True,
            ffn_dim_expansion=self.ffn_dim_expansion,
            with_shift=self.with_shift,
            name="self_attn",
        )(x, x[:, :, None], attn_splits)

        # Cross-attention: kv from the other views (all V-1 or kNN subset).
        # View-sharded: skip the (V, V-1) kv gather entirely — the ring core
        # rotates each chip's k/v block with ppermute (parallel/ring.py).
        if self.view_shard_axis is not None and kv_idx is None:
            x = AttentionLayer(
                self.d_model,
                no_ffn=False,
                ffn_dim_expansion=self.ffn_dim_expansion,
                with_shift=self.with_shift,
                ring_axis=self.view_shard_axis,
                name="cross_attn_ffn",
            )(x, x_pre, attn_splits)
            return x
        if kv_idx is None:
            # all other views: build (V, V-1) static index table
            idx = np.stack([
                [j for j in range(v) if j != i] for i in range(v)
            ]).astype(np.int32)  # (V, V-1)
            kv = x_pre[:, jnp.asarray(idx)]  # (B, V, V-1, H, W, C)
        else:
            kv = _gather_views(x_pre, kv_idx)

        x = AttentionLayer(
            self.d_model,
            no_ffn=False,
            ffn_dim_expansion=self.ffn_dim_expansion,
            with_shift=self.with_shift,
            name="cross_attn_ffn",
        )(x, kv, attn_splits)
        return x


def _gather_views(x: Array, idx: Array) -> Array:
    """x: (B, V, H, W, C), idx: (B, V, M) -> (B, V, M, H, W, C)."""
    b, v, h, w, c = x.shape
    m = idx.shape[-1]
    flat = jnp.take_along_axis(
        x.reshape(b, v, -1)[:, None].repeat(v, axis=1),
        idx[..., None],
        axis=2,
    )
    return flat.reshape(b, v, m, h, w, c)


class MultiViewFeatureTransformer(nn.Module):
    """Stack of (self + cross + FFN) blocks; odd layers use shifted windows.

    Reference: MultiViewFeatureTransformer (mv_transformer.py:540-650).
    """

    num_layers: int = 6
    d_model: int = 128
    ffn_dim_expansion: int = 4
    # When set (a mesh axis name), context views are sharded over that axis
    # and cross-attention runs as a ppermute ring (parallel/ring.py) instead
    # of gathering a (V, V-1) kv tensor. Incompatible with nn_idx (kNN view
    # subsets gather across shards); the kNN path falls back to gathers.
    view_shard_axis: str | None = None

    @nn.compact
    def __call__(
        self,
        features: Array,  # (B, V, H, W, C)
        attn_splits: int = 2,
        nn_idx: Array | None = None,  # (B, V, k+1) incl. self at position 0
    ) -> Array:
        kv_idx = None if nn_idx is None else nn_idx[..., 1:]
        x = features
        for i in range(self.num_layers):
            x = MultiViewTransformerBlock(
                self.d_model,
                self.ffn_dim_expansion,
                with_shift=(i % 2 == 1),
                view_shard_axis=(
                    None if kv_idx is not None else self.view_shard_axis
                ),
                name=f"layer_{i}",
            )(x, kv_idx, attn_splits)
        return x
