"""Ring-sharded cross-view attention.

The multi-view transformer's cross-attention (every view's queries attend to
all other views' tokens — reference src/model/encoder/unimatch/
mv_transformer.py:60-150) gathers a (B, V, V-1, H, W, C) key/value tensor in
the single-chip path. When context views are sharded over a mesh axis (the
ICI axis on a pod slice), that gather would all-to-all the full feature map
V-1 times and materialize it on every chip.

This module computes the same attention as a ring instead: each chip holds
its V/P views' keys/values, and P ppermute steps rotate the K/V block around
the ring while a numerically-stable online softmax accumulates
(max, denominator, numerator) — flash-attention-style, but blocked over
*views* rather than sequence. Peak memory per chip stays O(V/P) and the
collective is P-1 neighbor exchanges on the ring (each overlappable with the
attention compute of the resident block by the XLA latency-hiding scheduler).

Semantics match the local path bit-for-bit up to FP reassociation, including
the reference's quirks replicated there:
- kv tokens flattened (pixel-major, view-minor) with views in ascending
  order excluding self (self-tokens are masked to -1e30 here — exact-zero
  weight after the online-softmax correction);
- the shifted-window additive mask tiled VIEW-major, i.e. deliberately
  misaligned with the kv token order (mv_transformer.py:134 in the
  reference): mask column for kv token (view j, pixel t) is
  (t*(V-1) + pos_i(j)) mod L where pos_i(j) = j - (j > i).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array
from jax.sharding import PartitionSpec as P


def _online_update(m, l, o, scores, v_tokens):
    """One flash-style accumulation step.

    m, l: (..., L, 1); o: (..., L, C); scores: (..., L, T); v_tokens:
    (..., T, C)."""
    m_new = jnp.maximum(m, jnp.max(scores, axis=-1, keepdims=True))
    corr = jnp.exp(m - m_new)
    p = jnp.exp(scores - m_new)
    l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
    o_new = o * corr + jnp.einsum("...lt,...tc->...lc", p, v_tokens)
    return m_new, l_new, o_new


def ring_cross_view_attention(
    q: Array,  # (B, V, H, W, C) — V sharded over `axis`
    k: Array,  # (B, V, H, W, C)
    v: Array,  # (B, V, H, W, C)
    axis: str,
    splits: int = 1,
    with_shift: bool = False,
    mesh=None,
) -> Array:
    """Cross-view attention (each view over all OTHER views' tokens) with the
    view axis sharded over mesh axis ``axis``. Returns (B, V, H, W, C) with
    the same sharding. Requires V % axis_size == 0."""
    from ..models.mv_transformer import (
        _merge_windows_roll_back,
        _split_windows,
        shifted_window_regions,
    )

    if mesh is None:
        mesh = jax.sharding.get_abstract_mesh()
    p_size = mesh.shape[axis]
    b, v_total, h, w, c = q.shape
    if v_total % p_size != 0:
        raise ValueError(f"V={v_total} not divisible by axis size {p_size}")
    wh, ww = h // splits, w // splits
    l_win = wh * ww
    win = (
        jnp.asarray(shifted_window_regions(h, w, splits))
        if with_shift
        else None
    )  # (KK, L)

    def local(qb: Array, kb: Array, vb: Array) -> Array:
        rank = jax.lax.axis_index(axis)
        v_loc = qb.shape[1]
        q_gid = rank * v_loc + jnp.arange(v_loc, dtype=jnp.int32)  # (Vl,)

        if with_shift:
            sh, sw = wh // 2, ww // 2
            qb = jnp.roll(qb, (-sh, -sw), axis=(-3, -2))
            kb = jnp.roll(kb, (-sh, -sw), axis=(-3, -2))
            vb = jnp.roll(vb, (-sh, -sw), axis=(-3, -2))

        qw = _split_windows(qb, splits)  # (B, Vl, KK, L, C)
        scale = 1.0 / (c**0.5)

        m = jnp.full((b, v_loc, splits * splits, l_win, 1), -jnp.inf, qb.dtype)
        l_acc = jnp.zeros_like(m)
        o = jnp.zeros((b, v_loc, splits * splits, l_win, c), qb.dtype)

        perm = [(i, (i + 1) % p_size) for i in range(p_size)]
        for s in range(p_size):
            src = (rank - s) % p_size
            kv_gid = src * v_loc + jnp.arange(v_loc, dtype=jnp.int32)
            kw = _split_windows(kb, splits)  # (B, Vl, KK, L, C)
            vw = _split_windows(vb, splits)

            # (B, Vq, KK, L, Vkv, L)
            scores = (
                jnp.einsum("bvklc,bwktc->bvklwt", qw, kw) * scale
            )
            # self-view tokens: -1e30, an exact zero after the online
            # correction (never the -inf - -inf = nan trap)
            self_mask = q_gid[:, None] == kv_gid[None, :]  # (Vq, Vkv)
            add = jnp.where(self_mask, -1e30, 0.0)[
                None, :, None, None, :, None
            ]
            if with_shift:
                # reference mask column: (t*(V-1) + pos_i(j)) mod L, where
                # pos_i(j) = j - (j > i) is j's rank among i's kv views
                pos = kv_gid[None, :] - (
                    kv_gid[None, :] > q_gid[:, None]
                ).astype(jnp.int32)  # (Vq, Vkv)
                t_idx = jnp.arange(l_win, dtype=jnp.int32)
                cols = (
                    t_idx[None, None, :] * (v_total - 1) + pos[..., None]
                ) % l_win  # (Vq, Vkv, L)
                win_c = win[:, cols]  # (KK, Vq, Vkv, L)
                mismatch = (
                    win[None, :, :, None, None]  # (1, KK, L, 1, 1)
                    != jnp.transpose(win_c, (1, 0, 2, 3))[
                        :, :, None, :, :
                    ]  # (Vq, KK, 1, Vkv, L)
                )
                add = add + jnp.where(mismatch, -100.0, 0.0)[None]
            scores = scores + add.astype(scores.dtype)

            t_total = v_loc * l_win
            # kv token order within the step is (view, pixel); the online
            # softmax is order-invariant so this needs no reconciliation
            # with the reference's global (pixel, view) order.
            scores_f = scores.reshape(b, v_loc, splits * splits, l_win, t_total)
            v_tok = jnp.moveaxis(vw, 1, -3).reshape(
                b, 1, splits * splits, t_total, c
            )
            m, l_acc, o = _online_update(m, l_acc, o, scores_f, v_tok)

            if s + 1 < p_size:
                kb = jax.lax.ppermute(kb, axis, perm)
                vb = jax.lax.ppermute(vb, axis, perm)

        out = o / l_acc
        return _merge_windows_roll_back(out, splits, h, w, with_shift)

    spec = P(None, axis)
    return jax.shard_map(
        local, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec
    )(q, k, v)
