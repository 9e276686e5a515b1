"""MultiViewUniMatch depth network (the published DepthSplat depth branch).

Re-design of src/model/encoder/unimatch/mv_unimatch.py:18-589 for TPU:
- all tensors stay (B, V, ...) channels-last; no list-of-views shuffling and no
  runtime `set_num_views` patching (the view count is a real array dimension)
- plane-sweep warping is a vmapped bilinear gather (ops/grid_sample) — the
  cost-volume mean over source views is the natural psum axis when views are
  sharded (SURVEY.md §2.4)
- coarse-to-fine inverse-depth refinement with static per-scale shapes

Inverse-depth convention: ``min_depth`` = 1/far, ``max_depth`` = 1/near, both
(B, V); candidates ascend from far to near like the reference.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from ..ops import (
    plane_sweep_correlation,
    plane_sweep_correlation_window,
    resize_bilinear,
    warp_with_pose_depth_candidates,
)
from .backbone import CNNEncoder
from .dpt import DPTUpsamplerHead
from .layers import Conv
from .ldm_unet import UNetModel
from .mv_transformer import MultiViewFeatureTransformer
from .position import add_position_in_windows
from .vit import INTERMEDIATE_LAYER_IDX, VIT_CONFIGS, DinoViT, normalize_imagenet

DPT_MODEL_CONFIGS = {
    # dpt upsampler channel plan per vit type (mv_unimatch.py:180-197)
    "vits": {"features": 32, "out_channels": (48, 96, 192, 384)},
    "vitb": {"features": 48, "out_channels": (96, 192, 384, 768)},
    "vitl": {"features": 64, "out_channels": (128, 256, 512, 1024)},
}


def _other_view_indices(v: int) -> np.ndarray:
    return np.stack(
        [[j for j in range(v) if j != i] for i in range(v)]
    ).astype(np.int32)


def sweep_correlation_flat(
    src: Array,  # (N, h, w, C)
    ref: Array,  # (N, h, w, C)
    intr: Array,  # (N, 3, 3) pixel intrinsics
    pose: Array,  # (N, 4, 4) ref -> source
    inv_depth_cand: Array,  # (N, D, h, w) INVERSE depth candidates
    gather_dtype=None,
) -> Array:
    """Fused plane-sweep warp + correlation (NOT /sqrt(C)) for flattened
    (batch*view*source) groups; candidates arrive as inverse depths (the
    cost-volume convention here). Feature-major gathers — the warped feature
    tensor never materializes (ops/grid_sample.py:plane_sweep_correlation)."""
    return plane_sweep_correlation(
        src, ref, intr, pose, 1.0 / inv_depth_cand, gather_dtype=gather_dtype
    )


def gather_source_views(x: Array, idx: Array) -> Array:
    """x: (B, V, ...), idx: (B, V, M) -> (B, V, M, ...)."""
    b, v = x.shape[:2]
    m = idx.shape[-1]
    trailing = x.shape[2:]
    flat = x.reshape(b, v, -1)
    out = jnp.take_along_axis(flat[:, None].repeat(v, 1), idx[..., None], axis=2)
    return out.reshape(b, v, m, *trailing)


class MultiViewUniMatch(nn.Module):
    num_scales: int = 1
    feature_channels: int = 128
    upsample_factor: int = 8
    lowest_feature_resolution: int = 8
    num_transformer_layers: int = 6
    num_depth_candidates: int = 128
    vit_type: str = "vits"
    unet_channels: int = 128
    unet_channel_mult: tuple[int, ...] = (1, 1, 1)
    unet_num_res_blocks: int = 1
    unet_attn_resolutions: tuple[int, ...] = (4,)
    # When set (a mesh axis name, used inside jax.sharding.use_mesh), the
    # plane-sweep depth-candidate axis is sharded over that axis: each chip
    # warps and correlates a slice of the D hypotheses (SURVEY.md §2.4 — the
    # cost volume is the natural ICI-sharded dimension).
    spmd_depth_axis: str | None = None
    # When set, context views are sharded over that mesh axis and the
    # multi-view transformer's cross-attention runs as a ppermute ring
    # (parallel/ring.py) — no (V, V-1) kv gather. Requires V divisible by
    # the axis size and nn_idx=None.
    spmd_view_axis: str | None = None
    # Peak bytes allowed for the plane-sweep warped-features tensor
    # (B*V*M, D, h, w, C). Beyond this the sweep runs as a lax.scan over
    # depth-candidate chunks, correlating each chunk immediately — same
    # math, O(D/chunks) memory (12-view 512x960 would otherwise need ~12 GB
    # of warped features + a 24 GB gather-index tensor and OOM a 16 GB
    # chip). Ignored when spmd_depth_axis shards D across chips.
    plane_sweep_max_bytes: int = 2 * 1024**3
    # When the flat (C, BVM*hw) gather table exceeds this, the sweep scans
    # over (view, source) pairs so each step's table is ONE pair's source
    # features. Measured on v5e: gathers from a >16 MB table run ~11 ns/index
    # vs ~2.5-4 ns when the table is cache-resident — a 3-4x sweep speedup at
    # 12-view 512x960, bit-identical math (each pair's gather/dot is
    # independent).
    sweep_table_cache_bytes: int = 8 * 1024**2
    # "window" evaluates the refinement scales' (scale_idx > 0) banded
    # candidates from per-pixel window correlations
    # (ops.plane_sweep_correlation_window): window^2 feature gathers per
    # pixel instead of 4*D, exact while the band's bilinear taps fit the
    # window (out-of-window taps contribute zero and are counted in
    # results["sweep_window_overflow"]). "gather" (default) is the
    # reference-exact per-tap path at any band width.
    sweep_mode: str = "gather"
    sweep_window: int = 6
    # In window mode, also evaluate scale 0's uniform candidates from window
    # correlations by splitting D into this many contiguous groups (each
    # group's candidates span ~1/groups of the full disparity range, so a
    # small window covers them). 0 keeps scale 0 on the gather path.
    sweep_window_groups_scale0: int = 0
    # "bfloat16" rounds the features feeding the plane-sweep gather + dot to
    # bf16 (f32 weights/accumulation): the gather is byte-bound on TPU, so
    # this halves the sweep's dominant cost at ~1e-3 relative error on the
    # cost volume. "float32" (default) matches the reference bit-for-bit.
    sweep_gather_dtype: str = "float32"

    @nn.compact
    def __call__(
        self,
        images: Array,  # (B, V, H, W, 3) in [0, 1]
        intrinsics: Array,  # (B, V, 3, 3) normalized
        extrinsics: Array,  # (B, V, 4, 4) c2w
        min_depth: Array,  # (B, V) = 1 / far
        max_depth: Array,  # (B, V) = 1 / near
        attn_splits: int = 2,
        nn_idx: Array | None = None,  # (B, V, k+1) incl self at [..., 0]
        training: bool = False,
    ) -> dict[str, Any]:
        from ..utils.shapes import assert_shapes

        # runtime seam check (trace-time only): (B, V)-consistent arrays
        assert_shapes(
            {
                "images": (images, ("B", "V", None, None, 3)),
                "intrinsics": (intrinsics, ("B", "V", 3, 3)),
                "extrinsics": (extrinsics, ("B", "V", 4, 4)),
                "min_depth": (min_depth, ("B", "V")),
                "max_depth": (max_depth, ("B", "V")),
                "nn_idx": (nn_idx, ("B", "V", None)),
            }
        )
        b, v, h, w, _ = images.shape
        if self.sweep_gather_dtype not in ("float32", "bfloat16"):
            raise ValueError(
                "sweep_gather_dtype must be 'float32' or 'bfloat16', got "
                f"{self.sweep_gather_dtype!r}"
            )
        results: dict[str, Any] = {}
        images_norm = normalize_imagenet(images)

        # Pixel-unit intrinsics (the reference denormalizes, mv_unimatch:253-255).
        pix = jnp.stack(
            [jnp.full((), w, jnp.float32), jnp.full((), h, jnp.float32), jnp.ones(())]
        )
        intrinsics_px = intrinsics * pix[None, None, :, None]

        # --- CNN pyramid (fold views into batch) ---
        flat = images_norm.reshape(b * v, h, w, 3)
        cnn_all = CNNEncoder(
            output_dim=self.feature_channels,
            lowest_scale=self.lowest_feature_resolution,
            name="backbone",
        )(flat)  # high -> low resolution
        cnn_all = [f.reshape(b, v, *f.shape[1:]) for f in cnn_all]
        cnn_low_to_high = cnn_all[::-1]
        features_cnn = cnn_low_to_high[: self.num_scales]
        results["features_cnn_all_scales"] = cnn_all
        results["features_cnn"] = features_cnn

        # --- multi-view transformer on the lowest-resolution features ---
        feat0 = add_position_in_windows(features_cnn[0], attn_splits)
        features_mv = MultiViewFeatureTransformer(
            num_layers=self.num_transformer_layers,
            d_model=self.feature_channels,
            view_shard_axis=self.spmd_view_axis,
            name="transformer",
        )(feat0, attn_splits=attn_splits, nn_idx=nn_idx)

        if self.num_scales > 1:
            from .vit_fpn import ViTFeaturePyramid

            mv_list = ViTFeaturePyramid(
                tuple(2.0**i for i in range(self.num_scales)), name="mv_pyramid"
            )(features_mv.reshape(b * v, *features_mv.shape[2:]))
            features_mv_scales = [f.reshape(b, v, *f.shape[1:]) for f in mv_list]
        else:
            features_mv_scales = [features_mv]
        results["features_mv"] = features_mv_scales

        # --- DINOv2 monocular features, resized to 1/8 ---
        vit_cfg = VIT_CONFIGS[self.vit_type]
        rh, rw = h // 14 * 14, w // 14 * 14
        vit_in = resize_bilinear(flat, (rh, rw), align_corners=True)
        vit_layers = DinoViT(vit_cfg, name="pretrained")(
            vit_in, INTERMEDIATE_LAYER_IDX[self.vit_type]
        )
        mono_intermediate = []
        for tokens, _cls in vit_layers:
            grid = tokens.reshape(b * v, rh // 14, rw // 14, -1)
            mono_intermediate.append(
                resize_bilinear(grid, (h // 8, w // 8), align_corners=True)
            )
        results["features_mono_intermediate"] = [
            f.reshape(b, v, *f.shape[1:]) for f in mono_intermediate
        ]

        mono = mono_intermediate[-1]
        if self.lowest_feature_resolution == 4:
            mono = resize_bilinear(
                mono, (mono.shape[1] * 2, mono.shape[2] * 2), align_corners=True
            )
        if self.num_scales > 1:
            from .vit_fpn import ViTFeaturePyramid

            mono_list = ViTFeaturePyramid(
                tuple(2.0**i for i in range(self.num_scales)), name="mono_pyramid"
            )(mono)
        else:
            mono_list = [mono]
        features_mono_scales = [f.reshape(b, v, *f.shape[1:]) for f in mono_list]
        results["features_mono"] = features_mono_scales

        # --- source-view index table ---
        if nn_idx is None:
            src_idx = jnp.broadcast_to(
                jnp.asarray(_other_view_indices(v))[None], (b, v, v - 1)
            )
        else:
            src_idx = nn_idx[..., 1:]
        m = src_idx.shape[-1]

        src_extr = gather_source_views(extrinsics, src_idx)  # (B, V, M, 4, 4)
        # relative pose: ref camera -> source camera (mv_unimatch:405-407)
        rel_pose = jnp.linalg.inv(src_extr) @ extrinsics[:, :, None]

        depth = None  # inverse depth, (B, V, hs, ws, 1)
        depth_preds: list[Array] = []
        match_probs: list[Array] = []

        for scale_idx in range(self.num_scales):
            df = self.upsample_factor * 2 ** (self.num_scales - 1 - scale_idx)
            num_d = self.num_depth_candidates // 4**scale_idx

            intr_s = intrinsics_px.at[..., :2, :].multiply(1.0 / df)
            feats = features_mv_scales[scale_idx]  # (B, V, hs, ws, C)
            hs, ws, c = feats.shape[2:]

            if scale_idx > 0:
                assert depth is not None
                depth = jax.lax.stop_gradient(
                    resize_bilinear(depth, (hs, ws), align_corners=True)
                )

            lin = jnp.linspace(0.0, 1.0, num_d)
            inv_near = max_depth[..., None, None, None]  # (B, V, 1, 1, 1)
            inv_far = min_depth[..., None, None, None]
            if scale_idx == 0:
                # uniform inverse-depth candidates, (B, V, D, 1, 1)
                cand = inv_far + lin[None, None, :, None, None] * (inv_near - inv_far)
                cand = jnp.broadcast_to(cand, (b, v, num_d, hs, ws))
            else:
                interval = (
                    (inv_near - inv_far)
                    / (self.num_depth_candidates - 1)
                    / 2**scale_idx
                )
                d_prev = jnp.moveaxis(depth, -1, 2)  # (B, V, 1, hs, ws)
                lo = jnp.maximum(d_prev - interval * (num_d // 2), inv_far)
                hi = jnp.minimum(d_prev + interval * (num_d // 2 - 1), inv_near)
                cand = lo + lin[None, None, :, None, None] * (hi - lo)

            # --- plane-sweep cost volume ---
            src_feats = gather_source_views(feats, src_idx)  # (B, V, M, hs, ws, C)
            cand_rep = jnp.broadcast_to(
                cand[:, :, None], (b, v, m, num_d, hs, ws)
            )
            # ref intrinsics used on both sides, like the reference
            # (mv_unimatch:477-490 passes the ref view's K into the warp).
            intr_rep = jnp.broadcast_to(intr_s[:, :, None], (b, v, m, 3, 3))

            bvm = b * v * m
            src_flat = src_feats.reshape(bvm, hs, ws, c)
            intr_flat = intr_rep.reshape(bvm, 3, 3)
            pose_flat = rel_pose.reshape(bvm, 4, 4)
            feats_rep = jnp.broadcast_to(
                feats[:, :, None], (b, v, m, hs, ws, c)
            ).reshape(bvm, hs, ws, c)
            # Fused warp + correlation (ops plane_sweep_correlation): each
            # bilinear tap is one flat 16-bit column gather and the dot with
            # the ref features happens tap-by-tap — the (BVM, D, h, w, C)
            # warped tensor never materializes. `sweep_bytes` tracks the
            # per-tap gather output (C, BVM*D*hw); beyond the budget the
            # depth candidates are scanned in chunks (same math).
            gdtype = (
                jnp.bfloat16
                if self.sweep_gather_dtype == "bfloat16"
                else None
            )
            itemsize = 2 if gdtype is not None else 4
            sweep_bytes = itemsize * bvm * num_d * hs * ws * c
            cand_flat = cand_rep.reshape(bvm, num_d, hs, ws)
            if self.spmd_depth_axis is not None:
                from jax.sharding import PartitionSpec as _P

                cand_flat = jax.lax.with_sharding_constraint(
                    cand_flat, _P(None, self.spmd_depth_axis)
                )
                corr = sweep_correlation_flat(
                    src_flat, feats_rep, intr_flat, pose_flat, cand_flat,
                    gather_dtype=gdtype,
                )
                corr = jax.lax.with_sharding_constraint(
                    corr, _P(None, self.spmd_depth_axis)
                )
            elif self.sweep_mode == "window" and (
                scale_idx > 0
                or (
                    self.sweep_window_groups_scale0 > 0
                    and num_d % self.sweep_window_groups_scale0 == 0
                )
            ):
                # Window-correlation sweep, scanned per pair so gather tables
                # stay cache-resident. Scale 0's uniform candidates are split
                # into contiguous groups so each group's band is narrow
                # enough for the window; refinement scales are banded by
                # construction (one group).
                groups = (
                    self.sweep_window_groups_scale0 if scale_idx == 0 else 1
                )
                dg = num_d // groups

                def pair_step_w(ovf, xs):
                    s, r, k_, p, cd = xs

                    def grp(ovf_g, cd_g):
                        cost_1, ovf_1 = plane_sweep_correlation_window(
                            s[None], r[None], k_[None], p[None],
                            1.0 / cd_g[None],
                            window=self.sweep_window,
                            gather_dtype=gdtype,
                        )
                        return ovf_g + ovf_1, cost_1[0]

                    if groups == 1:
                        return grp(ovf, cd)
                    ovf_p, cost_g = jax.lax.scan(
                        grp, ovf, cd.reshape(groups, dg, hs, ws)
                    )
                    return ovf_p, cost_g.reshape(num_d, hs, ws)

                ovf0 = jnp.zeros((), jnp.int32)
                ovf, corr = jax.lax.scan(
                    pair_step_w,
                    ovf0,
                    (src_flat, feats_rep, intr_flat, pose_flat, cand_flat),
                )
                results["sweep_window_overflow"] = (
                    results.get("sweep_window_overflow", 0) + ovf
                )
            elif (
                bvm > 1
                and itemsize * c * bvm * hs * ws > self.sweep_table_cache_bytes
                and itemsize * num_d * hs * ws * c <= self.plane_sweep_max_bytes
            ):
                # Pair scan: one (view, source) pair per step, so the gather
                # table is a single pair's (C, hw) source features — cache-
                # resident gathers run 3-4x faster than one flat table over
                # all pairs. Bit-identical math (pairs are independent).
                def pair_step(_, xs):
                    s, r, k, p, cd = xs
                    return None, sweep_correlation_flat(
                        s[None], r[None], k[None], p[None], cd[None],
                        gather_dtype=gdtype,
                    )[0]

                _, corr = jax.lax.scan(
                    pair_step,
                    None,
                    (src_flat, feats_rep, intr_flat, pose_flat, cand_flat),
                )
            elif sweep_bytes > self.plane_sweep_max_bytes:
                n_chunks = 1
                while (
                    sweep_bytes // n_chunks > self.plane_sweep_max_bytes
                    and n_chunks < num_d
                ):
                    n_chunks *= 2
                # Ceil-division chunking so ANY num_d respects the byte
                # budget (a divisors-only fallback collapses to one chunk
                # for prime num_d and silently defeats the budget): pad the
                # candidate axis to n_chunks*dc with repeats of the last
                # candidate and slice the padded correlations off after.
                dc = -(-num_d // n_chunks)
                pad = n_chunks * dc - num_d
                cand_pad = (
                    jnp.concatenate(
                        [
                            cand_flat,
                            jnp.broadcast_to(
                                cand_flat[:, -1:], (bvm, pad, hs, ws)
                            ),
                        ],
                        axis=1,
                    )
                    if pad
                    else cand_flat
                )
                cand_cs = jnp.moveaxis(
                    cand_pad.reshape(bvm, n_chunks, dc, hs, ws), 1, 0
                )

                def sweep_step(_, cand_c):
                    return None, sweep_correlation_flat(
                        src_flat, feats_rep, intr_flat, pose_flat, cand_c,
                        gather_dtype=gdtype,
                    )

                _, corr_cs = jax.lax.scan(sweep_step, None, cand_cs)
                corr = jnp.moveaxis(corr_cs, 0, 1).reshape(
                    bvm, n_chunks * dc, hs, ws
                )[:, :num_d]
            else:
                corr = sweep_correlation_flat(
                    src_flat, feats_rep, intr_flat, pose_flat, cand_flat,
                    gather_dtype=gdtype,
                )
            # / sqrt(C), mean over source views (mv_unimatch:500-505)
            cost = (
                corr.reshape(b, v, m, num_d, hs, ws) / c**0.5
            ).mean(axis=2)
            cost = jnp.moveaxis(cost, 2, -1)  # (B, V, hs, ws, D)

            # --- UNet regressor ---
            concat = jnp.concatenate(
                [
                    cost,
                    features_cnn[scale_idx],
                    feats,
                    features_mono_scales[scale_idx],
                ],
                axis=-1,
            )
            channels = self.unet_channels // 2**scale_idx
            mult = tuple(self.unet_channel_mult) + (1,) * scale_idx
            attn_res = tuple(r * 2**scale_idx for r in self.unet_attn_resolutions)

            x = Conv(channels, 3, name=f"regressor{scale_idx}_in")(concat)
            x = nn.GroupNorm(num_groups=8, epsilon=1e-5,
                             name=f"regressor{scale_idx}_gn")(x)
            x = nn.gelu(x, approximate=False)
            x = UNetModel(
                model_channels=channels,
                out_channels=channels,
                num_res_blocks=self.unet_num_res_blocks,
                attention_resolutions=attn_res,
                channel_mult=mult,
                num_head_channels=32,
                use_cross_view_self_attn=True,
                name=f"regressor{scale_idx}_unet",
            )(x)
            x = Conv(channels, 3, name=f"regressor{scale_idx}_out")(x)
            x = x + Conv(channels, 1, padding=0,
                         name=f"regressor{scale_idx}_residual")(concat)

            # --- depth head: softmax expectation over candidates ---
            logits = Conv(channels * 2, 3, padding_mode="replicate",
                          name=f"depth_head{scale_idx}_0")(x)
            logits = nn.gelu(logits, approximate=False)
            logits = Conv(num_d, 3, padding_mode="replicate",
                          name=f"depth_head{scale_idx}_1")(logits)
            prob = nn.softmax(logits, axis=-1)  # (B, V, hs, ws, D)
            match_probs.append(prob)
            depth = jnp.einsum(
                "bvhwd,bvdhw->bvhw", prob, cand
            )[..., None]  # (B, V, hs, ws, 1) inverse depth

            if training and scale_idx < self.num_scales - 1:
                depth_preds.append(
                    resize_bilinear(depth, (h, w), align_corners=True)
                )

            if scale_idx == self.num_scales - 1:
                dpt_cfg = DPT_MODEL_CONFIGS[self.vit_type]
                mv_in = (
                    features_mv_scales[0].reshape(b * v, *features_mv_scales[0].shape[2:])
                    if self.num_scales == 1
                    else [
                        f.reshape(b * v, *f.shape[2:])
                        for f in features_mv_scales[::-1]
                    ]
                )
                residual = DPTUpsamplerHead(
                    out_channels=dpt_cfg["out_channels"],
                    features=dpt_cfg["features"],
                    downsample_factor=self.upsample_factor,
                    num_scales=self.num_scales,
                    name="upsampler",
                )(
                    mono_intermediate,
                    # resolution high -> low: [1/2, 1/4-ish, lowest]
                    [f.reshape(b * v, *f.shape[2:]) for f in cnn_all],
                    mv_in,
                    depth.reshape(b * v, hs, ws, 1),
                )  # (BV, H, W, 1)
                residual = residual.reshape(b, v, h, w, 1)
                depth_full = resize_bilinear(depth, (h, w), align_corners=True)
                depth_full = jnp.clip(
                    depth_full + residual, inv_far, inv_near
                )
                depth_preds.append(depth_full)

        # inverse depth -> depth (B, V, H, W)
        results["depth_preds"] = [1.0 / d[..., 0] for d in depth_preds]
        results["match_probs"] = match_probs
        return results
