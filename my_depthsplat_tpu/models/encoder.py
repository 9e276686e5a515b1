"""DepthSplat encoder: depth branch -> per-pixel Gaussian parameters.

Re-design of src/model/encoder/encoder_depthsplat.py:73-377. Both depth
branches are supported behind one config switch:
- "unimatch": the published MultiViewUniMatch multi-view branch
  (mv_unimatch.py — its import is merely commented out in the fork)
- "promptda": the fork's prompt-depth branch (promptda.py)

The gaussian head consumes concat(image, depth, mono features) exactly like the
fork's encoder (:200-222); for the unimatch branch the 1/8-resolution mono
features are upsampled to full resolution first.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from ..gaussians import GaussianAdapterCfg, adapt_gaussians, d_in
from ..geometry import sample_image_grid
from ..ops import resize_bilinear
from .layers import Conv
from .promptda import PromptDA
from .unimatch import MultiViewUniMatch


@dataclass(frozen=True)
class EncoderDepthSplatCfg:
    depth_branch: str = "unimatch"  # or "promptda"
    gaussian_adapter: GaussianAdapterCfg = field(
        default_factory=lambda: GaussianAdapterCfg(1e-10, 3.0, 2)
    )
    num_surfaces: int = 1
    gaussian_regressor_channels: int = 64
    init_sh_input_img: bool = True
    supervise_intermediate_depth: bool = True
    return_depth: bool = True
    train_depth_only: bool = False
    # mv_unimatch knobs
    num_scales: int = 1
    upsample_factor: int = 4
    lowest_feature_resolution: int = 4
    num_depth_candidates: int = 128
    costvolume_unet_feat_dim: int = 128
    costvolume_unet_channel_mult: tuple[int, ...] = (1, 1, 1)
    costvolume_unet_attn_res: tuple[int, ...] = ()
    multiview_trans_attn_split: int = 2
    monodepth_vit_type: str = "vits"
    # UniMatch branch only: 1x1-project the 1/8-res ViT features to this many
    # channels BEFORE upsampling to full resolution for the gaussian
    # regressor/head. The reference fork never wires unimatch features into
    # the regressor (its active PromptDA branch feeds raw 384-dim features),
    # so this path is ours to design: carrying the raw embed dim (up to 1024)
    # at full resolution costs ~20 GB of activations at 12 views x 512x960.
    # None = raw embed-dim features (PromptDA-style).
    regressor_feature_channels: int | None = 64
    local_mv_match: int = 2
    spmd_depth_axis: str | None = None  # shard plane-sweep hypotheses (mesh axis)
    spmd_view_axis: str | None = None  # shard context views (ring attention)
    # plane-sweep gather precision: "float32" (reference-exact) | "bfloat16"
    sweep_gather_dtype: str = "float32"
    # plane-sweep evaluation: "gather" (reference-exact per-tap gathers) |
    # "window" (banded refinement scales use per-pixel window correlations —
    # exact while taps fit sweep_window, overflow counted; see
    # models/unimatch.py sweep_mode)
    sweep_mode: str = "gather"
    sweep_window: int = 6
    sweep_window_groups_scale0: int = 0
    # Network compute precision: "float32" (reference-exact) | "bfloat16".
    # bf16 casts params + image-like inputs (camera fields, near/far, and
    # LiDAR depth prompts stay f32; outputs are cast back to f32 before the
    # renderer) — MXU convs/matmuls run ~2x and byte-bound feature traffic
    # halves. Applied by the drivers through
    # models.precision.apply_with_precision; parity tolerance is pinned by
    # tests/test_models.py::test_encoder_bf16_compute_parity.
    compute_dtype: str = "float32"
    shim_patch_size: int = 4
    downscale_factor: int = 4


def knn_view_indices(extrinsics: Array, k: int) -> Array:
    """(B, V, 4, 4) c2w -> (B, V, k+1) nearest-camera indices (incl. self).

    Reference encoder_depthsplat.py:144-153 (cdist + argsort over camera
    centers). Only used when V > 3.
    """
    xyz = extrinsics[..., :3, 3]
    d = jnp.linalg.norm(xyz[:, :, None] - xyz[:, None, :], axis=-1)
    order = jnp.argsort(d, axis=-1)
    return order[..., : k + 1]


class EncoderDepthSplat(nn.Module):
    cfg: EncoderDepthSplatCfg

    @nn.compact
    def __call__(
        self,
        context: dict[str, Array],
        training: bool = False,
    ) -> dict[str, Any]:
        """context keys: image (B,V,H,W,3), intrinsics (B,V,3,3) normalized,
        extrinsics (B,V,4,4) c2w, near (B,V), far (B,V),
        depth (B,V,hp,wp) LiDAR prompt (promptda branch only).

        Returns {"gaussians": PerViewGaussians-flattened dict fields or None,
        "depths": (B', V, H, W)} with B' = B * num_depth_preds when
        intermediate supervision is active.
        """
        cfg = self.cfg
        from ..utils.shapes import check_views

        check_views(context, "context")  # fail loudly on (B,V)-swaps etc.
        images = context["image"]
        b, v, h, w, _ = images.shape

        nn_idx = (
            knn_view_indices(context["extrinsics"], cfg.local_mv_match)
            if v > 3
            else None
        )

        # ---- depth prediction ----
        if cfg.depth_branch == "promptda":
            results = PromptDA(cfg.monodepth_vit_type, name="depth_predictor")(
                images, context["depth"]
            )
            features = results["features_mono_intermediate"][-1]  # (BV,H,W,C)
        else:
            results = MultiViewUniMatch(
                num_scales=cfg.num_scales,
                upsample_factor=cfg.upsample_factor,
                lowest_feature_resolution=cfg.lowest_feature_resolution,
                num_depth_candidates=cfg.num_depth_candidates,
                vit_type=cfg.monodepth_vit_type,
                unet_channels=cfg.costvolume_unet_feat_dim,
                unet_channel_mult=tuple(cfg.costvolume_unet_channel_mult),
                unet_attn_resolutions=tuple(cfg.costvolume_unet_attn_res),
                spmd_depth_axis=cfg.spmd_depth_axis,
                spmd_view_axis=cfg.spmd_view_axis,
                sweep_gather_dtype=cfg.sweep_gather_dtype,
                sweep_mode=cfg.sweep_mode,
                sweep_window=cfg.sweep_window,
                sweep_window_groups_scale0=cfg.sweep_window_groups_scale0,
                name="depth_predictor",
            )(
                images,
                context["intrinsics"],
                context["extrinsics"],
                1.0 / context["far"],
                1.0 / context["near"],
                attn_splits=cfg.multiview_trans_attn_split,
                nn_idx=nn_idx,
                training=training,
            )
            feats_18 = results["features_mono_intermediate"][-1]
            feats_18 = feats_18.reshape(b * v, *feats_18.shape[2:])
            if (
                cfg.regressor_feature_channels is not None
                and feats_18.shape[-1] > cfg.regressor_feature_channels
            ):
                feats_18 = Conv(
                    cfg.regressor_feature_channels, 1, padding=0,
                    name="feature_proj",
                )(feats_18)
            features = resize_bilinear(feats_18, (h, w), align_corners=True)

        depth_preds = results["depth_preds"]  # list of (B, V, H, W)
        depth = depth_preds[-1]

        num_preds = len(depth_preds)
        supervise_all = cfg.supervise_intermediate_depth and num_preds > 1

        if cfg.train_depth_only:
            depths = (
                jnp.concatenate(depth_preds, axis=0) if supervise_all else depth
            )
            return {"gaussians": None, "depths": depths}

        # ---- gaussian parameter prediction ----
        img_flat = images.reshape(b * v, h, w, 3)
        concat = jnp.concatenate(
            [img_flat, depth.reshape(b * v, h, w, 1), features], axis=-1
        )
        x = Conv(cfg.gaussian_regressor_channels, 3, name="regressor0")(concat)
        x = nn.gelu(x, approximate=False)
        x = Conv(cfg.gaussian_regressor_channels, 3, name="regressor1")(x)

        n_params = d_in(cfg.gaussian_adapter) + 3  # + opacity + offset_xy
        head_in = jnp.concatenate([x, img_flat, features], axis=-1)
        g = Conv(n_params, 3, padding_mode="replicate", name="head0")(head_in)
        g = nn.gelu(g, approximate=False)
        g = _head_final_conv(cfg, n_params)(g)  # (BV, H, W, n_params)

        raw = g.reshape(b, v, h * w, n_params)

        depths = depth.reshape(b, v, h * w, 1, 1)
        if supervise_all:
            inter = jnp.concatenate(
                [d.reshape(b, v, h * w, 1, 1) for d in depth_preds[:-1]], axis=0
            )
            depths = jnp.concatenate([inter, depths], axis=0)
            raw = jnp.concatenate([raw] * num_preds, axis=0)
            b_eff = b * num_preds
        else:
            b_eff = b

        opacities = jax.nn.sigmoid(raw[..., 0]).reshape(
            b_eff, v, h * w, 1, 1
        )  # (B', V, HW, srf=1, spp=1)
        raw = raw[..., 1:]
        raw = raw.reshape(b_eff, v, h * w, cfg.num_surfaces, -1)

        # pixel-center rays + learned sub-pixel offset (encoder :263-273)
        xy, _ = sample_image_grid((h, w))
        xy = xy.reshape(h * w, 1, 2)
        offset = jax.nn.sigmoid(raw[..., :2])
        pixel_size = jnp.asarray([1.0 / w, 1.0 / h], jnp.float32)
        xy_ray = xy[None, None] + (offset - 0.5) * pixel_size

        def rep(t: Array) -> Array:
            return (
                jnp.concatenate([t] * num_preds, axis=0) if supervise_all else t
            )

        gaussians = adapt_gaussians(
            cfg.gaussian_adapter,
            rep(context["extrinsics"])[:, :, None, None, None],
            rep(context["intrinsics"])[:, :, None, None, None],
            xy_ray[..., None, :],  # (B', V, HW, srf, 1, 2)
            depths,
            opacities,
            raw[..., None, 2:],  # (B', V, HW, srf, 1, d_in)
            input_images=rep(images) if cfg.init_sh_input_img else None,
        )

        out = {"gaussians": gaussians.flattened(), "per_view": gaussians}
        if cfg.return_depth:
            out["depths"] = (
                jnp.concatenate(depth_preds, axis=0) if supervise_all else depth
            )
        if "sweep_window_overflow" in results:
            # taps the window sweep dropped (should be 0; see sweep_mode)
            out["sweep_window_overflow"] = results["sweep_window_overflow"]
        return out


def _head_final_conv(cfg: EncoderDepthSplatCfg, n_params: int):
    """Final head conv with per-channel zero init.

    Reference encoder_depthsplat.py:124-131: zero-init the scale rows (3:6)
    always, and the SH rows (10:) when init_sh_input_img.
    """
    zero_rows = list(range(3, 6))
    if cfg.init_sh_input_img:
        zero_rows += list(range(10, n_params))
    zero_rows_arr = np.asarray(zero_rows, dtype=np.int64)

    def kernel_init(key, shape, dtype=jnp.float32):
        k = nn.initializers.lecun_normal()(key, shape, dtype)
        return k.at[..., zero_rows_arr].set(0.0)

    conv = nn.Conv(
        n_params,
        (3, 3),
        padding="VALID",  # replicate-padded manually below
        kernel_init=kernel_init,
        bias_init=nn.initializers.zeros,
        name="head1",
    )

    def apply(x: Array) -> Array:
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
        return conv(x)

    return apply
