"""torch checkpoint -> flax param tree converters.

The reference ships three pretrained-weight families this framework can load
once converted (no weights are bundled in this environment; these converters
operate on downloaded state_dicts):
- DINOv2 ViT backbones (torchhub/facebookresearch_dinov2_main)
- LPIPS VGG16 + linear heads (the pip `lpips` package)
- full DepthSplat checkpoints (MODEL_ZOO.md) — per-module mappings built on
  the same primitives (extended in later rounds).

Layout conventions: torch convs are (O, I, kh, kw) -> flax (kh, kw, I, O);
linears (O, I) -> (I, O).
"""

from __future__ import annotations

from typing import Mapping

import numpy as np


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def convert_conv(weight, bias=None) -> dict:
    out = {"kernel": _np(weight).transpose(2, 3, 1, 0)}
    if bias is not None:
        out["bias"] = _np(bias)
    return out


def convert_linear(weight, bias=None) -> dict:
    out = {"kernel": _np(weight).T}
    if bias is not None:
        out["bias"] = _np(bias)
    return out


def _ln(sd: Mapping, prefix: str) -> dict:
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def convert_dino_vit(state_dict: Mapping, depth: int) -> dict:
    """DINOv2 state_dict -> params for models.vit.DinoViT (flax)."""
    sd = state_dict
    params: dict = {
        "patch_embed": convert_conv(
            sd["patch_embed.proj.weight"], sd["patch_embed.proj.bias"]
        ),
        "cls_token": _np(sd["cls_token"]),
        "pos_embed": _np(sd["pos_embed"]),
        "norm": _ln(sd, "norm"),
    }
    for i in range(depth):
        p = f"blocks.{i}"
        params[f"block_{i}"] = {
            "norm1": _ln(sd, f"{p}.norm1"),
            "norm2": _ln(sd, f"{p}.norm2"),
            "ls1": _np(sd[f"{p}.ls1.gamma"]),
            "ls2": _np(sd[f"{p}.ls2.gamma"]),
            "attn": {
                "qkv": convert_linear(
                    sd[f"{p}.attn.qkv.weight"], sd[f"{p}.attn.qkv.bias"]
                ),
                "proj": convert_linear(
                    sd[f"{p}.attn.proj.weight"], sd[f"{p}.attn.proj.bias"]
                ),
            },
            "mlp_fc1": convert_linear(
                sd[f"{p}.mlp.fc1.weight"], sd[f"{p}.mlp.fc1.bias"]
            ),
            "mlp_fc2": convert_linear(
                sd[f"{p}.mlp.fc2.weight"], sd[f"{p}.mlp.fc2.bias"]
            ),
        }
    return {"params": params}


# lpips VGG16 feature indices per stage (torchvision features module indices).
_VGG_SLICES = [(0, 2), (5, 7), (10, 12, 14), (17, 19, 21), (24, 26, 28)]


def convert_lpips(lpips_state_dict: Mapping) -> dict:
    """lpips.LPIPS(net='vgg') state_dict -> params for train.lpips_net.LPIPS."""
    sd = lpips_state_dict
    vgg: dict = {}
    for si, conv_ids in enumerate(_VGG_SLICES):
        for ci, idx in enumerate(conv_ids):
            key = f"net.slice{si + 1}.{idx}"
            vgg[f"conv{si}_{ci}"] = convert_conv(
                sd[f"{key}.weight"], sd[f"{key}.bias"]
            )
    params: dict = {"vgg": vgg}
    for i in range(5):
        w = _np(sd[f"lin{i}.model.1.weight"])  # (1, C, 1, 1)
        params[f"lin{i}"] = w.reshape(w.shape[1], 1)
    return {"params": params}


def _qkv_reorder(weight, bias, num_heads: int) -> tuple[np.ndarray, np.ndarray]:
    """LDM AttentionBlock qkv channels are head-major ([h0: q k v][h1: ...]);
    our kernel expects part-major ([q: h0 h1...][k: ...][v: ...])."""
    w = _np(weight)  # (3*C, C_in, 1) conv1d
    b = _np(bias)
    three_c = w.shape[0]
    ch = three_c // (3 * num_heads)
    w = w.reshape(num_heads, 3, ch, *w.shape[1:])
    b = b.reshape(num_heads, 3, ch)
    w = np.moveaxis(w, 0, 1).reshape(three_c, *w.shape[3:])
    b = np.moveaxis(b, 0, 1).reshape(three_c)
    return w, b


def convert_ldm_unet(
    sd: Mapping,
    channel_mult: tuple[int, ...] = (1, 1, 1),
    num_res_blocks: int = 1,
    attention_resolutions: tuple[int, ...] = (4,),
    num_head_channels: int = 32,
    model_channels: int | None = None,
) -> dict:
    """Reference UNetModel state_dict -> params for models.ldm_unet.UNetModel.

    Follows the construction order of unet.py:742-1063 for the configuration
    DepthSplat uses (prenorm, conv resample, no cross-attn conditioning).
    """
    attn_res = set(attention_resolutions)
    params: dict = {}

    def conv(prefix, bias=True):
        w = sd[f"{prefix}.weight"]
        arr = _np(w)
        if arr.ndim == 3:  # conv1d -> 1x1 conv2d
            arr = arr[..., None]
        out = {"kernel": arr.transpose(2, 3, 1, 0)}
        if bias:
            out["bias"] = _np(sd[f"{prefix}.bias"])
        return out

    def norm(prefix):
        return {
            "GroupNorm_0": {
                "scale": _np(sd[f"{prefix}.weight"]),
                "bias": _np(sd[f"{prefix}.bias"]),
            }
        }

    def res_block(prefix):
        out = {
            "in_norm": norm(f"{prefix}.in_layers.0"),
            "in_conv": {"Conv_0": conv(f"{prefix}.in_layers.2")},
            "out_norm": norm(f"{prefix}.out_layers.0"),
            "out_conv": {"Conv_0": conv(f"{prefix}.out_layers.3")},
        }
        if f"{prefix}.skip_connection.weight" in sd:
            out["skip"] = {"Conv_0": conv(f"{prefix}.skip_connection")}
        return out

    def attn_block(prefix, ch):
        heads = max(ch // num_head_channels, 1)
        qw, qb = _qkv_reorder(
            sd[f"{prefix}.qkv.weight"], sd[f"{prefix}.qkv.bias"], heads
        )
        pw = _np(sd[f"{prefix}.proj_out.weight"])[..., None]
        return {
            "norm": norm(f"{prefix}.norm"),
            "qkv": {
                "Conv_0": {
                    "kernel": qw[..., None].transpose(2, 3, 1, 0),
                    "bias": qb,
                }
            },
            "proj_out": {
                "Conv_0": {
                    "kernel": pw.transpose(2, 3, 1, 0),
                    "bias": _np(sd[f"{prefix}.proj_out.bias"]),
                }
            },
        }

    mc = model_channels
    if mc is None:
        mc = _np(sd["input_blocks.0.0.weight"]).shape[0]

    params["conv_in"] = {"Conv_0": conv("input_blocks.0.0")}
    idx = 1
    blk = 0
    ds = 1
    ch = mc
    for level, mult in enumerate(channel_mult):
        for _ in range(num_res_blocks):
            params[f"in_res{blk}"] = res_block(f"input_blocks.{idx}.0")
            ch = mult * mc
            if ds in attn_res:
                params[f"in_attn{blk}"] = attn_block(f"input_blocks.{idx}.1", ch)
            idx += 1
            blk += 1
        if level != len(channel_mult) - 1:
            params[f"down{level}"] = {"Conv_0": conv(f"input_blocks.{idx}.0.op")}
            idx += 1
            ds *= 2

    params["mid_res0"] = res_block("middle_block.0")
    params["mid_res1"] = res_block("middle_block.2")

    idx = 0
    blk = 0
    for level, mult in reversed(list(enumerate(channel_mult))):
        for i in range(num_res_blocks + 1):
            params[f"out_res{blk}"] = res_block(f"output_blocks.{idx}.0")
            ch = mult * mc
            pos = 1
            if ds in attn_res:
                params[f"out_attn{blk}"] = attn_block(
                    f"output_blocks.{idx}.{pos}", ch
                )
                pos += 1
            if level and i == num_res_blocks:
                params[f"up{level}"] = {
                    "Conv_0": conv(f"output_blocks.{idx}.{pos}.conv")
                }
                ds //= 2
            idx += 1
            blk += 1

    params["out_norm"] = norm("out.0")
    params["out_conv"] = {"Conv_0": conv("out.2")}
    return {"params": params}


def convert_dpt_upsampler(sd: Mapping) -> dict:
    """Reference dpt_head.DPTHead (upsampler variant) -> models.dpt.DPTUpsamplerHead."""

    def conv(prefix, bias=True):
        out = {"kernel": _np(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}
        if bias:
            out["bias"] = _np(sd[f"{prefix}.bias"])
        return out

    def deconv(prefix):
        # torch ConvTranspose2d (in, out, kh, kw) -> flax (kh, kw, in, out);
        # torch's op is the conv gradient, so the kernel must be spatially
        # flipped for flax's lax.conv_transpose semantics.
        w = _np(sd[f"{prefix}.weight"])[:, :, ::-1, ::-1]
        return {
            "ConvTranspose_0": {
                "kernel": w.transpose(2, 3, 0, 1).copy(),
                "bias": _np(sd[f"{prefix}.bias"]),
            }
        }

    def rcu(prefix):
        return {
            "conv1": {"Conv_0": conv(f"{prefix}.conv1")},
            "conv2": {"Conv_0": conv(f"{prefix}.conv2")},
        }

    def fusion(prefix, with_skip=True):
        out = {
            "res2": rcu(f"{prefix}.resConfUnit2"),
            "out_conv": {"Conv_0": conv(f"{prefix}.out_conv")},
        }
        if with_skip:
            out["res1"] = rcu(f"{prefix}.resConfUnit1")
        return out

    params: dict = {"stem": {}}
    for i in range(4):
        params["stem"][f"project{i}"] = {"Conv_0": conv(f"projects.{i}")}
    params["stem"]["resize0"] = deconv("resize_layers.0")
    params["stem"]["resize1"] = deconv("resize_layers.1")
    params["stem"]["resize3"] = {"Conv_0": conv("resize_layers.3")}
    for i in range(3):
        params[f"concat_project{i}"] = {"Conv_0": conv(f"concat_projects.{i}")}
    for i in range(1, 5):
        params[f"layer{i}_rn"] = {"Conv_0": conv(f"scratch.layer{i}_rn", bias=False)}
    # refinenet4's skip unit is deleted in the reference (dpt_head.py:414)
    params["refine4"] = fusion("scratch.refinenet4", with_skip=False)
    params["refine3"] = fusion("scratch.refinenet3")
    params["refine2"] = fusion("scratch.refinenet2")
    params["refine1"] = fusion("scratch.refinenet1")
    params["head0"] = {"Conv_0": conv("scratch.output_conv.0")}
    params["head1"] = {"Conv_0": conv("scratch.output_conv.2")}
    params["head2"] = {"Conv_0": conv("scratch.output_conv.4")}
    return {"params": params}


def _sub(sd: Mapping, prefix: str) -> dict:
    p = prefix + "."
    return {k[len(p):]: v for k, v in sd.items() if k.startswith(p)}


def convert_cnn_backbone(sd: Mapping) -> dict:
    """backbone.CNNEncoder -> models.backbone.CNNEncoder params."""

    def res_block(prefix):
        out = {
            "Conv_0": {"Conv_0": convert_conv(sd[f"{prefix}.conv1.weight"])},
            "Conv_1": {"Conv_0": convert_conv(sd[f"{prefix}.conv2.weight"])},
        }
        if f"{prefix}.downsample.0.weight" in sd:
            out["Conv_2"] = {
                "Conv_0": convert_conv(
                    sd[f"{prefix}.downsample.0.weight"],
                    sd[f"{prefix}.downsample.0.bias"],
                )
            }
        return out

    return {
        "Conv_0": {"Conv_0": convert_conv(sd["conv1.weight"])},
        "ResidualBlock_0": res_block("layer1.0"),
        "ResidualBlock_1": res_block("layer1.1"),
        "ResidualBlock_2": res_block("layer2.0"),
        "ResidualBlock_3": res_block("layer2.1"),
        "ResidualBlock_4": res_block("layer3.0"),
        "ResidualBlock_5": res_block("layer3.1"),
        "Conv_1": {"Conv_0": convert_conv(sd["conv2.weight"], sd["conv2.bias"])},
    }


def convert_mv_transformer(sd: Mapping, num_layers: int) -> dict:
    """mv_transformer.MultiViewFeatureTransformer -> ours."""

    def dense(name):
        return {"Dense_0": convert_linear(sd[name])}

    def attn_layer(prefix, with_ffn):
        out = {
            "q_proj": dense(f"{prefix}.q_proj.weight"),
            "k_proj": dense(f"{prefix}.k_proj.weight"),
            "v_proj": dense(f"{prefix}.v_proj.weight"),
            "merge": dense(f"{prefix}.merge.weight"),
            "norm1": {
                "scale": _np(sd[f"{prefix}.norm1.weight"]),
                "bias": _np(sd[f"{prefix}.norm1.bias"]),
            },
        }
        if with_ffn:
            out["mlp_0"] = dense(f"{prefix}.mlp.0.weight")
            out["mlp_1"] = dense(f"{prefix}.mlp.2.weight")
            out["norm2"] = {
                "scale": _np(sd[f"{prefix}.norm2.weight"]),
                "bias": _np(sd[f"{prefix}.norm2.bias"]),
            }
        return out

    return {
        f"layer_{i}": {
            "self_attn": attn_layer(f"layers.{i}.self_attn", False),
            "cross_attn_ffn": attn_layer(f"layers.{i}.cross_attn_ffn", True),
        }
        for i in range(num_layers)
    }


def convert_mv_unimatch(
    sd: Mapping,
    num_scales: int = 1,
    vit_depth: int = 12,
    unet_channel_mult: tuple[int, ...] = (1, 1, 1),
    unet_attn_resolutions: tuple[int, ...] = (4,),
    num_transformer_layers: int = 6,
) -> dict:
    """Full mv_unimatch.MultiViewUniMatch state_dict -> our params tree."""
    params: dict = {
        "backbone": convert_cnn_backbone(_sub(sd, "backbone")),
        "transformer": convert_mv_transformer(
            _sub(sd, "transformer"), num_transformer_layers
        ),
        "pretrained": convert_dino_vit(_sub(sd, "pretrained"), vit_depth)["params"],
        "upsampler": convert_dpt_upsampler(_sub(sd, "upsampler"))["params"],
    }
    for i in range(num_scales):
        reg = _sub(sd, f"regressor.{i}")
        mult = tuple(unet_channel_mult) + (1,) * i
        attn_res = tuple(r * 2**i for r in unet_attn_resolutions)
        params[f"regressor{i}_in"] = {
            "Conv_0": convert_conv(reg["0.weight"], reg["0.bias"])
        }
        params[f"regressor{i}_gn"] = {
            "scale": _np(reg["1.weight"]),
            "bias": _np(reg["1.bias"]),
        }
        params[f"regressor{i}_unet"] = convert_ldm_unet(
            _sub(reg, "3"),
            channel_mult=mult,
            attention_resolutions=attn_res,
        )["params"]
        params[f"regressor{i}_out"] = {
            "Conv_0": convert_conv(reg["4.weight"], reg["4.bias"])
        }
        params[f"regressor{i}_residual"] = {
            "Conv_0": convert_conv(
                sd[f"regressor_residual.{i}.weight"],
                sd[f"regressor_residual.{i}.bias"],
            )
        }
        dh = _sub(sd, f"depth_head.{i}")
        params[f"depth_head{i}_0"] = {
            "Conv_0": convert_conv(dh["0.weight"], dh["0.bias"])
        }
        params[f"depth_head{i}_1"] = {
            "Conv_0": convert_conv(dh["2.weight"], dh["2.bias"])
        }
    if num_scales > 1:
        for name in ("mv_pyramid", "mono_pyramid"):
            pyr = _sub(sd, name)
            out: dict = {}
            # stage 1 (scale 2.0): ConvTranspose + conv (vit_fpn.py:39-55)
            out["s1_up0"] = {
                "ConvTranspose_0": {
                    "kernel": _np(pyr["stages.1.0.weight"])[:, :, ::-1, ::-1]
                    .transpose(2, 3, 0, 1)
                    .copy(),
                    "bias": _np(pyr["stages.1.0.bias"]),
                }
            }
            out["s1_conv"] = {
                "Conv_0": convert_conv(
                    pyr["stages.1.2.weight"], pyr["stages.1.2.bias"]
                )
            }
            params[name] = out
    return {"params": params}


def convert_prompt_dpt(sd: Mapping) -> dict:
    """Reference promptda_dpt.DPTHead -> models.dpt.PromptDPTHead params."""

    def conv(prefix, bias=True):
        out = {"kernel": _np(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}
        if bias:
            out["bias"] = _np(sd[f"{prefix}.bias"])
        return out

    def deconv(prefix):
        # spatially flipped: torch deconv is the conv gradient (see above)
        w = _np(sd[f"{prefix}.weight"])[:, :, ::-1, ::-1]
        return {
            "ConvTranspose_0": {
                "kernel": w.transpose(2, 3, 0, 1).copy(),
                "bias": _np(sd[f"{prefix}.bias"]),
            }
        }

    def rcu(prefix):
        return {
            "conv1": {"Conv_0": conv(f"{prefix}.conv1")},
            "conv2": {"Conv_0": conv(f"{prefix}.conv2")},
        }

    def fusion(prefix, with_skip=True):
        out = {
            "res2": rcu(f"{prefix}.resConfUnit2"),
            "out_conv": {"Conv_0": conv(f"{prefix}.out_conv")},
            # prompt-depth conv stack (promptda_dpt.py:257-268)
            "depth_conv1": {"Conv_0": conv(f"{prefix}.resConfUnit_depth.0")},
            "depth_conv2": {"Conv_0": conv(f"{prefix}.resConfUnit_depth.2")},
            "depth_conv3": {"Conv_0": conv(f"{prefix}.resConfUnit_depth.4")},
        }
        if with_skip:
            out["res1"] = rcu(f"{prefix}.resConfUnit1")
        return out

    params: dict = {"stem": {}}
    for i in range(4):
        params["stem"][f"project{i}"] = {"Conv_0": conv(f"projects.{i}")}
    params["stem"]["resize0"] = deconv("resize_layers.0")
    params["stem"]["resize1"] = deconv("resize_layers.1")
    params["stem"]["resize3"] = {"Conv_0": conv("resize_layers.3")}
    for i in range(1, 5):
        params[f"layer{i}_rn"] = {"Conv_0": conv(f"scratch.layer{i}_rn", bias=False)}
    # NOTE: promptda's refinenet4 KEEPS resConfUnit1 (unlike the upsampler
    # head) but never uses it; our module only creates used params.
    params["refine4"] = fusion("scratch.refinenet4", with_skip=False)
    params["refine3"] = fusion("scratch.refinenet3")
    params["refine2"] = fusion("scratch.refinenet2")
    params["refine1"] = fusion("scratch.refinenet1")
    params["out_conv1"] = {"Conv_0": conv("scratch.output_conv1")}
    params["out_conv2_0"] = {"Conv_0": conv("scratch.output_conv2.0")}
    params["out_conv2_1"] = {"Conv_0": conv("scratch.output_conv2.2")}
    return {"params": params}


def convert_promptda(sd: Mapping, vit_depth: int = 12) -> dict:
    """Full promptda.PromptDA state_dict -> models.promptda.PromptDA params."""
    return {
        "params": {
            "pretrained": convert_dino_vit(_sub(sd, "pretrained"), vit_depth)[
                "params"
            ],
            "depth_head": convert_prompt_dpt(_sub(sd, "depth_head"))["params"],
        }
    }
