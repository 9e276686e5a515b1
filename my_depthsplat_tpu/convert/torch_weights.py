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
