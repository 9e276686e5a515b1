"""Full DepthSplat checkpoint (.pth) -> flax params conversion scaffolding.

The reference's published checkpoints (MODEL_ZOO.md) are Lightning state
dicts with keys like ``encoder.depth_predictor.backbone...``,
``encoder.gaussian_regressor.0...``. This module provides:

- ``param_paths(params)``: flattened path listing of a flax tree (debugging /
  building mappings)
- ``convert_gaussian_heads``: the encoder's conv stacks (regressor + head),
  which map 1:1
- ``convert_encoder_checkpoint``: assembles what is currently mappable (ViT
  backbone via convert_dino_vit + gaussian heads) into an existing param tree

The remaining depth-branch modules (CNN backbone, MV transformer, UNet, DPT)
need per-layer name tables; they are filled in as parity work proceeds (no
reference weights are downloadable in this environment to verify against).
"""

from __future__ import annotations

from typing import Mapping

import jax
import numpy as np

from .torch_weights import _np, convert_conv, convert_dino_vit


def param_paths(params) -> list[str]:
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return [
        "/".join(str(k)[2:-2] if "'" in str(k) else str(k) for k in path)
        + f"  {tuple(leaf.shape)}"
        for path, leaf in flat
    ]


def convert_gaussian_heads(sd: Mapping) -> dict:
    """encoder.gaussian_regressor.{0,2} + gaussian_head.{0,2} -> flax names."""
    out = {}
    mapping = {
        "encoder.gaussian_regressor.0": "regressor0",
        "encoder.gaussian_regressor.2": "regressor1",
        "encoder.gaussian_head.0": "head0",
        "encoder.gaussian_head.2": "head1",
    }
    for torch_name, flax_name in mapping.items():
        wk = f"{torch_name}.weight"
        if wk in sd:
            out[flax_name] = convert_conv(sd[wk], sd.get(f"{torch_name}.bias"))
    return out


def convert_encoder_checkpoint(
    state_dict: Mapping, params: dict, vit_depth: int
) -> dict:
    """Merge the mappable parts of a reference checkpoint into ``params``.

    Returns a new tree; unmapped leaves keep their current values. The ViT is
    loaded from the ``encoder.depth_predictor.pretrained.*`` sub-dict.
    """
    sd = dict(state_dict)

    vit_sd = {
        k[len("encoder.depth_predictor.pretrained."):]: v
        for k, v in sd.items()
        if k.startswith("encoder.depth_predictor.pretrained.")
    }
    heads = convert_gaussian_heads(sd)

    new_params = jax.tree_util.tree_map(lambda x: x, params)  # copy structure

    def set_path(tree, path: list[str], value):
        node = tree
        for p in path[:-1]:
            node = node[p]
        node[path[-1]] = value

    root = new_params["params"]
    if vit_sd:
        vit_params = convert_dino_vit(vit_sd, vit_depth)["params"]
        if "depth_predictor" in root and "pretrained" in root["depth_predictor"]:
            root["depth_predictor"]["pretrained"] = _merge(
                root["depth_predictor"]["pretrained"], vit_params
            )
    for name, leaves in heads.items():
        if name in root:
            root[name] = _merge(root[name], leaves)
    return new_params


def _merge(base: dict, update: dict) -> dict:
    out = dict(base)
    for k, v in update.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _merge(out[k], v)
        else:
            expected = np.shape(out[k]) if k in out else None
            got = np.shape(_np(v)) if not isinstance(v, dict) else None
            if expected is not None and got is not None and expected != got:
                raise ValueError(f"shape mismatch at {k}: {expected} vs {got}")
            out[k] = _np(v) if not isinstance(v, dict) else v
    return out
