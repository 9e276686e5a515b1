"""LPIPS wiring: load weights (torch or orbax/npz) and build an apply fn.

The reference uses LPIPS both as 0.05 of the training loss
(src/loss/loss_lpips.py:27-59, frozen buffers) and as a headline eval metric
(src/evaluation/metrics.py:22-35). Pretrained VGG/LPIPS weights are not
downloadable in this environment, so the plumbing is load-if-present: when
``loss.lpips_weights`` points at a weights file the net activates in both
paths; otherwise LPIPS silently stays off (with a warning when the config
asked for a nonzero weight).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Callable

import numpy as np

from .lpips_net import LPIPS


def load_lpips_params(path: str | Path) -> Any:
    """Load LPIPS params from a torch lpips state_dict (.pth/.pt) or an .npz
    of '/'-joined flattened paths (as written by save_lpips_params)."""
    p = Path(path)
    if p.suffix in (".pth", ".pt", ".ckpt", ".bin"):
        import torch

        from ..convert.torch_weights import convert_lpips

        sd = torch.load(p, map_location="cpu", weights_only=True)
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        return convert_lpips(sd)
    if p.suffix == ".npz":
        flat = np.load(p)
        tree: dict = {}
        for key in flat.files:
            node = tree
            parts = key.split("/")
            for part in parts[:-1]:
                node = node.setdefault(part, {})
            node[parts[-1]] = flat[key]
        return tree
    raise ValueError(f"Unsupported LPIPS weights format: {p.suffix!r} ({p})")


def save_lpips_params(path: str | Path, params: Any) -> None:
    """Save an LPIPS param tree as a flat .npz ('/'-joined paths)."""
    import jax

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for keypath, leaf in flat:
        name = "/".join(
            getattr(k, "key", getattr(k, "idx", str(k))) for k in keypath
        )
        out[name] = np.asarray(leaf)
    np.savez(path, **out)


def build_lpips(weights: str | Path | None) -> tuple[Callable | None, Any]:
    """Returns (apply_fn, params) for the LPIPS perceptual net, or
    (None, None) when no weights file is configured / present.

    apply_fn(params, img0, img1) -> per-image distance, inputs (B, H, W, 3)
    in [0, 1] (the lpips forward(normalize=True) convention)."""
    if weights is None:
        return None, None
    p = Path(weights)
    if not p.exists():
        print(f"WARNING: loss.lpips_weights={p} not found — LPIPS disabled")
        return None, None
    params = load_lpips_params(p)
    net = LPIPS()

    def apply_fn(lpips_params, img0, img1):
        return net.apply(lpips_params, img0, img1)

    return apply_fn, params
