"""Evaluation-index generation: overlap-controlled context pair search.

Reference: src/evaluation/evaluation_index_generator.py:46-158. Produces the
frozen {scene: {context: [l, r], target: [...]}} JSON that makes test runs
deterministic and comparable across methods.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path

import numpy as np

from ..geometry.epipolar import view_overlap


@dataclass(frozen=True)
class IndexGeneratorCfg:
    num_target_views: int = 3
    min_overlap: float = 0.6
    max_overlap: float = 0.8
    min_distance: int = 45
    max_distance: int = 135
    output_path: Path = Path("outputs/evaluation_index")


def generate_index_for_scene(
    cfg: IndexGeneratorCfg,
    extrinsics: np.ndarray,  # (V, 4, 4)
    intrinsics: np.ndarray,  # (V, 3, 3)
    rng: np.random.Generator,
) -> dict | None:
    import jax.numpy as jnp

    v = extrinsics.shape[0]
    for context_index in rng.permutation(v):
        valid = []
        for step in (1, -1):
            current = int(context_index) + step * cfg.min_distance
            while 0 <= current < v:
                oa = float(
                    view_overlap(
                        jnp.asarray(extrinsics[current]),
                        jnp.asarray(intrinsics[current]),
                        jnp.asarray(extrinsics[context_index]),
                        jnp.asarray(intrinsics[context_index]),
                    )
                )
                ob = float(
                    view_overlap(
                        jnp.asarray(extrinsics[context_index]),
                        jnp.asarray(intrinsics[context_index]),
                        jnp.asarray(extrinsics[current]),
                        jnp.asarray(intrinsics[current]),
                    )
                )
                overlap = min(oa, ob)
                delta = abs(current - int(context_index))
                if cfg.min_overlap <= overlap <= cfg.max_overlap:
                    valid.append(current)
                if overlap < cfg.min_overlap or delta > cfg.max_distance:
                    break
                current += step
        if valid:
            chosen = valid[int(rng.integers(len(valid)))]
            left, right = sorted((chosen, int(context_index)))
            while True:
                targets = rng.integers(left, right + 1, cfg.num_target_views)
                if len(set(targets.tolist())) == cfg.num_target_views:
                    break
            return {
                "context": [left, right],
                "target": sorted(int(t) for t in targets),
            }
    return None


def save_index(index: dict, path: Path) -> None:
    path.mkdir(exist_ok=True, parents=True)
    with (path / "evaluation_index.json").open("w") as f:
        json.dump(index, f)
