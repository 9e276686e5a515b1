"""Generate the committed synthetic frozen-evaluation index.

The reference ships frozen evaluation indices (assets/*.json, loaded by
src/dataset/view_sampler/view_sampler_evaluation.py:36-43) that pin exact
context/target frames per scene, making `mode=test` deterministic. Real
RE10K indices can't be regenerated here (no dataset), so this script runs
the SAME generator (eval/index_generator.py — the overlap-controlled search
of evaluation_index_generator.py:46-158) over the synthetic camera
trajectory used by the test suite's chunk fixtures (tests/test_data.py
make_chunk: 12 frames translating along +x, fx=0.9 fy=1.2), and commits the
result as assets/evaluation_index_synthetic.json.

For real runs point dataset.view_sampler_args.index_path at the reference's
assets/evaluation_index_re10k.json (same schema).

Run: python scripts/make_synthetic_eval_index.py  (CPU, deterministic)
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def make_cameras(n_frames=12):
    """The tests' make_chunk trajectory (tests/test_data.py:23-45)."""
    extr = np.zeros((n_frames, 4, 4), np.float32)
    intr = np.zeros((n_frames, 3, 3), np.float32)
    for i in range(n_frames):
        w2c = np.eye(4, dtype=np.float32)
        w2c[0, 3] = -0.1 * i
        extr[i] = np.linalg.inv(w2c)  # c2w
        intr[i] = [[0.9, 0, 0.5], [0, 1.2, 0.5], [0, 0, 1]]
    return extr, intr


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    from my_depthsplat_tpu.eval.index_generator import (
        IndexGeneratorCfg,
        generate_index_for_scene,
    )

    # Bounds scaled to the 12-frame synthetic trajectory (the reference's
    # defaults assume ~200-frame RE10K clips).
    cfg = IndexGeneratorCfg(
        num_target_views=3,
        min_overlap=0.5,
        max_overlap=1.0,
        min_distance=4,
        max_distance=9,
    )
    extr, intr = make_cameras()
    index = {}
    for s in range(2):
        rng = np.random.default_rng(100 + s)
        entry = generate_index_for_scene(cfg, extr, intr, rng)
        assert entry is not None, f"generator found no valid pair for scene{s}"
        index[f"scene{s}"] = entry
    out = Path(__file__).resolve().parents[1] / "assets"
    out.mkdir(exist_ok=True)
    path = out / "evaluation_index_synthetic.json"
    path.write_text(json.dumps(index, indent=1))
    print(f"wrote {path}: {json.dumps(index)}")


if __name__ == "__main__":
    main()
