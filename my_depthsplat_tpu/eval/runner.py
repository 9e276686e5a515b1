"""Test-mode evaluation loop.

Replicates model_wrapper.py test_step/on_test_end (:386-631): per-scene timed
encoder + decoder calls with target-view chunking, PSNR/SSIM/LPIPS
accumulation, image dumps, and scores_all_avg.json / benchmark.json /
peak_memory.json outputs.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..models import DecoderSplattingCfg, decode_splatting
from ..utils.image_io import save_image
from .benchmarker import Benchmarker
from .metrics import compute_psnr, compute_ssim


@dataclass(frozen=True)
class TestCfg:
    output_dir: Path = Path("outputs/test")
    render_chunk_size: int | None = None  # target views per render call
    eval_time_skip_steps: int = 2
    save_image: bool = True
    save_depth: bool = False
    compute_scores: bool = True


def run_test(
    cfg: TestCfg,
    encoder_apply: Callable,  # (context) -> {"gaussians", "depths"}
    batches,  # iterable of single-scene batches (b == 1)
    decoder_cfg: DecoderSplattingCfg = DecoderSplattingCfg(),
    lpips_fn: Callable | None = None,
) -> dict:
    bench = Benchmarker()
    scores: dict[str, list] = {"psnr": [], "ssim": [], "lpips": []}
    names: list[str] = []

    for batch in batches:
        assert batch["target"]["image"].shape[0] == 1
        scene = batch["scene"][0]
        h, w = batch["target"]["image"].shape[2:4]
        v_tgt = batch["target"]["image"].shape[1]

        with bench.time("encoder"):
            out = encoder_apply(batch["context"])
            jax.block_until_ready(out["gaussians"].means)
        gaussians = out["gaussians"]

        chunk = cfg.render_chunk_size or v_tgt
        colors = []
        with bench.time("decoder", num_calls=v_tgt):
            for lo in range(0, v_tgt, chunk):
                hi = min(lo + chunk, v_tgt)
                dec = decode_splatting(
                    decoder_cfg,
                    gaussians,
                    jnp.asarray(batch["target"]["extrinsics"][:, lo:hi]),
                    jnp.asarray(batch["target"]["intrinsics"][:, lo:hi]),
                    jnp.asarray(batch["target"]["near"][:, lo:hi]),
                    jnp.asarray(batch["target"]["far"][:, lo:hi]),
                    (h, w),
                )
                colors.append(dec.color)
            color = jnp.concatenate(colors, axis=1)
            jax.block_until_ready(color)

        gt = jnp.asarray(batch["target"]["image"])  # (1, V, H, W, 3)
        if cfg.compute_scores:
            pr = color.reshape(-1, h, w, 3)
            gtf = gt.reshape(-1, h, w, 3)
            scores["psnr"].append(float(compute_psnr(gtf, pr).mean()))
            scores["ssim"].append(float(compute_ssim(gtf, pr).mean()))
            if lpips_fn is not None:
                scores["lpips"].append(float(lpips_fn(gtf, pr).mean()))
            names.append(scene)

        if cfg.save_image:
            for i in range(v_tgt):
                save_image(
                    np.asarray(color[0, i]),
                    cfg.output_dir / scene / f"color/{i:04d}.png",
                )

    out_dir = Path(cfg.output_dir)
    out_dir.mkdir(exist_ok=True, parents=True)
    if cfg.compute_scores and names:
        avg = {
            k: float(np.mean(v)) for k, v in scores.items() if len(v) > 0
        }
        (out_dir / "scores_all_avg.json").write_text(json.dumps(avg, indent=2))
        for k, v in scores.items():
            if v:
                (out_dir / f"scores_{k}_all.json").write_text(
                    json.dumps(dict(zip(names, v)), indent=2)
                )
    bench.dump(out_dir / "benchmark.json")
    bench.dump_memory(out_dir / "peak_memory.json")
    summary = bench.summarize(cfg.eval_time_skip_steps)
    return {
        "scores": {k: float(np.mean(v)) for k, v in scores.items() if v},
        "timing": summary,
    }
