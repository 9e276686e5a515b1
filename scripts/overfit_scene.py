"""End-to-end training-convergence proof on the real TPU: overfit a single
multi-view-consistent synthetic scene through the FULL driver (main.train:
curriculum loader, Pallas rasterizer fwd+bwd, checkpointing, validation) and
commit the rendered-PSNR/loss curves as artifacts.

The scene is a textured fronto-parallel plane viewed by a camera translating
along +x: view i's image is the texture window shifted by a constant integer
disparity (fx_px * baseline / depth), so the views are exactly consistent
with the stored cameras and a perfect model can drive the render loss to
zero. This is the analog of the reference's routine overfit sanity runs
through model_wrapper.py:165-343.

Usage (run on the real TPU; ~6 min for 300 steps):

    python scripts/overfit_scene.py --steps 300 --out artifacts/overfit_r04

Outputs: <out>/metrics.jsonl (the driver's log), <out>/curve.png
(loss + train/psnr vs step), and the driver's checkpoints/val panels.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def build_scene(root: Path, h=64, w=64, n_frames=12, disparity=4, seed=7):
    """Write a re10k-format chunk of one synthetic plane scene to
    root/{train,test}/000000.torch."""
    import torch
    from PIL import Image

    rng = np.random.default_rng(seed)
    # Smooth random texture: low-pass noise upsampled 8x, so JPEG is nearly
    # lossless and sub-pixel interpolation is benign.
    tw = w + disparity * (n_frames - 1)
    small = rng.uniform(0, 1, (h // 8 + 2, tw // 8 + 2, 3))
    tex = np.asarray(
        Image.fromarray((small * 255).astype(np.uint8)).resize(
            (tw, h), Image.BILINEAR
        ),
        dtype=np.uint8,
    )

    fx = 0.9  # normalized; fx_px = fx * w
    depth = 4.0
    baseline = disparity * depth / (fx * w)  # world units per frame

    cameras = np.zeros((n_frames, 18), np.float32)
    cameras[:, 0] = fx
    cameras[:, 1] = fx * w / h  # square pixels
    cameras[:, 2] = 0.5
    cameras[:, 3] = 0.5
    images = []
    for i in range(n_frames):
        w2c = np.eye(4, dtype=np.float32)
        # camera at x = i*baseline -> w2c translation is -i*baseline
        w2c[0, 3] = -baseline * i
        cameras[i, 6:] = w2c[:3].reshape(-1)
        # camera moving +x sees the texture window moving +x
        frame = tex[:, i * disparity : i * disparity + w]
        buf = io.BytesIO()
        Image.fromarray(frame).save(buf, format="JPEG", quality=98)
        images.append(
            torch.frombuffer(bytearray(buf.getvalue()), dtype=torch.uint8)
        )
    scene = [
        {
            "key": "plane0",
            "cameras": torch.from_numpy(cameras),
            "images": images,
        }
    ]
    for split in ("train", "test"):
        d = root / split
        d.mkdir(parents=True, exist_ok=True)
        torch.save(scene, d / "000000.torch")
    return {"depth": depth, "baseline": baseline, "n_frames": n_frames}


def plot_curves(jsonl: Path, png: Path) -> dict:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    steps, loss, psnr = [], [], []
    for line in jsonl.read_text().splitlines():
        rec = json.loads(line)
        if "loss/total" in rec:
            steps.append(rec["step"])
            loss.append(rec["loss/total"])
            psnr.append(rec.get("train/psnr", np.nan))

    fig, (ax1, ax2) = plt.subplots(2, 1, figsize=(7, 6), sharex=True)
    for ax in (ax1, ax2):
        ax.grid(True, color="#e3e3e3", linewidth=0.6)
        ax.spines[["top", "right"]].set_visible(False)
    ax1.plot(steps, loss, color="#4063d8", linewidth=2)
    ax1.set_yscale("log")
    ax1.set_title("Overfit-one-scene on v5e: total loss", loc="left")
    ax2.plot(steps, psnr, color="#389826", linewidth=2)
    ax2.set_title("train/psnr (dB)", loc="left")
    ax2.set_xlabel("step")
    fig.tight_layout()
    png.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(png, dpi=120)
    return {
        "first_psnr": psnr[0] if psnr else None,
        "last_psnr": psnr[-1] if psnr else None,
        "first_loss": loss[0] if loss else None,
        "last_loss": loss[-1] if loss else None,
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--out", type=Path, default=Path("artifacts/overfit_r04"))
    ap.add_argument("--data", type=Path, default=None,
                    help="scene dir (default <out>/data, built if missing)")
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--plot-only", action="store_true",
                    help="just regenerate curve.png from metrics.jsonl")
    ap.add_argument("--tiny-vit", action="store_true",
                    help="shrink the ViT to toy size (CPU smoke tests only)")
    ap.add_argument("--override", action="append", default=[],
                    help="extra config dot-overrides, e.g. "
                         "--override encoder.compute_dtype=bfloat16")
    a = ap.parse_args()

    out = a.out
    if not a.plot_only:
        data = a.data or out / "data"
        build_scene(data, h=a.size, w=a.size)
        if a.tiny_vit:
            from my_depthsplat_tpu.models import vit as vit_mod

            vit_mod.VIT_CONFIGS["vits"] = vit_mod.ViTConfig(
                embed_dim=64, depth=4, num_heads=2, base_img_size=56
            )
            vit_mod.INTERMEDIATE_LAYER_IDX["vits"] = [0, 1, 2, 3]

        from my_depthsplat_tpu.config import load_config
        from my_depthsplat_tpu.main import train

        cfg = load_config(None, [
            f"output_dir={out}",
            f"dataset.roots=[{data}]",
            f"dataset.image_shape=[{a.size}, {a.size}]",
            f"dataset.expected_shape=[{a.size}, {a.size}]",
            "dataset.augment=false",
            "dataset.view_sampler=bounded",
            "dataset.view_sampler_args.num_context_views=2",
            "dataset.view_sampler_args.num_target_views=2",
            "dataset.view_sampler_args.min_distance_between_context_views=4",
            "dataset.view_sampler_args.max_distance_between_context_views=8",
            # small-but-real model: vits mono branch, single scale
            "encoder.num_scales=1",
            "encoder.num_depth_candidates=64",
            "encoder.costvolume_unet_feat_dim=64",
            "encoder.gaussian_regressor_channels=32",
            f"trainer.max_steps={a.steps}",
            f"trainer.val_check_interval={max(50, a.steps // 4)}",
            "trainer.print_log_every_n_steps=10",
            f"checkpointing.every_n_train_steps={max(100, a.steps // 2)}",
            "optimizer.lr=2e-4",
            f"optimizer.total_steps={a.steps}",
            "optimizer.warmup_pct=0.1",
            "loss.lpips_weight=0.0",
        ] + a.override)
        train(cfg)

    summary = plot_curves(out / "metrics.jsonl", out / "curve.png")
    print(json.dumps(summary))
    if summary["last_psnr"] is not None and summary["first_psnr"] is not None:
        gain = summary["last_psnr"] - summary["first_psnr"]
        print(f"PSNR gain over run: {gain:+.2f} dB")


if __name__ == "__main__":
    main()
