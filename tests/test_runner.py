"""Eval runner test with a stub encoder — covers score dumps, ply export,
depth dumps, and trajectory video rendering without a trained model."""

import json

import jax.numpy as jnp
import numpy as np

from my_depthsplat_tpu.eval.runner import TestCfg, run_test
from my_depthsplat_tpu.gaussians.types import PerViewGaussians
from my_depthsplat_tpu.utils.ply_export import read_ply


def make_batch(h=32, w=32, v_ctx=2, v_tgt=2, seed=0):
    rng = np.random.default_rng(seed)
    def cams(v):
        extr = np.broadcast_to(np.eye(4, dtype=np.float32), (1, v, 4, 4)).copy()
        for i in range(v):
            extr[:, i, 0, 3] = 0.1 * i
        intr = np.broadcast_to(
            np.array([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1]], np.float32),
            (1, v, 3, 3),
        )
        return extr, intr

    ce, ci = cams(v_ctx)
    te, ti = cams(v_tgt)
    return {
        "scene": ["sceneX"],
        "context": {
            "image": rng.uniform(0, 1, (1, v_ctx, h, w, 3)).astype(np.float32),
            "extrinsics": ce, "intrinsics": ci,
            "near": np.full((1, v_ctx), 1.0, np.float32),
            "far": np.full((1, v_ctx), 100.0, np.float32),
        },
        "target": {
            "image": rng.uniform(0, 1, (1, v_tgt, h, w, 3)).astype(np.float32),
            "extrinsics": te, "intrinsics": ti,
            "near": np.full((1, v_tgt), 1.0, np.float32),
            "far": np.full((1, v_tgt), 100.0, np.float32),
        },
    }


def stub_encoder(context, h=32, w=32):
    """Pixel-aligned gaussians along the first view's rays, image colors."""
    rng = np.random.default_rng(1)
    b, v = 1, context["image"].shape[1]
    n = v * h * w
    depths = rng.uniform(2, 6, (b, v, h * w, 1, 1)).astype(np.float32)
    per_view = PerViewGaussians(
        means=jnp.asarray(
            np.concatenate(
                [rng.normal(0, 0.5, (b, v, h * w, 1, 1, 2)),
                 depths[..., None] * 1.0], axis=-1
            ).astype(np.float32)
        ),
        covariances=jnp.broadcast_to(
            jnp.eye(3) * 0.02**2, (b, v, h * w, 1, 1, 3, 3)
        ).astype(jnp.float32),
        harmonics=jnp.asarray(
            rng.normal(0, 0.2, (b, v, h * w, 1, 1, 3, 9)).astype(np.float32)
        ),
        opacities=jnp.asarray(
            rng.uniform(0.3, 0.9, (b, v, h * w, 1, 1)).astype(np.float32)
        ),
        scales=jnp.full((b, v, h * w, 1, 1, 3), 0.02, jnp.float32),
        rotations=jnp.broadcast_to(
            jnp.asarray([0.0, 0, 0, 1]), (b, v, h * w, 1, 1, 4)
        ).astype(jnp.float32),
    )
    depth_map = jnp.asarray(depths.reshape(b, v, h, w))
    return {
        "gaussians": per_view.flattened(),
        "per_view": per_view,
        "depths": depth_map,
    }


def test_run_test_full_outputs(tmp_path):
    cfg = TestCfg(
        output_dir=tmp_path,
        save_image=True,
        save_depth=True,
        save_gaussians=True,
        save_video=True,
        stabilize_camera=True,
        video_frames=4,
        render_chunk_size=2,
    )
    result = run_test(cfg, stub_encoder, [make_batch()])

    assert np.isfinite(result["scores"]["psnr"])
    assert "encoder" in result["timing"] and "decoder" in result["timing"]
    assert (tmp_path / "scores_all_avg.json").exists()
    assert (tmp_path / "benchmark.json").exists()
    assert (tmp_path / "sceneX" / "color" / "0000.png").exists()
    assert (tmp_path / "sceneX" / "depth" / "0000.png").exists()
    assert (tmp_path / "sceneX" / "depth" / "0000.npy").exists()

    ply = read_ply(tmp_path / "sceneX" / "gaussians.ply")
    # 8px border trim on 32x32 -> 16x16 kept per view, 2 views
    assert len(ply["x"]) == 2 * 16 * 16

    video = tmp_path / "sceneX" / "video.mp4"
    frames_dir = tmp_path / "sceneX" / "video"
    assert video.exists() or frames_dir.exists()

    parsed = json.loads((tmp_path / "scores_all_avg.json").read_text())
    assert "psnr" in parsed and "ssim" in parsed


def test_window_overflow_guard(tmp_path):
    """Nonzero sweep_window_overflow from the encoder fails eval by default
    (silently-degraded cost volumes must not produce published numbers) and
    is downgraded to a warning by allow_window_overflow."""
    import pytest

    def overflowing_encoder(context):
        out = stub_encoder(context)
        out["sweep_window_overflow"] = jnp.asarray(5, jnp.int32)
        return out

    cfg = TestCfg(output_dir=tmp_path, save_image=False, compute_scores=False)
    with pytest.raises(AssertionError, match="dropped 5 taps"):
        run_test(cfg, overflowing_encoder, [make_batch()])

    cfg = TestCfg(
        output_dir=tmp_path, save_image=False, compute_scores=False,
        allow_window_overflow=True,
    )
    run_test(cfg, overflowing_encoder, [make_batch()])  # warns, completes
