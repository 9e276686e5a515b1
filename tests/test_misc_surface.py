"""Smoke tests for the remaining public surface: metric computer, index
generator, 3-axis projections, camera drawing, spin trajectory."""

import json

import jax.numpy as jnp
import numpy as np

from my_depthsplat_tpu.eval.index_generator import (
    IndexGeneratorCfg,
    generate_index_for_scene,
    save_index,
)
from my_depthsplat_tpu.eval.metric_computer import (
    EvaluationCfg,
    MethodCfg,
    compute_metrics,
)
from my_depthsplat_tpu.gaussians.types import Gaussians
from my_depthsplat_tpu.utils.camera_path import generate_spin
from my_depthsplat_tpu.utils.drawing import draw_cameras
from my_depthsplat_tpu.utils.image_io import save_image
from my_depthsplat_tpu.utils.validation_viz import render_projections


def test_metric_computer(tmp_path):
    rng = np.random.default_rng(0)
    gt = rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32)
    for name, imgs in [
        ("gt", gt),
        ("methodA", np.clip(gt + 0.01, 0, 1)),
        ("methodB", np.clip(gt + 0.2, 0, 1)),
    ]:
        for i, im in enumerate(imgs):
            save_image(im, tmp_path / name / "scene0" / "color" / f"{i:04d}.png")

    cfg = EvaluationCfg(
        methods=(
            MethodCfg("A", "a", tmp_path / "methodA"),
            MethodCfg("B", "b", tmp_path / "methodB"),
        ),
        side_by_side_path=tmp_path / "sbs",
        output_metrics_path=tmp_path / "metrics.json",
    )
    summary = compute_metrics(cfg, tmp_path / "gt")
    assert summary["a"]["psnr"] > summary["b"]["psnr"]
    assert (tmp_path / "metrics.json").exists()
    assert (tmp_path / "sbs" / "scene0.png").exists()


def test_index_generator(tmp_path):
    # a slowly panning camera: near frames overlap a lot, far frames little
    v = 60
    extr = np.tile(np.eye(4, dtype=np.float32), (v, 1, 1))
    for i in range(v):
        th = i * 0.03
        extr[i, :3, :3] = np.array(
            [[np.cos(th), 0, np.sin(th)], [0, 1, 0], [-np.sin(th), 0, np.cos(th)]]
        )
    intr = np.tile(
        np.array([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1]], np.float32), (v, 1, 1)
    )
    cfg = IndexGeneratorCfg(
        num_target_views=3, min_overlap=0.3, max_overlap=0.95,
        min_distance=5, max_distance=40,
    )
    rng = np.random.default_rng(0)
    entry = generate_index_for_scene(cfg, extr, intr, rng)
    assert entry is not None
    left, right = entry["context"]
    assert 5 <= right - left
    assert all(left <= t <= right for t in entry["target"])
    save_index({"scene0": entry}, tmp_path)
    parsed = json.loads((tmp_path / "evaluation_index.json").read_text())
    assert parsed["scene0"]["context"] == [left, right]


def test_render_projections_and_spin():
    rng = np.random.default_rng(1)
    g = 200
    gaussians = Gaussians(
        means=jnp.asarray(rng.normal(0, 0.5, (1, g, 3)).astype(np.float32)),
        covariances=jnp.broadcast_to(
            jnp.eye(3) * 0.01**2, (1, g, 3, 3)
        ).astype(jnp.float32),
        harmonics=jnp.asarray(rng.normal(0, 0.3, (1, g, 3, 9)).astype(np.float32)),
        opacities=jnp.asarray(rng.uniform(0.3, 0.9, (1, g)).astype(np.float32)),
    )
    views = render_projections(gaussians, resolution=32, backend="oracle")
    assert views.shape == (3, 32, 32, 3)
    assert np.isfinite(views).all()

    poses = generate_spin(num_frames=8, elevation_deg=20, radius=2.0)
    assert poses.shape == (8, 4, 4)
    # all poses look at the origin: forward axis points from position to origin
    for p in poses:
        fwd = p[:3, 2]
        to_origin = -p[:3, 3]
        cos = fwd @ to_origin / (np.linalg.norm(to_origin) + 1e-9)
        assert cos > 0.99


def test_draw_cameras():
    img = np.zeros((48, 48, 3), np.float32)
    extr = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
    extr[0, :3, 3] = [0.3, 0, -2.0]
    extr[1, :3, 3] = [-0.3, 0, -2.0]
    intr = np.tile(
        np.array([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1]], np.float32), (2, 1, 1)
    )
    view = np.eye(4, dtype=np.float32)
    view[:3, 3] = [0, 0, -4.0]
    out = draw_cameras(img, extr, intr, view, np.eye(3, dtype=np.float32) * 0 + intr[0])
    assert out.max() > 0.3  # frusta drawn


def test_initialize_distributed_single_host_noop():
    from my_depthsplat_tpu.parallel import initialize_distributed

    assert initialize_distributed() is False
