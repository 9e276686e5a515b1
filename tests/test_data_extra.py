"""DL3DV + ARKitScenes dataset tests on synthetic fixtures."""

import numpy as np
import pytest
from PIL import Image
from scipy.spatial.transform import Rotation

from my_depthsplat_tpu.data import DataLoaderCfg, data_loader, get_view_sampler
from my_depthsplat_tpu.data.arkit import (
    DatasetARKitScenes,
    DatasetARKitScenesCfg,
    find_scene_orientation,
    interpolate_poses,
    parse_trajectory,
)
from my_depthsplat_tpu.data.dl3dv import DatasetDL3DV, DatasetDL3DVCfg

from test_data import make_chunk


@pytest.fixture
def dl3dv_dir(tmp_path):
    d = tmp_path / "dl3dv" / "train"
    d.mkdir(parents=True)
    make_chunk(d / "000000.torch", n_frames=16, h=54, w=96)
    return tmp_path / "dl3dv"


def test_dl3dv_dataset(dl3dv_dir):
    cfg = DatasetDL3DVCfg(
        roots=(dl3dv_dir,),
        image_shape=(48, 84),
        ori_image_shape=(54, 96),
        min_views=2,
        max_views=3,
    )
    sampler = get_view_sampler(
        "boundedv2",
        num_context_views=3,
        num_target_views=2,
        min_distance_between_context_views=4,
        max_distance_between_context_views=8,
        max_distance_to_context_views=2,
        stage="train",
    )
    ds = DatasetDL3DV(cfg, "train", sampler)
    batch = next(iter(data_loader(ds, DataLoaderCfg(batch_size=1), "train")))
    v_ctx = batch["context"]["image"].shape[1]
    assert 2 <= v_ctx <= 3
    assert batch["context"]["image"].shape[2:] == (48, 84, 3)
    # sorted context indices
    idx = batch["context"]["index"][0]
    assert (np.diff(idx) > 0).all()


def test_dl3dv_rejects_bad_cameras(dl3dv_dir):
    from my_depthsplat_tpu.data.dl3dv import _valid_cameras

    good = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
    assert _valid_cameras(good)
    bad = good.copy()
    bad[0, :3, 3] = 1e5  # absurd translation
    assert not _valid_cameras(bad)
    nonrot = good.copy()
    nonrot[0, :3, :3] *= 2.0  # det != 1
    assert not _valid_cameras(nonrot)


@pytest.fixture
def arkit_dir(tmp_path):
    rng = np.random.default_rng(0)
    scene = tmp_path / "arkit" / "Training" / "sceneA"
    (scene / "lowres_wide").mkdir(parents=True)
    (scene / "lowres_depth").mkdir()
    (scene / "lowres_wide_intrinsics").mkdir()

    # trajectory: camera moving along +x, identity rotation (w2c rows)
    lines = []
    for i in range(30):
        ts = 1000.0 + i * 0.1
        # world->device: rotation 0, translation -x (so c2w translation = +x)
        lines.append(f"{ts} 0 0 0 {-0.05 * i} 0 0")
    (scene / "lowres_wide.traj").write_text("\n".join(lines))

    for i in range(12):
        ts = 1000.05 + i * 0.2
        stem = f"sceneA_{ts:.3f}"
        img = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
        Image.fromarray(img).save(scene / "lowres_wide" / f"{stem}.png")
        depth = rng.integers(500, 5000, (48, 64), dtype=np.uint16)
        Image.fromarray(depth).save(scene / "lowres_depth" / f"{stem}.png")
        (scene / "lowres_wide_intrinsics" / f"{stem}.pincam").write_text(
            "64 48 60.0 60.0 32.0 24.0"
        )
    return tmp_path / "arkit"


def test_arkit_trajectory_interpolation(arkit_dir):
    ts, c2ws = parse_trajectory(
        arkit_dir / "Training" / "sceneA" / "lowres_wide.traj"
    )
    assert len(ts) == 30
    # c2w translation should be +x increasing
    assert c2ws[10, 0, 3] == pytest.approx(0.5, abs=1e-6)
    interp = interpolate_poses(ts, c2ws, np.array([1000.05, 1000.15]))
    assert interp[0, 0, 3] == pytest.approx(0.025, abs=1e-6)
    assert interp[1, 0, 3] == pytest.approx(0.075, abs=1e-6)


def test_arkit_dataset_end_to_end(arkit_dir):
    cfg = DatasetARKitScenesCfg(
        roots=(arkit_dir,), image_shape=(32, 48), min_frames=8, augment=False
    )
    sampler = get_view_sampler(
        "bounded",
        num_context_views=2,
        num_target_views=2,
        min_distance_between_context_views=3,
        max_distance_between_context_views=6,
        stage="train",
    )
    ds = DatasetARKitScenes(cfg, "train", sampler)
    batch = next(iter(data_loader(ds, DataLoaderCfg(batch_size=1), "train")))
    assert batch["context"]["image"].shape == (1, 2, 32, 48, 3)
    assert batch["context"]["depth"].shape == (1, 2, 32, 48)
    # depths in meters (source was 0.5..5m in mm)
    d = batch["context"]["depth"]
    assert 0.1 < d.mean() < 10.0
    assert np.isfinite(batch["context"]["extrinsics"]).all()


def test_sky_orientation_detection():
    # cameras whose device-up maps to world -z ... construct a c2w with device
    # up (-y in cam) pointing along world +z => UP
    c2w = np.eye(4)[None].repeat(3, 0)
    rot_up = Rotation.from_euler("x", -90, degrees=True).as_matrix()
    c2w[:, :3, :3] = rot_up  # -y cam axis -> +z world
    sky, corr = find_scene_orientation(c2w)
    assert sky == "UP"
    np.testing.assert_allclose(corr, np.eye(4), atol=1e-7)
