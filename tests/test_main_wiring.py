"""Driver-wiring tests (VERDICT round-1 items): dataset registry dispatch,
LPIPS loss wiring, pretrained slots, depth-only train/test, validation split,
and checkpoint retention."""

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from my_depthsplat_tpu.config import load_config
from my_depthsplat_tpu.data import build_dataset_cfg, get_dataset
from my_depthsplat_tpu.data.arkit import DatasetARKitScenesCfg
from my_depthsplat_tpu.data.dl3dv import DatasetDL3DV, DatasetDL3DVCfg
from my_depthsplat_tpu.data.re10k import DatasetRE10kCfg
from my_depthsplat_tpu.train import make_train_step
from my_depthsplat_tpu.train.checkpoints import prune_checkpoints
from my_depthsplat_tpu.train.lpips_io import load_lpips_params, save_lpips_params

from test_data import make_chunk
from test_main_smoke import _run_cli
from test_models import tiny_vit
from test_train import _tiny_train_cfg, make_batch


@pytest.fixture(autouse=True)
def _patch_tiny_vit(monkeypatch):
    from my_depthsplat_tpu.models import vit as vit_mod

    monkeypatch.setitem(vit_mod.VIT_CONFIGS, "vits", tiny_vit())
    monkeypatch.setitem(vit_mod.INTERMEDIATE_LAYER_IDX, "vits", [0, 1, 2, 3])


# ---------------------------------------------------------------- registry
def test_registry_builds_each_dataset_cfg():
    for name, want in [
        ("re10k", DatasetRE10kCfg),
        ("dl3dv", DatasetDL3DVCfg),
        ("arkit_scenes", DatasetARKitScenesCfg),
    ]:
        cfg = load_config(None, [f"dataset.name={name}"])
        assert type(build_dataset_cfg(cfg.dataset)) is want


def test_registry_extra_args_and_rejection():
    cfg = load_config(
        None,
        ["dataset.name=dl3dv", "dataset.extra_args.min_views=3",
         "dataset.extra_args.ori_image_shape=[54, 96]"],
    )
    ds_cfg = build_dataset_cfg(cfg.dataset)
    assert ds_cfg.min_views == 3
    assert ds_cfg.ori_image_shape == (54, 96)

    with pytest.raises(ValueError):
        build_dataset_cfg(load_config(None, ["dataset.name=nope"]).dataset)
    with pytest.raises(KeyError):
        build_dataset_cfg(
            load_config(
                None, ["dataset.name=re10k", "dataset.extra_args.bogus=1"]
            ).dataset
        )


def test_get_dataset_dispatches_dl3dv(tmp_path):
    d = tmp_path / "dl3dv" / "train"
    d.mkdir(parents=True)
    make_chunk(d / "000000.torch", n_frames=16, h=54, w=96)
    cfg = load_config(
        None,
        [f"dataset.roots=[{tmp_path / 'dl3dv'}]", "dataset.name=dl3dv",
         "dataset.image_shape=[48, 84]",
         "dataset.extra_args.ori_image_shape=[54, 96]"],
    )
    from my_depthsplat_tpu.data import get_view_sampler

    sampler = get_view_sampler(
        "boundedv2", stage="train", num_context_views=2, num_target_views=2,
        min_distance_between_context_views=2,
        max_distance_between_context_views=6,
        max_distance_to_context_views=2,
    )
    ds = get_dataset(cfg.dataset, "train", sampler)
    assert isinstance(ds, DatasetDL3DV)
    ex = next(ds.examples(np.random.default_rng(0)))
    assert ex["context"]["image"].shape[-1] == 3


# ---------------------------------------------------------- depth-only mode
@pytest.mark.slow
def test_depth_only_train_step():
    import dataclasses

    cfg = _tiny_train_cfg()
    cfg = dataclasses.replace(
        cfg, encoder=dataclasses.replace(cfg.encoder, train_depth_only=True)
    )
    init_fn, train_step = make_train_step(cfg)
    batch = make_batch(h=32, w=32)
    rng = np.random.default_rng(0)
    gt = rng.uniform(0.5, 5.0, (1, 2, 32, 32)).astype(np.float32)
    gt[:, :, :4] = 0.0  # invalid region must be masked out
    batch["context"]["depth"] = jnp.asarray(gt)
    state = init_fn(jax.random.key(0), batch)
    step = jax.jit(train_step)
    state, logs0 = step(state, batch)
    assert np.isfinite(float(logs0["loss/depth_l1"]))
    assert float(logs0["grad_norm"]) > 0
    for _ in range(3):
        state, logs = step(state, batch)
    assert float(logs["loss/total"]) < float(logs0["loss/total"])


def test_depth_only_requires_gt_depth():
    import dataclasses

    from my_depthsplat_tpu.train.step import TrainState

    cfg = _tiny_train_cfg()
    cfg = dataclasses.replace(
        cfg, encoder=dataclasses.replace(cfg.encoder, train_depth_only=True)
    )
    _, train_step = make_train_step(cfg)
    batch = make_batch(h=32, w=32)
    # the guard fires at trace time before the encoder runs, so no real
    # params are needed (a full eager init cost ~110 s of this test's time)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params={}, opt_state=None
    )
    with pytest.raises(ValueError, match="train_depth_only"):
        train_step(state, batch)


def test_runner_depth_only(tmp_path):
    from my_depthsplat_tpu.eval.runner import TestCfg, run_test

    depths = jnp.asarray(
        np.random.default_rng(0).uniform(1, 5, (1, 2, 16, 16)), jnp.float32
    )
    batch = {
        "scene": ["sceneX"],
        "context": {"image": np.zeros((1, 2, 16, 16, 3), np.float32)},
        "target": {
            "image": np.zeros((1, 1, 16, 16, 3), np.float32),
            "extrinsics": np.tile(np.eye(4, dtype=np.float32), (1, 1, 1, 1)),
            "intrinsics": np.tile(np.eye(3, dtype=np.float32), (1, 1, 1, 1)),
            "near": np.ones((1, 1), np.float32),
            "far": np.full((1, 1), 10.0, np.float32),
        },
    }
    result = run_test(
        TestCfg(output_dir=tmp_path / "t", forward_depth_only=True),
        lambda ctx: {"gaussians": None, "depths": depths},
        [batch],
    )
    assert result["scores"] == {}
    assert (tmp_path / "t" / "sceneX" / "depth" / "0000.png").exists()
    assert (tmp_path / "t" / "sceneX" / "depth" / "0001.npy").exists()


# ------------------------------------------------------------------- lpips
def test_lpips_io_roundtrip(tmp_path):
    tree = {
        "params": {
            "vgg": {"conv0_0": {"kernel": np.ones((3, 3, 3, 8), np.float32)}},
            "lin0": np.full((8, 1), 0.5, np.float32),
        }
    }
    p = tmp_path / "lpips.npz"
    save_lpips_params(p, tree)
    back = load_lpips_params(p)
    np.testing.assert_array_equal(
        back["params"]["vgg"]["conv0_0"]["kernel"],
        tree["params"]["vgg"]["conv0_0"]["kernel"],
    )
    np.testing.assert_array_equal(back["params"]["lin0"], tree["params"]["lin0"])


def test_build_lpips_missing_file_disables(tmp_path, capsys):
    from my_depthsplat_tpu.train.lpips_io import build_lpips

    fn, params = build_lpips(tmp_path / "absent.npz")
    assert fn is None and params is None


# -------------------------------------------------------------- checkpoints
def test_prune_checkpoints(tmp_path):
    for s in [1, 5, 3, 9, 7]:
        (tmp_path / f"step_{s}").mkdir()
    (tmp_path / "not_a_ckpt").mkdir()
    prune_checkpoints(tmp_path, keep=2)
    left = sorted(p.name for p in tmp_path.iterdir())
    assert left == ["not_a_ckpt", "step_7", "step_9"]


# ------------------------------------------------------------ CLI wiring
@pytest.mark.slow
def test_cli_dl3dv_dispatch_and_validation(tmp_path):
    """dl3dv config must load the DL3DV reader (VERDICT missing #2) and the
    val hook must log val/psnr from the held-out split (#4)."""
    for split in ("train", "test"):
        d = tmp_path / "dl3dv" / split
        d.mkdir(parents=True)
        make_chunk(d / "000000.torch", n_scenes=2, n_frames=12, h=48, w=48,
                   seed=0 if split == "train" else 1)
    overrides = [
        f"output_dir={tmp_path / 'out'}",
        "dataset.name=dl3dv",
        f"dataset.roots=[{tmp_path / 'dl3dv'}]",
        "dataset.image_shape=[32, 32]",
        "dataset.extra_args.ori_image_shape=[48, 48]",
        "dataset.extra_args.min_views=2",
        "dataset.extra_args.max_views=2",
        "dataset.view_sampler=boundedv2",
        "dataset.view_sampler_args={num_context_views: 2, num_target_views: 2, "
        "min_distance_between_context_views: 2, "
        "max_distance_between_context_views: 5, "
        "max_distance_to_context_views: 2}",
        "encoder.num_scales=1",
        "encoder.num_depth_candidates=16",
        "encoder.costvolume_unet_feat_dim=16",
        "encoder.supervise_intermediate_depth=false",
        "loss.lpips_weight=0",
        "optimizer.total_steps=10",
        "trainer.max_steps=2",
        "trainer.val_check_interval=2",
        "trainer.print_log_every_n_steps=1",
        "checkpointing.every_n_train_steps=100",
        "data_loader.batch_size=1",
    ]
    r = _run_cli(tmp_path, overrides)
    assert r.returncode == 0, r.stderr[-3000:]
    lines = [
        json.loads(l)
        for l in (tmp_path / "out" / "metrics.jsonl").read_text().splitlines()
    ]
    assert any("val/psnr" in l for l in lines), r.stdout[-2000:]


@pytest.mark.slow
def test_cli_pretrained_slots_and_save_top_k(tmp_path):
    """Pretrained-slot loading via the CLI (VERDICT missing #3) and
    save_top_k retention (#7)."""
    data = tmp_path / "re10k" / "train"
    data.mkdir(parents=True)
    make_chunk(data / "000000.torch", n_scenes=2, n_frames=10, h=48, w=48)
    (tmp_path / "re10k" / "test").mkdir()
    make_chunk(tmp_path / "re10k" / "test" / "000000.torch", n_scenes=1,
               n_frames=10, h=48, w=48, seed=1)

    common = [
        f"dataset.roots=[{tmp_path / 're10k'}]",
        "dataset.image_shape=[32, 32]",
        "dataset.view_sampler_args={num_context_views: 2, num_target_views: 2, "
        "min_distance_between_context_views: 2, "
        "max_distance_between_context_views: 5}",
        "encoder.num_scales=1",
        "encoder.num_depth_candidates=16",
        "encoder.costvolume_unet_feat_dim=16",
        "encoder.supervise_intermediate_depth=false",
        "loss.lpips_weight=0",
        "optimizer.total_steps=10",
        "trainer.print_log_every_n_steps=1",
        "trainer.val_check_interval=100",
        "data_loader.batch_size=1",
    ]
    r = _run_cli(
        tmp_path,
        common + [
            f"output_dir={tmp_path / 'out1'}",
            "trainer.max_steps=3",
            "checkpointing.every_n_train_steps=1",
            "checkpointing.save_top_k=2",
        ],
    )
    assert r.returncode == 0, r.stderr[-3000:]
    ckpts = sorted((tmp_path / "out1" / "checkpoints").iterdir())
    assert [c.name for c in ckpts] == ["step_2", "step_3"]  # top-k pruned

    # all three slots load through the CLI (applied in reference order in
    # one run — each prints its own confirmation)
    r2 = _run_cli(
        tmp_path,
        common + [
            f"output_dir={tmp_path / 'out_slots'}",
            "trainer.max_steps=1",
            "checkpointing.every_n_train_steps=100",
            f"checkpointing.pretrained_model={ckpts[-1]}",
            f"checkpointing.pretrained_monodepth={ckpts[-1]}",
            f"checkpointing.pretrained_depth={ckpts[-1]}",
        ],
    )
    assert r2.returncode == 0, r2.stderr[-3000:]
    assert "loaded pretrained_model" in r2.stdout
    assert "loaded pretrained_monodepth" in r2.stdout
    assert "loaded pretrained depth slot" in r2.stdout


_TINY_LPIPS_PATCH = """
import my_depthsplat_tpu.train.lpips_net as lpips_mod
lpips_mod._VGG_STAGES = ((8, 1), (16, 1))
"""


@pytest.mark.slow
def test_cli_lpips_wiring(tmp_path, monkeypatch):
    """LPIPS appears in train logs and scores_all_avg.json when a weights
    file is configured (VERDICT missing #1). The VGG is shrunk identically
    in this process (weight generation) and the CLI subprocess."""
    from my_depthsplat_tpu.train import lpips_net

    monkeypatch.setattr(lpips_net, "_VGG_STAGES", ((8, 1), (16, 1)))
    net = lpips_net.LPIPS()
    params = net.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)),
                      jnp.zeros((1, 32, 32, 3)))
    weights = tmp_path / "lpips.npz"
    save_lpips_params(weights, jax.tree.map(np.asarray, params))

    data = tmp_path / "re10k" / "train"
    data.mkdir(parents=True)
    make_chunk(data / "000000.torch", n_scenes=2, n_frames=10, h=48, w=48)
    test_d = tmp_path / "re10k" / "test"
    test_d.mkdir()
    make_chunk(test_d / "000000.torch", n_scenes=1, n_frames=10, h=48, w=48,
               seed=1)
    common = [
        f"output_dir={tmp_path / 'out'}",
        f"dataset.roots=[{tmp_path / 're10k'}]",
        "dataset.image_shape=[32, 32]",
        "dataset.view_sampler_args={num_context_views: 2, num_target_views: 2, "
        "min_distance_between_context_views: 2, "
        "max_distance_between_context_views: 5}",
        "encoder.num_scales=1",
        "encoder.num_depth_candidates=16",
        "encoder.costvolume_unet_feat_dim=16",
        "encoder.supervise_intermediate_depth=false",
        "loss.lpips_weight=0.05",
        "loss.lpips_apply_after_step=0",
        f"loss.lpips_weights={weights}",
        "optimizer.total_steps=10",
        "trainer.max_steps=2",
        "trainer.val_check_interval=100",
        "trainer.print_log_every_n_steps=1",
        "checkpointing.every_n_train_steps=100",
        "data_loader.batch_size=1",
    ]
    r = _run_cli(tmp_path, common, timeout=600, extra_patch=_TINY_LPIPS_PATCH)
    assert r.returncode == 0, r.stderr[-3000:]
    lines = [
        json.loads(l)
        for l in (tmp_path / "out" / "metrics.jsonl").read_text().splitlines()
    ]
    lpips_vals = [l["loss/lpips"] for l in lines if "loss/lpips" in l]
    assert lpips_vals and any(v != 0.0 for v in lpips_vals)

    r2 = _run_cli(tmp_path, common + ["mode=test"], timeout=600,
                  extra_patch=_TINY_LPIPS_PATCH)
    assert r2.returncode == 0, r2.stderr[-3000:]
    scores = json.loads(
        (tmp_path / "out" / "test" / "scores_all_avg.json").read_text()
    )
    assert "lpips" in scores and np.isfinite(scores["lpips"])


# ----------------------------------------------------- overflow warning
def test_window_overflow_warning_one_shot(capsys):
    """First nonzero sweep/window_overflow prints a loud warning, once."""
    from my_depthsplat_tpu.main import _warn_window_overflow

    # zero / absent: no warning
    assert _warn_window_overflow({}, 0, False) is False
    assert _warn_window_overflow({"sweep/window_overflow": 0.0}, 1, False) is False
    assert capsys.readouterr().out == ""
    # first nonzero: loud warning
    warned = _warn_window_overflow({"sweep/window_overflow": 42.0}, 2, False)
    assert warned is True
    out = capsys.readouterr().out
    assert "WARNING" in out and "DROPPING" in out and "42" in out
    # already warned: silent
    assert _warn_window_overflow({"sweep/window_overflow": 99.0}, 3, True) is True
    assert capsys.readouterr().out == ""
