"""Config loading + checkpoint save/restore + partial-load slot tests."""

import jax
import jax.numpy as jnp
import numpy as np

from my_depthsplat_tpu.config import load_config
from my_depthsplat_tpu.train.checkpoints import (
    find_latest_checkpoint,
    load_pretrained_depth,
    load_pretrained_model,
    load_pretrained_monodepth,
    restore_checkpoint,
    save_checkpoint,
)


def test_config_defaults_and_overrides(tmp_path):
    y = tmp_path / "cfg.yaml"
    y.write_text(
        """
mode: train
dataset:
  name: re10k
  image_shape: [128, 128]
encoder:
  num_scales: 2
  monodepth_vit_type: vitb
optimizer:
  lr: 0.0003
"""
    )
    cfg = load_config(y, ["optimizer.lr=1e-4", "encoder.num_depth_candidates=64",
                         "trainer.max_steps=123"])
    assert cfg.dataset.image_shape == (128, 128)
    assert cfg.encoder.num_scales == 2
    assert cfg.encoder.monodepth_vit_type == "vitb"
    assert cfg.optimizer.lr == 1e-4  # override wins
    assert cfg.encoder.num_depth_candidates == 64
    assert cfg.trainer.max_steps == 123


def test_config_rejects_unknown_keys(tmp_path):
    import pytest

    with pytest.raises(KeyError):
        load_config(None, ["encoder.not_a_real_flag=1"])


def test_checkpoint_roundtrip(tmp_path):
    state = {
        "params": {"a": jnp.arange(4.0), "b": {"c": jnp.ones((2, 2))}},
        "step": jnp.asarray(7),
    }
    save_checkpoint(tmp_path / "ckpts", 7, state)
    save_checkpoint(tmp_path / "ckpts", 12, state)
    latest = find_latest_checkpoint(tmp_path / "ckpts")
    assert latest.name == "step_12"
    zeros = jax.tree.map(jnp.zeros_like, state)
    restored = restore_checkpoint(latest, zeros)
    np.testing.assert_array_equal(np.asarray(restored["params"]["a"]), [0, 1, 2, 3])
    assert int(restored["step"]) == 7


def test_partial_load_slots():
    params = {
        "params": {
            "depth_predictor": {"w": jnp.zeros(3)},
            "head0": {"w": jnp.zeros(2)},
        }
    }
    loaded = {
        "params": {
            "depth_predictor": {"w": jnp.ones(3)},
            "head0": {"w": jnp.ones(2)},
        }
    }
    mono = load_pretrained_monodepth(params, loaded)
    assert np.asarray(mono["params"]["depth_predictor"]["w"]).sum() == 3
    assert np.asarray(mono["params"]["head0"]["w"]).sum() == 0

    model_no_depth = load_pretrained_model(params, loaded, skip_depth_predictor=True)
    assert np.asarray(model_no_depth["params"]["depth_predictor"]["w"]).sum() == 0
    assert np.asarray(model_no_depth["params"]["head0"]["w"]).sum() == 2

    depth_only = load_pretrained_depth(params, loaded)
    assert np.asarray(depth_only["params"]["depth_predictor"]["w"]).sum() == 3
    assert np.asarray(depth_only["params"]["head0"]["w"]).sum() == 0


def test_new_encoder_cfg_fields_roundtrip(tmp_path):
    """spmd/view-sharding and sweep fields flow from YAML to the encoder cfg."""
    import yaml

    from my_depthsplat_tpu.config import load_config

    base = yaml.safe_load(open("configs/re10k_small.yaml"))
    base["encoder"]["spmd_view_axis"] = "model"
    base["encoder"]["sweep_gather_dtype"] = "bfloat16"
    base["encoder"]["spmd_depth_axis"] = "model"
    p = tmp_path / "cfg.yaml"
    yaml.safe_dump(base, open(p, "w"))
    cfg = load_config(p)
    enc = cfg.encoder
    assert enc.spmd_view_axis == "model"
    assert enc.spmd_depth_axis == "model"
    assert enc.sweep_gather_dtype == "bfloat16"


def test_wandb_uri_resolution(tmp_path, monkeypatch):
    """wandb:// checkpoint URIs (reference src/misc/wandb_tools.py:43-62):
    plain paths pass through; wandb URIs raise a clear error when wandb (or
    its project config) is unavailable in this environment."""
    import pytest

    from my_depthsplat_tpu.train.checkpoints import resolve_checkpoint_uri

    p = tmp_path / "ckpt"
    assert resolve_checkpoint_uri(p) == p
    assert resolve_checkpoint_uri(str(p)) == p

    monkeypatch.delenv("WANDB_PROJECT", raising=False)
    with pytest.raises(RuntimeError, match="wandb"):
        resolve_checkpoint_uri("wandb://abc123:v4")
