"""Train-step tests: loss math, schedule, and a full optimization step with
data-parallel sharding over the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from my_depthsplat_tpu.gaussians import GaussianAdapterCfg
from my_depthsplat_tpu.models.encoder import EncoderDepthSplatCfg
from my_depthsplat_tpu.parallel import MeshCfg, make_mesh, shard_batch
from my_depthsplat_tpu.train import (
    LossCfg,
    OptimizerCfg,
    TrainCfg,
    compute_losses,
    make_train_step,
    onecycle_cosine,
)
from my_depthsplat_tpu.train.losses import mse_loss

from test_models import make_context, tiny_vit  # noqa: F401  (fixture reuse)


@pytest.fixture(autouse=True)
def _patch_tiny_vit(monkeypatch):
    from my_depthsplat_tpu.models import vit as vit_mod

    monkeypatch.setitem(vit_mod.VIT_CONFIGS, "vits", tiny_vit())
    monkeypatch.setitem(vit_mod.INTERMEDIATE_LAYER_IDX, "vits", [0, 1, 2, 3])


def test_mse_loss_clamp_matches_masked_mean():
    rng = np.random.default_rng(0)
    pred = jnp.asarray(rng.normal(size=(4, 8, 8, 3)), jnp.float32)
    target = jnp.zeros_like(pred)
    clamp = 0.5
    ours = mse_loss(pred, target, 1.0, l1=False, clamp_large_error=clamp)
    d = np.asarray(pred)
    keep = d[d**2 < clamp]
    np.testing.assert_allclose(float(ours), np.mean(keep**2), rtol=1e-5)


def test_onecycle_schedule_shape():
    sched = onecycle_cosine(1e-3, 1000, pct_start=0.01)
    lrs = np.asarray([sched(s) for s in [0, 10, 100, 500, 999]])
    assert lrs[1] == pytest.approx(1e-3, rel=1e-3)  # peak at end of warmup
    assert lrs[0] < lrs[1]
    assert lrs[2] < lrs[1] and lrs[3] < lrs[2] and lrs[4] < lrs[3]
    assert lrs[4] < 1e-6  # annealed to ~initial/1e4


def test_compute_losses_intermediate_weighting():
    b, v, h, w = 1, 1, 4, 4
    target = jnp.zeros((b, v, h, w, 3))
    color = jnp.stack(
        [jnp.full((v, h, w, 3), 1.0), jnp.full((v, h, w, 3), 2.0)]
    )  # two stacked preds: intermediate=1, final=2
    cfg = LossCfg(mse_weight=1.0, lpips_weight=0.0, intermediate_loss_weight=0.5)
    total, logs = compute_losses(cfg, color, target, jnp.zeros((), jnp.int32))
    # final mse = 4, intermediate = 0.5^1 * 1 = 0.5
    np.testing.assert_allclose(float(total), 4.0 + 0.5, rtol=1e-6)


def _tiny_train_cfg():
    return TrainCfg(
        encoder=EncoderDepthSplatCfg(
            depth_branch="unimatch",
            gaussian_adapter=GaussianAdapterCfg(1e-10, 3.0, 2),
            num_scales=1,
            upsample_factor=4,
            lowest_feature_resolution=4,
            num_depth_candidates=16,
            costvolume_unet_feat_dim=16,
            monodepth_vit_type="vits",
            supervise_intermediate_depth=False,
        ),
        loss=LossCfg(lpips_weight=0.0),
        optimizer=OptimizerCfg(lr=1e-4, lr_monodepth=1e-6, total_steps=100),
    )


def make_batch(b=1, h=32, w=32, seed=0):
    ctx = make_context(b=b, v=2, h=h, w=w, seed=seed)
    tgt_ctx = make_context(b=b, v=1, h=h, w=w, seed=seed + 1)
    return {
        "context": ctx,
        "target": {
            "image": tgt_ctx["image"],
            "extrinsics": tgt_ctx["extrinsics"],
            "intrinsics": tgt_ctx["intrinsics"],
            "near": tgt_ctx["near"],
            "far": tgt_ctx["far"],
        },
    }


@pytest.mark.slow
def test_train_step_reduces_loss():
    cfg = _tiny_train_cfg()
    init_fn, train_step = make_train_step(cfg)
    batch = make_batch()
    state = init_fn(jax.random.key(0), batch)
    step = jax.jit(train_step)
    state, logs0 = step(state, batch)
    assert np.isfinite(float(logs0["loss/total"]))
    assert float(logs0["grad_norm"]) > 0
    for _ in range(3):
        state, logs = step(state, batch)
    assert float(logs["loss/total"]) < float(logs0["loss/total"])
    assert int(state.step) == 4


@pytest.mark.slow
def test_train_step_data_parallel_8_devices():
    """Same step, batch sharded over the 8-device data axis; jit inserts the
    gradient reduction. Losses must match the single-device value."""
    cfg = _tiny_train_cfg()
    init_fn, train_step = make_train_step(cfg)
    batch = make_batch(b=8)
    state = init_fn(jax.random.key(0), batch)

    mesh = make_mesh(MeshCfg(data=8, model=1))
    sharded = shard_batch(mesh, batch)
    step = jax.jit(train_step)
    state2, logs_sharded = step(state, sharded)
    _, logs_local = step(state, batch)
    np.testing.assert_allclose(
        float(logs_sharded["loss/total"]), float(logs_local["loss/total"]),
        rtol=2e-4,
    )


def test_grad_accum_matches_full_batch():
    """grad_accum=2 on a bs2 batch must produce the same update as the
    single full-batch step (mean-of-microbatch grads == full-batch grad for
    equal microbatch sizes)."""
    from dataclasses import replace

    cfg = _tiny_train_cfg()
    batch = make_batch(b=2)
    init_fn, step_full = make_train_step(cfg)
    _, step_accum = make_train_step(replace(cfg, grad_accum=2))
    state = init_fn(jax.random.key(0), batch)

    s_full, logs_full = jax.jit(step_full)(state, batch)
    s_acc, logs_acc = jax.jit(step_accum)(state, batch)
    np.testing.assert_allclose(
        float(logs_acc["loss/total"]), float(logs_full["loss/total"]),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(logs_acc["grad_norm"]), float(logs_full["grad_norm"]),
        rtol=1e-4,
    )
    for pa, pf in zip(
        jax.tree.leaves(s_acc.params), jax.tree.leaves(s_full.params)
    ):
        np.testing.assert_allclose(
            np.asarray(pa), np.asarray(pf), rtol=2e-4, atol=2e-6
        )


def test_grad_accum_rejects_indivisible_batch():
    from dataclasses import replace

    cfg = replace(_tiny_train_cfg(), grad_accum=2)
    init_fn, step = make_train_step(cfg)
    batch = make_batch(b=1)
    state = init_fn(jax.random.key(0), batch)
    with pytest.raises(ValueError, match="not divisible"):
        jax.jit(step)(state, batch)
