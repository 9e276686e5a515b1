"""CLI entry point: training / testing driver.

Replaces the reference's hydra main + Lightning Trainer (src/main.py:44-288):

    python -m my_depthsplat_tpu.main --config config/re10k.yaml mode=train \\
        optimizer.lr=2e-4 trainer.max_steps=100000

Dot-overrides compose onto the YAML config exactly like the reference's CLI.
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import jax
import numpy as np

from .config import RootCfg, load_config, to_dict
from .data import DataLoaderCfg, data_loader, get_view_sampler
from .data.re10k import DatasetRE10k, DatasetRE10kCfg
from .parallel import MeshCfg, initialize_distributed, make_mesh, shard_batch
from .train import TrainCfg, make_train_step
from .train.checkpoints import (
    find_latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)


def build_dataset(cfg: RootCfg, stage: str, host_id: int = 0, num_hosts: int = 1):
    sampler = get_view_sampler(
        cfg.dataset.view_sampler, stage=stage, **cfg.dataset.view_sampler_args
    )
    ds_cfg = DatasetRE10kCfg(
        roots=tuple(Path(r) for r in cfg.dataset.roots),
        image_shape=tuple(cfg.dataset.image_shape),
        near=cfg.dataset.near,
        far=cfg.dataset.far,
        augment=cfg.dataset.augment,
        test_chunk_interval=cfg.dataset.test_chunk_interval,
        expected_shape=(
            tuple(cfg.dataset.expected_shape)
            if cfg.dataset.expected_shape is not None
            else None
        ),
    )
    return DatasetRE10k(ds_cfg, stage, sampler, host_id, num_hosts)


def jax_batch(batch: dict) -> dict:
    """numpy batch (NHWC already) -> jax arrays, dropping host-only fields."""
    import jax.numpy as jnp

    def conv(views):
        return {
            k: jnp.asarray(v)
            for k, v in views.items()
            if k in ("image", "extrinsics", "intrinsics", "near", "far", "depth")
        }

    return {"context": conv(batch["context"]), "target": conv(batch["target"])}


def train(cfg: RootCfg) -> None:
    out_dir = Path(cfg.output_dir)
    out_dir.mkdir(exist_ok=True, parents=True)
    (out_dir / "config.json").write_text(json.dumps(to_dict(cfg), indent=2, default=str))

    # Multi-host: one SPMD program per host over a pod-wide mesh (the
    # reference's Lightning DDP/NCCL num_nodes path, main.py:140-156).
    initialize_distributed()
    mesh = make_mesh(MeshCfg(data=-1, model=1))
    host_id = jax.process_index()
    num_hosts = jax.process_count()

    train_cfg = TrainCfg(
        encoder=cfg.encoder,
        decoder=cfg.decoder,
        loss=cfg.loss,
        optimizer=cfg.optimizer,
    )
    init_fn, train_step = make_train_step(train_cfg)
    step_fn = jax.jit(train_step, donate_argnums=(0,))

    dataset = build_dataset(cfg, "train", host_id, num_hosts)
    loader_cfg = DataLoaderCfg(
        batch_size=cfg.data_loader.batch_size,
        seed=cfg.data_loader.seed,
        host_id=host_id,
        num_hosts=num_hosts,
    )

    state = None
    start_step = 0
    if cfg.checkpointing.resume:
        latest = find_latest_checkpoint(out_dir / "checkpoints")
        if latest is not None:
            print(f"resuming from {latest}")
            start_step = int(latest.name.split("_")[1])

    from .utils.logger import LocalLogger

    logger = LocalLogger(out_dir, run_name=out_dir.name) if host_id == 0 else None
    loader = data_loader(dataset, loader_cfg, "train", global_step=start_step)
    log_every = cfg.trainer.print_log_every_n_steps
    t_last = time.time()
    for step_idx, batch in enumerate(loader):
        jb = jax_batch(batch)
        if state is None:
            state = init_fn(jax.random.key(cfg.seed), jb)
            latest = (
                find_latest_checkpoint(out_dir / "checkpoints")
                if cfg.checkpointing.resume
                else None
            )
            if latest is not None:
                state = restore_checkpoint(latest, state)
        jb = shard_batch(mesh, jb)
        state, logs = step_fn(state, jb)

        gstep = int(state.step)
        if gstep % log_every == 0:
            jax.block_until_ready(logs["loss/total"])
            dt = (time.time() - t_last) / log_every
            t_last = time.time()
            msg = ", ".join(f"{k}={float(v):.4f}" for k, v in sorted(logs.items()))
            print(f"step {gstep}: {msg} ({dt:.3f}s/it)", flush=True)
            if logger is not None:
                logger.log_scalars(gstep, {**logs, "perf/s_per_it": dt})
        if (
            gstep % cfg.trainer.val_check_interval == 0
            and logger is not None
        ):
            _log_validation_panel(cfg, state, batch, gstep, logger)
        if (
            cfg.trainer.test_eval_interval > 0
            and gstep % cfg.trainer.test_eval_interval == 0
            and host_id == 0
        ):
            _run_periodic_test_eval(cfg, state, gstep, logger)
        if gstep % cfg.checkpointing.every_n_train_steps == 0 and host_id == 0:
            save_checkpoint(out_dir / "checkpoints", gstep, state)
        if gstep >= cfg.trainer.max_steps:
            break
    if host_id == 0 and state is not None:
        save_checkpoint(out_dir / "checkpoints", int(state.step), state)
    if logger is not None:
        logger.close()


def _run_periodic_test_eval(cfg, state, step, logger) -> None:
    """Full-test eval with the current weights (model_wrapper.py:775-930):
    iterate the test split, render, and log test/psnr — rank zero only."""
    import itertools

    from .eval.runner import TestCfg, run_test
    from .models import EncoderDepthSplat

    try:
        encoder = EncoderDepthSplat(cfg.encoder)
        dataset = build_dataset(cfg, "test")
        loader = data_loader(
            dataset, DataLoaderCfg(batch_size=1, seed=cfg.data_loader.seed),
            "test",
        )
        batches = (
            {**b, **jax_batch(b)}
            for b in itertools.islice(loader, cfg.trainer.test_eval_max_scenes)
        )
        apply = jax.jit(
            lambda context: encoder.apply(state.params, context, training=False)
        )
        result = run_test(
            TestCfg(
                output_dir=Path(cfg.output_dir) / f"test_step{step}",
                save_image=False,
            ),
            apply,
            batches,
            decoder_cfg=cfg.decoder,
        )
        print(f"[test eval @ {step}] {result['scores']}", flush=True)
        if logger is not None and result["scores"]:
            logger.log_scalars(
                step, {f"test/{k}": v for k, v in result["scores"].items()}
            )
    except Exception as e:  # periodic eval must never kill training
        print(f"periodic test eval failed: {e}")


def _log_validation_panel(cfg, state, batch, step, logger) -> None:
    """Side-by-side GT vs render of the first batch element (the analog of the
    reference's wandb comparison panels, model_wrapper.py:727-766)."""
    import numpy as np

    from .models import EncoderDepthSplat, decode_splatting
    from .utils.layout import add_border, hcat, vcat

    try:
        encoder = EncoderDepthSplat(cfg.encoder)
        jb = jax_batch(batch)
        ctx = jax.tree.map(lambda x: x[:1], jb["context"])
        tgt = jax.tree.map(lambda x: x[:1], jb["target"])
        out = encoder.apply(state.params, ctx, training=False)
        gaussians = out["gaussians"]
        b_eff = gaussians.means.shape[0]
        gaussians = jax.tree.map(lambda x: x[-1:], gaussians)
        h, w = tgt["image"].shape[2:4]
        dec = decode_splatting(
            cfg.decoder, gaussians, tgt["extrinsics"], tgt["intrinsics"],
            tgt["near"], tgt["far"], (h, w),
        )
        gt_row = hcat(*[np.asarray(tgt["image"][0, i]) for i in
                        range(tgt["image"].shape[1])])
        pr_row = hcat(*[np.asarray(dec.color[0, i]) for i in
                        range(dec.color.shape[1])])
        logger.log_image(step, "val/comparison", add_border(vcat(gt_row, pr_row)))
    except Exception as e:  # visualization must never kill training
        print(f"validation panel failed: {e}")


def test(cfg: RootCfg) -> None:
    from flax.linen import Module  # noqa: F401  (keep flax import local)

    from .eval.runner import TestCfg, run_test
    from .models import EncoderDepthSplat

    out_dir = Path(cfg.output_dir)
    encoder = EncoderDepthSplat(cfg.encoder)
    dataset = build_dataset(cfg, "test")
    loader_cfg = DataLoaderCfg(batch_size=1, seed=cfg.data_loader.seed)

    params = None
    if cfg.checkpointing.load:
        from .train import TrainCfg as _TC, make_train_step as _mts

        init_fn, _ = _mts(
            TrainCfg(encoder=cfg.encoder, decoder=cfg.decoder,
                     loss=cfg.loss, optimizer=cfg.optimizer)
        )
        first = next(iter(data_loader(dataset, loader_cfg, "test")))
        state = init_fn(jax.random.key(0), jax_batch(first))
        state = restore_checkpoint(Path(cfg.checkpointing.load), state)
        params = state.params
    else:
        first = next(iter(data_loader(dataset, loader_cfg, "test")))
        params = encoder.init(jax.random.key(0), jax_batch(first)["context"])

    apply = jax.jit(
        lambda context: encoder.apply(params, context, training=False)
    )

    batches = (
        {**b, **jax_batch(b)}
        for b in data_loader(dataset, loader_cfg, "test")
    )
    result = run_test(
        TestCfg(output_dir=out_dir / "test"),
        lambda context: apply(context),
        batches,
        decoder_cfg=cfg.decoder,
    )
    print(json.dumps(result, indent=2))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args()
    cfg = load_config(args.config, args.overrides)
    if cfg.mode == "train":
        train(cfg)
    else:
        test(cfg)


if __name__ == "__main__":
    main()
