"""CLI entry point: training / testing driver.

Replaces the reference's hydra main + Lightning Trainer (src/main.py:44-288):

    python -m my_depthsplat_tpu.main --config config/re10k.yaml mode=train \\
        optimizer.lr=2e-4 trainer.max_steps=100000

Dot-overrides compose onto the YAML config exactly like the reference's CLI.
Wired capabilities (reference file:line):
- dataset registry dispatch re10k/dl3dv/arkit (src/dataset/__init__.py:21-32)
- patch/bounds shims on every batch (encoder_depthsplat.py:363-373,
  shims/bounds_shim.py:40-80)
- 3-way pretrained partial loading + torch-ckpt conversion
  (src/main.py:188-266)
- LPIPS as training loss and eval metric when weights are configured
  (src/loss/loss_lpips.py:27-59, src/evaluation/metrics.py:22-35)
- a real held-out validation hook (model_wrapper.py:634-773 +
  ValidationWrapper) and periodic full-test eval (:775-930)
- multi-host-safe checkpointing with save_top_k retention (main.py:115-125)
- depth-only train/test (config/main.yaml:73, model_wrapper.py:431,503-560)
"""

from __future__ import annotations

import argparse
import dataclasses
import itertools
import json
import time
from pathlib import Path

import jax
import numpy as np

from .config import RootCfg, load_config, to_dict
from .data import (
    DataLoaderCfg,
    apply_bounds_shim,
    apply_patch_shim,
    data_loader,
    get_dataset,
    get_view_sampler,
)
from .models.vit import VIT_CONFIGS
from .parallel import MeshCfg, initialize_distributed, make_mesh, shard_batch
from .train import TrainCfg, make_train_step
from .train.checkpoints import (
    find_latest_checkpoint,
    load_pretrained_depth,
    load_pretrained_model,
    load_pretrained_monodepth,
    load_slot_params,
    restore_checkpoint,
    save_checkpoint,
)
from .train.lpips_io import build_lpips


def build_dataset(cfg: RootCfg, stage: str, host_id: int = 0, num_hosts: int = 1):
    """dataset.name-dispatched reader (reference src/dataset/__init__.py:21-32)."""
    sampler = get_view_sampler(
        cfg.dataset.view_sampler, stage=stage, **cfg.dataset.view_sampler_args
    )
    return get_dataset(cfg.dataset, stage, sampler, host_id, num_hosts)


def prepare_batch(cfg: RootCfg, batch: dict) -> dict:
    """Numpy-side batch shims (the reference's get_data_shim composition,
    data_module.py:17-32 + encoder_depthsplat.py:363-373): crop to a multiple
    of patch_size*downscale so non-multiple resolutions (e.g. 270x480) work,
    then optionally replace near/far with disparity-derived bounds."""
    patch = cfg.encoder.shim_patch_size * cfg.encoder.downscale_factor
    batch = apply_patch_shim(batch, patch)
    if cfg.dataset.use_bounds_shim:
        batch = apply_bounds_shim(
            batch,
            cfg.dataset.bounds_near_disparity,
            cfg.dataset.bounds_far_disparity,
        )
    return batch


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


def _vit_depth(cfg: RootCfg) -> int:
    return VIT_CONFIGS[cfg.encoder.monodepth_vit_type].depth


def apply_pretrained_slots(cfg: RootCfg, state):
    """The reference's 3-way filtered pretrained loading before fit/test
    (src/main.py:188-266). Order matches the reference: monodepth first,
    then full model (optionally skipping the depth predictor), then the
    strict depth-only slot."""
    ck = cfg.checkpointing
    params = state.params
    if ck.pretrained_monodepth:
        loaded = load_slot_params(ck.pretrained_monodepth, state, _vit_depth(cfg))
        params = load_pretrained_monodepth(params, loaded)
        print(f"loaded pretrained_monodepth from {ck.pretrained_monodepth}")
    if ck.pretrained_model:
        loaded = load_slot_params(ck.pretrained_model, state, _vit_depth(cfg))
        params = load_pretrained_model(
            params, loaded, skip_depth_predictor=ck.pretrained_model_skip_depth
        )
        print(f"loaded pretrained_model from {ck.pretrained_model}")
    for slot in (ck.pretrained_depth, ck.pretrained_mvdepth):
        if slot:
            loaded = load_slot_params(slot, state, _vit_depth(cfg))
            params = load_pretrained_depth(params, loaded)
            print(f"loaded pretrained depth slot from {slot}")
    return state.replace(params=params)


def build_parallel(cfg: RootCfg, devices=None):
    """Mesh + SPMD wiring from trainer.mesh_data/mesh_model (the reference's
    trainer.num_nodes surface, src/main.py:140-156). When mesh_model > 1 the
    encoder's depth-hypothesis and ring-view sharding turn on
    (spmd_depth_axis/spmd_view_axis = "model") and rendered target views
    shard over (data, model). Returns (mesh, encoder_cfg, render_sharding);
    shared by train() and __graft_entry__.dryrun_multichip so the validated
    dry-run path IS the production path."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(
        MeshCfg(data=cfg.trainer.mesh_data, model=cfg.trainer.mesh_model),
        devices=devices,
    )
    encoder_cfg = cfg.encoder
    render_sharding = None
    if mesh.shape["model"] > 1:
        encoder_cfg = dataclasses.replace(
            encoder_cfg, spmd_depth_axis="model", spmd_view_axis="model"
        )
        render_sharding = NamedSharding(mesh, P(("data", "model")))
    return mesh, encoder_cfg, render_sharding


def _warn_window_overflow(logs: dict, gstep: int, warned: bool) -> bool:
    """Loud one-shot warning on the first nonzero sweep/window_overflow.

    A too-narrow sweep window silently degrades cost volumes; eval RAISES
    on this (eval/runner.py), training must at least shout. Returns the
    updated warned flag."""
    if warned:
        return True
    ovf = float(logs.get("sweep/window_overflow", 0.0))
    if ovf > 0:
        print(
            f"WARNING: sweep/window_overflow={ovf:.0f} at step {gstep} — "
            "the window-mode plane sweep is DROPPING taps; cost volumes "
            "are degraded. Raise encoder.sweep_window (or use "
            "sweep_mode='gather').",
            flush=True,
        )
        return True
    return False


def train(cfg: RootCfg) -> None:
    out_dir = Path(cfg.output_dir)
    out_dir.mkdir(exist_ok=True, parents=True)
    (out_dir / "config.json").write_text(json.dumps(to_dict(cfg), indent=2, default=str))

    # Multi-host: one SPMD program per host over a pod-wide mesh (the
    # reference's Lightning DDP/NCCL num_nodes path, main.py:140-156).
    initialize_distributed()
    mesh, encoder_cfg, render_sharding = build_parallel(cfg)
    cfg = dataclasses.replace(cfg, encoder=encoder_cfg)
    jax.set_mesh(mesh)  # global: sharded train/eval programs resolve axes
    host_id = jax.process_index()
    num_hosts = jax.process_count()

    # LPIPS loss wiring (loss_lpips.py:27-59): active only when a weights
    # file is configured AND the loss weight is nonzero.
    lpips_apply_fn, lpips_params = (None, None)
    if cfg.loss.lpips_weight > 0 and cfg.loss.lpips_weights:
        lpips_apply_fn, lpips_params = build_lpips(cfg.loss.lpips_weights)

    train_cfg = TrainCfg(
        encoder=cfg.encoder,
        decoder=cfg.decoder,
        loss=cfg.loss,
        optimizer=cfg.optimizer,
        depth_mode=cfg.train.depth_mode,
        grad_accum=cfg.train.grad_accum,
    )
    init_fn, train_step = make_train_step(
        train_cfg, lpips_apply_fn, render_sharding=render_sharding
    )
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
    # Live-step curriculum: the loader reads this cell per example, so the
    # bounded samplers' warm-up schedules actually advance during the run
    # (the reference publishes the step through StepTracker every training
    # step, model_wrapper.py:371-373 + view_sampler.py:57-59).
    step_cell = {"step": start_step}
    loader = data_loader(
        dataset, loader_cfg, "train", global_step=lambda: step_cell["step"]
    )
    # Held-out validation stream (model_wrapper.py:634-773 +
    # ValidationWrapper): a single repeating val sample, NOT the train batch.
    val_iter = _make_val_iter(cfg)
    # One jitted eval-mode encoder for validation AND periodic test eval —
    # built once so repeated evals hit jax.jit's cache instead of recompiling
    # the encoder every interval.
    from .models import EncoderDepthSplat
    from .models.precision import apply_with_precision

    _eval_encoder = EncoderDepthSplat(cfg.encoder)
    eval_apply = jax.jit(
        lambda params, context: apply_with_precision(
            _eval_encoder.apply, cfg.encoder.compute_dtype, params, context,
            training=False,
        )
    )
    log_every = cfg.trainer.print_log_every_n_steps
    last_saved_step = -1
    warned_overflow = False
    t_last = time.time()
    for step_idx, batch in enumerate(loader):
        batch = prepare_batch(cfg, batch)
        jb = jax_batch(batch)
        if state is None:
            state = init_fn(jax.random.key(cfg.seed), jb, lpips_params)
            state = apply_pretrained_slots(cfg, state)
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
        step_cell["step"] = gstep
        if gstep % log_every == 0:
            jax.block_until_ready(logs["loss/total"])
            dt = (time.time() - t_last) / log_every
            t_last = time.time()
            msg = ", ".join(f"{k}={float(v):.4f}" for k, v in sorted(logs.items()))
            print(f"step {gstep}: {msg} ({dt:.3f}s/it)", flush=True)
            warned_overflow = _warn_window_overflow(
                logs, gstep, warned_overflow
            )
            if logger is not None:
                logger.log_scalars(gstep, {**logs, "perf/s_per_it": dt})
        if gstep % cfg.trainer.val_check_interval == 0:
            # All hosts run validation (identical data/computation — a
            # host-0-only jit over pod-global params would desync); only
            # host 0 writes.
            _run_validation(cfg, state, val_iter, gstep, logger, eval_apply)
        if (
            cfg.trainer.test_eval_interval > 0
            and gstep % cfg.trainer.test_eval_interval == 0
        ):
            _run_periodic_test_eval(cfg, state, gstep, logger,
                                    write=host_id == 0, eval_apply=eval_apply)
        if gstep % cfg.checkpointing.every_n_train_steps == 0:
            # all processes must enter the orbax save (multi-host safety)
            save_checkpoint(out_dir / "checkpoints", gstep, state,
                            keep=cfg.checkpointing.save_top_k)
            last_saved_step = gstep
        if gstep >= cfg.trainer.max_steps:
            break
    # End-of-run save — skipped when the in-loop save already wrote this
    # step (max_steps % every_n == 0 would otherwise collide with orbax's
    # "destination already exists"). Same control flow on every host.
    if state is not None and int(state.step) != last_saved_step:
        save_checkpoint(out_dir / "checkpoints", int(state.step), state,
                        keep=cfg.checkpointing.save_top_k)
    if logger is not None:
        logger.close()


def _make_val_iter(cfg: RootCfg):
    """Iterator over held-out val batches; None when no val split exists.
    Mirrors ValidationWrapper (validation_wrapper.py:7-32): one sample per
    validation run, cycling through the val split."""
    try:
        dataset = build_dataset(cfg, "val")
        loader_cfg = DataLoaderCfg(batch_size=1, seed=cfg.data_loader.seed)

        def gen():
            while True:
                yield from data_loader(dataset, loader_cfg, "val")

        return gen()
    except Exception as e:
        print(f"no validation split available ({e}); validation disabled")
        return None


def _run_validation(cfg, state, val_iter, step, logger, eval_apply) -> None:
    """Held-out val render: val/psnr + comparison panel
    (model_wrapper.py:634-773). ``eval_apply`` is the train loop's cached
    jitted encoder (params, context) -> out."""
    from .eval.metrics import compute_psnr
    from .eval.runner import jitted_decode
    from .utils.layout import add_border, hcat, vcat

    if val_iter is None:
        return
    try:
        batch = prepare_batch(cfg, next(val_iter))
        jb = jax_batch(batch)
        out = eval_apply(state.params, jb["context"])
        gaussians = out["gaussians"]
        if gaussians is None:  # depth-only mode: log depth panel only
            if logger is not None:
                from .utils.vis_depth import viz_depth

                d = np.asarray(out["depths"])[-1]
                row = hcat(*[viz_depth(d[i]) for i in range(d.shape[0])])
                logger.log_image(step, "val/depth", add_border(row))
            return
        tgt = jb["target"]
        gaussians = jax.tree.map(lambda x: x[-1:], gaussians)
        h, w = tgt["image"].shape[2:4]
        dec = jitted_decode(cfg.decoder, (h, w))(
            gaussians, tgt["extrinsics"], tgt["intrinsics"],
            tgt["near"], tgt["far"],
        )
        psnr = float(
            compute_psnr(
                tgt["image"].reshape(-1, h, w, 3),
                dec.color.reshape(-1, h, w, 3),
            ).mean()
        )
        print(f"[val @ {step}] psnr={psnr:.3f}", flush=True)
        if logger is not None:
            logger.log_scalars(step, {"val/psnr": psnr})
            gt_row = hcat(*[np.asarray(tgt["image"][0, i]) for i in
                            range(tgt["image"].shape[1])])
            pr_row = hcat(*[np.asarray(dec.color[0, i]) for i in
                            range(dec.color.shape[1])])
            logger.log_image(step, "val/comparison", add_border(vcat(gt_row, pr_row)))
    except Exception as e:  # validation must never kill training
        print(f"validation failed: {e}")


def _run_periodic_test_eval(cfg, state, step, logger, write: bool,
                            eval_apply) -> None:
    """Full-test eval with the current weights (model_wrapper.py:775-930):
    iterate the test split, render, and log test/psnr. Runs on every host
    (identical computation keeps SPMD programs in sync); only ``write``
    hosts emit files/logs. ``eval_apply`` is the train loop's cached jitted
    encoder — repeated evals reuse its compilation."""
    import functools

    from .eval.runner import run_test

    try:
        dataset = build_dataset(cfg, "test")
        loader = data_loader(
            dataset, DataLoaderCfg(batch_size=1, seed=cfg.data_loader.seed),
            "test",
        )
        batches = (
            {**b, **jax_batch(prepare_batch(cfg, b))}
            for b in itertools.islice(loader, cfg.trainer.test_eval_max_scenes)
        )
        apply = functools.partial(eval_apply, state.params)
        lpips_fn = _eval_lpips_fn(cfg, state)
        result = run_test(
            dataclasses.replace(
                cfg.test,
                output_dir=Path(cfg.output_dir) / f"test_step{step}",
                save_image=False,
            ),
            apply,
            batches,
            decoder_cfg=cfg.decoder,
            lpips_fn=lpips_fn,
        )
        if write:
            print(f"[test eval @ {step}] {result['scores']}", flush=True)
            if logger is not None and result["scores"]:
                scalars = {f"test/{k}": v for k, v in result["scores"].items()}
                # instance-budget overflow must be visible in eval scalars
                # too (CUDA reference never drops)
                scalars["test/num_dropped"] = float(result["num_dropped"])
                logger.log_scalars(step, scalars)
    except Exception as e:  # periodic eval must never kill training
        print(f"periodic test eval failed: {e}")


def _eval_lpips_fn(cfg: RootCfg, state=None):
    """LPIPS eval metric (metrics.py:22-35): prefers params already in the
    train state, else loads from the configured weights file."""
    if not cfg.loss.lpips_weights:
        return None
    apply_fn, params = build_lpips(cfg.loss.lpips_weights)
    if apply_fn is None:
        return None
    if state is not None and state.lpips_params is not None:
        params = state.lpips_params
    return lambda a, b: apply_fn(params, a, b)


def _shrink_batch(batch, v_ctx: int = 2, v_tgt: int = 1, hw: int = 64):
    """Init-sized view of a batch: first ``v`` views, ``hw``-pixel crops."""

    def views(d, v):
        out = dict(d)
        for k in ("extrinsics", "intrinsics", "near", "far"):
            if k in out:
                out[k] = out[k][:, :v]
        for k in ("image", "depth"):
            if k in out:
                s = out[k].shape
                out[k] = out[k][:, :v, : min(hw, s[2]), : min(hw, s[3])]
        return out

    return {
        **batch,
        "context": views(batch["context"], v_ctx),
        "target": views(batch["target"], v_tgt),
    }


def test(cfg: RootCfg) -> None:
    from .eval.runner import run_test
    from .models import EncoderDepthSplat

    out_dir = Path(cfg.output_dir)
    encoder = EncoderDepthSplat(cfg.encoder)
    dataset = build_dataset(cfg, "test")
    loader_cfg = DataLoaderCfg(batch_size=1, seed=cfg.data_loader.seed)

    from .train import TrainCfg as _TC, make_train_step as _mts

    init_fn, _ = _mts(
        TrainCfg(encoder=cfg.encoder, decoder=cfg.decoder,
                 loss=cfg.loss, optimizer=cfg.optimizer)
    )
    first = next(iter(data_loader(dataset, loader_cfg, "test")))
    # Initialize on a 2-view 64x64 crop of the first batch: every parameter
    # in this architecture is input-shape-independent (ViT pos-embeds
    # interpolate at apply time), and an eager flax init at full test
    # resolution (e.g. 12 views x 512x960) materializes per-layer
    # activations without remat — enough to OOM a 16 GB chip before the
    # jitted forward (which fits) ever runs.
    state = init_fn(
        jax.random.key(0),
        _shrink_batch(jax_batch(prepare_batch(cfg, first))),
    )
    state = apply_pretrained_slots(cfg, state)
    if cfg.checkpointing.load:
        from .train.checkpoints import resolve_checkpoint_uri

        ckpt_path = resolve_checkpoint_uri(cfg.checkpointing.load)
        if ckpt_path.suffix in (".pth", ".pt", ".ckpt", ".bin"):
            # torch/Lightning checkpoints (including wandb:// artifacts,
            # whose model.ckpt is the reference's Lightning format) go
            # through the converter; orbax handles this framework's own dirs
            state = state.replace(
                params=load_slot_params(ckpt_path, state, _vit_depth(cfg))
            )
        else:
            state = restore_checkpoint(ckpt_path, state)
    # optimizer state is dead weight in test mode (the restore above needed
    # the full TrainState template); free it before the big forwards
    state = state.replace(opt_state=None)
    params = state.params

    from .models.precision import apply_with_precision

    # params enter as a jit ARGUMENT: a closure would embed all of them as
    # inline program constants (a ~0.5 GB lowered program for gs-base that
    # the remote-compile tunnel rejects, plus a host round-trip per leaf)
    _apply_p = jax.jit(
        lambda p, context: apply_with_precision(
            encoder.apply, cfg.encoder.compute_dtype, p, context,
            training=False,
        )
    )
    apply = lambda context: _apply_p(params, context)

    batches = (
        {**b, **jax_batch(prepare_batch(cfg, b))}
        for b in data_loader(dataset, loader_cfg, "test")
    )
    test_cfg = dataclasses.replace(
        cfg.test,
        output_dir=out_dir / "test",
        forward_depth_only=(
            cfg.test.forward_depth_only or cfg.encoder.train_depth_only
        ),
    )
    result = run_test(
        test_cfg,
        apply,
        batches,
        decoder_cfg=cfg.decoder,
        lpips_fn=_eval_lpips_fn(cfg),
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
