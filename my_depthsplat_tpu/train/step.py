"""The jitted training step: encoder -> decoder -> losses -> AdamW update.

Replaces the reference's Lightning training_step (model_wrapper.py:165-373):
pure-functional TrainState, sharding-in-types data parallelism (batch on the
"data" mesh axis; jit inserts the gradient psum), render-loss on final +
intermediate outputs.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax import Array

from ..models import DecoderSplattingCfg, EncoderDepthSplat, decode_splatting
from ..models.encoder import EncoderDepthSplatCfg
from ..models.precision import apply_with_precision
from .losses import LossCfg, compute_losses
from .optim import OptimizerCfg, make_optimizer, schedule_values


@dataclass(frozen=True)
class TrainCfg:
    encoder: EncoderDepthSplatCfg = field(default_factory=EncoderDepthSplatCfg)
    decoder: DecoderSplattingCfg = field(default_factory=DecoderSplattingCfg)
    loss: LossCfg = field(default_factory=LossCfg)
    optimizer: OptimizerCfg = field(default_factory=OptimizerCfg)
    # Render depth alongside color during training (the reference's
    # train_cfg.depth_mode hook, model_wrapper.py:196-234): "depth" |
    # "disparity" | "relative_disparity" | "log" | None.
    depth_mode: str | None = None
    # Gradient accumulation: split the batch's leading axis into this many
    # microbatches, scan the grad computation, average, and apply ONE
    # optimizer update — numerically a larger batch without its peak
    # memory. The reference reaches bs8 on 40-80 GB GPUs
    # (scripts/re10k_depthsplat_train.sh); on a 16 GB v5e chip bs8 exceeds
    # device memory (the AOT compile fails), so effective-bs8 = bs4 x 2.
    grad_accum: int = 1


class TrainState(struct.PyTreeNode):
    step: Array
    params: Any
    opt_state: Any
    lpips_params: Any = None  # frozen perceptual net

    @classmethod
    def create(cls, params, tx, lpips_params=None):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            lpips_params=lpips_params,
        )


def _depth_only_loss(cfg: TrainCfg, depths: Array, batch) -> tuple[Array, dict]:
    """Masked L1 against GT depth for depth-only pre-training.

    depths: (B * num_preds, V, H, W) stacked coarse-to-fine predictions
    (final last). GT comes from batch["context"]["depth"] (B, V, hp, wp),
    nearest-resized to (H, W) so sparse/zero (invalid) pixels stay invalid.
    Intermediate predictions get the same gamma^k weighting as the render
    losses (model_wrapper.py:273-341).
    """
    # (missing GT depth is rejected earlier, at the loss_fn batch seam)
    gt = batch["context"]["depth"]  # (B, V, hp, wp)
    b = gt.shape[0]
    b_eff = depths.shape[0]
    num = b_eff // b
    h, w = depths.shape[2:4]
    if gt.shape[2:4] != (h, w):
        gt = jax.image.resize(gt, (*gt.shape[:2], h, w), method="nearest")
    valid = gt > 0.0
    denom = jnp.maximum(jnp.sum(valid), 1)

    def one(pred: Array) -> Array:
        err = jnp.abs(pred - gt)
        return jnp.sum(jnp.where(valid, err, 0.0)) / denom

    total = one(depths[-b:])
    logs: dict[str, Array] = {"loss/depth_l1": total}
    if num > 1:
        inter = jnp.zeros(())
        for i in range(num - 1):
            wgt = cfg.loss.intermediate_loss_weight ** (num - 1 - i)
            inter = inter + wgt * one(depths[b * i : b * (i + 1)])
        logs["loss/depth_intermediate"] = inter
        total = total + inter
    logs["loss/total"] = total
    return total, logs


def make_train_step(
    cfg: TrainCfg,
    lpips_apply_fn: Callable | None = None,
    render_sharding=None,
) -> tuple[Callable, Callable]:
    """Returns (init_fn, train_step).

    train_step(state, batch) -> (state, logs). ``batch`` carries
    {"context": {...}, "target": {image, extrinsics, intrinsics, near, far}}.
    Shard the batch's leading axis over the mesh "data" axis and jit with
    matching in_shardings; gradients reduce automatically.
    """
    encoder = EncoderDepthSplat(cfg.encoder)
    tx = make_optimizer(cfg.optimizer, None)

    def init_fn(rng, batch, lpips_params=None) -> TrainState:
        params = encoder.init(rng, batch["context"], training=True)
        return TrainState.create(params, tx, lpips_params)

    def loss_fn(params, state: TrainState, batch):
        from ..utils.shapes import check_views

        # batch-seam validation (trace-time only): context and target must
        # share B; a (B, V)-swap or transposed image fails with a named error
        dims = check_views(batch["context"], "batch.context")
        check_views(batch["target"], "batch.target", {"B": dims["B"]})
        if cfg.encoder.train_depth_only and "depth" not in batch["context"]:
            # fail before tracing the encoder: depth-only pre-training needs
            # GT depth in the batch (see _depth_only_loss)
            raise ValueError(
                "encoder.train_depth_only=True requires GT depth in the "
                "batch (context.depth) — use a dataset that provides it "
                "(arkit_scenes)"
            )
        target = batch["target"]
        h, w = target["image"].shape[2:4]
        # precision policy (encoder.compute_dtype): bf16 casts happen inside
        # the grad trace, so mixed-precision training gets f32 master params
        # with bf16 network compute for free
        out = apply_with_precision(
            encoder.apply, cfg.encoder.compute_dtype, params,
            batch["context"], training=True,
        )
        gaussians = out["gaussians"]

        if gaussians is None:
            # Depth-only pre-training (encoder.train_depth_only): no decoder.
            # The reference's depth-only mode is inference-only
            # (model_wrapper.py:431,503-560 early-returns in test); for
            # training we supervise directly against the LiDAR/GT depth the
            # ARKit reader emits (dataset_arkit_scenes.py:366-410) with a
            # masked L1 and the same gamma^k intermediate weighting.
            return _depth_only_loss(cfg, out["depths"], batch)

        b = target["extrinsics"].shape[0]
        b_eff = gaussians.means.shape[0]
        num = b_eff // b

        def rep(x):
            return jnp.concatenate([x] * num, axis=0) if num > 1 else x

        dec = decode_splatting(
            cfg.decoder,
            gaussians,
            rep(target["extrinsics"]),
            rep(target["intrinsics"]),
            rep(target["near"]),
            rep(target["far"]),
            (h, w),
            depth_mode=cfg.depth_mode,
            render_sharding=render_sharding,
        )
        total, logs = compute_losses(
            cfg.loss,
            dec.color,
            target["image"],
            state.step,
            lpips_apply_fn,
            state.lpips_params,
        )
        if dec.num_dropped is not None:
            # instance-budget overflow (CUDA never drops) — watch this stay 0
            logs["render/num_dropped"] = dec.num_dropped.astype(jnp.float32)
        if out.get("sweep_window_overflow") is not None:
            # taps the window-mode plane sweep dropped (must stay 0: a
            # too-narrow encoder.sweep_window silently degrades cost volumes)
            logs["sweep/window_overflow"] = out["sweep_window_overflow"].astype(
                jnp.float32
            )
        if dec.depth is not None:
            logs["render/depth_mean"] = dec.depth.mean()
        # train/psnr on the final prediction (model_wrapper.py:238-243)
        mse = jnp.mean((dec.color[-b:] - target["image"]) ** 2, axis=(2, 3, 4))
        logs["train/psnr"] = (-10.0 * jnp.log10(jnp.maximum(mse, 1e-10))).mean()
        return total, logs

    def train_step(state: TrainState, batch):
        if cfg.grad_accum > 1:
            a = cfg.grad_accum
            bsz = jax.tree.leaves(batch)[0].shape[0]
            if bsz % a != 0:
                raise ValueError(
                    f"batch size {bsz} is not divisible by grad_accum {a}"
                )

            def split(x):
                return x.reshape(a, x.shape[0] // a, *x.shape[1:])

            micro = jax.tree.map(split, batch)

            def scan_body(acc, mb):
                (l, lg), g = jax.value_and_grad(loss_fn, has_aux=True)(
                    state.params, state, mb
                )
                acc = jax.tree.map(jnp.add, acc, g)
                return acc, (l, lg)

            zeros = jax.tree.map(jnp.zeros_like, state.params)
            acc, (losses, logs_seq) = jax.lax.scan(scan_body, zeros, micro)
            grads = jax.tree.map(lambda g: g / a, acc)
            loss = losses.mean()
            # microbatch logs average to the full-batch value for all mean-
            # style metrics (equal microbatch sizes); counters like
            # render/num_dropped become per-microbatch means
            logs = jax.tree.map(lambda x: x.mean(0), logs_seq)
        else:
            (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, state, batch
            )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state
        )
        logs["grad_norm"] = optax.global_norm(grads)
        logs.update(schedule_values(cfg.optimizer, state.step))
        return new_state, logs

    return init_fn, train_step
