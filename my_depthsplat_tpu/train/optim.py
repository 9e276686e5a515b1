"""Optimizer: two-group AdamW + OneCycle cosine schedule.

Reference: model_wrapper.py:1104-1158 — params whose name contains
"pretrained" (the frozen-ish DINOv2 backbone) train at ``lr_monodepth``,
everything else at ``lr``; torch OneCycleLR(pct_start=0.01, cos anneal).
Gradient clipping (0.5) is applied here as well (main.py:151).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import optax


@dataclass(frozen=True)
class OptimizerCfg:
    lr: float = 2e-4
    lr_monodepth: float = 4e-6
    weight_decay: float = 0.01
    grad_clip: float = 0.5
    total_steps: int = 150_000
    warmup_pct: float = 0.01


def onecycle_cosine(
    max_lr: float,
    total_steps: int,
    pct_start: float = 0.01,
    div_factor: float = 25.0,
    final_div_factor: float = 1e4,
):
    """torch OneCycleLR(anneal_strategy='cos') schedule."""
    initial = max_lr / div_factor
    final = initial / final_div_factor
    up_steps = max(int(pct_start * total_steps), 1)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        up = initial + (max_lr - initial) * 0.5 * (
            1.0 - jnp.cos(jnp.pi * jnp.minimum(step / up_steps, 1.0))
        )
        down_t = jnp.clip((step - up_steps) / max(total_steps - up_steps, 1), 0.0, 1.0)
        down = final + (max_lr - final) * 0.5 * (1.0 + jnp.cos(jnp.pi * down_t))
        return jnp.where(step < up_steps, up, down)

    return schedule


def schedule_values(cfg: OptimizerCfg, step) -> dict:
    """Current learning rate of both param groups, for logging (the
    reference's LearningRateMonitor, src/main.py:107-110)."""
    horizon = cfg.total_steps + 10  # matches make_optimizer's schedule
    return {
        "lr/new": onecycle_cosine(cfg.lr, horizon, cfg.warmup_pct)(step),
        "lr/pretrained": onecycle_cosine(cfg.lr_monodepth, horizon, cfg.warmup_pct)(
            step
        ),
    }


def _is_pretrained(path: tuple) -> bool:
    return any("pretrained" in str(k) for k in path)


def make_optimizer(cfg: OptimizerCfg, params) -> optax.GradientTransformation:
    def label_fn(tree):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: "pretrained" if _is_pretrained(path) else "new", tree
        )

    def group(max_lr: float) -> optax.GradientTransformation:
        return optax.adamw(
            onecycle_cosine(max_lr, cfg.total_steps + 10, cfg.warmup_pct),
            weight_decay=cfg.weight_decay,
        )

    opt = optax.multi_transform(
        {"pretrained": group(cfg.lr_monodepth), "new": group(cfg.lr)},
        label_fn,
    )
    return optax.chain(optax.clip_by_global_norm(cfg.grad_clip), opt)
