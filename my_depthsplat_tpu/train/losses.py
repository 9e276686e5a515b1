"""Training losses (reference: src/loss/loss_mse.py, loss_lpips.py, and the
intermediate-depth weighting in model_wrapper.py:273-341)."""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
from jax import Array


@dataclass(frozen=True)
class LossCfg:
    mse_weight: float = 1.0
    lpips_weight: float = 0.05
    # Step from which LPIPS contributes (loss_lpips.py:46-48). The reference
    # experiments apply it from step 0 (config/experiment/re10k.yaml), so 0
    # is the default — a large default silently trains MSE-only.
    lpips_apply_after_step: int = 0
    # Path to LPIPS(VGG) weights: a torch lpips state_dict (.pth) or a
    # converted .npz (train/lpips_io.py). None disables LPIPS (no pretrained
    # weights ship in this environment).
    lpips_weights: str | None = None
    l1_loss: bool = False
    clamp_large_error: float = 0.0  # train_ignore_large_loss
    intermediate_loss_weight: float = 0.9


def mse_loss(
    pred: Array,  # (..., 3)
    target: Array,
    weight: float,
    l1: bool = False,
    clamp_large_error: float = 0.0,
) -> Array:
    """MSE (or L1) with optional large-error exclusion (loss_mse.py:22-44).

    The reference drops clamped elements via boolean indexing; here the mean is
    taken over the surviving elements with a mask (identical value, jit-safe).
    """
    delta = pred - target
    if clamp_large_error > 0:
        valid = (delta**2) < clamp_large_error
        err = jnp.abs(delta) if l1 else delta**2
        total = jnp.sum(jnp.where(valid, err, 0.0))
        count = jnp.maximum(jnp.sum(valid), 1)
        return weight * total / count
    err = jnp.abs(delta) if l1 else delta**2
    return weight * err.mean()


def lpips_loss(
    lpips_apply_fn,
    lpips_params,
    pred: Array,  # (B, V, H, W, 3)
    target: Array,
    weight: float,
    step: Array,
    apply_after_step: int,
) -> Array:
    """LPIPS gated by global step (loss_lpips.py:46-48)."""
    b, v = pred.shape[:2]
    d = lpips_apply_fn(
        lpips_params,
        pred.reshape(b * v, *pred.shape[2:]),
        target.reshape(b * v, *target.shape[2:]),
    )
    return jnp.where(step >= apply_after_step, weight * d.mean(), 0.0)


def compute_losses(
    cfg: LossCfg,
    color: Array,  # (B_eff, V, H, W, 3) — final batch LAST (encoder stacking)
    target: Array,  # (B, V, H, W, 3)
    step: Array,
    lpips_apply_fn=None,
    lpips_params=None,
) -> tuple[Array, dict[str, Array]]:
    """Final + gamma^(k)-weighted intermediate losses over the stacked batch."""
    from ..utils.shapes import assert_shapes

    assert_shapes(
        {
            "loss.color": (color, (None, "V", "H", "W", 3)),
            "loss.target": (target, ("B", "V", "H", "W", 3)),
        }
    )
    b = target.shape[0]
    b_eff = color.shape[0]
    num = b_eff // b
    if b_eff % b != 0:
        raise ValueError(
            f"prediction batch {b_eff} is not a multiple of target batch {b}"
        )
    logs: dict[str, Array] = {}

    def one(pred_slice: Array) -> tuple[Array, Array]:
        m = mse_loss(pred_slice, target, cfg.mse_weight, cfg.l1_loss,
                     cfg.clamp_large_error)
        if lpips_apply_fn is not None and cfg.lpips_weight > 0:
            lp = lpips_loss(
                lpips_apply_fn, lpips_params, pred_slice, target,
                cfg.lpips_weight, step, cfg.lpips_apply_after_step,
            )
        else:
            lp = jnp.zeros(())
        return m, lp

    mse_final, lpips_final = one(color[-b:])
    total = mse_final + lpips_final
    logs["loss/mse"] = mse_final
    logs["loss/lpips"] = lpips_final

    if num > 1:
        inter_total = jnp.zeros(())
        for i in range(num - 1):
            w = cfg.intermediate_loss_weight ** (num - 1 - i)
            m, lp = one(color[b * i : b * (i + 1)])
            inter_total = inter_total + w * (m + lp)
        logs["loss/intermediate"] = inter_total
        total = total + inter_total

    logs["loss/total"] = total
    return total, logs
