"""Inference precision policy: bf16 network compute with f32 geometry.

TPU VPU/MXU run bf16 at ~2x f32 throughput and the byte-bound ops (plane
sweep gathers, feature maps) halve their traffic, so casting the network to
bf16 is the single biggest single-chip lever on the feed-forward headline
workload (reference: 0.6 s for 12 views at 512x960 on A100, README.md:105).

The cast is applied to PARAMS and IMAGE-like inputs only: camera fields
(intrinsics/extrinsics/near/far) stay f32, so everything derived from them
by dtype promotion — plane-sweep candidates, warp coordinates, ray
directions, gaussian means — keeps f32 geometry precision. Outputs are cast
back to f32 before the renderer.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

_CAMERA_KEYS = ("extrinsics", "intrinsics", "near", "far", "depth")


def cast_network_inputs(params: Any, context: dict, dtype) -> tuple[Any, dict]:
    """Cast params + image-like context fields to ``dtype`` (camera fields
    untouched). dtype=None / float32 returns inputs unchanged."""
    if dtype is None or dtype == jnp.float32:
        return params, context
    params = jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        params,
    )
    context = {
        k: (
            v
            if k in _CAMERA_KEYS or not jnp.issubdtype(v.dtype, jnp.floating)
            else v.astype(dtype)
        )
        for k, v in context.items()
    }
    return params, context


def cast_outputs_f32(out: Any) -> Any:
    """Encoder outputs -> f32 for the renderer/metrics."""
    return jax.tree.map(
        lambda x: (
            x.astype(jnp.float32)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x
        ),
        out,
    )


def resolve_dtype(name: str | None):
    if name in (None, "float32", "f32"):
        return jnp.float32
    if name in ("bfloat16", "bf16"):
        return jnp.bfloat16
    raise ValueError(f"Unknown compute dtype {name!r}")


def apply_with_precision(apply_fn, compute_dtype: str | None, params, context,
                         **kwargs):
    """Run an encoder apply under the configured precision policy
    (encoder.compute_dtype): bf16 params + image-like inputs, f32 camera
    fields and LiDAR depth prompts, outputs cast back to f32. float32 is a
    strict no-op passthrough."""
    dtype = resolve_dtype(compute_dtype)
    if dtype == jnp.float32:
        return apply_fn(params, context, **kwargs)
    params, context = cast_network_inputs(params, context, dtype)
    return cast_outputs_f32(apply_fn(params, context, **kwargs))
