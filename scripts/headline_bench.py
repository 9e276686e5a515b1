"""Measure the reference's headline workload on this framework: feed-forward
reconstruction (encoder -> gaussians -> render 1 target view) for 12 context
views at 512x960 (reference: 0.6 s end-to-end on one A100, README.md:105).

Development tool; run on the real TPU.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import __graft_entry__ as ge
from my_depthsplat_tpu.models import (
    DecoderSplattingCfg,
    EncoderDepthSplat,
    decode_splatting,
)


def main() -> None:
    v_ctx = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    w = int(sys.argv[3]) if len(sys.argv) > 3 else 960

    if "bf16" in sys.argv:
        # halve the byte-bound plane-sweep gather (see unimatch cfg)
        sweep_dtype = "bfloat16"
    else:
        sweep_dtype = "float32"
    if len(sys.argv) > 4 and sys.argv[4] == "small":
        cfg = ge._encoder_cfg(tiny=False)
    else:
        # the reference's 512x960 video-rendering config (README.md:115-135):
        # gs-base = vitb, num_scales=2, upsample_factor=4, lowest res 1/8
        from dataclasses import replace

        cfg = replace(
            ge._encoder_cfg(tiny=False),
            num_scales=2,
            upsample_factor=4,
            lowest_feature_resolution=8,
            monodepth_vit_type="vitb",
            sweep_gather_dtype=sweep_dtype,
        )
    batch = ge._make_batch(b=1, v_ctx=v_ctx, v_tgt=1, h=h, w=w)
    encoder = EncoderDepthSplat(cfg)
    shapes = jax.eval_shape(
        lambda key: encoder.init(key, batch["context"], training=False),
        jax.random.key(0),
    )
    host_rng = np.random.default_rng(0)

    def mat(s):
        return jnp.asarray(
            host_rng.normal(0.0, 0.02, s.shape).astype(s.dtype)
            if jnp.issubdtype(s.dtype, jnp.floating)
            else np.zeros(s.shape, s.dtype)
        )

    params = jax.tree.map(mat, shapes)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    print(f"params: {n_params/1e6:.1f}M", flush=True)

    encoder_only = "encoder_only" in sys.argv
    bf16net = "bf16net" in sys.argv

    def forward(params, batch):
        context = batch["context"]
        if bf16net:
            from my_depthsplat_tpu.models.precision import (
                cast_network_inputs,
                cast_outputs_f32,
            )

            params, context = cast_network_inputs(params, context, jnp.bfloat16)
            out = cast_outputs_f32(
                encoder.apply(params, context, training=False)
            )
        else:
            out = encoder.apply(params, context, training=False)
        if encoder_only:
            # the reference's 0.6 s headline is feed-forward RECONSTRUCTION
            # (images -> gaussians); rendering frames is a separate step
            return out["gaussians"].means
        dec = decode_splatting(
            DecoderSplattingCfg(),
            out["gaussians"],
            batch["target"]["extrinsics"],
            batch["target"]["intrinsics"],
            batch["target"]["near"],
            batch["target"]["far"],
            batch["target"]["image"].shape[2:4],
        )
        return dec.color

    f = jax.jit(forward)
    t0 = time.perf_counter()
    out = f(params, batch)
    jax.block_until_ready(out)
    print(f"compile+first: {time.perf_counter()-t0:.1f}s, out {out.shape}", flush=True)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = f(params, batch)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    print(
        f"{v_ctx}-view {h}x{w} forward: min {min(ts)*1e3:.0f} ms "
        f"(reference A100 headline: 600 ms end-to-end)"
    )


if __name__ == "__main__":
    main()
