"""Measure the full training step (encoder fwd+bwd + render fwd+bwd + AdamW)
on the real TPU at the re10k small config (2 context views, 256x256).

Reference budget: 1x A100 runs bs8 x 600k steps (scripts/re10k_depthsplat_train.sh);
their cluster recipe is 4 GPU x bs8 x 150k. This prints steps/s and samples/s
for direct comparison once the reference's per-step time is known.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

import __graft_entry__ as ge
from my_depthsplat_tpu.train import LossCfg, OptimizerCfg, TrainCfg, make_train_step


def main() -> None:
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    accum = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    h = w = 256
    cfg = TrainCfg(
        encoder=ge._encoder_cfg(tiny=False),
        loss=LossCfg(lpips_weight=0.0),  # LPIPS weights not bundled; MSE only
        optimizer=OptimizerCfg(total_steps=1000),
        grad_accum=accum,
    )
    init_fn, train_step = make_train_step(cfg)
    batch = ge._make_batch(b=b * accum, v_ctx=2, v_tgt=4, h=h, w=w)

    t0 = time.perf_counter()
    # init on a bs1 batch: every parameter is batch-size-independent, and an
    # eager flax init at bs8 x 256^2 materializes per-layer activations for
    # minutes before the jitted step (which is what we measure) ever runs
    init_batch = (
        batch
        if b * accum == 1
        else ge._make_batch(b=1, v_ctx=2, v_tgt=4, h=h, w=w)
    )
    # jit the init: eager flax init over the axon tunnel pays a round trip
    # per op (~500 s); one compiled dispatch takes seconds
    state = jax.jit(init_fn)(jax.random.key(0), init_batch)
    jax.block_until_ready(state.params)
    print(f"init: {time.perf_counter()-t0:.1f}s", flush=True)

    step = jax.jit(train_step, donate_argnums=0)
    t0 = time.perf_counter()
    state, logs = step(state, batch)
    jax.block_until_ready(logs["loss/total"])
    print(f"compile+first: {time.perf_counter()-t0:.1f}s  loss={float(logs['loss/total']):.4f}", flush=True)

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        state, logs = step(state, batch)
    jax.block_until_ready(logs["loss/total"])
    dt = (time.perf_counter() - t0) / iters
    mem = jax.local_devices()[0].memory_stats() or {}
    peak = mem.get("peak_bytes_in_use", 0) / 2**30
    lim = mem.get("bytes_limit", 0) / 2**30
    eff = b * accum
    tag = f"bs{b}x{accum} (effective bs{eff})" if accum > 1 else f"bs{b}"
    print(
        f"train step ({tag}, 2-view 256x256, 4 targets): {dt*1e3:.0f} ms "
        f"-> {1/dt:.2f} steps/s, {eff/dt:.2f} samples/s, "
        f"peak mem {peak:.2f}/{lim:.2f} GiB"
    )


if __name__ == "__main__":
    main()
