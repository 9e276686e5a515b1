"""Dump the TPU-compiled train-step HLO and report hot-fusion metadata."""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

import __graft_entry__ as ge
from my_depthsplat_tpu.train import LossCfg, OptimizerCfg, TrainCfg, make_train_step


def main() -> None:
    cfg = TrainCfg(
        encoder=ge._encoder_cfg(tiny=False),
        loss=LossCfg(lpips_weight=0.0),
        optimizer=OptimizerCfg(total_steps=1000),
    )
    init_fn, train_step = make_train_step(cfg)
    batch = ge._make_batch(b=1, v_ctx=2, v_tgt=4, h=256, w=256)
    state_shapes = jax.eval_shape(init_fn, jax.random.key(0), batch)
    state = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype), state_shapes
    )
    batch_s = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), batch
    )
    txt = jax.jit(train_step).lower(state, batch_s).compile().as_text()
    with open("/tmp/train_hlo.txt", "w") as f:
        f.write(txt)
    print("bytes:", len(txt))
    for name in [
        "fusion.585", "fusion.6", "fusion.592", "fusion.16", "fusion.4",
        "broadcast_multiply_fusion.1", "multiply_reduce_fusion",
    ]:
        for line in txt.splitlines():
            if f" %{name} = " in line:
                m = re.search(
                    r'op_name="([^"]*)" source_file="([^"]*)" source_line=(\d+)',
                    line,
                )
                shape = line.split("=", 1)[1].strip()[:60]
                print(f"{name}: {shape}")
                if m:
                    print(f"   {m.group(1)[:90]}  {m.group(2)}:{m.group(3)}")
                break


if __name__ == "__main__":
    main()
