"""Compile the SAME sharded train step dryrun_multichip validates for an
8-device (data=4, model=2) mesh and dump the post-SPMD-partitioner HLO with
collective counts (VERDICT r2 task 5: the lowering evidence behind the
multi-chip story).

By default compiles on an 8-virtual-device CPU mesh (the XLA SPMD
partitioner's sharding propagation and collective insertion run identically
across backends; only the collective IMPLEMENTATION differs per platform).
With ``--tpu`` it attempts an AOT compile against a v5e:2x4 TPU topology
description, which requires a compiler that accepts that topology.

Writes /tmp/multichip_hlo.txt.gz and prints the collective table for
PERF.md.
"""

from __future__ import annotations

import gzip
import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N_DEV = 8

if "--tpu" not in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={N_DEV}"
        ).strip()

import jax

import __graft_entry__ as ge
from my_depthsplat_tpu.config import RootCfg, TrainerCfg
from my_depthsplat_tpu.main import build_parallel
from my_depthsplat_tpu.parallel import batch_sharding
from my_depthsplat_tpu.train import LossCfg, OptimizerCfg, TrainCfg, make_train_step


def main() -> None:
    if "--tpu" in sys.argv:
        from jax.experimental import topologies

        topo = topologies.get_topology_desc(
            "v5e8", "tpu", topology_name="v5e:2x4"
        )
        devices = topo.devices
    else:
        devices = jax.devices("cpu")[:N_DEV]

    model_axis = 2
    root = RootCfg(
        encoder=ge._encoder_cfg(tiny=True),
        trainer=TrainerCfg(
            mesh_data=N_DEV // model_axis, mesh_model=model_axis
        ),
    )
    mesh, encoder_cfg, render_sharding = build_parallel(root, devices=devices)
    cfg = TrainCfg(
        encoder=encoder_cfg,
        loss=LossCfg(lpips_weight=0.0),
        optimizer=OptimizerCfg(total_steps=100),
    )
    init_fn, train_step = make_train_step(cfg, render_sharding=render_sharding)

    b = N_DEV // model_axis
    batch = ge._make_batch(b=b, v_ctx=2, v_tgt=model_axis, h=32, w=32)
    with jax.sharding.set_mesh(mesh):
        state_shapes = jax.eval_shape(init_fn, jax.random.key(0), batch)
        bs = batch_sharding(mesh)
        batch_s = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=bs), batch
        )
        compiled = jax.jit(train_step).lower(state_shapes, batch_s).compile()
    txt = compiled.as_text()
    out = "/tmp/multichip_hlo.txt.gz"
    with gzip.open(out, "wt") as f:
        f.write(txt)

    counts: Counter[str] = Counter()
    chans: Counter[str] = Counter()
    for m in re.finditer(
        r"\b(all-reduce|all-gather|reduce-scatter|collective-permute|"
        r"all-to-all)(?:-start)?\b(?:\.\d+)? = ",
        txt,
    ):
        counts[m.group(1)] += 1
    # replica group shapes tell which mesh axis each collective rides
    for m in re.finditer(
        r"(all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all)"
        r"[^\n]*?replica_groups=(\{[^}]*\}|\[[^\]]*\])",
        txt,
    ):
        chans[f"{m.group(1)} groups={m.group(2)[:40]}"] += 1
    print(f"HLO: {len(txt)} bytes -> {out}")
    print(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}")
    print("collectives per train step:")
    for k, v in sorted(counts.items()):
        print(f"  {k:20s} {v}")
    print("by replica group:")
    for k, v in sorted(chans.items()):
        print(f"  x{v:<3d} {k}")


if __name__ == "__main__":
    main()
