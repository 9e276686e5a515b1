"""Compile the HEADLINE forward (12-view 512x960 gs-base encoder) sharded
over an 8-device mesh with depth-hypothesis sharding (spmd_depth_axis) and
dump the post-SPMD-partitioner collective inventory — the lowering evidence
behind the pod-slice 0.6 s-class BASELINE target (the sweep, the measured
single-chip floor, shards embarrassingly over depth candidates).

Compiles on a virtual 8-device CPU mesh (the XLA SPMD partitioner's
sharding propagation and collective insertion are backend-independent).
Usage: python scripts/dump_headline_multichip_hlo.py [--h 512 --w 960]
Writes artifacts/headline_multichip_hlo.txt.gz and prints the byte-weighted
collective table for PERF.md.
"""

from __future__ import annotations

import argparse
import gzip
import os
import re
import sys
from collections import Counter, defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N_DEV = 8
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={N_DEV}"
    ).strip()

import jax
import jax.numpy as jnp
import numpy as np

import __graft_entry__ as ge

_DT_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1, "u16": 2,
             "f16": 2, "s8": 1, "u8": 1, "s64": 8, "u64": 8}


def _shape_bytes(s: str) -> int:
    total = 0
    for m in re.finditer(r"([a-z]+\d+|pred)\[([\d,]*)\]", s):
        n = 1
        if m.group(2):
            for d in m.group(2).split(","):
                n *= int(d)
        total += n * _DT_BYTES.get(m.group(1), 4)
    return total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=12)
    ap.add_argument("--h", type=int, default=512)
    ap.add_argument("--w", type=int, default=960)
    ap.add_argument("--out", default="artifacts/headline_multichip_hlo.txt.gz")
    ap.add_argument("--mode", choices=("depth", "views"), default="depth",
                    help="depth: shard plane-sweep hypotheses over 8 devices; "
                         "views: shard the V axis of the whole encoder over "
                         "4 devices (12 views -> 3/device)")
    a = ap.parse_args()

    from dataclasses import replace

    from my_depthsplat_tpu.models import EncoderDepthSplat

    n_dev = N_DEV if a.mode == "depth" else 4
    cfg = ge._headline_cfg(
        compute_dtype="bfloat16",
        spmd_depth_axis="model" if a.mode == "depth" else None,
    )
    mesh = jax.sharding.Mesh(
        np.asarray(jax.devices("cpu")[:n_dev]).reshape(n_dev), ("model",)
    )
    batch = ge._make_batch(b=1, v_ctx=a.views, v_tgt=1, h=a.h, w=a.w)
    encoder = EncoderDepthSplat(cfg)
    with jax.sharding.set_mesh(mesh):
        shapes = jax.eval_shape(
            lambda key: encoder.init(key, batch["context"], training=False),
            jax.random.key(0),
        )

    def forward(params, context):
        from my_depthsplat_tpu.models.precision import apply_with_precision

        out = apply_with_precision(
            encoder.apply, cfg.compute_dtype, params, context, training=False
        )
        return out["gaussians"].means

    if a.mode == "views":
        # shard every context array's V axis over the mesh; XLA propagates
        # the view sharding through the per-view network (convs/ViT/heads)
        from jax.sharding import NamedSharding, PartitionSpec as P

        vs = NamedSharding(mesh, P(None, "model"))
        ctx_shapes = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=vs),
            batch["context"],
        )
    else:
        ctx_shapes = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), batch["context"]
        )
    with jax.sharding.set_mesh(mesh):
        print("lowering + compiling (several minutes on CPU)...", flush=True)
        compiled = jax.jit(forward).lower(shapes, ctx_shapes).compile()
    txt = compiled.as_text()
    with gzip.open(a.out, "wt") as f:
        f.write(txt)

    counts: Counter[str] = Counter()
    bytes_by: dict[str, int] = defaultdict(int)
    for line in txt.splitlines():
        m = re.search(
            r"%\S+ = (.*?) (all-reduce|all-gather|reduce-scatter|"
            r"collective-permute|all-to-all)(?:-start)?\(",
            line,
        )
        if not m:
            continue
        counts[m.group(2)] += 1
        bytes_by[m.group(2)] += _shape_bytes(m.group(1))
    print(f"HLO: {len(txt)} bytes -> {a.out}")
    print(f"workload: {a.views}-view {a.h}x{a.w}, mesh model={n_dev}, "
          f"mode={a.mode}")
    print("collectives per forward:")
    for k in sorted(counts):
        print(f"  {k:20s} x{counts[k]:<4d} {bytes_by[k]/1e6:9.2f} MB out")


if __name__ == "__main__":
    main()
