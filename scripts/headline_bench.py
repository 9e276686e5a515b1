"""Pinned, reproducible measurement of the reference's headline workload:
feed-forward reconstruction (12 context views @ 512x960 -> gaussians ->
render 1 target view) on this framework. Reference: 0.6 s end-to-end on one
A100 (/root/reference/README.md:105).

Model config matches the reference's 512x960 video-rendering recipe
(README.md:115-135): gs-base = vitb monodepth, num_scales=2,
upsample_factor=4, lowest feature resolution 1/8.

Usage (run on the real TPU):

    # single configuration
    python scripts/headline_bench.py --sweep-dtype bfloat16 --net-dtype bfloat16
    # the full {f32,bf16net} x {gather,window} matrix -> JSON artifact
    python scripts/headline_bench.py --matrix --json artifacts/HEADLINE_rNN.json

The recorded r04 headline (artifacts/HEADLINE_r04.json) is reproduced by
`--matrix`; the shipped fast config (configs/re10k_720p_fast.yaml) pins the
winning combination. Timing: jit-compiled forward, 1 warm-up, then min of
--iters wall-clock runs with block_until_ready (the program is ~1 s of device
work, so dispatch overlap is negligible; see PERF.md "Tunnel measurement
gotchas").
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from dataclasses import replace

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
from my_depthsplat_tpu.models.precision import apply_with_precision


def build_cfg(a: argparse.Namespace):
    if a.model == "small":
        # gs-small: vits, single scale, 1/4 features
        cfg = ge._encoder_cfg(tiny=False)
    else:
        cfg = ge._headline_cfg()
    cfg = replace(
        cfg,
        sweep_gather_dtype=a.sweep_dtype,
        sweep_mode=a.sweep_mode,
        sweep_window=a.window,
        sweep_window_groups_scale0=a.window_groups_scale0,
        compute_dtype=a.net_dtype,
    )
    if getattr(a, "spmd_depth", 1) > 1:
        # composed pod-slice layout: explicit named axes so the sweep's
        # depth-hypothesis sharding constraints land on the "depth" axis
        cfg = replace(
            cfg,
            spmd_view_axis="view" if a.spmd_views > 1 else None,
            spmd_depth_axis="depth",
        )
    return cfg


def measure(a: argparse.Namespace) -> dict:
    cfg = build_cfg(a)
    batch = ge._make_batch(b=1, v_ctx=a.views, v_tgt=1, h=a.height, w=a.width)
    encoder = EncoderDepthSplat(cfg)

    # --spmd-views N: the pod-slice layout (PERF.md pod-slice projection) —
    # shard the context VIEW axis over an N-device mesh; per-view network
    # partitions for free, cross-view collectives ride ICI. Validated
    # numerically by tests/test_parallel_ring.py
    # ::test_encoder_view_sharded_forward_matches_local.
    mesh = None
    spmd_depth = getattr(a, "spmd_depth", 1)
    if a.spmd_views > 1 or spmd_depth > 1:
        import numpy as _np
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        devs = jax.devices()
        n_need = max(a.spmd_views, 1) * max(spmd_depth, 1)
        if len(devs) < n_need:
            raise SystemExit(
                f"--spmd-views {a.spmd_views} x --spmd-depth {spmd_depth} "
                f"needs {n_need} devices; found {len(devs)}"
            )
        if spmd_depth > 1:
            # composed (views x depth) pod-slice layout — the 8-chip
            # projection's mesh (PERF.md pod-slice section)
            mesh = Mesh(
                _np.asarray(devs[:n_need]).reshape(
                    max(a.spmd_views, 1), spmd_depth
                ),
                ("view", "depth"),
            )
            view_axis = "view"
        else:
            mesh = Mesh(
                _np.asarray(devs[: a.spmd_views]).reshape(a.spmd_views),
                ("model",),
            )
            view_axis = "model"
        vs = NamedSharding(
            mesh, P(None, view_axis) if a.spmd_views > 1 else P()
        )
        batch["context"] = {
            k: jax.device_put(x, vs) for k, x in batch["context"].items()
        }

    import contextlib

    def mesh_ctx():
        return (
            jax.sharding.set_mesh(mesh) if mesh is not None
            else contextlib.nullcontext()
        )

    with mesh_ctx():
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

    def forward(params, batch):
        out = apply_with_precision(
            encoder.apply, cfg.compute_dtype, params, batch["context"],
            training=False,
        )
        ovf = out.get("sweep_window_overflow")
        if a.encoder_only:
            # the reference's 0.6 s headline is feed-forward RECONSTRUCTION
            # (images -> gaussians); rendering frames is a separate step
            return out["gaussians"].means, ovf
        if getattr(a, "spmd_decode", False) and a.spmd_views > 1:
            # pod-slice decode: depth groups sharded over the same chips
            # that sharded the encoder's views (render/sharded.py)
            from my_depthsplat_tpu.render.sharded import (
                render_pallas_depth_sharded,
            )

            g = out["gaussians"]
            tgt = batch["target"]
            bt = tgt["extrinsics"].shape[0] * tgt["extrinsics"].shape[1]
            h_t, w_t = tgt["image"].shape[2:4]
            axis = "view" if getattr(a, "spmd_depth", 1) > 1 else "model"
            color = render_pallas_depth_sharded(
                axis,
                tgt["extrinsics"].reshape(bt, 4, 4),
                tgt["intrinsics"].reshape(bt, 3, 3),
                tgt["near"].reshape(bt),
                tgt["far"].reshape(bt),
                (h_t, w_t),
                jnp.zeros((bt, 3), jnp.float32),
                jnp.broadcast_to(g.means, (bt,) + g.means.shape[1:]),
                jnp.broadcast_to(
                    g.covariances, (bt,) + g.covariances.shape[1:]
                ),
                jnp.broadcast_to(
                    g.harmonics, (bt,) + g.harmonics.shape[1:]
                ),
                jnp.broadcast_to(
                    g.opacities, (bt,) + g.opacities.shape[1:]
                ),
                instance_budget=int(6 * g.means.shape[1]),
            )
            return color, ovf
        dec = decode_splatting(
            DecoderSplattingCfg(),
            out["gaussians"],
            batch["target"]["extrinsics"],
            batch["target"]["intrinsics"],
            batch["target"]["near"],
            batch["target"]["far"],
            batch["target"]["image"].shape[2:4],
        )
        return dec.color, ovf

    f = jax.jit(forward)
    with mesh_ctx():
        t0 = time.perf_counter()
        out, ovf = f(params, batch)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(a.iters):
            t0 = time.perf_counter()
            out, ovf = f(params, batch)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        if a.profile:
            with jax.profiler.trace(a.profile):
                out, ovf = f(params, batch)
                jax.block_until_ready(out)
    ms = [round(t * 1e3, 1) for t in ts]
    mpix = a.views * a.height * a.width / 1e6
    return {
        "views": a.views,
        "h": a.height,
        "w": a.width,
        "model": a.model,
        "sweep_dtype": a.sweep_dtype,
        "sweep_mode": a.sweep_mode,
        "window": a.window if a.sweep_mode == "window" else None,
        "window_groups_scale0": (
            a.window_groups_scale0 if a.sweep_mode == "window" else None
        ),
        "net_dtype": a.net_dtype,
        "encoder_only": a.encoder_only,
        "spmd_views": a.spmd_views,
        "spmd_depth": getattr(a, "spmd_depth", 1),
        "params_m": round(n_params / 1e6, 1),
        "compile_s": round(compile_s, 1),
        "ms": ms,
        "ms_min": min(ms),
        "mpix_per_s": round(mpix / (min(ms) / 1e3), 2),
        "sweep_window_overflow": (int(ovf) if ovf is not None else None),
    }


MATRIX = [
    # (label, overrides) — the {precision} x {sweep path} measurement grid
    ("f32_gather", {}),
    ("bf16sweep_gather", {"sweep_dtype": "bfloat16"}),
    ("f32_window", {"sweep_mode": "window"}),
    ("bf16net_gather", {"net_dtype": "bfloat16"}),
    ("bf16net_window", {"net_dtype": "bfloat16", "sweep_mode": "window"}),
]


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--views", type=int, default=12)
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=960)
    p.add_argument("--model", choices=("base", "small"), default="base")
    p.add_argument("--sweep-dtype", choices=("float32", "bfloat16"),
                   default="float32",
                   help="plane-sweep gather precision (sweep_gather_dtype)")
    p.add_argument("--sweep-mode", choices=("gather", "window"),
                   default="gather")
    p.add_argument("--window", type=int, default=6,
                   help="sweep_window (window mode)")
    p.add_argument("--window-groups-scale0", type=int, default=16,
                   help="sweep_window_groups_scale0 (window mode, scale 0)")
    p.add_argument("--net-dtype", choices=("float32", "bfloat16"),
                   default="float32",
                   help="network compute precision (encoder.compute_dtype)")
    p.add_argument("--encoder-only", action="store_true",
                   help="stop at gaussians (no render) like the reference's "
                        "reconstruction headline")
    p.add_argument("--spmd-views", type=int, default=1,
                   help="shard the context view axis over this many devices "
                        "(the pod-slice layout; needs a multi-chip runtime)")
    p.add_argument("--spmd-depth", type=int, default=1,
                   help="also shard plane-sweep depth hypotheses over this "
                        "many devices (composed views x depth mesh — the "
                        "8-chip projection's layout)")
    p.add_argument("--spmd-decode", action="store_true",
                   help="with --spmd-views: shard the huge-G decode's depth "
                        "groups over the same mesh axis "
                        "(render/sharded.py; forward-only)")
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--matrix", action="store_true",
                   help="run the full precision x sweep-path matrix")
    p.add_argument("--json", type=str, default=None,
                   help="write results (single dict or matrix list) to PATH")
    p.add_argument("--profile", type=str, default=None,
                   help="dump a device profile trace to DIR (single mode)")
    a = p.parse_args()

    meta = {
        "workload": f"{a.views}-view {a.height}x{a.width} feed-forward "
                    "reconstruction + 1 target render",
        "reference": "0.6 s end-to-end, 1x A100 (README.md:105)",
        "device": jax.devices()[0].device_kind,
        "jax": jax.__version__,
        "cmd": " ".join(sys.argv),
    }
    if a.matrix:
        results = []
        for label, overrides in MATRIX:
            run = argparse.Namespace(**{**vars(a), **overrides})
            r = measure(run)
            r["label"] = label
            print(json.dumps(r), flush=True)
            results.append(r)
        payload = {"meta": meta, "results": results}
    else:
        r = measure(a)
        print(json.dumps(r), flush=True)
        payload = {"meta": meta, "results": [r]}

    if a.json:
        with open(a.json, "w") as fh:
            json.dump(payload, fh, indent=1)
        print(f"wrote {a.json}", flush=True)


if __name__ == "__main__":
    main()
