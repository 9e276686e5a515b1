"""Per-op device-time breakdown of the bench fwd+bwd render step."""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
from collections import defaultdict
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from my_depthsplat_tpu.render.pallas_raster import render_pallas


def device_ops(trace_dir):
    fn = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/vm.trace.json.gz"))[-1]
    with gzip.open(fn) as f:
        tr = json.load(f)
    agg = defaultdict(float)
    cnt = defaultdict(int)
    for e in tr["traceEvents"]:
        if e.get("ph") == "X" and e.get("pid") == 3 and e.get("tid") == 3:
            agg[e["name"]] += e.get("dur", 0) / 1e3
            cnt[e["name"]] += 1
    return agg, cnt


def main():
    h = w = 256
    n_views = 2
    g = n_views * h * w
    rng = np.random.default_rng(0)
    extr = np.broadcast_to(np.eye(4, dtype=np.float32), (n_views, 4, 4)).copy()
    extr[:, 0, 3] = 0.15 * np.arange(n_views)
    intr = np.broadcast_to(
        np.array([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1]], np.float32),
        (n_views, 3, 3),
    )
    near = np.full((n_views,), 1.0, np.float32)
    far = np.full((n_views,), 100.0, np.float32)
    bg = np.zeros((n_views, 3), np.float32)
    means = rng.normal(size=(n_views, g, 3)).astype(np.float32) * np.array(
        [1.0, 1.0, 0.0], np.float32
    ) + np.array([0.0, 0.0, 4.0], np.float32)
    scales = rng.uniform(0.01, 0.05, size=(n_views, g, 3)).astype(np.float32)
    cov = np.zeros((n_views, g, 3, 3), np.float32)
    cov[..., 0, 0] = scales[..., 0] ** 2
    cov[..., 1, 1] = scales[..., 1] ** 2
    cov[..., 2, 2] = scales[..., 2] ** 2
    sh = rng.normal(size=(n_views, g, 3, 9)).astype(np.float32) * 0.3
    opac = rng.uniform(0.3, 1.0, size=(n_views, g)).astype(np.float32)
    args = tuple(map(jnp.asarray, (extr, intr, near, far, bg, means, cov, sh, opac)))

    render = partial(render_pallas, instance_budget=6 * h * w)

    def loss_fn(means_, cov_, sh_, opac_):
        img = render(args[0], args[1], args[2], args[3], (h, w), args[4],
                     means_, cov_, sh_, opac_)
        return jnp.sum(img ** 2)

    step = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3)))
    out = step(args[5], args[6], args[7], args[8])
    jax.block_until_ready(out)
    d = "/tmp/step_ops"
    jax.profiler.start_trace(d)
    out = step(args[5], args[6], args[7], args[8])
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    agg, cnt = device_ops(d)
    total = sum(agg.values())
    print(f"total {total:.3f} ms over {sum(cnt.values())} op executions")
    for n, t in sorted(agg.items(), key=lambda kv: -kv[1])[:30]:
        print(f"  {t:8.3f} ms x{cnt[n]:<4d} {n[:90]}")


if __name__ == "__main__":
    main()
