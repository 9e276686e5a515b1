"""Device-profile the bench render step (fwd+bwd) and print per-op device
durations (development tool). Usage: python scripts/profile_render_trace.py
[instance_budget_multiplier, default 8].
"""

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


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 8
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

    args = tuple(
        map(jnp.asarray, (extr, intr, near, far, bg, means, cov, sh, opac))
    )
    render = partial(render_pallas, instance_budget=mult * 256 * 256)

    def loss_fn(means, cov, sh, opac):
        img = render(
            args[0], args[1], args[2], args[3], (h, w), args[4],
            means, cov, sh, opac,
        )
        return jnp.sum(img**2)

    step = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3)))
    out = step(args[5], args[6], args[7], args[8])
    jax.block_until_ready(out)
    print("compiled", flush=True)

    jax.profiler.start_trace("/tmp/rendertrace")
    out = step(args[5], args[6], args[7], args[8])
    jax.block_until_ready(out)
    jax.profiler.stop_trace()

    fn = sorted(glob.glob("/tmp/rendertrace/plugins/profile/*/vm.trace.json.gz"))[-1]
    with gzip.open(fn) as f:
        tr = json.load(f)
    evs = [e for e in tr["traceEvents"] if e.get("ph") == "X"]
    agg = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for e in evs:
        if e.get("pid") == 3 and e.get("tid") == 3:
            agg[e["name"]] += e.get("dur", 0) / 1e3
            cnt[e["name"]] += 1
            total += e.get("dur", 0) / 1e3
    rows = sorted(agg.items(), key=lambda kv: -kv[1])
    print(f"total device op time: {total:.1f} ms (budget mult {mult})")
    for n, t in rows[:30]:
        print(f"{t:9.3f} ms x{cnt[n]:<4d} {n[:70]}")
    print(f"rest: {sum(t for _, t in rows[30:]):.1f} ms in {max(0, len(rows)-30)} ops")


if __name__ == "__main__":
    main()
