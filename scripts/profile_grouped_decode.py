"""Device-profile the huge-G grouped decode alone (no encoder): 5.9M random
gaussians -> one 512x960 render through the depth-grouped chained path.

Run on the real TPU: python scripts/profile_grouped_decode.py [n_gaussians]
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from my_depthsplat_tpu.render import pallas_raster


def main() -> None:
    g = int(sys.argv[1]) if len(sys.argv) > 1 else 12 * 512 * 960
    h, w = 512, 960
    rng = np.random.default_rng(0)
    extr = np.eye(4, dtype=np.float32)[None]
    intr = np.array([[[1.0, 0, 0.5], [0, 1.2, 0.5], [0, 0, 1.0]]], np.float32)
    means = np.stack(
        [rng.uniform(-1.5, 1.5, g), rng.uniform(-1.0, 1.0, g),
         rng.uniform(2.0, 8.0, g)], -1,
    ).astype(np.float32)[None]
    scales = rng.uniform(0.001, 0.004, (g, 3)).astype(np.float32)
    cov = np.zeros((1, g, 3, 3), np.float32)
    for i in range(3):
        cov[0, :, i, i] = scales[:, i] ** 2
    sh = (rng.normal(size=(1, g, 3, 9)) * 0.3).astype(np.float32)
    opac = rng.uniform(0.2, 0.95, (1, g)).astype(np.float32)
    near = np.ones((1,), np.float32)
    far = np.full((1,), 100.0, np.float32)
    bg = np.zeros((1, 3), np.float32)
    args = tuple(
        map(jnp.asarray, (extr, intr, near, far, bg, means, cov, sh, opac))
    )

    f = jax.jit(
        lambda m, c, s, o: pallas_raster.render_pallas(
            *args[:4], (h, w), args[4], m, c, s, o,
            instance_budget=6 * g,
        )
    )
    out = f(*args[5:])
    jax.block_until_ready(out)
    d = "/tmp/grouped_decode_prof"
    jax.profiler.start_trace(d)
    out = f(*args[5:])
    jax.block_until_ready(out)
    jax.profiler.stop_trace()

    fn = sorted(glob.glob(f"{d}/plugins/profile/*/vm.trace.json.gz"))[-1]
    with gzip.open(fn) as fh:
        tr = json.load(fh)
    agg = defaultdict(float)
    cnt = defaultdict(int)
    for e in tr["traceEvents"]:
        if e.get("ph") == "X" and e.get("pid") == 3 and e.get("tid") == 3:
            agg[e["name"]] += e.get("dur", 0) / 1e3
            cnt[e["name"]] += 1
    total = sum(agg.values())
    print(f"decode device total at G={g}: {total:.0f} ms")
    for n, t in sorted(agg.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{t:9.1f} ms x{cnt[n]:<4d} {n[:90]}")


if __name__ == "__main__":
    main()
