"""Microbench: pack-VJP scatter-add variants (accumulator size, splits)."""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def device_total(trace_dir):
    fn = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/vm.trace.json.gz"))[-1]
    with gzip.open(fn) as f:
        tr = json.load(f)
    return sum(
        e.get("dur", 0) / 1e3
        for e in tr["traceEvents"]
        if e.get("ph") == "X" and e.get("pid") == 3 and e.get("tid") == 3
    )


def profile(tag, fn, *args):
    f = jax.jit(fn)
    r = f(*args)
    jax.block_until_ready(r)
    d = f"/tmp/scv_{tag}"
    jax.profiler.start_trace(d)
    r = f(*args)
    jax.block_until_ready(r)
    jax.profiler.stop_trace()
    print(f"{tag}: {device_total(d):.3f} ms", flush=True)


def main():
    rows = 16
    bg = 262144
    L = 6 * 65536 * 2 + 256  # bench cap + slack
    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.normal(size=(rows, L)).astype(np.float32))
    # realistic: lanes sorted by (tile, slot); emulate with random slots
    idx = jnp.asarray(rng.integers(0, bg, size=(L,), dtype=np.int32))
    # per-view split: first half of lanes index view0 slots, second half view1
    half = L // 2
    idx0 = jnp.asarray(rng.integers(0, bg // 2, size=(half,), dtype=np.int32))
    idx1 = jnp.asarray(rng.integers(0, bg // 2, size=(L - half,), dtype=np.int32))

    def scat_full(g, idx):
        return jnp.zeros((rows, bg), jnp.float32).at[:, idx].add(g)

    def scat_split(g, i0, i1):
        a = jnp.zeros((rows, bg // 2), jnp.float32).at[:, i0].add(g[:, :half])
        b = jnp.zeros((rows, bg // 2), jnp.float32).at[:, i1].add(g[:, half:])
        return a, b

    def scat_8rows(g, idx):
        # two scatters of 8 rows each — tests whether row count matters
        a = jnp.zeros((8, bg), jnp.float32).at[:, idx].add(g[:8])
        b = jnp.zeros((8, bg), jnp.float32).at[:, idx].add(g[8:])
        return a, b

    def scat_quarter(g, i0):
        # accumulator at bg//4 (4 MB x16 rows): well under any cache cliff
        return jnp.zeros((rows, bg // 4), jnp.float32).at[:, i0 % (bg // 4)].add(g)

    profile("full_262k_acc", scat_full, g, idx)
    profile("split_131k_acc", scat_split, g, idx0, idx1)
    profile("eight_rows_x2", scat_8rows, g, idx)
    profile("quarter_acc", scat_quarter, g, idx)


if __name__ == "__main__":
    main()
