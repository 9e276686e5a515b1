"""Profiler-based microbenchmarks (wall clocks lie over the axon tunnel).

Runs a set of candidate ops once under jax.profiler and prints per-op device
durations. Usage: python scripts/profile_micro.py [case ...]
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


def profile(tag, fn, *args):
    f = jax.jit(fn)
    r = f(*args)
    jax.block_until_ready(r)
    d = f"/tmp/micro_{tag}"
    jax.profiler.start_trace(d)
    r = f(*args)
    jax.block_until_ready(r)
    jax.profiler.stop_trace()
    agg, cnt = device_ops(d)
    total = sum(agg.values())
    print(f"== {tag}: total {total:.3f} ms")
    for n, t in sorted(agg.items(), key=lambda kv: -kv[1])[:6]:
        print(f"   {t:8.3f} ms x{cnt[n]:<3d} {n[:60]}")


def main():
    cases = sys.argv[1:] or ["scatter", "sort"]
    L = 786_432
    BG = 262_144
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, BG, L), jnp.int32)
    idx_sorted = jnp.sort(idx)
    g = jnp.asarray(rng.normal(size=(16, L)), jnp.float32)

    if "scatter" in cases:
        profile(
            "scat_unsorted",
            lambda i, x: jnp.zeros((16, BG), jnp.float32).at[:, i].add(x),
            idx, g,
        )
        profile(
            "scat_sorted",
            lambda i, x: jnp.zeros((16, BG), jnp.float32).at[:, i].add(
                x, indices_are_sorted=True
            ),
            idx_sorted, g,
        )
        profile(
            "scat_rowmajor",
            lambda i, x: jnp.zeros((BG, 16), jnp.float32).at[i].add(x.T),
            idx, g,
        )
        profile(
            "scat_9rows",
            lambda i, x: jnp.zeros((9, BG), jnp.float32).at[:, i].add(x[:9]),
            idx, g,
        )

    if "sort" in cases:
        n = 1_835_008
        k1 = jnp.asarray(rng.integers(0, 2**28, n), jnp.int32)
        io = jnp.arange(n, dtype=jnp.int32)
        profile("sort1_1.84M", lambda k: jax.lax.sort((k,), num_keys=1)[0], k1)
        profile(
            "sort2_1.84M",
            lambda k, i: jax.lax.sort((k, i), num_keys=1), k1, io,
        )
        profile(
            "sort2_786k",
            lambda k, i: jax.lax.sort((k, i), num_keys=1),
            k1[:L], io[:L],
        )

    if "segsum" in cases:
        # segment-sum of slot-sorted lanes: 16 rows x L lanes -> (16, BG)
        # via sorted-flag scatter vs manual reduction
        profile(
            "segsum_sorted_scatter",
            lambda i, x: jnp.zeros((16, BG), jnp.float32).at[:, i].add(
                x, indices_are_sorted=True, unique_indices=False
            ),
            idx_sorted, g,
        )


if __name__ == "__main__":
    main()
