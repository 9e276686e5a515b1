"""Microbench: inverse-permutation alternatives to the pack-VJP scatter-add.

The pack VJP's f32 scatter-add (~12.5 ns/index) is the #1 render cost. If the
candidate sort carried the candidate id in the key (i64), the backward could
replace the scatter with a u16 gather (~2.3-4 ns/index) plus dense per-tier
reductions. This measures the building blocks at bench scale:

  sort_i32_cand   — current single-key i32 sort over the full candidate set
  sort_i64_cand   — same keys widened to i64 with a 20-bit payload
  sort2_i64       — second i64 sort (cand_id<<20 | position) = inverse perm
  scatter_add_16r — current pack-VJP scatter (16 f32 rows, L lanes)
  scatter_set_i32 — scatter-assign of iota (alternative inverse perm)
  gather_u16_32r  — backward gather of d_packed as u16 pairs (32 rows)
  tier1_reduce    — dense (rows, 4, BG) sum over the tier-1 axis
"""

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
    d = f"/tmp/invp_{tag}"
    jax.profiler.start_trace(d)
    r = f(*args)
    jax.block_until_ready(r)
    jax.profiler.stop_trace()
    print(f"{tag}: {device_total(d):.3f} ms", flush=True)


def main():
    rows = 16
    bg = 262144
    n_cand = 4 * bg + 2 * 32768  # tier-1 + compacted tiers (bench-like)
    L = 6 * 65536 * 2 + 256  # layout lanes (cap + slack)
    rng = np.random.default_rng(0)

    keys32 = jnp.asarray(
        rng.integers(0, 512 << 18, size=(n_cand,), dtype=np.int64).astype(np.int32)
    )
    cand = jnp.arange(n_cand, dtype=jnp.int64)
    g16 = jnp.asarray(rng.normal(size=(rows, L)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, bg, size=(L,), dtype=np.int32))
    idx_cand = jnp.asarray(rng.integers(0, n_cand, size=(L,), dtype=np.int32))
    tbl_u16 = jnp.asarray(
        rng.integers(0, 65535, size=(2 * rows, L), dtype=np.int64).astype(np.uint16)
    )
    gather_idx = jnp.asarray(
        rng.integers(0, L, size=(n_cand,), dtype=np.int32)
    )
    dense = jnp.asarray(rng.normal(size=(rows, 4, bg)).astype(np.float32))

    profile("sort_i32_cand", lambda k: jax.lax.sort((k,), num_keys=1)[0], keys32)
    profile(
        "sort_i64_cand",
        lambda k, c: jax.lax.sort(
            ((k.astype(jnp.int64) << 20) | c,), num_keys=1
        )[0],
        keys32, cand,
    )
    k64 = (keys32.astype(jnp.int64) << 20) | cand
    s64 = jax.lax.sort((k64,), num_keys=1)[0]
    profile(
        "sort2_i64",
        lambda s: jax.lax.sort(
            (((s & 0xFFFFF) << 21)
             | jax.lax.iota(jnp.int64, s.shape[0]),),
            num_keys=1,
        )[0],
        s64,
    )
    profile(
        "scatter_add_16r",
        lambda g, i: jnp.zeros((rows, bg), jnp.float32).at[:, i].add(g),
        g16, idx,
    )
    profile(
        "scatter_set_i32",
        lambda i: jnp.zeros((n_cand,), jnp.int32)
        .at[i]
        .set(jnp.arange(n_cand, dtype=jnp.int32)[: i.shape[0]][: i.shape[0]]
             if False else jnp.arange(i.shape[0], dtype=jnp.int32)),
        idx_cand,
    )
    profile(
        "gather_u16_32r",
        lambda t, i: t[:, i],
        tbl_u16, gather_idx,
    )
    profile(
        "tier1_reduce",
        lambda d: jnp.sum(d, axis=1),
        dense,
    )


if __name__ == "__main__":
    main()
