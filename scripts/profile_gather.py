"""Microbenchmark gather layouts on the real TPU (development tool).

The binning pipeline's dominant cost is gathering per-gaussian screen rows
into lane space (1.18M indices from a 524k-column table). Compare:
  a) minor-dim gather  rows(9, BG)[:, idx]
  b) major-dim gather  rows_t(BG, 16)[idx]  (row gather, 64B contiguous)
  c) major-dim gather  rows_t(BG, 128)[idx] (full-lane rows)
  d) per-row 1d gathers row(BG,)[idx] x 9
  e) one-hot matmul (for scale: only if tiny)
  f) scatter-add transpose of (b) — the backward cost
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - start) / iters * 1e3


def main() -> None:
    bg_count = 2 * 256 * 256
    L = 1179648
    rng = np.random.default_rng(0)
    idx = jnp.asarray(
        rng.integers(0, bg_count, size=(L,), dtype=np.int32)
    )
    rows = jnp.asarray(rng.normal(size=(9, bg_count)).astype(np.float32))
    rows_t16 = jnp.asarray(
        rng.normal(size=(bg_count, 16)).astype(np.float32)
    )
    rows_t128 = jnp.asarray(
        rng.normal(size=(bg_count, 128)).astype(np.float32)
    )
    row1 = rows[0]

    a = jax.jit(lambda r, i: r[:, i])
    print(f"a minor (9,BG)[:,idx]:    {timeit(a, rows, idx):8.2f} ms")

    b = jax.jit(lambda r, i: r[i])
    print(f"b major (BG,16)[idx]:     {timeit(b, rows_t16, idx):8.2f} ms")

    c = jax.jit(lambda r, i: r[i])
    print(f"c major (BG,128)[idx]:    {timeit(c, rows_t128, idx):8.2f} ms")

    d = jax.jit(lambda r, i: jnp.stack([r[0][i], r[1][i], r[2][i]]))
    print(f"d per-row 1d x3:          {timeit(d, rows, idx):8.2f} ms")

    e = jax.jit(lambda r, i: r[i])
    print(f"e 1d (BG,)[idx]:          {timeit(e, row1, idx):8.2f} ms")

    g = jnp.asarray(rng.normal(size=(L, 16)).astype(np.float32))
    f = jax.jit(
        lambda u, i: jnp.zeros((bg_count, 16), jnp.float32).at[i].add(u)
    )
    print(f"f scatter-add (L,16)->BG: {timeit(f, g, idx):8.2f} ms")

    g1 = jnp.asarray(rng.normal(size=(L,)).astype(np.float32))
    f1 = jax.jit(
        lambda u, i: jnp.zeros((bg_count,), jnp.float32).at[i].add(u)
    )
    print(f"g scatter-add (L,)->BG:   {timeit(f1, g1, idx):8.2f} ms")

    # sorted-index gather: does locality help?
    idx_s = jnp.sort(idx)
    print(f"h sorted idx minor:       {timeit(a, rows, idx_s):8.2f} ms")
    print(f"i sorted idx major16:     {timeit(b, rows_t16, idx_s):8.2f} ms")

    # segment-sum via sort+cumsum alternative for backward
    def seg_sort(u, i):
        key = i.astype(jnp.int32)
        sk, su = jax.lax.sort((key, u), num_keys=1)
        c = jnp.cumsum(su)
        ends = jnp.searchsorted(sk, jnp.arange(1, bg_count + 1, dtype=jnp.int32))
        tot = c[jnp.clip(ends - 1, 0, L - 1)]
        return jnp.diff(tot, prepend=jnp.zeros((1,), u.dtype))
    print(f"j segsum sort+cumsum 1d:  {timeit(jax.jit(seg_sort), g1, idx):8.2f} ms")


if __name__ == "__main__":
    main()
