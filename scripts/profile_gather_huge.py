"""Microbenchmark gather layouts at HUGE-G scale on the real TPU.

The grouped decode's dominant remaining cost (PERF.md round-4) is the global
slot gather: moving 24 u16 rows per gaussian to depth-sorted slot space at
5.9M gaussians. The table is ~283 MB — far out of cache — and the measured
rate was ~28.8 ns/index with the (24, Gp) rows-major layout, i.e. each index
touches 24 cache lines (rows are Gp*2 B apart). Candidate fixes:

  a) rows-major minor-dim gather   t(24, Gp)[:, idx]      (round-4 shipped)
  b) index-major row gather        t(Gp, 24)[idx]         (48 B contiguous)
  c) index-major i32 row gather    t(Gp, 12) i32 [idx]    (same bytes, wider dtype)
  d) index-major padded row gather t(Gp, 32) u16 [idx]    (64 B = 1 line exactly)
  e) per-group slices: 23 gathers of 256k indices each from the SAME big
     table (locality identical; checks per-dispatch overhead only)
  f) the per-group pack gather at both group sizes: (18, 2^19) u16 table
     (18.9 MB, just over cache) vs (18, 2^18) (9.4 MB, resident), 2.75M
     candidate lanes per group-equivalent

Run: python scripts/profile_gather_huge.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - start) / iters * 1e3


def main() -> None:
    gp = 12 * 512 * 960  # 5.9M gaussians (headline)
    rng = np.random.default_rng(0)
    # depth-sort permutation is a full random permutation of [0, Gp)
    idx = jnp.asarray(rng.permutation(gp).astype(np.int32))

    t_minor = jnp.asarray(
        rng.integers(0, 65535, size=(24, gp), dtype=np.uint16)
    )
    t_major = jnp.asarray(
        rng.integers(0, 65535, size=(gp, 24), dtype=np.uint16)
    )
    t_major32 = jnp.asarray(
        rng.integers(0, 2**31 - 1, size=(gp, 12), dtype=np.int32)
    )
    t_major_pad = jnp.asarray(
        rng.integers(0, 65535, size=(gp, 32), dtype=np.uint16)
    )

    a = jax.jit(lambda t, i: t[:, i])
    ms = timeit(a, t_minor, idx)
    print(f"a (24,Gp)u16[:,idx]:  {ms:8.1f} ms  {ms*1e6/gp:6.2f} ns/idx")

    b = jax.jit(lambda t, i: t[i])
    ms = timeit(b, t_major, idx)
    print(f"b (Gp,24)u16[idx]:    {ms:8.1f} ms  {ms*1e6/gp:6.2f} ns/idx")

    c = jax.jit(lambda t, i: t[i])
    ms = timeit(c, t_major32, idx)
    print(f"c (Gp,12)i32[idx]:    {ms:8.1f} ms  {ms*1e6/gp:6.2f} ns/idx")

    d = jax.jit(lambda t, i: t[i])
    ms = timeit(d, t_major_pad, idx)
    print(f"d (Gp,32)u16[idx]:    {ms:8.1f} ms  {ms*1e6/gp:6.2f} ns/idx")

    s19 = 1 << 19
    n_groups = -(-gp // s19)

    def per_group(t, i):
        outs = []
        for gi in range(n_groups):
            outs.append(t[:, i[gi * s19 : (gi + 1) * s19]])
        return outs

    e = jax.jit(per_group)
    ms = timeit(e, t_minor, idx)
    print(f"e per-group minor:    {ms:8.1f} ms  {ms*1e6/gp:6.2f} ns/idx")

    def per_group_major(t, i):
        outs = []
        for gi in range(n_groups):
            outs.append(t[i[gi * s19 : (gi + 1) * s19]])
        return outs

    e2 = jax.jit(per_group_major)
    ms = timeit(e2, t_major, idx)
    print(f"e2 per-group major:   {ms:8.1f} ms  {ms*1e6/gp:6.2f} ns/idx")

    # f) per-group pack gather: candidate lanes into the group's slot table.
    # Headline measured ~2.75 live lanes/gaussian; emulate one group's pack
    # at both group sizes with the same per-group lane density.
    for s_bits in (19, 18):
        s = 1 << s_bits
        lanes = int(2.75 * s)
        pack_idx = jnp.asarray(
            rng.integers(0, s, size=(lanes,), dtype=np.int32)
        )
        tbl = jnp.asarray(
            rng.integers(0, 65535, size=(18, s), dtype=np.uint16)
        )
        f = jax.jit(lambda t, i: t[:, i])
        ms = timeit(f, tbl, pack_idx)
        per_g_equiv = ms * (gp / s) / 1e0  # scaled to all groups
        print(
            f"f pack (18,2^{s_bits})[:,idx] {lanes} lanes: {ms:8.2f} ms "
            f"{ms*1e6/lanes:6.2f} ns/idx  (~{per_g_equiv:6.1f} ms whole headline)"
        )


if __name__ == "__main__":
    main()
