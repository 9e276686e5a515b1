"""Microbenchmark gather layouts at HUGE-G scale on the real TPU.

The grouped decode's dominant remaining cost (PERF.md round-4) is the global
slot gather: moving 24 u16 rows per gaussian to depth-sorted slot space at
5.9M gaussians. The table is ~283 MB — far out of cache — and the measured
rate was ~28.8 ns/index with the (24, Gp) rows-major layout, i.e. each index
touches 24 separate cache lines (rows sit Gp*2 B apart). Candidates:

  a) rows-major minor-dim gather   t(24, Gp)[:, idx]      (round-4 shipped)
  b) index-major row gather        t(Gp, 24)[idx]         (48 B contiguous)
  c) index-major i32 row gather    t(Gp, 12) i32 [idx]    (same bytes, wider dtype)
  d) index-major padded row gather t(Gp, 32) u16 [idx]    (64 B = 1 line)
  e) per-group slices of (a)/(b): same locality, checks dispatch overhead
  f) the per-group pack gather at group sizes 2^19 (18.9 MB table, just over
     the ~16 MB cache) vs 2^18 (9.4 MB, resident), same lane density

Timings via the device profiler (wall clocks lie over the axon tunnel).
Run: python scripts/profile_gather_huge.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from scripts._prof_util import device_total  # noqa: E402

import jax
import jax.numpy as jnp
import numpy as np


def profile(tag, n_idx, fn, *args):
    f = jax.jit(fn)
    r = f(*args)
    jax.block_until_ready(r)
    d = f"/tmp/gh_{tag}"
    jax.profiler.start_trace(d)
    r = f(*args)
    jax.block_until_ready(r)
    jax.profiler.stop_trace()
    ms = device_total(d)
    print(f"{tag:24s} {ms:8.1f} ms  {ms*1e6/n_idx:6.2f} ns/idx", flush=True)
    return ms


def main() -> None:
    gp = 12 * 512 * 960  # 5.9M gaussians (headline)
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.permutation(gp).astype(np.int32))

    t_minor = jnp.asarray(rng.integers(0, 65535, (24, gp), dtype=np.uint16))
    t_major = jnp.asarray(rng.integers(0, 65535, (gp, 24), dtype=np.uint16))
    t_major32 = jnp.asarray(
        rng.integers(0, 2**31 - 1, (gp, 12), dtype=np.int32)
    )
    t_major_pad = jnp.asarray(
        rng.integers(0, 65535, (gp, 32), dtype=np.uint16)
    )

    profile("a_(24,Gp)u16_minor", gp, lambda t, i: t[:, i], t_minor, idx)
    profile("b_(Gp,24)u16_major", gp, lambda t, i: t[i], t_major, idx)
    profile("c_(Gp,12)i32_major", gp, lambda t, i: t[i], t_major32, idx)
    profile("d_(Gp,32)u16_major", gp, lambda t, i: t[i], t_major_pad, idx)

    # g) halve the row count: 24 u16 rows bit-packed as 12 u32 rows
    t_minor32 = jnp.asarray(
        rng.integers(0, 2**31 - 1, (12, gp), dtype=np.int32)
    )
    profile("g_(12,Gp)i32_minor", gp, lambda t, i: t[:, i], t_minor32, idx)
    t_minor6 = jnp.asarray(
        rng.integers(0, 2**31 - 1, (6, gp), dtype=np.int32)
    )
    profile("g6_(6,Gp)i32_minor", gp, lambda t, i: t[:, i], t_minor6, idx)

    # h) scatter-set transpose: write gaussian-order rows INTO slot space
    profile(
        "h_scatterset_(12,Gp)i32", gp,
        lambda t, i: jnp.zeros((12, gp), jnp.int32).at[:, i].set(t),
        t_minor32, idx,
    )

    s19 = 1 << 19
    n_groups = -(-gp // s19)

    def per_group_minor(t, i):
        return [
            t[:, i[gi * s19 : (gi + 1) * s19]] for gi in range(n_groups)
        ]

    def per_group_major(t, i):
        return [t[i[gi * s19 : (gi + 1) * s19]] for gi in range(n_groups)]

    profile("e_pergroup_minor", gp, per_group_minor, t_minor, idx)
    profile("e2_pergroup_major", gp, per_group_major, t_major, idx)

    for s_bits in (19, 18):
        s = 1 << s_bits
        lanes = int(2.75 * s)
        pack_idx = jnp.asarray(rng.integers(0, s, (lanes,), dtype=np.int32))
        tbl = jnp.asarray(rng.integers(0, 65535, (18, s), dtype=np.uint16))
        ms = profile(
            f"f_pack_18x2^{s_bits}", lanes, lambda t, i: t[:, i], tbl, pack_idx
        )
        print(
            f"   -> scaled to whole headline (~{2.75*gp/1e6:.1f}M lanes): "
            f"{ms * (2.75 * gp) / lanes:6.1f} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
