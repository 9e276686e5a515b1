"""Prototype + microbenchmark: Pallas per-tile-structure scatter reduction.

PERF.md has listed "a Pallas reduction over the per-tile structure" as the
one untried lever against the pack-VJP scatter-add floor (9.8-11.4 ms for
786k lanes -> 262k slots, ~12-15 ns/index) since round 1. The quantity that
decides whether ANY Pallas formulation can beat XLA's scatter is the rate of
a per-lane read-modify-write into a VMEM-resident accumulator: every known
structure (per-tile runs with ascending slots, slot-block passes with
searchsorted segment bounds) still ends in one dynamic-lane-index
accumulate per live lane, because the VPU cannot scatter within a vreg and
one-hot matmul formulations cost lanes x slot_range x rows MACs (measured
out by orders of magnitude).

This kernel measures exactly that floor: CHUNKed DMA of (16, L) lane rows +
slot ids into VMEM, then a fori_loop of `acc[:, slot] += g[:, lane]` RMW
stores into a (16, SB) VMEM accumulator. If the per-lane rate is >= ~10 ns,
the XLA scatter IS the hardware floor and the lever is dead.

Run on the real TPU: python scripts/profile_pallas_scatter.py
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 16
SB = 8192  # slot-block width: (16, 8192) f32 accumulator = 512 KB VMEM


def _scatter_kernel(slots_ref, g_ref, out_ref, acc, sem_g, sem_s, g_vmem, s_vmem):
    L = g_ref.shape[1]
    acc[:, :] = jnp.zeros((ROWS, SB), jnp.float32)
    cp_g = pltpu.make_async_copy(g_ref, g_vmem, sem_g)
    cp_s = pltpu.make_async_copy(slots_ref, s_vmem, sem_s)
    cp_g.start()
    cp_s.start()
    cp_g.wait()
    cp_s.wait()

    def body(l, _):
        idx = s_vmem[0, l]
        col = g_vmem[:, pl.ds(l, 1)]
        cur = acc[:, pl.ds(idx, 1)]
        acc[:, pl.ds(idx, 1)] = cur + col
        return 0

    jax.lax.fori_loop(0, L, body, 0)
    out_ref[:, :] = acc[:, :]


def pallas_scatter(slots, g):
    L = g.shape[1]
    return pl.pallas_call(
        _scatter_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS, SB), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((ROWS, SB), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.VMEM((ROWS, L), jnp.float32),
            pltpu.VMEM((1, L), jnp.int32),
        ],
    )(slots, g)


def device_total(trace_dir) -> float:
    fn = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/vm.trace.json.gz"))[-1]
    with gzip.open(fn) as f:
        tr = json.load(f)
    agg = defaultdict(float)
    for e in tr["traceEvents"]:
        if e.get("ph") == "X" and e.get("pid") == 3 and e.get("tid") == 3:
            agg[e["name"]] += e.get("dur", 0) / 1e3
    return sum(agg.values())


def main() -> None:
    rng = np.random.default_rng(0)
    L = 65536
    slots = jnp.asarray(
        np.sort(rng.integers(0, SB, (1, L))).astype(np.int32)
    )  # ascending like a tile run's slot order
    g = jnp.asarray(rng.normal(size=(ROWS, L)).astype(np.float32))

    f = jax.jit(pallas_scatter)
    out = f(slots, g)
    jax.block_until_ready(out)
    # correctness vs XLA scatter
    want = jnp.zeros((ROWS, SB), jnp.float32).at[:, slots[0]].add(g)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(want), atol=1e-4
    )
    print("correctness vs XLA scatter: OK", flush=True)

    d = "/tmp/pallas_scatter_prof"
    jax.profiler.start_trace(d)
    out = f(slots, g)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    ms = device_total(d)
    print(
        f"pallas per-lane VMEM RMW: {ms:.2f} ms for {L} lanes = "
        f"{ms*1e6/L:.2f} ns/lane (XLA scatter-add floor: ~12-15 ns/idx; "
        f"a full 786k-lane reduction at this rate would take "
        f"{ms*786432/L:.1f} ms vs the measured 9.8 ms)",
        flush=True,
    )


if __name__ == "__main__":
    main()
