"""Prototype + microbenchmark: Pallas per-tile-structure scatter reduction.

PERF.md has listed "a Pallas reduction over the per-tile structure" as the
one untried lever against the pack-VJP scatter-add floor (9.8-11.4 ms for
786k lanes -> 262k slots, ~12-15 ns/index) since round 1. The quantity that
decides whether ANY Pallas formulation can beat XLA's scatter is the rate of
a per-lane read-modify-write into a VMEM-resident accumulator: every known
structure (per-tile runs with ascending slots, slot-block passes with
searchsorted segment bounds) still ends in one dynamic-index accumulate per
live lane, because the VPU cannot scatter within a vreg and one-hot matmul
formulations cost lanes x slot_range x rows MACs (orders of magnitude out).

Mosaic constraints shape the prototype: dynamic LANE offsets are illegal
(128-multiple rule), dynamic SUBLANE offsets are legal — so the accumulator
is (SB, ROWS) with slots on the sublane axis, per-lane rows are (1, ROWS)
vectors (ROWS padded to the 128-lane tiling), and the slot ids stream through SMEM (scalar reads need scalar
memory). That layout is also what a production kernel would use.

This measures exactly that floor: per-lane `acc[slot, :] += g[lane, :]` RMW
in VMEM. If the rate is >= ~10 ns/lane, XLA's scatter IS the hardware floor
and the lever is dead.

Run on the real TPU: python scripts/profile_pallas_scatter.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from scripts._prof_util import device_total  # noqa: E402

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 128  # padded to the 128-lane tiling (DMA slices must align)
SB = 2048  # slot-block height: (SB, ROWS) f32 accumulator (sublane-indexed)
CHUNK = 2048  # lanes per DMA chunk


def _scatter_kernel(
    slots_ref,  # (L,) i32 in ANY/HBM
    g_ref,  # (L, ROWS) f32 in ANY/HBM
    out_ref,  # (SB, ROWS) f32 VMEM output
    g_vmem,  # (2, CHUNK, ROWS) scratch
    s_smem,  # (CHUNK,) SMEM scratch (single-buffered: the lane loop waits
    # on the ids anyway; only the g rows double-buffer)
    sem_g,
    sem_s,
):
    L = g_ref.shape[0]
    n_chunks = L // CHUNK
    out_ref[:, :] = jnp.zeros((SB, ROWS), jnp.float32)

    def dma_g(c, slot):
        return pltpu.make_async_copy(
            g_ref.at[pl.ds(c * CHUNK, CHUNK), :], g_vmem.at[slot], sem_g.at[slot]
        )

    def dma_s(c):
        return pltpu.make_async_copy(
            slots_ref.at[pl.ds(c * CHUNK, CHUNK)], s_smem, sem_s
        )

    dma_g(0, 0).start()

    def chunk_body(c, _):
        slot = c % 2

        @pl.when(c + 1 < n_chunks)
        def _():
            dma_g(c + 1, (c + 1) % 2).start()

        dma_s(c).start()
        dma_g(c, slot).wait()
        dma_s(c).wait()

        def lane_body(l4, _):
            # 4x unrolled: within a tile run slots strictly ascend, so
            # consecutive lanes never collide and the RMWs are independent
            for u in range(4):
                l = l4 * 4 + u
                idx = s_smem[l]
                row = g_vmem[slot, pl.ds(l, 1), :]
                out_ref[pl.ds(idx, 1), :] = out_ref[pl.ds(idx, 1), :] + row
            return 0

        jax.lax.fori_loop(0, CHUNK // 4, lane_body, 0)
        return 0

    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)


def pallas_scatter(slots, g):
    return pl.pallas_call(
        _scatter_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((SB, ROWS), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK, ROWS), jnp.float32),
            pltpu.SMEM((CHUNK,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(slots, g)


def main() -> None:
    rng = np.random.default_rng(0)
    L = 65536
    slots = jnp.asarray(
        np.sort(rng.integers(0, SB, L)).astype(np.int32)
    )  # ascending like a tile run's slot order
    g = jnp.asarray(rng.normal(size=(L, ROWS)).astype(np.float32))

    f = jax.jit(pallas_scatter)
    out = f(slots, g)
    jax.block_until_ready(out)
    want = jnp.zeros((SB, ROWS), jnp.float32).at[slots].add(g)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-3)
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
