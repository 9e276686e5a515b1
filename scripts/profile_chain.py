"""Serialized-chain timing: each iteration depends on the previous output,
so pipelining/dedup in the remote tunnel can't hide true device time."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def chain_time(fn, x, iters=10):
    """fn: x -> x-like. Chains iterations through a data dependency."""
    y = fn(x)
    jax.block_until_ready(y)
    start = time.perf_counter()
    y = x
    for _ in range(iters):
        y = fn(y)
    jax.block_until_ready(y)
    return (time.perf_counter() - start) / iters * 1e3


def indep_time(fn, x, iters=10):
    y = fn(x)
    jax.block_until_ready(y)
    start = time.perf_counter()
    for _ in range(iters):
        y = fn(x)
    jax.block_until_ready(y)
    return (time.perf_counter() - start) / iters * 1e3


def main() -> None:
    rng = np.random.default_rng(0)
    L = 1179648

    big = jnp.asarray(rng.normal(size=(L, 16)).astype(np.float32))
    f = jax.jit(lambda x: x * 1.0000001 + 0.0000001)
    print(f"eltwise 75MB chain:  {chain_time(f, big):8.3f} ms")
    print(f"eltwise 75MB indep:  {indep_time(f, big):8.3f} ms")

    n_cand = 2 * 256 * 256 * 16
    keys = jnp.asarray(rng.integers(0, 2**28, size=(n_cand,), dtype=np.int32))

    def sort_fn(k):
        s = jax.lax.sort((k,), num_keys=1)[0]
        # feed something back so the next sort's input depends on this one
        return (s ^ (s >> 1)) % (2**28)

    sf = jax.jit(sort_fn)
    print(f"sort 8.4M chain:     {chain_time(sf, keys):8.3f} ms")
    print(f"sort 8.4M indep:     {indep_time(sf, keys):8.3f} ms")

    # matmul calibration: v5e MXU f32 ~ 49 TFLOPs -> 2*4096^3 = 137 GFLOP
    a = jnp.asarray(rng.normal(size=(4096, 4096)).astype(np.float32))
    mm = jax.jit(lambda x: (x @ a) * 1e-3)
    t = chain_time(mm, a)
    print(f"matmul 4096 chain:   {t:8.3f} ms  ({2*4096**3/t/1e9:.1f} TFLOP/s)")

    bf = jnp.asarray(rng.normal(size=(4096, 4096))).astype(jnp.bfloat16)
    mmb = jax.jit(lambda x: (x @ bf).astype(jnp.bfloat16))
    t = chain_time(mmb, bf)
    print(f"matmul bf16 chain:   {t:8.3f} ms  ({2*4096**3/t/1e9:.1f} TFLOP/s)")


if __name__ == "__main__":
    main()
