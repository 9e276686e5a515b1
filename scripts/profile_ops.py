"""Standalone timings of the exact heavy ops in binning (development tool)."""

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
    print("devices:", jax.devices())
    bg_count = 2 * 256 * 256
    L = 1179648
    n_cand = bg_count * 16
    rng = np.random.default_rng(0)

    # bandwidth calibration: copy 75MB
    big = jnp.asarray(rng.normal(size=(L, 16)).astype(np.float32))
    copy = jax.jit(lambda x: x + 1.0)
    t = timeit(copy, big)
    print(f"eltwise 75MB in/out:      {t:8.3f} ms  ({2*big.nbytes/t*1e3/2**30:.0f} GiB/s)")

    # the big single-key sort
    keys = jnp.asarray(rng.integers(0, 2**30, size=(n_cand,), dtype=np.int32))
    srt = jax.jit(lambda k: jax.lax.sort((k,), num_keys=1)[0])
    print(f"sort 8.4M int32:          {timeit(srt, keys):8.3f} ms")

    # two-operand stable sort for comparison
    pay = jnp.asarray(np.arange(n_cand, dtype=np.int32))
    srt2 = jax.jit(
        lambda k, p: jax.lax.sort((k, p), num_keys=1, is_stable=True)[1]
    )
    print(f"sort 8.4M int32+payload:  {timeit(srt2, keys, pay):8.3f} ms")

    # depth sort (f32 key + int payload, 524k)
    dk = jnp.asarray(rng.normal(size=(bg_count,)).astype(np.float32))
    dp = jnp.asarray(np.arange(bg_count, dtype=np.int32))
    srtd = jax.jit(
        lambda k, p: jax.lax.sort((k, p), num_keys=1, is_stable=True)[1]
    )
    print(f"sort 524k f32+payload:    {timeit(srtd, dk, dp):8.3f} ms")

    # the exact pack computation standalone
    idx = jnp.asarray(rng.integers(0, n_cand, size=(L,), dtype=np.int32))
    sorted_slot = jnp.asarray(
        rng.integers(0, bg_count, size=(n_cand,), dtype=np.int32)
    )
    order = jnp.asarray(
        rng.permutation(bg_count).astype(np.int32)
    )
    sgdata = jnp.asarray(rng.normal(size=(9, bg_count)).astype(np.float32))
    lane_live = jnp.asarray(rng.integers(0, 2, size=(L,)).astype(bool))

    def pack(src, sorted_slot, order, rows, lane_live):
        slot_of_lane = jnp.where(lane_live, sorted_slot[src], bg_count)
        slot_safe = jnp.minimum(slot_of_lane, bg_count - 1)
        lane_ok = slot_of_lane < bg_count
        gaussian_id = jnp.where(lane_ok, order[slot_safe], bg_count)
        gid_safe = jnp.minimum(gaussian_id, bg_count - 1)
        packed = jnp.where(lane_ok[None, :], rows[:, gid_safe], 0.0)
        packed = jnp.pad(packed, ((0, 16 - packed.shape[0]), (0, 0)))
        return packed, gaussian_id

    packj = jax.jit(pack)
    print(f"pack (lane gathers+where):{timeit(packj, idx, sorted_slot, order, sgdata, lane_live):8.3f} ms")

    # candidate expansion: (BG,2) -> (BG,16) tile ids + where
    rect_min = jnp.asarray(
        rng.integers(0, 15, size=(bg_count, 2), dtype=np.int32)
    )
    rw = jnp.asarray(rng.integers(1, 4, size=(bg_count,), dtype=np.int32))
    area = jnp.asarray(rng.integers(1, 9, size=(bg_count,), dtype=np.int32))
    valid = jnp.asarray(rng.integers(0, 2, size=(bg_count,)).astype(bool))

    def cand(rect_min, rw, area, valid):
        j = jnp.arange(16, dtype=jnp.int32)
        rw_safe = jnp.maximum(rw, 1)[:, None]
        tx = rect_min[:, 0:1] + j[None, :] % rw_safe
        ty = rect_min[:, 1:2] + j[None, :] // rw_safe
        iv = (j[None, :] < jnp.minimum(area, 16)[:, None]) & valid[:, None]
        return jnp.where(iv, ty * 16 + tx, 2048).astype(jnp.int32)

    print(f"candidate expansion:      {timeit(jax.jit(cand), rect_min, rw, area, valid):8.3f} ms")

    # searchsorted 2x1024 over 8.4M
    sk = jnp.sort(keys)
    q = jnp.asarray(np.arange(2048, dtype=np.int32) * 1000)
    ss = jax.jit(lambda s, q: jnp.searchsorted(s, q))
    print(f"searchsorted 2048/8.4M:   {timeit(ss, sk, q):8.3f} ms")


if __name__ == "__main__":
    main()
