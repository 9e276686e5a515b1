"""Shared device-profiler helpers for the scripts/profile_* tools.

Wall clocks lie over the axon tunnel (async completion makes repeated
dispatches look free — PERF.md "Tunnel measurement gotchas"), so every
microbenchmark measures whole-program DEVICE time from a jax.profiler
trace. The pid==3/tid==3 filter selects the TPU op track in the
vm.trace.json.gz these builds emit.
"""

from __future__ import annotations

import glob
import gzip
import json
from collections import defaultdict

import jax


def device_ops(trace_dir: str):
    """Per-op device durations (ms) and counts from the newest trace."""
    fn = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/vm.trace.json.gz"))[-1]
    with gzip.open(fn) as f:
        tr = json.load(f)
    agg: dict = defaultdict(float)
    cnt: dict = defaultdict(int)
    for e in tr["traceEvents"]:
        if e.get("ph") == "X" and e.get("pid") == 3 and e.get("tid") == 3:
            agg[e["name"]] += e.get("dur", 0) / 1e3
            cnt[e["name"]] += 1
    return agg, cnt


def device_total(trace_dir: str) -> float:
    """Total device op time (ms) from the newest trace in trace_dir."""
    agg, _ = device_ops(trace_dir)
    return sum(agg.values())


def profile_device_ms(tag: str, fn, *args) -> float:
    """jit + warm up fn(*args), trace ONE call, return device ms."""
    f = jax.jit(fn)
    r = f(*args)
    jax.block_until_ready(r)
    d = f"/tmp/prof_{tag}"
    jax.profiler.start_trace(d)
    r = f(*args)
    jax.block_until_ready(r)
    jax.profiler.stop_trace()
    return device_total(d)
