"""Wall-clock benchmarking with warm-up skipping + device memory stats.

Reference: src/misc/benchmarker.py:11-40 (tagged context-manager timing with
num_calls amortization, JSON dumps, CUDA peak memory). TPU memory comes from
device.memory_stats() instead of the CUDA allocator.
"""

from __future__ import annotations

import json
import time
from collections import defaultdict
from contextlib import contextmanager
from pathlib import Path

import jax
import numpy as np


class Benchmarker:
    def __init__(self) -> None:
        self.execution_times: dict[str, list[float]] = defaultdict(list)

    @contextmanager
    def time(self, tag: str, num_calls: int = 1):
        try:
            start = time.time()
            yield
        finally:
            end = time.time()
            for _ in range(num_calls):
                self.execution_times[tag].append((end - start) / num_calls)

    def dump(self, path: Path) -> None:
        path.parent.mkdir(exist_ok=True, parents=True)
        path.write_text(json.dumps(dict(self.execution_times), indent=2))

    def dump_memory(self, path: Path) -> None:
        path.parent.mkdir(exist_ok=True, parents=True)
        stats = {}
        for i, d in enumerate(jax.local_devices()):
            try:
                stats[f"device_{i}"] = d.memory_stats()
            except Exception:  # CPU devices have no memory stats
                stats[f"device_{i}"] = None
        path.write_text(json.dumps(stats, indent=2, default=str))

    def summarize(self, skip_steps: int = 0) -> dict[str, float]:
        out = {}
        for tag, times in self.execution_times.items():
            kept = times[skip_steps:] if len(times) > skip_steps else times
            out[tag] = float(np.mean(kept)) if kept else float("nan")
        return out

    def clear_history(self) -> None:
        self.execution_times = defaultdict(list)
