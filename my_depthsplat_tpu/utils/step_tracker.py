"""Cross-process global-step publication for curriculum schedules.

Reference: src/misc/step_tracker.py:9-23 used a torch shared-memory tensor +
Manager RLock so dataloader workers could read the trainer's step. This
framework's loader is in-process generators by default (the step is passed as
an argument), but the same capability is kept for multiprocess loaders via a
multiprocessing shared value.
"""

from __future__ import annotations

import multiprocessing as mp


class StepTracker:
    def __init__(self) -> None:
        self._value = mp.Value("q", 0)  # int64 + built-in lock

    def set_step(self, step: int) -> None:
        with self._value.get_lock():
            self._value.value = int(step)

    def get_step(self) -> int:
        with self._value.get_lock():
            return int(self._value.value)
