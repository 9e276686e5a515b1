"""Experiment logging.

Replaces the reference's WandbLogger / LocalLogger pair (main.py:89-112,
src/misc/LocalLogger.py): scalars stream to JSONL, images/panels to PNG. A
wandb backend is used transparently when the package is importable (it is not
bundled in this image).
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np

from .image_io import save_image


class LocalLogger:
    def __init__(self, output_dir: Path, run_name: str = "run") -> None:
        self.dir = Path(output_dir)
        self.dir.mkdir(exist_ok=True, parents=True)
        self._scalars = open(self.dir / "metrics.jsonl", "a")
        self._t0 = time.time()
        self._wandb = None
        try:  # optional
            import wandb

            self._wandb = wandb.init(
                project="depthsplat-tpu", name=run_name, dir=str(self.dir)
            )
        except Exception:
            pass

    def log_scalars(self, step: int, scalars: dict) -> None:
        rec = {
            "step": int(step),
            "time": time.time() - self._t0,
            **{k: float(v) for k, v in scalars.items()},
        }
        self._scalars.write(json.dumps(rec) + "\n")
        self._scalars.flush()
        if self._wandb is not None:
            self._wandb.log(scalars, step=step)

    def log_image(self, step: int, tag: str, image: np.ndarray) -> None:
        safe = tag.replace("/", "_")
        save_image(image, self.dir / "images" / f"{safe}_{step:0>8}.png")
        if self._wandb is not None:
            import wandb

            self._wandb.log({tag: wandb.Image(np.asarray(image))}, step=step)

    def close(self) -> None:
        self._scalars.close()
        if self._wandb is not None:
            self._wandb.finish()
