"""Device mesh + sharding helpers.

The reference scales with Lightning DDP/NCCL (main.py:140-156, up to 8 nodes x
4 GPUs); here the equivalents are an explicit 2-D jax mesh:

- axis "data": data parallelism (DCN axis on multi-host pods) — batch sharded,
  gradients psum-reduced by jit from the sharding annotations.
- axis "model": intra-model parallelism (ICI axis) — gaussians/rays/tiles in
  the renderer, depth hypotheses in the cost volume, views in attention.

All functions are no-ops-compatible with a single device (mesh (1, 1)).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclass(frozen=True)
class MeshCfg:
    data: int = -1  # -1: all devices on the data axis
    model: int = 1


def make_mesh(cfg: MeshCfg = MeshCfg(), devices=None) -> Mesh:
    devices = jax.devices() if devices is None else devices
    n = len(devices)
    data = cfg.data if cfg.data > 0 else n // cfg.model
    assert data * cfg.model == n, f"{data}x{cfg.model} != {n} devices"
    dev = np.asarray(devices).reshape(data, cfg.model)
    return Mesh(dev, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch axis over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place every array in a pytree with its leading axis on the data axis."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)
