"""Multi-host initialization.

The reference scales across nodes with PyTorch Lightning DDP + NCCL launched
by torchrun-style env vars (reference main.py:140-156, trainer.num_nodes up
to 8 in scripts/dl3dv_depthsplat_train.sh). The JAX equivalent is
``jax.distributed.initialize()`` once per host process before any device
use; after that ``jax.devices()`` spans the pod slice and a single
``Mesh`` + ``pjit`` program runs SPMD with gradient psums over ICI/DCN.

On TPU pods the coordinator address, process count, and process id are all
discoverable from the metadata/env, so ``initialize()`` needs no arguments;
on CPU/GPU fleets the standard JAX env vars
(JAX_COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID) or explicit kwargs apply.
"""

from __future__ import annotations

import os


def initialize_distributed(require: bool = False) -> bool:
    """Initialize multi-host JAX when the environment indicates one.

    Returns True when running distributed (process_count > 1 after init).
    Single-host runs are a no-op (False). Call before creating any arrays.

    Triggers on: explicit JAX coordinator env vars, TPU pod metadata
    (MEGASCALE_/TPU_WORKER_ env), or ``require=True``.
    """
    import jax

    # Multi-host evidence only: an explicit coordinator address, or a
    # worker-hostnames list with MORE than one entry. (Single-entry
    # TPU_WORKER_HOSTNAMES is set by single-chip TPU plugins too, and must
    # not force distributed init.)
    hostnames = [
        h for h in os.environ.get("TPU_WORKER_HOSTNAMES", "").split(",") if h
    ]
    want = require or any(
        os.environ.get(k)
        for k in (
            "JAX_COORDINATOR_ADDRESS",
            "COORDINATOR_ADDRESS",
            "MEGASCALE_COORDINATOR_ADDRESS",
        )
    ) or len(hostnames) > 1
    if not want:
        return jax.process_count() > 1
    try:
        jax.distributed.initialize()
    except (RuntimeError, ValueError) as e:
        msg = str(e).lower()
        # Tolerate only the already-initialized case (the launcher won the
        # race). "must be called before backends initialized" means some
        # earlier import touched the JAX backend — swallowing it would let
        # a pod silently train as N independent single-host runs with the
        # wrong global batch and a shared output_dir, so it must raise.
        if "already" not in msg:
            raise RuntimeError(
                "jax.distributed.initialize() failed although multi-host "
                "env vars are present. If the error is 'must be called "
                "before backends initialized', something used a JAX device "
                "before initialize_distributed() — move that use later."
            ) from e
    return jax.process_count() > 1
