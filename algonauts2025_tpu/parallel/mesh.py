"""Device mesh and sharding utilities (the "comm backend" of the build).

The reference's distributed layer is Lightning DDP over NCCL (reference
algonauts2025/main.py:388-394 + srun launch).  The TPU-native equivalent
is: one JAX program per host, ``jax.distributed.initialize`` for
multi-host, a named Mesh whose ``data`` axis spans the slice (ICI), and
jit/SPMD inserting the gradient all-reduce — there is no explicit
communication code anywhere else in the framework.

A ``model`` axis is provisioned for sharding the per-subject readout
(subjects x 3072 x 1000 is the largest weight) when scaling beyond pure DP.
"""

from __future__ import annotations

import logging
import os
import typing as tp

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)

__all__ = [
    "init_distributed",
    "get_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
]


def init_distributed() -> None:
    """Initialize multi-host JAX when launched across hosts.

    No-op in single-process runs.  Uses the standard env contract
    (coordinator address + process count) that TPU pod launchers provide.
    """
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        return  # single-process run
    kwargs: dict = {}
    # TPU pods auto-detect process count/id; generic launchers (and the
    # two-process CPU test) provide them explicitly via env
    if os.environ.get("JAX_NUM_PROCESSES"):
        if "JAX_PROCESS_ID" not in os.environ:
            # defaulting to 0 would give every worker the same rank and
            # hang the coordinator with an opaque barrier timeout
            raise RuntimeError(
                "JAX_NUM_PROCESSES is set but JAX_PROCESS_ID is not; "
                "export a distinct JAX_PROCESS_ID per process"
            )
        kwargs = dict(
            coordinator_address=addr,
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]),
        )
    # NOTE: nothing may touch the XLA backend before initialize() — even
    # jax.process_count() would initialize it and make this call fail
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        if "already" in str(e):
            logger.info("jax.distributed already initialized")
            return
        raise
    logger.info(
        "jax.distributed initialized: process %d/%d",
        jax.process_index(),
        jax.process_count(),
    )


def get_mesh(
    n_devices: int | None = None,
    model_parallel: int = 1,
    devices: tp.Sequence[jax.Device] | None = None,
) -> Mesh:
    """A ("data", "model") mesh over the available devices.

    ``model_parallel=1`` (default) gives pure data parallelism; the model
    axis exists so readout sharding can be enabled without re-plumbing.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch) across the data axis, replicate the rest."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(
    batch_data: tp.Mapping[str, tp.Any], mesh: Mesh | None
) -> dict[str, jax.Array]:
    """Place a host batch onto the mesh, batch axis over "data".

    Batches whose leading dim does not divide the data axis are placed
    replicated (eval-tail batches) — correctness over peak efficiency.
    """
    if mesh is None:
        return {
            k: v if isinstance(v, jax.Array) else jax.device_put(v)
            for k, v in batch_data.items()
        }
    n_data = mesh.shape["data"]
    target = batch_sharding(mesh)
    out = {}
    for k, v in batch_data.items():
        if isinstance(v, jax.Array) and getattr(v, "sharding", None) == target:
            out[k] = v  # already prefetched with the right sharding
        elif v.shape[0] % n_data == 0:
            out[k] = jax.device_put(v, target)
        else:
            out[k] = jax.device_put(v, replicated(mesh))
    return out
