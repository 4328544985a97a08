"""Data-parallel mesh utilities.

The reference's only parallelism is DDP over NCCL (SURVEY.md §2.3).  The
TPU-native equivalent: a 1-D 'data' mesh; the batch is sharded over it and
parameters are replicated.  All three of the reference's hand-written
collectives (DDP gradient all-reduce, the correlation-matrix all-reduce at
loss.py:21, SyncBatchNorm) fall out automatically — any reduction over the
batch axis of a sharded array is compiled by GSPMD into an on-ICI all-reduce.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(cfg) -> None:
    """Multi-host initialization (reference init_distributed_mode,
    utils.py:335-361): with --distributed, join the jax.distributed
    coordinator.  Auto-detected on TPU pods / SLURM; on generic clusters set
    JAX_COORDINATOR_ADDRESS + JAX_NUM_PROCESSES + JAX_PROCESS_ID (the analog
    of the reference's MASTER_ADDR/WORLD_SIZE/RANK envs).  Single-process
    runs are untouched."""
    if not getattr(cfg, "distributed", False):
        return
    import os

    import jax

    kw = {}
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        kw = dict(
            coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]),
        )
    jax.distributed.initialize(**kw)
    print(
        f"[process {jax.process_index()}/{jax.process_count()}] "
        f"{jax.local_device_count()} local / {jax.device_count()} global devices"
    )


def get_mesh(n_devices: int = 0, devices=None) -> Mesh:
    """1-D data mesh over the first n_devices local devices (0 = all)."""
    if devices is None:
        devices = jax.devices()
    if n_devices and n_devices > 0:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(x, mesh: Optional[Mesh], axis: int = 0):
    """Device-put a host batch with `axis` split over the 'data' mesh
    (axis=1 for (n_steps, B, ...) stacks used by --steps_per_dispatch)."""
    if mesh is None:
        return jax.device_put(x)
    if axis == 0:
        return jax.device_put(x, batch_sharding(mesh))
    spec = [None] * np.ndim(x)
    spec[axis] = "data"
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))
