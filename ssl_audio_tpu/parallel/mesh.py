"""Data- and tensor-parallel mesh utilities.

The reference's only parallelism is DDP over NCCL (SURVEY.md §2.3).  The
TPU-native equivalent: a 1-D 'data' mesh; the batch is sharded over it and
parameters are replicated.  All three of the reference's hand-written
collectives (DDP gradient all-reduce, the correlation-matrix all-reduce at
loss.py:21, SyncBatchNorm) fall out automatically — any reduction over the
batch axis of a sharded array is compiled by GSPMD into an on-ICI all-reduce.

Beyond reference parity, `--model_parallel N` selects a 2-D (data, model)
mesh with Megatron-style tensor parallelism over the transformer blocks:
the qkv/fc1 Dense kernels are column-sharded and the proj/fc2 kernels
row-sharded over the 'model' axis (TP_RULES), so each block needs exactly
one all-reduce per fused pair — the collective GSPMD derives from the
annotations.  Optimizer moments mirror the param shardings (each device
stores only its kernel shards: TP also shards optimizer memory).  The model
code is untouched — sharding lives entirely in the placement of the state
pytree (state_shardings), the GSPMD recipe rather than hand-written
collectives.
"""
from __future__ import annotations

import re
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


def get_mesh(n_devices: int = 0, model_parallel: int = 1, devices=None) -> Mesh:
    """1-D 'data' mesh over the first n_devices local devices (0 = all), or
    a 2-D (data, model) mesh when model_parallel > 1.  The model axis is the
    fastest-varying (innermost) device dimension so tensor-parallel
    collectives ride adjacent-chip ICI links on real TPU topologies."""
    if devices is None:
        devices = jax.devices()
    if n_devices and n_devices > 0:
        devices = devices[:n_devices]
    mp = max(int(model_parallel), 1)
    if mp == 1:
        return Mesh(np.asarray(devices), axis_names=("data",))
    n = len(devices)
    if n % mp:
        raise ValueError(
            f"--model_parallel {mp} must divide the device count {n}")
    return Mesh(np.asarray(devices).reshape(n // mp, mp),
                axis_names=("data", "model"))


# Megatron-style tensor-parallel placement for the transformer blocks
# (applies to MAE-ViT encoder AND decoder blocks — both use the same
# attn/mlp param naming).  Column-parallel qkv/fc1 (shard the output
# features), row-parallel proj/fc2 (shard the input features): activations
# between the two halves of each pair stay sharded over 'model' with no
# communication; GSPMD inserts one all-reduce after proj and one after fc2.
# Biases of column-parallel layers shard with their features; everything
# else (norms, embeddings, conv stems, heads, BN stats) is replicated.
TP_RULES = (
    (re.compile(r".*attn/qkv_kernel$"), P(None, "model")),
    (re.compile(r".*attn/proj/kernel$"), P("model", None)),
    (re.compile(r".*mlp/fc1/kernel$"), P(None, "model")),
    (re.compile(r".*mlp/fc1/bias$"), P("model")),
    (re.compile(r".*mlp/fc2/kernel$"), P("model", None)),
)


def _tp_spec(path: str, shape, n_model: int) -> P:
    """PartitionSpec for one state leaf; replicated unless a TP rule matches
    AND the sharded dimension is divisible by the model-axis size."""
    for pat, spec in TP_RULES:
        if pat.match(path):
            for i, ax in enumerate(spec):
                if ax == "model" and (i >= len(shape) or shape[i] % n_model):
                    return P()
            return spec
    return P()


# Leaves smaller than this stay replicated under FSDP: all-gathering a tiny
# bias costs more latency than its shard saves in HBM (ZeRO keeps the same
# threshold concept; 16k fp32 = 64 KiB)
FSDP_MIN_SIZE = 16384


def _fsdp_spec(shape, n_data: int, size: int) -> P:
    """ZeRO-3-style spec: shard the largest divisible dimension over 'data'.

    GSPMD then emits exactly the ZeRO-3 schedule from the placement alone:
    params all-gather just before use, gradients reduce-scatter, and the
    AdamW moments (sharded the same way — they mirror the param tree) update
    shard-locally.  Per-device optimizer+param memory drops ~n_data x."""
    if size < FSDP_MIN_SIZE:
        return P()
    best, best_dim = -1, -1
    for i, d in enumerate(shape):
        if d % n_data == 0 and d > best:
            best, best_dim = d, i
    if best_dim < 0:
        return P()
    spec = [None] * len(shape)
    spec[best_dim] = "data"
    return P(*spec)


def _path_str(path) -> str:
    """'params/encoder/block0/mlp/fc1/kernel'-style key path (dict keys and
    dataclass/namedtuple attrs normalized to '/')."""
    return re.sub(r"\W+", "/", jax.tree_util.keystr(path)).strip("/")


# state sub-trees whose leaves are per-example, not per-parameter: the
# mixup ring buffer and any carried batch-shaped state must NOT be
# FSDP-sharded by the size heuristic (their leading axis is a bank/batch
# axis, and they are not all-gathered params)
_FSDP_SKIP = re.compile(r"(^|/)aug/")


def state_shardings(state, mesh: Mesh, fsdp: bool = False):
    """NamedSharding tree mirroring `state`.

    - 'model' mesh axis present -> Megatron tensor-parallel specs for the
      transformer Dense kernels (TP_RULES).
    - fsdp=True -> remaining large leaves shard over 'data' (ZeRO-3; see
      _fsdp_spec).  Composes with TP: a 2-D mesh + fsdp gives
      TP kernels + data-sharded everything-else.
    - otherwise replicated.

    Matching is by key-path suffix, so the optimizer moments (mu/nu mirror
    the param tree inside opt_state) and the BYOL target params shard
    exactly like the params they track."""
    has_model = "model" in mesh.axis_names
    if not has_model and not fsdp:
        rep = NamedSharding(mesh, P())
        return jax.tree.map(lambda _: rep, state)
    n_model = mesh.shape.get("model", 1)
    n_data = mesh.shape["data"]

    def leaf_sharding(path, leaf):
        if not hasattr(leaf, "shape"):
            return NamedSharding(mesh, P())
        pstr = _path_str(path)
        spec = _tp_spec(pstr, leaf.shape, n_model) if has_model else P()
        if fsdp and spec == P() and not _FSDP_SKIP.search(pstr):
            spec = _fsdp_spec(leaf.shape, n_data, int(np.prod(leaf.shape)))
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(leaf_sharding, state)


def place_state(state, mesh: Mesh, fsdp: bool = False):
    """device_put the train state with its TP/FSDP/replicated shardings."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, s) if hasattr(x, "shape") else x,
        state, state_shardings(state, mesh, fsdp=fsdp))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(x, mesh: Optional[Mesh], axis: int = 0):
    """Device-put a host batch with `axis` split over the 'data' mesh
    (axis=1 for (n_steps, B, ...) stacks used by --steps_per_dispatch).

    Multi-process (jax.distributed): `x` is this process's LOCAL slice of
    the global batch (the DataLoader's per-batch contiguous shard) and the
    global array is assembled across processes — concatenation in process
    order, matching the single-process row order (pipeline._global_batch)."""
    if mesh is None:
        return jax.device_put(x)
    if axis == 0:
        spec = P("data")
    else:
        s = [None] * np.ndim(x)
        s[axis] = "data"
        spec = P(*s)
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))
    return jax.device_put(x, sharding)
