"""Device mesh + sharding utilities (single- and multi-host).

Capability match: the reference's parallelism surface (SURVEY.md §2.2) —
DDP data parallelism and FSDP parameter sharding — expressed the TPU-native way:
one `jax.sharding.Mesh` with a ``data`` axis (DDP) and an optional ``fsdp`` axis
(ZeRO-3-style parameter sharding), `jit` + `NamedSharding` instead of NCCL;
gradient all-reduce is inserted by XLA.

Multi-host (the reference's detectron2.engine.launch + NCCL rendezvous,
tools/train_net.py:656-666): `initialize_distributed` wraps
``jax.distributed.initialize`` (ICI intra-slice, DCN across slices); the mesh
then spans ``jax.devices()`` across all processes, each host feeding only its
local shard of the global batch (``local_batch_slice``), and writers/checkpoint
run on process 0 only (``is_main_process``).
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger("ape_tpu")


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """jax.distributed.initialize with env fallbacks; no-op when single-process.

    On TPU pods the three args auto-detect from the runtime; on CPU/GPU smoke
    tests they come from JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID (the reference's --dist-url/--machine-rank equivalents).
    Returns True when a multi-process runtime was initialized.
    """
    num = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if num <= 1 and coordinator_address is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address
        or os.environ.get("JAX_COORDINATOR_ADDRESS"),
        num_processes=num_processes,
        process_id=process_id,
    )
    logger.info(
        f"distributed: process {jax.process_index()}/{jax.process_count()}, "
        f"{jax.local_device_count()} local / {jax.device_count()} global devices"
    )
    return True


def is_main_process() -> bool:
    return jax.process_index() == 0


def local_batch_slice(global_batch: int) -> slice:
    """This host's contiguous slice of a global batch (per-host data loading:
    the reference shards sampler streams by rank, build_multi_dataset.py:367)."""
    per = global_batch // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)


def make_mesh(
    n_devices: Optional[int] = None, fsdp: int = 1, devices: Optional[Sequence] = None
) -> Mesh:
    """Mesh of shape (data, fsdp) over ALL processes' devices. fsdp=1 -> pure
    data parallelism. On multi-host, `jax.devices()` already spans hosts; the
    data axis is laid out host-major so each host's batch shard lands on its
    local devices (collectives ride ICI within a slice)."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    n = len(devices)
    assert n % fsdp == 0, (n, fsdp)
    arr = np.asarray(devices).reshape(n // fsdp, fsdp)
    return Mesh(arr, ("data", "fsdp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard leading (batch) dim over data axis, replicate the rest."""
    return NamedSharding(mesh, P("data"))


def param_sharding(mesh: Mesh, params, min_size: int = 2**16):
    """FSDP-style: shard the largest axis of big parameter leaves over ``fsdp``;
    small leaves replicate. Matches create_fsdp_model's ModuleWrapPolicy intent
    (reference engine/defaults.py:37-119) without per-module wrappers."""
    fsdp_size = mesh.shape["fsdp"]

    def spec_for(x):
        if fsdp_size == 1 or x.ndim == 0 or x.size < min_size:
            return NamedSharding(mesh, P())
        # choose the largest axis divisible by fsdp
        axes = sorted(range(x.ndim), key=lambda a: -x.shape[a])
        for a in axes:
            if x.shape[a] % fsdp_size == 0:
                spec = [None] * x.ndim
                spec[a] = "fsdp"
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec_for, params)


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch with the leading dim sharded over data axis.

    Multi-host: each process passes its LOCAL slice of the global batch
    (see ``local_batch_slice``) and the global array is assembled without
    host-to-host data movement."""
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        def put(x):
            return jax.make_array_from_process_local_data(sh, np.asarray(x))
    else:
        def put(x):
            return jax.device_put(x, sh)

    return jax.tree.map(put, batch)
