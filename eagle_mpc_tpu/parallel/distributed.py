"""Multi-host (multi-process) execution: jax.distributed plumbing.

The reference has no distributed story at all (SURVEY.md §2b); this module
adds the TPU-native one. A "host" is a JAX process owning a subset of the
global devices:

- on a real pod slice, one process per host, devices = its local chips,
  collectives ride ICI within the slice and DCN across slices;
- in CI, N local processes each with ``--xla_force_host_platform_device_count``
  CPU devices emulate the topology end-to-end (same code path, same
  GSPMD partitioning, real cross-process collectives over gRPC).

Everything above this module is topology-agnostic: ``make_mesh()`` builds
the GLOBAL mesh from ``jax.devices()``, data is placed shard-by-shard with
:func:`host_local_batch` + ``jax.make_array_from_single_device_arrays``,
and ``mesh.sharded_summary`` reduces with ``psum`` so no host ever gathers
the batch.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

from . import mesh as mesh_mod


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_count: Optional[int] = None) -> None:
    """Join (or bootstrap) a multi-process JAX job.

    On TPU pods the three arguments are auto-detected from the environment
    and may be omitted. For the CPU emulation path, pass them explicitly
    (or via EAGLE_MPC_COORDINATOR / EAGLE_MPC_NUM_PROCS / EAGLE_MPC_PROC_ID)
    and set ``local_device_count`` BEFORE jax initializes its backends.
    """
    if local_device_count is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count="
                        f"{local_device_count}").strip()
    coordinator_address = coordinator_address or os.environ.get(
        "EAGLE_MPC_COORDINATOR")
    if num_processes is None and "EAGLE_MPC_NUM_PROCS" in os.environ:
        num_processes = int(os.environ["EAGLE_MPC_NUM_PROCS"])
    if process_id is None and "EAGLE_MPC_PROC_ID" in os.environ:
        process_id = int(os.environ["EAGLE_MPC_PROC_ID"])
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def host_local_batch(global_batch: int, seed_fn, mesh=None):
    """Build a GLOBALLY-sharded batched array from per-host local shards.

    ``seed_fn(global_index_range) -> np.ndarray`` produces the local rows
    from their global indices, so every host materializes ONLY its shard
    (the multi-host data-loading pattern: no host holds the global batch).

    Returns a jax.Array sharded over the mesh's batch axis.
    """
    if mesh is None:
        mesh = mesh_mod.make_mesh()
    n_dev = mesh.devices.size
    if global_batch % n_dev:
        raise ValueError(f"global batch {global_batch} % {n_dev} devices != 0")
    per_dev = global_batch // n_dev
    sharding = mesh_mod.batch_sharding(mesh)

    local_arrays = []
    for d in jax.local_devices():
        # global position of this device's shard
        idx = int(np.flatnonzero(mesh.devices.ravel() == d)[0])
        rows = seed_fn(np.arange(idx * per_dev, (idx + 1) * per_dev))
        local_arrays.append(jax.device_put(np.asarray(rows), d))
    shape = (global_batch,) + local_arrays[0].shape[1:]
    return jax.make_array_from_single_device_arrays(shape, sharding,
                                                    local_arrays)


def process_summary() -> dict:
    """Topology facts for logging."""
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
