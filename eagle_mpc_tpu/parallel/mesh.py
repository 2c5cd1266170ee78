"""Device mesh + sharding helpers: the framework's scale-out dimension.

The reference is strictly single-process/single-thread (SURVEY.md §2b:
no NCCL/MPI/threads anywhere); the TPU framework ADDS the parallel axes:

- **batch** (the DP analog): thousands of scenarios (perturbed x0 /
  different missions' parameters) solved concurrently — `vmap` inside one
  chip, sharded over the mesh's ``batch`` axis across chips/hosts.
- reductions (convergence counts, cost sums, scaling metrics) ride XLA
  collectives over ICI (`psum` inside `shard_map`), never host gathers.

All helpers work identically on a real TPU slice and on the CPU test mesh
(``XLA_FLAGS=--xla_force_host_platform_device_count=N``).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PSpec

BATCH_AXIS = "batch"


def make_mesh(n_devices: Optional[int] = None, devices: Optional[Sequence] = None,
              axis: str = BATCH_AXIS) -> Mesh:
    """1-D mesh over the available devices (batch-parallel SPMD layout)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = BATCH_AXIS) -> NamedSharding:
    """Sharding for arrays whose LEADING axis is the scenario batch."""
    return NamedSharding(mesh, PSpec(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PSpec())


def shard_batch(mesh: Mesh, tree, axis: str = BATCH_AXIS):
    """Place every leaf of a batched pytree with its leading axis sharded
    over the mesh. Scalar leaves (no batch axis) are replicated."""
    bsh = batch_sharding(mesh, axis)
    rep = replicated(mesh)

    def place(x):
        if getattr(x, "ndim", 0) >= 1 and x.shape[0] % mesh.devices.size == 0:
            return jax.device_put(x, bsh)
        return jax.device_put(x, rep)

    return jax.tree_util.tree_map(place, tree)
