"""Device mesh + sharding helpers: the framework's scale-out dimension.

The reference is strictly single-process/single-thread (SURVEY.md §2b:
no NCCL/MPI/threads anywhere); the TPU framework ADDS the parallel axes:

- **batch** (the DP analog): thousands of scenarios (perturbed x0 /
  different missions' parameters) solved concurrently — `vmap` inside one
  chip, sharded over the mesh's ``batch`` axis across chips/hosts.
- reductions (convergence counts, cost sums, scaling metrics) ride XLA
  collectives over ICI (`psum`/`pmax` inside `shard_map`,
  :func:`sharded_summary`) — only scalars ever reach the host.

All helpers work identically on a real TPU slice, on the CPU test mesh
(``XLA_FLAGS=--xla_force_host_platform_device_count=N``), and on a
multi-process ``jax.distributed`` mesh spanning hosts (see
``parallel/distributed.py``): `Mesh` over ``jax.devices()`` covers every
process's devices, and the same `shard_map` programs compile to ICI
collectives within a slice and DCN collectives across hosts.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PSpec

try:  # JAX >= 0.4.35 exposes shard_map at the top level
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover - older JAX
    from jax.experimental.shard_map import shard_map as _shard_map

BATCH_AXIS = "batch"


def make_mesh(n_devices: Optional[int] = None, devices: Optional[Sequence] = None,
              axis: str = BATCH_AXIS) -> Mesh:
    """1-D mesh over the available devices (batch-parallel SPMD layout).

    In a multi-process (``jax.distributed``) job, ``jax.devices()`` lists
    the GLOBAL device set, so the resulting mesh spans all hosts."""
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


def shard_batch(mesh: Mesh, tree, batch_size: Optional[int] = None,
                axis: str = BATCH_AXIS):
    """Place every leaf whose LEADING axis is the scenario batch sharded
    over the mesh; every other leaf replicated.

    ``batch_size`` is the explicit contract for which leaves are batched:
    exactly those with ``shape[0] == batch_size``. When omitted it is taken
    from the largest leading axis in the tree — and then every leaf whose
    leading axis is merely divisible by the device count but is NOT the
    batch (e.g. a (30, ...) horizon array on a 6-device mesh) is replicated,
    not silently mis-sharded (VERDICT r2 item 8).
    """
    bsh = batch_sharding(mesh, axis)
    rep = replicated(mesh)
    if batch_size is None:
        dims = [x.shape[0] for x in jax.tree_util.tree_leaves(tree)
                if getattr(x, "ndim", 0) >= 1]
        if not dims:
            return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), tree)
        batch_size = max(dims)
    if batch_size % mesh.devices.size != 0:
        raise ValueError(
            f"batch_size {batch_size} is not divisible by the mesh size "
            f"{mesh.devices.size}")

    def place(x):
        if getattr(x, "ndim", 0) >= 1 and x.shape[0] == batch_size:
            return jax.device_put(x, bsh)
        return jax.device_put(x, rep)

    return jax.tree_util.tree_map(place, tree)


# ---------------------------------------------------------------------------
# Collective reductions (psum/pmax over the mesh — never host gathers)
# ---------------------------------------------------------------------------

def make_sharded_summary(mesh: Mesh, axis: str = BATCH_AXIS):
    """Compiled per-batch convergence summary reduced ON DEVICE.

    Each device reduces its local shard, then a single ``psum``/``pmax``
    over the ``batch`` mesh axis combines them (ICI within a slice, DCN
    across hosts). The host receives six replicated scalars — the batched
    result arrays (xs, us, ...) never leave the devices.

    Returns ``summarize(feasible, failed, iters, cost) -> dict``.
    """
    spec_b = PSpec(axis)
    spec_r = PSpec()

    def local(feasible, failed, iters, cost):
        f32 = jnp.float32
        sums = jnp.stack([
            jnp.asarray(feasible.shape[0], f32),        # local count
            jnp.sum(feasible.astype(f32)),
            jnp.sum(failed.astype(f32)),
            jnp.sum(iters.astype(f32)),
            jnp.sum(cost.astype(f32)),
        ])
        sums = jax.lax.psum(sums, axis)
        it_max = jax.lax.pmax(jnp.max(iters), axis)
        return sums, it_max

    fn = jax.jit(_shard_map(local, mesh=mesh,
                            in_specs=(spec_b, spec_b, spec_b, spec_b),
                            out_specs=(spec_r, spec_r)))

    def summarize(feasible, failed, iters, cost) -> dict:
        sums, it_max = fn(feasible, failed, iters, cost)
        sums = np.asarray(sums)
        n = float(sums[0])
        return {
            "n": int(n),
            "feasible_frac": float(sums[1] / n),
            "failed_frac": float(sums[2] / n),
            "iters_mean": float(sums[3] / n),
            "iters_max": int(it_max),
            "cost_mean": float(sums[4] / n),
        }

    return summarize


def sharded_summary(mesh: Mesh, res, axis: str = BATCH_AXIS) -> dict:
    """One-shot :func:`make_sharded_summary` over an SbFddpResult-like
    object (fields feasible / failed / iters / cost, batch-leading)."""
    return make_sharded_summary(mesh, axis)(res.feasible, res.failed,
                                            res.iters, res.cost)
