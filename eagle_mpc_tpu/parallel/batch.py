"""Batched scenario solving: the TPU throughput harness.

Implements the reference benchmark's perturbed-initial-state pattern
(/root/reference/benchmark/problem-rates.cpp:13-25 ``applyRandomNoise``) at
TPU scale: a batch of ProblemParams differing in x0 (or any other leaf),
solved by ONE vmapped compiled program, optionally sharded over a device
mesh. Per-element convergence masks isolate diverged scenarios (they cannot
poison the batch — each element carries its own while_loop state).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ocp import problem as P
from ..solvers import sbfddp
from . import mesh as mesh_mod


def perturbed_x0_batch(params: P.ProblemParams, n: int, scale: float = 0.05,
                       seed: int = 0) -> P.ProblemParams:
    """Batch of problems differing in x0: additive noise on position /
    joints / velocities, quaternion block left untouched (kept valid)."""
    rng = np.random.default_rng(seed)
    x0 = np.asarray(params.x0)
    noise = rng.normal(size=(n, x0.shape[0])) * scale
    noise[:, 3:7] = 0.0
    x0s = jnp.asarray(x0[None] + noise, dtype=params.x0.dtype)
    return jax.vmap(lambda x: params._replace(x0=x))(x0s)


def make_batch_solver(spec: P.ProblemSpec, maxiter: int = 100,
                      settings: Optional[sbfddp.SbFddpSettings] = None,
                      mesh=None, donate: bool = False):
    """Compiled batched SbFDDP solver.

    Returns ``solve(batch_params) -> SbFddpResult`` with every result leaf
    batched. With ``mesh``, inputs/outputs are sharded over the batch axis
    and XLA partitions the whole solve across devices (SPMD) — each device
    runs its shard's while_loops independently; no cross-device
    synchronization is in the solve path at all.
    """
    settings = settings or sbfddp.SbFddpSettings()

    def solve_one(p):
        return sbfddp.solve(spec, p, maxiter=maxiter, settings=settings)

    fn = jax.vmap(solve_one)
    if mesh is None:
        return jax.jit(fn, donate_argnums=(0,) if donate else ())

    bsh = mesh_mod.batch_sharding(mesh)
    return jax.jit(fn, in_shardings=(bsh,), out_shardings=bsh,
                   donate_argnums=(0,) if donate else ())


def convergence_summary(res: sbfddp.SbFddpResult) -> dict:
    """Host-side per-batch stats (feasible fraction, iteration stats)."""
    feas = np.asarray(res.feasible)
    iters = np.asarray(res.iters)
    return {
        "n": int(feas.shape[0]),
        "feasible_frac": float(feas.mean()),
        "failed_frac": float(np.asarray(res.failed).mean()),
        "iters_mean": float(iters.mean()),
        "iters_max": int(iters.max()),
        "cost_mean": float(np.asarray(res.cost).mean()),
    }
