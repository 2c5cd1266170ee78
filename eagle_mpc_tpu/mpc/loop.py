"""Closed-loop MPC harness: the reference demo loop as ONE compiled program.

The reference (examples/python/mpc.py:49-61) alternates per 2 ms sim tick:
set x0 from the plant -> updateProblem(t) -> warm-started solve (iters
budget) -> apply us_squash[0] to the RK4 plant. Here the whole loop is a
``lax.scan`` whose body contains the parameter update, the SbFDDP solve and
the plant step — so a full closed-loop experiment (or a vmapped batch of
them) is a single XLA program with zero host round-trips.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..sim.plant import AerialSimulator
from ..solvers import sbfddp
from . import base


class ClosedLoopResult(NamedTuple):
    states: jnp.ndarray      # (n_steps + 1, nx) plant trajectory
    controls: jnp.ndarray    # (n_steps, nu) applied (squashed) controls
    solve_iters: jnp.ndarray  # (n_steps,)
    costs: jnp.ndarray       # (n_steps,)
    xs: jnp.ndarray          # final solver state candidate
    us: jnp.ndarray          # final solver control candidate


def run_closed_loop(controller: base.MpcAbstract, simulator: AerialSimulator,
                    x0, xs_warm, us_warm, n_steps: int, dt_sim_ms: float,
                    maxiter: Optional[int] = None,
                    settings: Optional[sbfddp.SbFddpSettings] = None,
                    fixed: bool = False) -> ClosedLoopResult:
    """Jit/vmap-friendly closed-loop rollout.

    ``xs_warm/us_warm``: initial solver candidate (the offline solution's
    first T+1 states / T controls in the reference demo, mpc.py:39-41).
    One control is applied per sim tick of ``dt_sim_ms`` (the reference's
    dtSimulator = 2 ms against a 30 ms node duration). ``fixed=True``
    selects the fixed-depth tick solver (the TPU fast path)."""
    params0 = controller.params0
    settings = settings or controller.solver_settings()

    def tick(carry, i):
        x, xs, us = carry
        t_ms = i * dt_sim_ms
        params = controller.update_problem(t_ms, params0._replace(x0=x))
        res = controller.solve(params, xs, us, maxiter=maxiter,
                               settings=settings, fixed=fixed)
        u = res.us_squash[0]
        x_next = simulator.step(x, u)
        return (x_next, res.xs, res.us), (x_next, u, res.iters, res.cost)

    x0 = jnp.asarray(x0, dtype=xs_warm.dtype)
    (xf, xs, us), (states, controls, iters, costs) = jax.lax.scan(
        tick, (x0, xs_warm, us_warm), jnp.arange(n_steps))
    states = jnp.concatenate([x0[None], states], axis=0)
    return ClosedLoopResult(states=states, controls=controls,
                            solve_iters=iters, costs=costs, xs=xs, us=us)
