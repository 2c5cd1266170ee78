"""Squash-box FDDP: smooth-saturation + penalty homotopy driver.

TPU-native re-design of the reference's headline solver
(/root/reference/src/sbfddp.cpp): box control constraints are enforced by a
smooth squashing of the controls plus a quadratic barrier on the pre-squash
input, annealed over a short homotopy. Differences from the reference are
mechanical, not semantic:

- The barrier cost is a regular cost SLOT of the StackedProblem (appended by
  ``problem.from_trajectory`` when ``use_squash``); the homotopy only updates
  its activation weights + the squash smoothness in the parameter pytree —
  never the structure, so the MPC loop never retraces.
- The homotopy stage count is static (computed from convergence_init/stop on
  the host: 2 stages with the reference defaults, 1 in the MPC loop), so the
  whole solve - homotopy, FDDP iterations, optional DDP polish - is ONE
  compiled XLA program.
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ocp import actuation as act
from ..ocp import problem as P
from . import fddp


@dataclasses.dataclass(frozen=True)
class SbFddpSettings:
    """Reference hyper-parameters (src/sbfddp.cpp:5-38)."""

    smooth_init: float = 0.1
    smooth_mult: float = 0.5
    barrier_weight: float = 1e-3
    convergence_init: float = 1e-2
    convergence_stop: float = 1e-3
    convergence_mult: float = 0.1
    max_iters: int = 100          # per homotopy stage
    reg_init: float = 1e-9
    solver: fddp.SolverSettings = dataclasses.field(default_factory=fddp.SolverSettings)

    @property
    def n_stages(self) -> int:
        """Homotopy stages: while convergence >= convergence_stop."""
        n = 0
        c = self.convergence_init
        while c >= self.convergence_stop * (1 - 1e-12):
            n += 1
            c *= self.convergence_mult
        return max(n, 1)


class SbFddpResult(NamedTuple):
    xs: jnp.ndarray
    us: jnp.ndarray           # pre-squash controls (the solver's decision vars)
    us_squash: jnp.ndarray    # squashed controls — what a plant consumes
    cost: jnp.ndarray
    iters: jnp.ndarray
    feasible: jnp.ndarray
    failed: jnp.ndarray
    smooth: jnp.ndarray       # squash smoothness the candidate is consistent under
    trace: Optional[fddp.IterTrace] = None  # when settings.solver.record_trace:
                                            # homotopy stages + DDP polish concat


def barrier_slot_index(spec: P.ProblemSpec) -> int:
    for i, s in enumerate(spec.slots):
        if s.name == P.BARRIER_SLOT:
            return i
    raise ValueError("Problem has no barrier slot — build it with use_squash=True")


def _set_homotopy(spec, params: P.ProblemParams, smooth) -> P.ProblemParams:
    """Update squash smoothness + barrier activation weights
    (squashingUpdate/barrierUpdate, src/sbfddp.cpp:462-477)."""
    k = barrier_slot_index(spec)
    w = act.barrier_quad_weights(params.glob.s_lb, params.glob.s_ub, smooth)
    act_w = tuple(w if i == k else a for i, a in enumerate(params.glob.act_w))
    glob = params.glob._replace(squash_smooth=jnp.asarray(smooth, dtype=params.x0.dtype),
                                act_w=act_w)
    return params._replace(glob=glob)


@P.highest_matmul
def solve(spec: P.ProblemSpec, params: P.ProblemParams, xs_init=None,
          us_init=None, maxiter: int = 100, feasible: bool = False,
          settings: Optional[SbFddpSettings] = None) -> SbFddpResult:
    """SbFDDP solve (reference SolverSbFDDP::solve, src/sbfddp.cpp:192-226).

    Jit-friendly: wrap in ``jax.jit`` with (spec, maxiter, settings) static
    and vmap over ``params``/initial candidates for scenario batches.
    """
    settings = settings or SbFddpSettings()
    params = P.as_device(params)
    if xs_init is None or us_init is None:
        xs0, us0 = fddp.default_init(spec, params)
        xs_init = xs_init if xs_init is not None else xs0
        us_init = us_init if us_init is not None else us0

    xs, us = xs_init, us_init
    feas = jnp.asarray(feasible)
    total_iters = jnp.zeros((), jnp.int32)
    failed = jnp.zeros((), bool)
    record = settings.solver.record_trace
    traces = []
    maxiter_static = int(maxiter) if record else None

    smooth = settings.smooth_init
    convergence = settings.convergence_init
    maxiter_arr = jnp.asarray(maxiter, jnp.int32)

    for stage in range(settings.n_stages):
        params = _set_homotopy(spec, params, smooth)
        res = fddp.solve_fddp(spec, settings.solver, params, xs, us,
                              maxiter_arr, jnp.asarray(convergence, dtype=xs.dtype),
                              reg_init=settings.reg_init, feasible=False,
                              trace_len=maxiter_static, phase_id=stage)
        xs, us, feas = res.xs, res.us, res.feasible
        total_iters = total_iters + res.iters
        failed = failed | res.failed
        if record:
            traces.append(res.trace)
        smooth *= settings.smooth_mult
        convergence *= settings.convergence_mult
    cost_fddp = res.cost

    final_smooth = settings.smooth_init * settings.smooth_mult ** (settings.n_stages - 1)
    params = _set_homotopy(spec, params, final_smooth)

    # plain-DDP polish if the FDDP stages ended infeasible
    # (src/sbfddp.cpp:217-219); masked, so a feasible batch element keeps
    # its candidate.
    ddp_res = fddp.solve_ddp(spec, settings.solver, params, xs, us,
                             jnp.where(feas, 0, maxiter_arr),
                             jnp.asarray(settings.convergence_stop, dtype=xs.dtype),
                             reg_init=settings.reg_init, feasible=feas,
                             trace_len=maxiter_static, phase_id=-2)
    if record:
        traces.append(ddp_res.trace)
    xs = jnp.where(feas, xs, ddp_res.xs)
    us = jnp.where(feas, us, ddp_res.us)
    # ``final_smooth`` equals the LAST homotopy stage's smoothness, so the
    # feasible branch's cost is exactly that stage's converged cost — no
    # re-evaluation needed (ddp_res.cost covers the polish branch)
    cost = jnp.where(feas, cost_fddp, ddp_res.cost)
    total_iters = total_iters + jnp.where(feas, 0, ddp_res.iters)
    feas_out = feas | ddp_res.feasible

    us_squash = P.squashed_controls(spec, params, us)
    return SbFddpResult(xs=xs, us=us, us_squash=us_squash, cost=cost,
                        iters=total_iters, feasible=feas_out, failed=failed,
                        smooth=jnp.asarray(final_smooth, dtype=xs.dtype),
                        trace=fddp.concat_traces(traces) if record else None)


def _total_cost(spec, params, xs, us):
    costs, _, cT = P.calc_all(spec, params, xs, us)
    return jnp.sum(costs) + cT
