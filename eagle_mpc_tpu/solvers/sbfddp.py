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
import numpy as np

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

    dtype = xs_init.dtype
    record = settings.solver.record_trace
    maxiter_static = int(maxiter) if record else None
    maxiter_arr = jnp.asarray(maxiter, jnp.int32)
    n_stages = settings.n_stages
    final_smooth = settings.smooth_init * settings.smooth_mult ** (n_stages - 1)

    # Homotopy schedule + DDP polish as ONE lax.scan: the FDDP/DDP
    # differences inside solve_fddp_or_ddp are data (traced ``ddp`` flag),
    # so the whole SbFDDP solve contains exactly ONE solver body — XLA
    # compile time is dominated by solver-body instantiations (was
    # n_stages + 1 of them). Schedule rows: n_stages FDDP stages with
    # annealed (smooth, th_stop), then the plain-DDP polish at the final
    # smoothness (reference loop at src/sbfddp.cpp:205-219).
    smooth_k = np.array([settings.smooth_init * settings.smooth_mult ** k
                         for k in range(n_stages)] + [final_smooth])
    th_stop_k = np.array([settings.convergence_init * settings.convergence_mult ** k
                          for k in range(n_stages)] + [settings.convergence_stop])
    ddp_k = np.array([False] * n_stages + [True])
    phase_k = np.array(list(range(n_stages)) + [-2], dtype=np.int8)

    def stage(carry, inp):
        xs, us, feas, iters, failed = carry
        smooth, th_stop, ddp, phase = inp
        params_k = _set_homotopy(spec, params, smooth.astype(dtype))
        # the polish runs only for still-infeasible candidates
        # (src/sbfddp.cpp:217-219); masked per element, so a feasible batch
        # element keeps its candidate (maxiter 0 leaves the state untouched)
        maxiter_k = jnp.where(ddp & feas, 0, maxiter_arr)
        feas_in = jnp.where(ddp, feas, False)
        res = fddp.solve_fddp_or_ddp(
            spec, settings.solver, params_k, xs, us, maxiter_k,
            th_stop.astype(dtype), settings.reg_init, feas_in, ddp=ddp,
            trace_len=maxiter_static, phase_id=phase)
        feas_new = jnp.where(ddp, feas | res.feasible, res.feasible)
        carry = (res.xs, res.us, feas_new, iters + res.iters,
                 failed | res.failed)
        return carry, (res.cost, res.trace)

    init = (xs_init, us_init, jnp.asarray(feasible),
            jnp.zeros((), jnp.int32), jnp.zeros((), bool))
    (xs, us, feas_out, total_iters, failed), (costs, traces) = jax.lax.scan(
        stage, init,
        (jnp.asarray(smooth_k, dtype), jnp.asarray(th_stop_k, dtype),
         jnp.asarray(ddp_k), jnp.asarray(phase_k)))
    cost = costs[-1]

    params = _set_homotopy(spec, params, final_smooth)
    us_squash = P.squashed_controls(spec, params, us)
    trace = None
    if record:
        # (n_stages + 1, maxiter) rows -> flat concat order
        trace = fddp.IterTrace(*(t.reshape((-1,) + t.shape[2:])
                                 for t in traces))
    return SbFddpResult(xs=xs, us=us, us_squash=us_squash, cost=cost,
                        iters=total_iters, feasible=feas_out, failed=failed,
                        smooth=jnp.asarray(final_smooth, dtype=dtype),
                        trace=trace)


def _total_cost(spec, params, xs, us):
    costs, _, cT = P.calc_all(spec, params, xs, us)
    return jnp.sum(costs) + cT
