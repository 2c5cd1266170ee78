"""MPC controller base: shared problem scaffolding + reference sampling.

TPU-native re-design of the reference's ``MpcAbstract``
(/root/reference/src/mpc-base.cpp, include/eagle_mpc/mpc-base.hpp): a
controller owns

- a static ``ProblemSpec`` with ``knots - 1`` running nodes + terminal — ONE
  jit compile per controller;
- a base ``ProblemParams`` pytree;
- a pure ``update_problem(t_ms, params) -> params`` that re-aims per-node
  references / activities / weights (the reference's updateProblem is pure
  parameter mutation, SURVEY.md §3.4 — here that fact becomes literal).

The closed-loop step (update + warm-started solve) is a single compiled XLA
program; scenario batches vmap over it.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import specs as cspecs
from ..ocp import actuation as act
from ..ocp import costs as C
from ..ocp import problem as P
from ..solvers import fddp, sbfddp

#: SolverTypes_map equivalent (include/eagle_mpc/mpc-base.hpp:44-48)
SOLVER_TYPES = (cspecs.SOLVER_SBFDDP, cspecs.SOLVER_BOX_FDDP, cspecs.SOLVER_BOX_DDP)

#: MpcTypes_map equivalent (include/eagle_mpc/mpc-base.hpp:56-59)
MPC_TYPES = (cspecs.MPC_CARROT, cspecs.MPC_RAIL, cspecs.MPC_WEIGHTED)


def _try_param(server, getter, key, default):
    try:
        return getter(key)
    except cspecs.MissingValueException:
        return default


@dataclasses.dataclass
class MpcAbstract:
    """Shared construction + solve plumbing for Carrot / Rail / Weighted.

    Subclasses must fill ``spec`` / ``params0`` (the structurally fixed
    problem) and implement ``update_problem``."""

    mpc_params: cspecs.MpcParamsSpec
    spec: P.ProblemSpec = dataclasses.field(init=False)
    params0: P.ProblemParams = dataclasses.field(init=False)

    # ------------------------------------------------------------------
    @property
    def dt(self) -> int:
        """Node duration in ms (mpc_controller/dt)."""
        return self.mpc_params.dt

    @property
    def knots(self) -> int:
        return self.mpc_params.knots

    @property
    def iters(self) -> int:
        """Per-tick solver iteration budget (mpc_controller/iters)."""
        return self.mpc_params.iters

    @property
    def solver_type(self) -> str:
        return self.mpc_params.solver

    @property
    def use_squash(self) -> bool:
        return self.mpc_params.solver == cspecs.SOLVER_SBFDDP

    @property
    def state(self):
        return self.spec.state

    # ------------------------------------------------------------------
    def update_problem(self, t_ms, params: P.ProblemParams) -> P.ProblemParams:
        raise NotImplementedError

    # ------------------------------------------------------------------
    def solver_settings(self, convergence_init: float = 1e-3) -> sbfddp.SbFddpSettings:
        """MPC-loop solver settings: single homotopy stage (the reference
        sets ``convergence_init = 1e-3`` after the warm-start solve,
        examples/python/mpc.py:41)."""
        return sbfddp.SbFddpSettings(convergence_init=convergence_init)

    def solve(self, params: P.ProblemParams, xs, us, maxiter: Optional[int] = None,
              settings: Optional[sbfddp.SbFddpSettings] = None,
              schedule: Optional[sbfddp.HomotopySchedule] = None,
              fixed: bool = False, n_alphas: Optional[int] = None):
        """One warm-started MPC solve. Jit/vmap-safe (wrap externally).

        ``schedule`` (traced homotopy rows) lets one compiled program serve
        both the warm-start solve and the per-tick re-solve (while-loop
        solver only). ``fixed=True`` routes to the fixed-depth tick path
        (:func:`sbfddp.solve_fixed` — no data-dependent while_loops; the
        fast path for vmapped scenario batches; ``n_alphas`` truncates its
        line-search ladder)."""
        maxiter = self.iters if maxiter is None else maxiter
        if self.solver_type == cspecs.SOLVER_SBFDDP:
            if fixed:
                if schedule is not None:
                    raise ValueError("fixed=True uses a static stage layout; "
                                     "schedule rows are a while-solver feature")
                return sbfddp.solve_fixed(
                    self.spec, params, xs, us, depth=int(maxiter),
                    settings=settings or self.solver_settings(),
                    n_alphas=n_alphas)
            return sbfddp.solve(self.spec, params, xs, us, maxiter=maxiter,
                                settings=settings or self.solver_settings(),
                                schedule=schedule)
        # Box solvers consume raw controls (no squash slot in the spec).
        box = fddp.solve_box_fddp if self.solver_type == cspecs.SOLVER_BOX_FDDP \
            else fddp.solve_box_ddp
        res = box(self.spec, fddp.SolverSettings(), params, xs, us,
                  jnp.asarray(maxiter, jnp.int32),
                  jnp.asarray(1e-9, dtype=xs.dtype))
        return sbfddp.SbFddpResult(
            xs=res.xs, us=res.us, us_squash=res.us, cost=res.cost,
            iters=res.iters, feasible=res.feasible, failed=res.failed,
            smooth=jnp.zeros((), dtype=xs.dtype))

    # ------------------------------------------------------------------
    # Construction helpers
    # ------------------------------------------------------------------
    def _finalize_problem(self, slots, slot_weights, slot_active, slot_refs,
                          act_w, lbs, ubs, x0=None, squash_smooth=0.1,
                          dtype=None):
        """Assemble spec + params from per-slot scaffolding.

        ``slot_weights``/``slot_active``: (K,) per-slot scalars replicated
        over nodes; ``slot_refs``: per-slot (ref_dim,) default references.
        The barrier slot for SbFDDP is appended here (running nodes only,
        mirroring the reference's barrierInit over running models,
        /root/reference/src/sbfddp.cpp:169-190)."""
        if dtype is None:
            dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        mp = self.mpc_params
        model = mp.model
        nu = mp.platform.nu
        T = self.knots - 1
        s_lb = np.asarray(mp.platform.u_lb, dtype=np.float64)
        s_ub = np.asarray(mp.platform.u_ub, dtype=np.float64)

        slots = list(slots)
        act_w, lbs, ubs = list(act_w), list(lbs), list(ubs)
        slot_weights = list(slot_weights)
        slot_active = list(slot_active)
        slot_refs = list(slot_refs)
        if self.use_squash:
            slots.append(C.CostSlot(name=P.BARRIER_SLOT, kind=C.CONTROL,
                                    activation=C.WQBARRIER, nr=nu, ref_dim=nu))
            act_w.append(np.asarray(act.barrier_quad_weights(s_lb, s_ub, squash_smooth)))
            lbs.append(s_lb.copy())
            ubs.append(s_ub.copy())
            slot_weights.append(sbfddp.SbFddpSettings.barrier_weight)
            slot_active.append(1.0)
            slot_refs.append(np.zeros(nu))

        K = len(slots)
        weight = np.tile(np.asarray(slot_weights), (T + 1, 1))
        active = np.tile(np.asarray(slot_active), (T + 1, 1))
        refs = [np.tile(np.asarray(r, dtype=np.float64), (T + 1, 1)) for r in slot_refs]
        if self.use_squash:
            active[T, K - 1] = 0.0   # barrier acts on running nodes only

        integ = P._INTEGRATOR_MAP[mp.integration_method]
        self.spec = P.ProblemSpec(
            model=model, nu=nu,
            tau_f=tuple(map(tuple, mp.platform.tau_f)),
            slots=tuple(slots), integrator=integ, T=T,
            dt=mp.dt / 1000.0, use_squash=self.use_squash,
        )
        if x0 is None:
            x0 = np.zeros(model.nx)
            x0[6] = 1.0
        # host leaves (closure-safe; see ocp.problem.as_device)
        cvt = lambda a: np.asarray(a, dtype=dtype)
        self.params0 = P.ProblemParams(
            x0=cvt(x0),
            node=P.NodeParams(weight=cvt(weight), active=cvt(active),
                              refs=tuple(cvt(r) for r in refs)),
            glob=P.GlobalParams(
                act_w=tuple(cvt(a) for a in act_w),
                lb=tuple(cvt(a) for a in lbs),
                ub=tuple(cvt(a) for a in ubs),
                squash_smooth=cvt(squash_smooth),
                s_lb=cvt(s_lb), s_ub=cvt(s_ub),
            ),
        )


def make_reference_sampler(state, state_ref: np.ndarray, t_ref: np.ndarray,
                           hold_yaw_only: bool = False,
                           dtype=None) -> Callable:
    """Vectorizable sampler of the offline reference trajectory.

    Follows CarrotMpc::computeStateReference
    (/root/reference/src/mpc-controllers/carrot-mpc.cpp:384-401): past the
    last reference sample, hold the final configuration at zero velocity;
    ``hold_yaw_only`` reproduces RailMpc's yaw-only hold attitude
    (rail-mpc.cpp:185-188). Inside the reference, configurations follow the
    free-flyer geodesic (pinocchio::interpolate) and velocities are linear.

    Returns ``sample(t_ms) -> (nx,)`` for a scalar time; vmap it over nodes.
    """
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    # host (numpy) closures: baked into the jitted program as literals —
    # never capture eager device arrays (see ocp.problem.as_device)
    state_ref_h = np.asarray(state_ref, dtype=dtype)
    t_ref_h = np.asarray(t_ref, dtype=dtype)
    N = state_ref_h.shape[0]
    nq = state.nq

    q_hold = state_ref_h[-1, :nq].copy()
    if hold_yaw_only:
        # quaternion (x,y,z,w): keep the (z, w) components -> yaw-only
        quat = np.array([0.0, 0.0, q_hold[5], q_hold[6]])
        quat = quat / np.linalg.norm(quat)
        q_hold[3:7] = quat
    x_hold_h = np.concatenate([q_hold, np.zeros(state.nv)]).astype(dtype)

    # TPU-shaped lookup (profiled on the v5e, see BASELINE.md round 4):
    # - the reference timeline is a UNIFORM grid, so the interval index is
    #   arithmetic — jnp.searchsorted lowers to a while-loop binary search
    #   that cost ~18 ms per gather at B x T = 15360 nodes;
    # - rows are fetched by ONE-HOT MATMUL against the (N, nx) table: a
    #   dynamic row gather lowers to a while + per-index dynamic-update-
    #   slice storm on TPU (~50 ms/tick across the four fetches), while the
    #   (nodes, N) x (N, nx) product rides the MXU in microseconds.
    dt_grid = float(t_ref_h[1] - t_ref_h[0]) if N > 1 else 1.0
    uniform = N > 1 and np.allclose(np.diff(t_ref_h), dt_grid)

    def sample(t_ms):
        state_ref = jnp.asarray(state_ref_h)
        x_hold = jnp.asarray(x_hold_h)
        t_ms = jnp.asarray(t_ms, dtype=dtype)
        origin = jnp.asarray(float(t_ref_h[0]), dtype)
        if uniform:
            # arithmetic index on the uniform grid, measured from its origin
            # (t_ref[0] need not be 0 for a public helper — ADVICE r4)
            pos = (t_ms - origin) / jnp.asarray(dt_grid, dtype)
            idx = jnp.floor(pos).astype(jnp.int32) + 1
        else:
            t_ref = jnp.asarray(t_ref_h)
            idx = jnp.searchsorted(t_ref, t_ms, side="right").astype(jnp.int32)
        hold = idx >= N
        i1 = jnp.clip(idx, 1, N - 1)
        i0 = i1 - 1
        t0 = origin + i0.astype(dtype) * jnp.asarray(dt_grid, dtype) if uniform \
            else jnp.asarray(t_ref_h)[i0]
        t1 = origin + i1.astype(dtype) * jnp.asarray(dt_grid, dtype) if uniform \
            else jnp.asarray(t_ref_h)[i1]
        alpha = (t_ms - t0) / (t1 - t0)
        rows = jnp.arange(N, dtype=jnp.int32)
        x0 = (rows == i0).astype(dtype) @ state_ref
        x1 = (rows == i1).astype(dtype) @ state_ref
        q = state.interpolate_config(x0[:nq], x1[:nq], alpha)
        v = x0[nq:] + alpha * (x1[nq:] - x0[nq:])
        x = jnp.concatenate([q, v])
        return jnp.where(hold, x_hold, x)

    return sample


def stage_index(t_stages, t):
    """upper_bound(t_stages, t) - 1 for a TINY boundary table: a broadcast
    comparison count — jnp.searchsorted lowers to a while-loop binary
    search on TPU, measured far slower at these sizes (BASELINE.md r4)."""
    t = jnp.asarray(t)
    return (jnp.sum(t[..., None] >= t_stages, axis=-1)
            .astype(jnp.int32) - 1)


def stage_boundaries(stages, dt_ms: int) -> np.ndarray:
    """CarrotMpc's t_stages_: cumulative stage end-times with every stage
    duration clamped to >= dt (carrot-mpc.cpp:29-44). Length n_stages + 1,
    first entry 0."""
    t = [0]
    for st in stages:
        d = max(st.duration, dt_ms)
        t.append(t[-1] + d)
    return np.asarray(t, dtype=np.int64)
