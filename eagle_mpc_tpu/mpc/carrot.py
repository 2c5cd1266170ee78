"""Carrot MPC: chase a moving reference point along the offline trajectory.

TPU-native re-design of the reference controller
(/root/reference/src/mpc-controllers/carrot-mpc.cpp). Problem structure is
static — 5 cost slots on every node:

  state_reg     WeightedQuad      always active, zero reference
  control_reg   WeightedQuad      always active
  state_limits  WeightedQuadBarrier always active
  carrot_state  Quad              toggled + re-aimed by update_problem
  carrot_tail   WeightedQuad      active past the trajectory end (hold)

``update_problem`` is a pure function: per-node stage lookup
(searchsorted over the clamped stage boundaries, carrot-mpc.cpp:314-318),
carrot activation for non-transition stages / last node, reference
interpolation along the offline solution (geodesic in configuration, linear
in velocity), and hold-position tail past the end (carrot-mpc.cpp:330-401).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import specs as cspecs
from ..ocp import costs as C
from ..ocp import problem as P
from . import base

# slot indices (static layout)
STATE_REG, CONTROL_REG, STATE_LIMITS, CARROT_STATE, CARROT_TAIL = range(5)


@dataclasses.dataclass
class CarrotMpc(base.MpcAbstract):
    """Construction mirrors CarrotMpc::CarrotMpc + loadCostParams +
    createProblem (carrot-mpc.cpp:15-296); cost weight keys and defaults are
    the reference's (carrot_weight=10, carrot_tail_weight=5,
    control_reg=1e-2, state_reg=1e-3, state_limits=100)."""

    trajectory: cspecs.TrajectorySpec = None
    state_ref: np.ndarray = None          # (N, nx) offline solution
    dt_ref: int = 0                       # ms between reference samples

    def __post_init__(self):
        mp = self.mpc_params
        state = cspecs_state(mp)
        ndx, nu, nx = state.ndx, mp.platform.nu, state.nx
        server = mp.server
        g = server.get_double
        gv = server.get_vector
        pre = "mpc_controller/"

        carrot_weight = base._try_param(server, g, pre + "carrot_weight", 10.0)
        tail_weight = base._try_param(server, g, pre + "carrot_tail_weight", 5.0)
        tail_act_w = base._try_param(server, gv, pre + "carrot_tail_act_weights",
                                     np.ones(ndx))
        creg_weight = base._try_param(server, g, pre + "carrot_control_reg_weight", 1e-2)
        creg_act_w = base._try_param(server, gv, pre + "carrot_control_reg_act_weights",
                                     np.ones(nu))
        sreg_weight = base._try_param(server, g, pre + "carrot_state_reg_weight", 1e-3)
        sreg_act_w = base._try_param(server, gv, pre + "carrot_state_ref_act_weights",
                                     np.ones(ndx))
        slim_weight = base._try_param(server, g, pre + "carrot_state_limits_weight", 100.0)
        slim_act_w = base._try_param(server, gv, pre + "carrot_state_limits_act_weights",
                                     np.ones(ndx))
        slim_lb = gv(pre + "carrot_state_limits_l_bound")
        slim_ub = gv(pre + "carrot_state_limits_u_bound")

        zero_x = np.zeros(nx)
        zero_x[6] = 1.0
        no_bound = np.full(ndx, np.inf)

        slots = [
            C.CostSlot("state_reg", C.STATE, C.WQUAD, ndx, nx),
            C.CostSlot("control_reg", C.CONTROL, C.WQUAD, nu, nu),
            C.CostSlot("state_limits", C.STATE, C.WQBARRIER, ndx, nx),
            C.CostSlot("carrot_state", C.STATE, C.QUAD, ndx, nx),
            C.CostSlot("carrot_tail", C.STATE, C.WQUAD, ndx, nx),
        ]
        self._finalize_problem(
            slots,
            slot_weights=[sreg_weight, creg_weight, slim_weight,
                          carrot_weight, tail_weight],
            slot_active=[1.0, 1.0, 1.0, 0.0, 0.0],
            slot_refs=[zero_x, np.zeros(nu), zero_x, zero_x, zero_x],
            act_w=[sreg_act_w, creg_act_w, slim_act_w, np.ones(ndx), tail_act_w],
            lbs=[-no_bound, -np.full(nu, np.inf), slim_lb, -no_bound, -no_bound],
            ubs=[no_bound, np.full(nu, np.inf), slim_ub, no_bound, no_bound],
        )

        n_ref = self.state_ref.shape[0]
        self._t_ref = np.arange(n_ref, dtype=np.int64) * self.dt_ref
        self._sample = base.make_reference_sampler(state, self.state_ref, self._t_ref)
        # host tables (closure-safe: baked as literals at trace time)
        self._t_stages = base.stage_boundaries(self.trajectory.stages, self.dt)
        self._transition = np.asarray(
            [bool(s.transition) for s in self.trajectory.stages])
        self._n_stages = len(self.trajectory.stages)

    # ------------------------------------------------------------------
    def update_problem(self, t_ms, params: P.ProblemParams) -> P.ProblemParams:
        """Pure updateProblem (carrot-mpc.cpp:298-359): toggles carrot /
        tail activity and re-aims their state references, all nodes at once."""
        params = P.as_device(params)
        T = self.spec.T
        dtype = params.x0.dtype
        node_time = jnp.asarray(t_ms, dtype) + jnp.arange(T + 1, dtype=dtype) * self.dt

        # active stage per node: upper_bound(t_stages, t) - 1. The table is
        # tiny (n_stages + 1), so a broadcast comparison-count beats
        # jnp.searchsorted (which lowers to a while-loop binary search on
        # TPU; see BASELINE.md round-4 profile)
        t_stages = jnp.asarray(self._t_stages.astype(dtype))
        idx_stage = jnp.sum(node_time[:, None] >= t_stages[None, :],
                            axis=1).astype(jnp.int32) - 1
        beyond = idx_stage >= self._n_stages
        stage_c = jnp.clip(idx_stage, 0, self._n_stages - 1)
        is_transition = jnp.asarray(self._transition)[stage_c]
        is_last = jnp.arange(T + 1) == T

        carrot_active = (~beyond) & ((~is_transition) | is_last)
        tail_active = beyond

        refs = jax.vmap(self._sample)(node_time).astype(dtype)

        active = params.node.active
        active = active.at[:, CARROT_STATE].set(carrot_active.astype(dtype))
        active = active.at[:, CARROT_TAIL].set(tail_active.astype(dtype))
        new_refs = list(params.node.refs)
        new_refs[CARROT_STATE] = refs
        new_refs[CARROT_TAIL] = refs
        return params._replace(node=params.node._replace(
            active=active, refs=tuple(new_refs)))


def cspecs_state(mp: cspecs.MpcParamsSpec):
    from ..dynamics.state import State

    return State(mp.model.nq, mp.model.nv)
