"""Rail MPC: pure reference tracking along the offline trajectory.

TPU-native re-design of /root/reference/src/mpc-controllers/rail-mpc.cpp:
two cost slots on every node — ``rail_state`` (WeightedQuad on the state
error vs the time-interpolated reference) and ``control`` (Quad reg) —
and ``update_problem`` re-aims every node's reference. Past the end of the
reference the hold state keeps only the yaw component of the attitude
(rail-mpc.cpp:179-200).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..ocp import costs as C
from ..ocp import problem as P
from . import base
from .carrot import cspecs_state

RAIL_STATE, CONTROL = range(2)


@dataclasses.dataclass
class RailMpc(base.MpcAbstract):
    """Weights/defaults follow the reference ctor (rail-mpc.cpp:16-62):
    rail_weight=10, rail_activation_weights=1, rail_control_weight=1e-1."""

    state_ref: np.ndarray = None
    dt_ref: int = 0

    def __post_init__(self):
        mp = self.mpc_params
        state = cspecs_state(mp)
        ndx, nu, nx = state.ndx, mp.platform.nu, state.nx
        server = mp.server
        pre = "mpc_controller/"

        rail_weight = base._try_param(server, server.get_double, pre + "rail_weight", 10.0)
        rail_act_w = base._try_param(server, server.get_vector,
                                     pre + "rail_activation_weights", np.ones(ndx))
        control_weight = base._try_param(server, server.get_double,
                                         pre + "rail_control_weight", 1e-1)

        zero_x = np.zeros(nx)
        zero_x[6] = 1.0
        no_bound = np.full(ndx, np.inf)
        slots = [
            C.CostSlot("rail_state", C.STATE, C.WQUAD, ndx, nx),
            C.CostSlot("control", C.CONTROL, C.QUAD, nu, nu),
        ]
        self._finalize_problem(
            slots,
            slot_weights=[rail_weight, control_weight],
            slot_active=[1.0, 1.0],
            slot_refs=[zero_x, np.zeros(nu)],
            act_w=[rail_act_w, np.ones(nu)],
            lbs=[-no_bound, -np.full(nu, np.inf)],
            ubs=[no_bound, np.full(nu, np.inf)],
        )

        n_ref = self.state_ref.shape[0]
        self._t_ref = np.arange(n_ref, dtype=np.int64) * self.dt_ref
        self._sample = base.make_reference_sampler(state, self.state_ref,
                                                   self._t_ref, hold_yaw_only=True)

    def update_problem(self, t_ms, params: P.ProblemParams) -> P.ProblemParams:
        """Re-aim every node's rail reference (rail-mpc.cpp:154-177)."""
        T = self.spec.T
        dtype = params.x0.dtype
        node_time = jnp.asarray(t_ms, dtype) + jnp.arange(T + 1, dtype=dtype) * self.dt
        refs = jax.vmap(self._sample)(node_time).astype(dtype)
        new_refs = list(params.node.refs)
        new_refs[RAIL_STATE] = refs
        return params._replace(node=params.node._replace(refs=tuple(new_refs)))
