"""Task-activated carrot MPC: mission stage costs toggled per node.

Parity controller for the reference's pure-Python ``CarrotMpc`` subclass
(/root/reference/bindings/python/eagle_mpc/utils/mpc_controllers.py:29-46),
which demonstrated user-extensible update semantics: instead of the C++
carrot's fixed 5-cost menu it keeps the MISSION's own stage costs on every
node, activates exactly the active stage's costs per node (name-prefix match
in the reference; slot/stage index equality here), and — when the horizon's
last node falls in a transition stage — activates a terminal carrot state
cost re-aimed at the time-interpolated offline reference
(mpc_controllers.py:40-44).

It also shows the framework-native extension pattern: subclass, build a slot
table in ``__post_init__`` (structure), override ``update_problem``
(pure parameter function) — no retracing in the control loop.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..config import specs as cspecs
from ..ocp import costs as C
from ..ocp import problem as P
from . import base
from .carrot import cspecs_state
from .weighted import mission_cost_slots


@dataclasses.dataclass
class TaskActivatedCarrotMpc(base.MpcAbstract):
    trajectory: cspecs.TrajectorySpec = None
    state_ref: np.ndarray = None          # (N, nx) offline solution
    dt_ref: int = 0                       # ms between reference samples

    def __post_init__(self):
        mp = self.mpc_params
        state = cspecs_state(mp)
        model = mp.model
        nx, ndx = model.nx, state.ndx

        # stages are NOT transition-merged (mpc_controllers.py walks
        # trajectory.stages directly, using t_ini boundaries)
        self._stages = self.trajectory.stages
        # host tables (closure-safe: baked as literals at trace time)
        self._t_stages = np.asarray([s.t_ini for s in self._stages])
        self._transition = np.asarray(
            [bool(s.transition) for s in self._stages])
        self._n_stages = len(self._stages)

        (slots, weights, refs, act_w, lbs, ubs, slot_stage, _exempt,
         _sw) = mission_cost_slots(self._stages, model, mp.platform.nu)

        # + terminal carrot slot (the "state" cost of mpc_controllers.py:41)
        carrot_weight = base._try_param(
            mp.server, mp.server.get_double,
            "mpc_controller/carrot_weight", 10.0)
        zero_x = np.zeros(nx)
        zero_x[6] = 1.0
        no_bound = np.full(ndx, np.inf)
        slots.append(C.CostSlot("task_carrot", C.STATE, C.QUAD, ndx, nx))
        weights.append(carrot_weight)
        refs.append(zero_x)
        act_w.append(np.ones(ndx))
        lbs.append(-no_bound)
        ubs.append(no_bound)

        self._finalize_problem(
            slots, slot_weights=weights,
            slot_active=[0.0] * len(slots),
            slot_refs=refs, act_w=act_w, lbs=lbs, ubs=ubs)
        self._slot_stage = np.asarray(slot_stage)
        self._n_mission_slots = len(slot_stage)

        n_ref = self.state_ref.shape[0]
        t_ref = np.arange(n_ref, dtype=np.int64) * self.dt_ref
        self._sample = base.make_reference_sampler(state, self.state_ref, t_ref)

    # ------------------------------------------------------------------
    def _active_stages(self, t_ms, dtype):
        """Per-node active stage with the sequential jump clamp
        (mpc_controllers.py getActiveStage: a node may advance at most one
        stage past its predecessor when it would land two ahead)."""
        T = self.spec.T
        t_stages = jnp.asarray(self._t_stages.astype(dtype))
        node_time = jnp.asarray(t_ms, dtype) + \
            jnp.arange(T + 1, dtype=dtype) * self.dt
        raw = base.stage_index(t_stages, node_time)
        last0 = base.stage_index(t_stages, jnp.asarray(t_ms, dtype))

        def step(last, r):
            idx = jnp.where(r == last + 2, r - 1, r)
            return idx, idx

        _, idx = jax.lax.scan(step, last0, raw)
        return node_time, jnp.clip(idx, 0, self._n_stages - 1)

    def update_problem(self, t_ms, params: P.ProblemParams) -> P.ProblemParams:
        params = P.as_device(params)
        dtype = params.x0.dtype
        node_time, idx_stage = self._active_stages(t_ms, dtype)
        K = self._n_mission_slots

        active_mission = (jnp.asarray(self._slot_stage)[None, :]
                          == idx_stage[:, None])

        # terminal carrot: last node in a transition stage
        T = self.spec.T
        is_last = jnp.arange(T + 1) == T
        carrot_on = is_last & jnp.asarray(self._transition)[idx_stage]
        ref_last = self._sample(node_time[-1]).astype(dtype)

        active = params.node.active.at[:, :K].set(active_mission.astype(dtype))
        active = active.at[:, K].set(carrot_on.astype(dtype))
        new_refs = list(params.node.refs)
        new_refs[K] = jnp.broadcast_to(ref_last, (T + 1, ref_last.shape[0]))
        return params._replace(node=params.node._replace(
            active=active, refs=tuple(new_refs)))
