"""Weighted MPC: the mission's own stage costs, exponentially re-weighted.

TPU-native re-design of /root/reference/src/mpc-controllers/weighted-mpc.cpp:
transition stages are merged into their successors (weighted-mpc.cpp:59-71),
every node carries the union of all remaining stages' costs, and
``update_problem`` (i) activates the slots of each node's active stage,
(ii) modulates non-reg/limits weights by
``w_stage * exp(alpha * (t_node - t_stage_end)/1000) * beta`` saturated past
the trajectory end (computeWeight, weighted-mpc.cpp:233-245). The active
stage per node uses the sequential "jump clamp" (a node may advance at most
one stage past its predecessor when it would land exactly two ahead,
computeActiveStage(time, last), weighted-mpc.cpp:197-204) — a short
``lax.scan`` over the horizon.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import specs as cspecs
from ..ocp import costs as C
from ..ocp import problem as P
from . import base


def merge_transition_stages(stages: Tuple[cspecs.StageSpec, ...]):
    """Fold each transition stage into its successor (duration summed,
    t_ini kept) — weighted-mpc.cpp:59-71."""
    merged: List[cspecs.StageSpec] = []
    carry_dur = 0
    carry_tini = None
    for st in stages:
        if st.transition:
            carry_dur += st.duration
            if carry_tini is None:
                carry_tini = st.t_ini
            continue
        merged.append(dataclasses.replace(
            st,
            duration=st.duration + carry_dur,
            t_ini=st.t_ini if carry_tini is None else carry_tini,
        ))
        carry_dur = 0
        carry_tini = None
    return tuple(merged)


def mission_cost_slots(stages, model, nu):
    """Union-of-stage-costs slot table: one slot per (stage, cost) named
    "<stage>/<cost>", with per-slot stage index / reg-exemption / base weight
    side arrays. Shared by WeightedMpc and TaskActivatedCarrotMpc."""
    nx = model.nx
    slots, weights, refs, act_w, lbs, ubs = [], [], [], [], [], []
    slot_stage: List[int] = []
    slot_exempt: List[bool] = []   # '/reg*' and '/limits*' keep stage weight
    slot_stage_weight: List[float] = []
    for si, st in enumerate(stages):
        for cost in st.costs:
            kind = P._KIND_MAP[cost.type]
            ref_dims = {C.STATE: nx, C.CONTROL: nu, C.FRICTION_CONE: 0}
            slots.append(C.CostSlot(
                name=f"{st.name}/{cost.name}",
                kind=kind,
                activation=P._ACT_MAP[cost.activation],
                nr=cost.nr,
                ref_dim=ref_dims.get(kind, C.REF_DIMS.get(kind, cost.nr)),
                frame_id=cost.frame_id,
            ))
            weights.append(cost.weight)
            r = P._encode_ref(cost, nx, nu)
            refs.append(r if len(r) else np.zeros(0))
            w = cost.act_weights if cost.act_weights is not None else np.ones(cost.nr)
            lb = cost.lower_bound if cost.lower_bound is not None \
                else np.full(cost.nr, -np.inf)
            ub = cost.upper_bound if cost.upper_bound is not None \
                else np.full(cost.nr, np.inf)
            act_w.append(np.asarray(w, dtype=np.float64))
            lbs.append(np.asarray(lb, dtype=np.float64))
            ubs.append(np.asarray(ub, dtype=np.float64))
            slot_stage.append(si)
            slot_exempt.append(cost.name.startswith("reg")
                               or cost.name.startswith("limits"))
            slot_stage_weight.append(cost.weight)
    return (slots, weights, refs, act_w, lbs, ubs,
            slot_stage, slot_exempt, slot_stage_weight)


@dataclasses.dataclass
class WeightedMpc(base.MpcAbstract):
    trajectory: cspecs.TrajectorySpec = None
    dt_ref: int = 0

    def __post_init__(self):
        mp = self.mpc_params
        server = mp.server
        pre = "mpc_controller/"
        g = server.get_double
        self.alpha = base._try_param(server, g, pre + "weighted_alpha", 20.0)
        self.beta = base._try_param(server, g, pre + "weighted_beta", 1.0)
        # state_reg / control_reg keys are read by the reference ctor but
        # never used to build costs (weighted-mpc.cpp:40-58); kept for parity.
        self.state_reg = base._try_param(server, g, pre + "weighted_state_reg", 1e-1)
        self.control_reg = base._try_param(server, g, pre + "weighted_control_reg", 1e-1)

        self._stages = merge_transition_stages(self.trajectory.stages)
        # host tables (closure-safe: baked as literals at trace time)
        self._t_stages = np.asarray([s.t_ini for s in self._stages])
        self._n_stages = len(self._stages)
        self._duration = self.trajectory.duration

        # slot union: one slot per (stage, cost); weight/activity per node
        # are parameters. Reference slot name "<stage>/<cost>".
        model = mp.model
        (slots, weights, refs, act_w, lbs, ubs, slot_stage, slot_exempt,
         slot_stage_weight) = mission_cost_slots(
            self._stages, model, mp.platform.nu)

        self._finalize_problem(
            slots,
            slot_weights=weights,
            slot_active=[0.0] * len(slots),
            slot_refs=refs,
            act_w=act_w, lbs=lbs, ubs=ubs,
        )
        self._slot_stage = np.asarray(slot_stage)
        self._slot_exempt = np.asarray(slot_exempt)
        self._slot_stage_weight = np.asarray(slot_stage_weight)
        self._stage_end = np.asarray(
            [s.t_ini + s.duration for s in self._stages], dtype=np.float64)
        self._n_mission_slots = len(slots)

    # ------------------------------------------------------------------
    def _active_stages(self, t_ms, dtype):
        """Per-node active stage with the sequential jump clamp
        (weighted-mpc.cpp:172-204)."""
        T = self.spec.T
        t_stages = jnp.asarray(self._t_stages.astype(dtype))
        node_time = jnp.asarray(t_ms, dtype) + jnp.arange(T + 1, dtype=dtype) * self.dt
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
        # activity: slot's stage == node's stage (barrier slot untouched)
        active_mission = (jnp.asarray(self._slot_stage)[None, :]
                          == idx_stage[:, None])

        # weight modulation (computeWeight): saturate past trajectory end
        stage_end = jnp.asarray(self._stage_end.astype(dtype))[idx_stage]  # (T+1,)
        slot_w = jnp.asarray(self._slot_stage_weight.astype(dtype))
        wt = jnp.where(node_time > self._duration, 0.0,
                       (node_time - stage_end) / 1000.0)
        mod = jnp.exp(self.alpha * wt) * self.beta                     # (T+1,)
        w_mission = jnp.where(jnp.asarray(self._slot_exempt)[None, :],
                              slot_w[None, :],
                              slot_w[None, :] * mod[:, None])

        active = params.node.active.at[:, :K].set(active_mission.astype(dtype))
        weight = params.node.weight.at[:, :K].set(w_mission)
        return params._replace(node=params.node._replace(
            active=active, weight=weight))
