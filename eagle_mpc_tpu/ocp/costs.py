"""Cost residuals and activation functions.

The 7 residual types x 4 activations of the reference factories
(/root/reference/src/factory/cost.cpp, activation.cpp), as pure functions.
Costs follow Crocoddyl's structure: scalar cost = weight * a(r(x, u)) with
Gauss-Newton derivatives L = w * (R' Ar, R' diag(Arr) R) — the same
approximation the reference solver runs on, which also keeps cost Hessians
PSD for the Riccati pass.

Residual references are DATA (arrays), never structure: MPC controllers remap
them every tick without retracing (SURVEY.md §3.4 key fact).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..dynamics import lie
from ..dynamics.model import RobotModel

# slot kinds
STATE = "state"
CONTROL = "control"
FRAME_PLACEMENT = "frame_placement"
FRAME_TRANSLATION = "frame_translation"
FRAME_ROTATION = "frame_rotation"
FRAME_VELOCITY = "frame_velocity"
FRICTION_CONE = "friction_cone"

# activation kinds
QUAD = "quad"
WQUAD = "wquad"
QBARRIER = "qbarrier"
WQBARRIER = "wqbarrier"

#: reference vector length per kind (state handled separately: nx)
REF_DIMS = {
    FRAME_PLACEMENT: 7,     # p (3) + quat (4)
    FRAME_TRANSLATION: 3,
    FRAME_ROTATION: 4,      # quat
    FRAME_VELOCITY: 6,      # [linear, angular] LOCAL
}


class CostSlot(NamedTuple):
    """Static description of one cost channel (hashable, closed over by jit).

    A slot is shared by all nodes; per-node weight/activity/reference live in
    the parameter pytree. Costs from different stages with identical static
    signature share a slot (the union-of-costs masking design)."""

    name: str
    kind: str
    activation: str
    nr: int
    ref_dim: int           # reference vector length (state: nx, placement: 7, ...)
    frame_id: int = -1
    contact_id: int = -1   # friction-cone slots: index into contact slots
    cone_A: Optional[Tuple[Tuple[float, ...], ...]] = None  # static 5x3 cone matrix


def friction_cone_matrix(n_surf: np.ndarray, mu: float) -> np.ndarray:
    """4-facet outer linearized friction cone + normal-force row (the
    crocoddyl ``FrictionCone(n_surf, mu, 4, false)`` the reference hardcodes
    at src/factory/cost.cpp:154). Rows A so that A f >= lb = 0."""
    n = np.asarray(n_surf, dtype=np.float64)
    n = n / np.linalg.norm(n)
    # orthonormal tangent basis
    t1 = np.cross(n, [1.0, 0.0, 0.0])
    if np.linalg.norm(t1) < 1e-6:
        t1 = np.cross(n, [0.0, 1.0, 0.0])
    t1 /= np.linalg.norm(t1)
    t2 = np.cross(n, t1)
    rows = []
    for t in (t1, t2):
        rows.append(mu * n - t)
        rows.append(mu * n + t)
    rows.append(n)
    return np.stack(rows)


# ---------------------------------------------------------------------------
# Activations: value a(r), gradient Ar, Gauss-Newton diagonal Arr
# ---------------------------------------------------------------------------

def activation(kind: str, r, w, lb, ub):
    """Returns (a, Ar, Arr_diag). ``w``/``lb``/``ub`` are runtime params
    (mutated by SbFDDP's barrier homotopy)."""
    if kind == QUAD:
        return 0.5 * jnp.sum(r * r), r, jnp.ones_like(r)
    if kind == WQUAD:
        wr = w * r
        return 0.5 * jnp.sum(wr * r), wr, w
    if kind in (QBARRIER, WQBARRIER):
        rlo = jnp.minimum(r - lb, 0.0)
        rhi = jnp.maximum(r - ub, 0.0)
        viol = rlo + rhi
        mask = (viol != 0.0).astype(r.dtype)
        if kind == QBARRIER:
            return 0.5 * jnp.sum(viol * viol), viol, mask
        return 0.5 * jnp.sum(w * viol * viol), w * viol, w * mask
    raise ValueError(f"unknown activation kind {kind}")


# ---------------------------------------------------------------------------
# Residuals. FK results are provided via a small cache computed once per
# evaluation point (placements / velocities shared by all frame slots).
# ---------------------------------------------------------------------------

class FkCache(NamedTuple):
    pw: Optional[tuple] = None    # per-body world translation
    Rw: Optional[tuple] = None    # per-body world rotation
    vel: Optional[tuple] = None   # per-body local spatial velocity


def build_fk_cache(model: RobotModel, slots, q, v) -> FkCache:
    from ..dynamics import rbd

    need_pose = any(s.kind in (FRAME_PLACEMENT, FRAME_TRANSLATION, FRAME_ROTATION)
                    for s in slots)
    need_vel = any(s.kind == FRAME_VELOCITY for s in slots)
    pw = Rw = vel = None
    if need_pose:
        pw, Rw = rbd.body_world_placements(model, q)
        pw, Rw = tuple(pw), tuple(Rw)
    if need_vel:
        _, _, _, vel_l = rbd._tree_kinematics(model, q, v)
        vel = tuple(vel_l)
    return FkCache(pw, Rw, vel)


def _frame_pose(model, slot, cache, q):
    f = model.frames[slot.frame_id]
    fp = jnp.asarray(f.p, dtype=q.dtype)
    fR = jnp.asarray(f.R, dtype=q.dtype)
    return cache.pw[f.body] + cache.Rw[f.body] @ fp, cache.Rw[f.body] @ fR


def residual(model: RobotModel, state, slot: CostSlot, ref, cache: FkCache,
             x, u, forces=None):
    """Residual vector for one slot at one evaluation point.

    ``u`` here is the raw solver control (pre-squash ``s`` under SbFDDP, as
    in the reference where control residuals act on the squashing input).
    ``forces``: per-contact local contact forces (friction-cone slots).
    """
    q = x[..., : state.nq]
    v = x[..., state.nq :]
    if slot.kind == STATE:
        return state.diff(ref, x)
    if slot.kind == CONTROL:
        return u - ref
    if slot.kind == FRAME_TRANSLATION:
        p, _ = _frame_pose(model, slot, cache, q)
        return p - ref
    if slot.kind == FRAME_ROTATION:
        _, R = _frame_pose(model, slot, cache, q)
        Rref = lie.quat_to_rot(ref)
        return lie.log3(Rref.T @ R)
    if slot.kind == FRAME_PLACEMENT:
        p, R = _frame_pose(model, slot, cache, q)
        pref, qref = ref[..., :3], ref[..., 3:7]
        Rref = lie.quat_to_rot(qref)
        t_rel = Rref.T @ (p - pref)
        R_rel = Rref.T @ R
        return lie.log6(t_rel, lie.rot_to_quat(R_rel))
    if slot.kind == FRAME_VELOCITY:
        from ..dynamics import spatial

        f = model.frames[slot.frame_id]
        fp = jnp.asarray(f.p, dtype=q.dtype)
        fR = jnp.asarray(f.R, dtype=q.dtype)
        vf = spatial.motion_to_child(fp, fR, cache.vel[f.body])
        return vf - ref
    if slot.kind == FRICTION_CONE:
        A = jnp.asarray(np.array(slot.cone_A), dtype=x.dtype)
        force = forces[slot.contact_id][..., :3]
        return A @ force
    raise ValueError(f"unknown residual kind {slot.kind}")
