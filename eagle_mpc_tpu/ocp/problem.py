"""The StackedProblem: a shooting OCP as (static spec, dynamic parameters).

This is the keystone TPU design decision (SURVEY.md §7): the reference's
mutable object graph (``crocoddyl::ShootingProblem`` + per-node cost sums
mutated in place by the MPC controllers) becomes

- ``ProblemSpec``   — static, hashable structure: robot model, cost slots
  (the union of all stages' costs, deduplicated by static signature),
  integrator, horizon length, dt. Closed over by jit; one compile per spec.
- ``ProblemParams`` — a pytree of arrays: per-node weights / active masks /
  references, global activation params, squash smoothness, x0. Everything a
  controller mutates at runtime is here, so the MPC loop never retraces
  (the reference's updateProblem is pure parameter mutation, §3.4).

Node evaluation vmaps across the horizon (all T nodes in parallel on chip);
scenario batches vmap across problems; meshes shard the batch axis.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def highest_matmul(f):
    """Trace ``f`` under HIGHEST matmul precision.

    On TPU, float32 ``dot`` defaults to bfloat16 passes (~2^-8 relative
    error). The OCP/solver matrices are tiny (n <= 24) so the extra MXU
    passes are free, while bf16 error exceeds the PD margin of the Riccati
    Quu (observed: constant Cholesky failures -> 10+ regularization-retry
    re-runs of the whole backward pass per direction on the v5e) and
    corrupts gains/derivatives outright."""
    @functools.wraps(f)
    def g(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return f(*args, **kwargs)
    return g

from ..config import specs as cspecs
from ..dynamics import rbd
from ..dynamics.model import RobotModel
from ..dynamics.state import State
from . import actuation as act
from . import costs as C

# integrators
EULER = "euler"
RK4 = "rk4"

_INTEGRATOR_MAP = {
    cspecs.INTEGRATOR_EULER: EULER,
    cspecs.INTEGRATOR_RK4: RK4,
    EULER: EULER,
    RK4: RK4,
}

_ACT_MAP = {
    cspecs.ACT_QUAD: C.QUAD,
    cspecs.ACT_WEIGHTED_QUAD: C.WQUAD,
    cspecs.ACT_QUAD_BARRIER: C.QBARRIER,
    cspecs.ACT_WEIGHTED_QUAD_BARRIER: C.WQBARRIER,
}

_KIND_MAP = {
    cspecs.COST_STATE: C.STATE,
    cspecs.COST_CONTROL: C.CONTROL,
    cspecs.COST_FRAME_PLACEMENT: C.FRAME_PLACEMENT,
    cspecs.COST_FRAME_TRANSLATION: C.FRAME_TRANSLATION,
    cspecs.COST_FRAME_ROTATION: C.FRAME_ROTATION,
    cspecs.COST_FRAME_VELOCITY: C.FRAME_VELOCITY,
    cspecs.COST_FRICTION_CONE: C.FRICTION_CONE,
}

BARRIER_SLOT = "barrier"


# ---------------------------------------------------------------------------
# Parameter pytrees
# ---------------------------------------------------------------------------

class NodeParams(NamedTuple):
    """Per-node cost parameters; every leaf has leading axis T+1 (index T is
    the terminal node)."""

    weight: jnp.ndarray               # (T+1, K)
    active: jnp.ndarray               # (T+1, K) float mask
    refs: Tuple[jnp.ndarray, ...]     # per slot: (T+1, ref_dim)
    contact_active: jnp.ndarray = None       # (T+1, NC) float mask
    contact_refs: Tuple[jnp.ndarray, ...] = ()  # per contact: (T+1, ref_dim)


class GlobalParams(NamedTuple):
    """Horizon-wide parameters (runtime-mutable without retracing)."""

    act_w: Tuple[jnp.ndarray, ...]    # per slot: (nr,)
    lb: Tuple[jnp.ndarray, ...]       # per slot: (nr,)
    ub: Tuple[jnp.ndarray, ...]       # per slot: (nr,)
    squash_smooth: jnp.ndarray        # scalar
    s_lb: jnp.ndarray                 # (nu,) squash input bounds
    s_ub: jnp.ndarray


class ProblemParams(NamedTuple):
    x0: jnp.ndarray
    node: NodeParams
    glob: GlobalParams


class NodeView(NamedTuple):
    """NodeParams sliced at one node index."""

    weight: jnp.ndarray
    active: jnp.ndarray
    refs: Tuple[jnp.ndarray, ...]
    contact_active: jnp.ndarray = None
    contact_refs: Tuple[jnp.ndarray, ...] = ()


def as_device(tree):
    """Convert every array leaf of a parameter pytree to a jnp array.

    Parameter pytrees are built with HOST (numpy) leaves so that closing
    over them in a jitted function embeds them as baked HLO literals — eager
    device arrays captured as jaxpr constants force a slow per-call dispatch
    path on tunneled TPU runtimes (and bloat dispatch everywhere else).
    Call this (or rely on the solvers/controllers, which call it on entry)
    when device-resident leaves are needed, e.g. for ``.at[]`` updates."""
    return jax.tree_util.tree_map(
        lambda a: jnp.asarray(a) if isinstance(a, (np.ndarray, np.generic)) else a,
        tree)


def node_view(node: NodeParams, t) -> NodeView:
    ca = None if node.contact_active is None else node.contact_active[t]
    return NodeView(node.weight[t], node.active[t],
                    tuple(r[t] for r in node.refs),
                    ca, tuple(r[t] for r in node.contact_refs))


def running_views(node: NodeParams, T: int) -> NodeView:
    """Batched view over the T running nodes (for vmap over the horizon)."""
    ca = None if node.contact_active is None else node.contact_active[:T]
    return NodeView(node.weight[:T], node.active[:T],
                    tuple(r[:T] for r in node.refs),
                    ca, tuple(r[:T] for r in node.contact_refs))


# ---------------------------------------------------------------------------
# Problem spec
# ---------------------------------------------------------------------------

class ContactSlot(NamedTuple):
    """Static description of one contact channel (crocoddyl
    ContactModel3D/6D as instantiated by the reference factory,
    /root/reference/src/factory/contacts.cpp). Per-node activity and the
    reference position/pose are parameters; Baumgarte gains are static."""

    name: str
    frame_id: int
    dim: int                 # 3 (point) or 6 (placement)
    ref_dim: int             # 3 or 7 (p + quat)
    gains: Tuple[float, float] = (0.0, 0.0)


@dataclasses.dataclass(frozen=True)
class ProblemSpec:
    model: RobotModel
    nu: int
    tau_f: Tuple[Tuple[float, ...], ...]     # (6, n_rotors) as nested tuples (hashable)
    slots: Tuple[C.CostSlot, ...]
    integrator: str
    T: int
    dt: float                                 # seconds
    use_squash: bool
    contacts: Tuple[ContactSlot, ...] = ()

    @property
    def state(self) -> State:
        return State(self.model.nq, self.model.nv)

    @property
    def tau_f_np(self) -> np.ndarray:
        return np.asarray(self.tau_f)

    @property
    def nc_rows(self) -> int:
        return sum(c.dim for c in self.contacts)

    def __hash__(self):
        return hash((self.model, self.nu, self.slots, self.integrator, self.T,
                     self.dt, self.use_squash, self.tau_f, self.contacts))


class NodeDerivatives(NamedTuple):
    cost: jnp.ndarray
    xnext: jnp.ndarray
    Fx: jnp.ndarray
    Fu: jnp.ndarray
    Lx: jnp.ndarray
    Lu: jnp.ndarray
    Lxx: jnp.ndarray
    Lxu: jnp.ndarray
    Luu: jnp.ndarray


# ---------------------------------------------------------------------------
# Dynamics + cost evaluation
# ---------------------------------------------------------------------------

def squash(spec: ProblemSpec, glob: GlobalParams, s):
    if not spec.use_squash:
        return s
    return act.smooth_sat(s, glob.s_lb, glob.s_ub, glob.squash_smooth)


def _contact_rows(spec: ProblemSpec, view: NodeView, x):
    """Stacked constraint Jacobian rows, drift+Baumgarte terms and per-row
    activity masks for every contact slot at one evaluation point.

    3-D contact: LOCAL-frame point acceleration (crocoddyl ContactModel3D:
    a.linear + w x v_lin) with Baumgarte on the position error (rotated into
    the local frame) and linear velocity. 6-D: full LOCAL spatial
    acceleration with Baumgarte on the SE3 log error and twist."""
    from ..dynamics import lie

    st = spec.state
    q, v = x[..., : st.nq], x[..., st.nq :]
    Js, a0s, acts = [], [], []
    for ci, c in enumerate(spec.contacts):
        J6 = rbd.frame_jacobian_local(spec.model, q, c.frame_id)
        drift = rbd.frame_accel_drift(spec.model, q, v, c.frame_id)
        vf = rbd.frame_velocity(spec.model, q, v, c.frame_id)
        ref = view.contact_refs[ci]
        kp, kd = c.gains
        if c.dim == 3:
            p, R = rbd.frame_placement(spec.model, q, c.frame_id)
            a0 = drift[:3] + jnp.cross(vf[3:], vf[:3])
            a0 = a0 + kp * (R.T @ (p - ref)) + kd * vf[:3]
            Js.append(J6[:3])
        else:
            p, R = rbd.frame_placement(spec.model, q, c.frame_id)
            pref, qref = ref[..., :3], ref[..., 3:7]
            Rref = lie.quat_to_rot(qref)
            err = lie.log6(Rref.T @ (p - pref),
                           lie.rot_to_quat(Rref.T @ R))
            a0 = drift + kp * err + kd * vf
            Js.append(J6)
        a0s.append(a0)
        acts.append(jnp.broadcast_to(view.contact_active[ci], (c.dim,)))
    return (jnp.concatenate(Js, axis=0), jnp.concatenate(a0s, axis=0),
            jnp.concatenate(acts, axis=0))


def _split_forces(spec: ProblemSpec, lam):
    forces = []
    off = 0
    for c in spec.contacts:
        forces.append(lam[off : off + c.dim])
        off += c.dim
    return tuple(forces)


def _dam(spec: ProblemSpec, view: NodeView, glob: GlobalParams, x, s):
    """Continuous dynamics: control -> (squash) -> allocation -> fwd dyn
    (free or contact-constrained). Returns (a, u_squash, forces)."""
    u = squash(spec, glob, s)
    tau_f = jnp.asarray(spec.tau_f_np, dtype=x.dtype)
    tau = act.actuation_tau(tau_f, u)
    st = spec.state
    q, v = x[..., : st.nq], x[..., st.nq :]
    if not spec.contacts:
        return rbd.fwd_dynamics(spec.model, q, v, tau), u, ()
    J, a0, active = _contact_rows(spec, view, x)
    a, lam = rbd.contact_fwd_dynamics(spec.model, q, v, tau, J, a0, active)
    return a, u, _split_forces(spec, lam)


def _point_residuals(spec: ProblemSpec, view: NodeView, glob: GlobalParams,
                     x, s, terminal: bool, forces=()):
    """Residual vectors of every slot at one evaluation point. Control-type
    slots at the terminal node get a zero residual (crocoddyl convention:
    state-only calc zeroes control residuals). ``forces``: per-contact local
    forces from the constrained dynamics (friction-cone residuals)."""
    st = spec.state
    cache = C.build_fk_cache(spec.model, spec.slots, x[: st.nq], x[st.nq :])
    rs = []
    for k, slot in enumerate(spec.slots):
        if slot.kind == C.FRICTION_CONE:
            if not forces or slot.contact_id < 0 or terminal:
                rs.append(jnp.zeros(slot.nr, dtype=x.dtype))
                continue
            # rotate the local contact force to world; cone normal is world
            _, R = rbd.frame_placement(
                spec.model, x[: st.nq], spec.contacts[slot.contact_id].frame_id)
            f_w = R @ forces[slot.contact_id][:3]
            A = jnp.asarray(np.array(slot.cone_A), dtype=x.dtype)
            rs.append(A @ f_w)
            continue
        if terminal and slot.kind == C.CONTROL:
            rs.append(jnp.zeros(slot.nr, dtype=x.dtype))
            continue
        rs.append(C.residual(spec.model, st, slot, view.refs[k], cache, x, s))
    return rs


def _point_cost(spec: ProblemSpec, view: NodeView, glob: GlobalParams,
                x, s, terminal: bool, forces=()):
    rs = _point_residuals(spec, view, glob, x, s, terminal, forces)
    total = jnp.zeros((), dtype=x.dtype)
    for k, slot in enumerate(spec.slots):
        a, _, _ = C.activation(slot.activation, rs[k], glob.act_w[k],
                               glob.lb[k], glob.ub[k])
        total = total + view.weight[k] * view.active[k] * a
    return total


def _stage_points(spec: ProblemSpec, view: NodeView, glob: GlobalParams, x, s):
    """Evaluation points and quadrature coefficients of the integrator.

    Returns ([(coeff, x_i, forces_i)], xnext, u_squash_first) with coeff
    summing to dt. Euler is the reference's symplectic Euler (IAM Euler:
    dq = v dt + a dt^2, dv = a dt); RK4 follows crocoddyl's manifold RK4
    with cost quadrature dt/6 * (l0 + 2 l1 + 2 l2 + l3)."""
    st = spec.state
    dt = spec.dt
    v = x[st.nq :]
    a0, u_sq, f0 = _dam(spec, view, glob, x, s)
    if spec.integrator == EULER:
        vnext = v + a0 * dt
        dx = jnp.concatenate([vnext * dt, a0 * dt])
        return [(dt, x, f0)], st.integrate(x, dx), u_sq

    def k(xi, ai):
        return jnp.concatenate([xi[st.nq :], ai])

    k0 = k(x, a0)
    y1 = st.integrate(x, k0 * (dt / 2))
    a1, _, f1 = _dam(spec, view, glob, y1, s)
    k1 = k(y1, a1)
    y2 = st.integrate(x, k1 * (dt / 2))
    a2, _, f2 = _dam(spec, view, glob, y2, s)
    k2 = k(y2, a2)
    y3 = st.integrate(x, k2 * dt)
    a3, _, f3 = _dam(spec, view, glob, y3, s)
    k3 = k(y3, a3)
    dx = (k0 + 2 * k1 + 2 * k2 + k3) * (dt / 6)
    pts = [(dt / 6, x, f0), (dt / 3, y1, f1), (dt / 3, y2, f2), (dt / 6, y3, f3)]
    return pts, st.integrate(x, dx), u_sq


@highest_matmul
def node_calc(spec: ProblemSpec, view: NodeView, glob: GlobalParams, x, s):
    """One running node: (xnext, discrete cost, squashed control)."""
    pts, xnext, u_sq = _stage_points(spec, view, glob, x, s)
    cost = jnp.zeros((), dtype=x.dtype)
    for coeff, xi, fi in pts:
        cost = cost + coeff * _point_cost(spec, view, glob, xi, s,
                                          terminal=False, forces=fi)
    return xnext, cost, u_sq


@highest_matmul
def terminal_calc(spec: ProblemSpec, view: NodeView, glob: GlobalParams, x):
    """Terminal node cost (unscaled by dt, crocoddyl terminal convention)."""
    s = jnp.zeros(spec.nu, dtype=x.dtype)
    return _point_cost(spec, view, glob, x, s, terminal=True)


@highest_matmul
def node_calc_diff(spec: ProblemSpec, view: NodeView, glob: GlobalParams, x, s):
    """Derivatives of one running node in the tangent space.

    One fused jacfwd pass produces the dynamics Jacobians (Fx, Fu) and every
    residual Jacobian; cost derivatives are assembled Gauss-Newton style
    (crocoddyl semantics, PSD by construction)."""
    st = spec.state
    ndx, nu = st.ndx, spec.nu
    dtype = x.dtype

    pts0, xnext0, _ = _stage_points(spec, view, glob, x, s)
    coeffs = [c for c, _, _ in pts0]
    n_pts = len(pts0)

    def fun(z):
        xx = st.integrate(x, z[:ndx])
        ss = s + z[ndx:]
        pts, xnext, _ = _stage_points(spec, view, glob, xx, ss)
        outs = [st.diff(xnext0, xnext)]
        for _, xi, fi in pts:
            outs.extend(_point_residuals(spec, view, glob, xi, ss,
                                         terminal=False, forces=fi))
        return jnp.concatenate(outs)

    z0 = jnp.zeros(ndx + nu, dtype=dtype)
    val0, jvp = jax.linearize(fun, z0)
    J = jax.vmap(jvp)(jnp.eye(ndx + nu, dtype=dtype)).T  # (n_out, ndx+nu)

    # unpack
    Fxu = J[:ndx]
    Fx, Fu = Fxu[:, :ndx], Fxu[:, ndx:]
    # Gauss-Newton assembly as ONE weighted GEMM pair over the stacked
    # residual rows (instead of 2 GEMMs per slot per quadrature point):
    # g = J_r^T (w . A_r), H = J_r^T diag(w . A_rr) J_r — the per-slot sum
    # is exactly the row-concatenated product. At B=512 x T=29 this cut the
    # assembly phase from ~10 ms to the cost of two batched GEMMs.
    cost = jnp.zeros((), dtype=dtype)
    gAr, gArr = [], []
    off = ndx
    for ipt in range(n_pts):
        coeff = coeffs[ipt]
        for k, slot in enumerate(spec.slots):
            nr = slot.nr
            r = val0[off : off + nr]
            off += nr
            a, Ar, Arr = C.activation(slot.activation, r, glob.act_w[k],
                                      glob.lb[k], glob.ub[k])
            wk = coeff * view.weight[k] * view.active[k]
            cost = cost + wk * a
            gAr.append(wk * Ar)
            gArr.append(wk * Arr)
    J_res = J[ndx:]
    # slot-less (degenerate) specs: zero cost gradients, not a concatenate
    # of an empty list (ADVICE r4)
    wAr = jnp.concatenate(gAr) if gAr else jnp.zeros((0,), dtype)
    wArr = jnp.concatenate(gArr) if gArr else jnp.zeros((0,), dtype)
    g = J_res.T @ wAr
    H = J_res.T @ (wArr[:, None] * J_res)

    return NodeDerivatives(
        cost=cost, xnext=xnext0, Fx=Fx, Fu=Fu,
        Lx=g[:ndx], Lu=g[ndx:],
        Lxx=H[:ndx, :ndx], Lxu=H[:ndx, ndx:], Luu=H[ndx:, ndx:],
    )


@highest_matmul
def terminal_calc_diff(spec: ProblemSpec, view: NodeView, glob: GlobalParams, x):
    st = spec.state
    ndx = st.ndx
    dtype = x.dtype
    s0 = jnp.zeros(spec.nu, dtype=dtype)

    def fun(dx):
        xx = st.integrate(x, dx)
        rs = _point_residuals(spec, view, glob, xx, s0, terminal=True)
        return jnp.concatenate(rs) if rs else jnp.zeros((0,), dtype)

    z0 = jnp.zeros(ndx, dtype=dtype)
    val0, jvp = jax.linearize(fun, z0)
    J = jax.vmap(jvp)(jnp.eye(ndx, dtype=dtype)).T

    cost = jnp.zeros((), dtype=dtype)
    gAr, gArr = [], []
    off = 0
    for k, slot in enumerate(spec.slots):
        nr = slot.nr
        r = val0[off : off + nr]
        off += nr
        a, Ar, Arr = C.activation(slot.activation, r, glob.act_w[k],
                                  glob.lb[k], glob.ub[k])
        wk = view.weight[k] * view.active[k]
        cost = cost + wk * a
        gAr.append(wk * Ar)
        gArr.append(wk * Arr)
    wAr = jnp.concatenate(gAr) if gAr else jnp.zeros((0,), dtype)
    wArr = jnp.concatenate(gArr) if gArr else jnp.zeros((0,), dtype)
    Lx = J.T @ wAr
    Lxx = J.T @ (wArr[:, None] * J)
    return cost, Lx, Lxx


# ---------------------------------------------------------------------------
# Horizon-level evaluation (vmapped across nodes)
# ---------------------------------------------------------------------------

@highest_matmul
def calc_all(spec: ProblemSpec, params: ProblemParams, xs, us):
    """Cost and next-state of every running node (parallel across the
    horizon) + terminal cost. Returns (costs (T,), xnexts (T, nx), cost_T)."""
    views = running_views(params.node, spec.T)
    f = lambda view, x, u: node_calc(spec, view, params.glob, x, u)
    xnexts, costs, _ = jax.vmap(f)(views, xs[: spec.T], us)
    cost_T = terminal_calc(spec, node_view(params.node, spec.T), params.glob, xs[spec.T])
    return costs, xnexts, cost_T


@highest_matmul
def calc_diff_all(spec: ProblemSpec, params: ProblemParams, xs, us,
                  pallas_nodes: bool = False):
    """Derivatives of all running nodes (vmapped) + terminal derivatives.

    ``pallas_nodes`` routes the running-node linearization through the
    fused batch-in-lanes kernel (ops/node_pallas.py) when the spec is in
    its scope (free dynamics, Euler, STATE/CONTROL slots) and the call is
    vmapped over a scenario batch; the terminal node stays here (1/T of
    the work)."""
    lT, LxT, LxxT = terminal_calc_diff(
        spec, node_view(params.node, spec.T), params.glob, xs[spec.T])
    if pallas_nodes:
        from ..ops import node_pallas
        if node_pallas.supported(spec):
            derivs = node_pallas.calc_diff_running(spec, params, xs, us)
            return derivs, (lT, LxT, LxxT)
    views = running_views(params.node, spec.T)
    f = lambda view, x, u: node_calc_diff(spec, view, params.glob, x, u)
    derivs = jax.vmap(f)(views, xs[: spec.T], us)
    return derivs, (lT, LxT, LxxT)


@highest_matmul
def total_cost(spec: ProblemSpec, params: ProblemParams, xs, us):
    """Total cost of a candidate WITHOUT the dynamics rollout where valid.

    Under symplectic Euler with no contacts the node cost is
    dt * l(x_t, u_t) — no forward dynamics needed; RK4 (cost quadrature at
    intermediate dynamic points) and contact problems (friction-cone
    residual needs the KKT forces) fall back to :func:`calc_all`. Used for
    the maxiter = 0 stages of a homotopy schedule, where the full
    evaluation would be pure overhead."""
    if spec.integrator != EULER or spec.contacts:
        costs, _, cT = calc_all(spec, params, xs, us)
        return jnp.sum(costs) + cT
    views = running_views(params.node, spec.T)
    f = lambda view, x, u: _point_cost(spec, view, params.glob, x, u,
                                       terminal=False)
    costs = jax.vmap(f)(views, xs[: spec.T], us)
    cT = terminal_calc(spec, node_view(params.node, spec.T), params.glob,
                       xs[spec.T])
    return spec.dt * jnp.sum(costs) + cT


def squashed_controls(spec: ProblemSpec, params: ProblemParams, us):
    """us_squash extraction (reference: SolverSbFDDP::fillSquashedOutputs)."""
    return squash(spec, params.glob, us)


# ---------------------------------------------------------------------------
# Builders
# ---------------------------------------------------------------------------

def _slot_key(cost: cspecs.CostSpec):
    """Two stage costs share a slot iff their static signature matches; all
    per-node data (weight, activity, reference) lives in params."""
    act_w = cost.act_weights.tobytes() if cost.act_weights is not None else b""
    lb = cost.lower_bound.tobytes() if cost.lower_bound is not None else b""
    ub = cost.upper_bound.tobytes() if cost.upper_bound is not None else b""
    cone = (cost.n_surf.tobytes(), cost.mu) if cost.n_surf is not None else None
    return (cost.type, cost.activation, cost.nr, cost.frame_id, act_w, lb, ub, cone)


def _encode_ref(cost: cspecs.CostSpec, nx: int, nu: int) -> np.ndarray:
    kind = _KIND_MAP[cost.type]
    if kind == C.STATE:
        return np.asarray(cost.reference, dtype=np.float64)
    if kind == C.CONTROL:
        return np.asarray(cost.reference, dtype=np.float64)
    if kind == C.FRAME_PLACEMENT:
        return np.concatenate([cost.position, cost.orientation])
    if kind == C.FRAME_TRANSLATION:
        return np.asarray(cost.position, dtype=np.float64)
    if kind == C.FRAME_ROTATION:
        return np.asarray(cost.orientation, dtype=np.float64)
    if kind == C.FRAME_VELOCITY:
        return np.concatenate([cost.linear, cost.angular])
    if kind == C.FRICTION_CONE:
        return np.zeros(0)
    raise AssertionError


def _default_ref(slot: C.CostSlot, nx: int) -> np.ndarray:
    if slot.kind == C.STATE:
        ref = np.zeros(nx)
        ref[6] = 1.0
        return ref
    if slot.kind in (C.FRAME_PLACEMENT, C.FRAME_ROTATION):
        ref = np.zeros(slot.ref_dim)
        ref[-1] = 1.0  # identity quaternion tail
        return ref
    return np.zeros(slot.ref_dim)


def stage_knots(stages, dt_ms: int) -> Tuple[np.ndarray, int]:
    """Number of running knots per stage + terminal stage index, implementing
    the duration-0 rules of /root/reference/src/trajectory.cpp:110-137:
    a 0-duration stage contributes 1 knot (and steals one from the next
    stage) unless it is last, in which case it only becomes the terminal."""
    n = len(stages)
    knots = np.zeros(n, dtype=int)
    last_d0 = False
    for i, st in enumerate(stages):
        if st.duration // dt_ms == 0 and i + 1 < n:
            knots[i] = 1
            last_d0 = True
        else:
            knots[i] = st.duration // dt_ms - (1 if last_d0 else 0)
            last_d0 = False
    return knots, n - 1


def from_trajectory(traj: cspecs.TrajectorySpec, dt_ms: Optional[int] = None,
                    use_squash: Optional[bool] = None,
                    integrator: Optional[str] = None,
                    squash_smooth: float = 0.1,
                    dtype=jnp.float64) -> Tuple[ProblemSpec, ProblemParams]:
    """Trajectory::createProblem equivalent: mission spec -> StackedProblem.

    Per-stage differing cost sets are unified into the slot union with
    per-node masking; the last stage's model is the terminal node."""
    if dt_ms is None:
        dt_ms = traj.problem_params.dt
    if use_squash is None:
        use_squash = traj.problem_params.use_squash
    if integrator is None:
        integrator = traj.problem_params.integrator
    if not integrator:
        raise ValueError("Problem parameters not specified in the YAML file. "
                         "Pass dt/use_squash/integrator explicitly.")
    integ = _INTEGRATOR_MAP[integrator]
    model = traj.model
    nx, nu = model.nx, traj.nu

    # ---- contact slot union (by frame + type); per-node activity is data.
    # Any contact anywhere => constrained dynamics everywhere with masks
    # (an inactive masked contact reduces exactly to free dynamics).
    contact_keys = {}
    contact_slots: list = []
    stage_contact_idx = []   # per stage: list of (contact_idx, spec)
    for st in traj.stages:
        entries = []
        for con in st.contacts:
            dim = 6 if con.type == cspecs.CONTACT_6D else 3
            key = (con.frame_id, dim)
            if key not in contact_keys:
                contact_keys[key] = len(contact_slots)
                contact_slots.append(ContactSlot(
                    name=con.name, frame_id=con.frame_id, dim=dim,
                    ref_dim=7 if dim == 6 else 3,
                    gains=tuple(float(g) for g in con.gains),
                ))
            entries.append((contact_keys[key], con))
        stage_contact_idx.append(entries)

    def _cone_contact_id(frame_id: int) -> int:
        for i, cs in enumerate(contact_slots):
            if cs.frame_id == frame_id:
                return i
        return -1

    # ---- build the cost slot union
    slot_keys = {}
    slots: list = []
    slot_specs: list = []
    stage_slot_idx = []   # per stage: list of (slot_idx, cost)
    for st in traj.stages:
        entries = []
        for cost in st.costs:
            key = _slot_key(cost)
            if key not in slot_keys:
                slot_keys[key] = len(slots)
                cone = None
                if cost.n_surf is not None:
                    cone = tuple(map(tuple, C.friction_cone_matrix(cost.n_surf, cost.mu)))
                kind = _KIND_MAP[cost.type]
                ref_dims = {C.STATE: nx, C.CONTROL: nu, C.FRICTION_CONE: 0}
                slots.append(C.CostSlot(
                    name=f"{st.name}/{cost.name}",
                    kind=kind,
                    activation=_ACT_MAP[cost.activation],
                    nr=cost.nr,
                    ref_dim=ref_dims.get(kind, C.REF_DIMS.get(kind, cost.nr)),
                    frame_id=cost.frame_id,
                    contact_id=_cone_contact_id(cost.frame_id)
                    if kind == C.FRICTION_CONE else -1,
                    cone_A=cone,
                ))
                slot_specs.append(cost)
            entries.append((slot_keys[key], cost))
        stage_slot_idx.append(entries)

    if use_squash:
        slots.append(C.CostSlot(name=BARRIER_SLOT, kind=C.CONTROL,
                                activation=C.WQBARRIER, nr=nu, ref_dim=nu))
        slot_specs.append(None)

    knots, term_stage = stage_knots(traj.stages, dt_ms)
    T = int(knots.sum())
    if T <= 0:
        raise ValueError("Trajectory has no running nodes at this dt")

    spec = ProblemSpec(
        model=model, nu=nu,
        tau_f=tuple(map(tuple, traj.platform.tau_f)),
        slots=tuple(slots), integrator=integ, T=T,
        dt=dt_ms / 1000.0, use_squash=use_squash,
        contacts=tuple(contact_slots),
    )

    # ---- fill parameters
    K = len(slots)
    weight = np.zeros((T + 1, K))
    active = np.zeros((T + 1, K))
    refs = [np.tile(_default_ref(s, nx), (T + 1, 1)) for s in slots]

    node_stage = np.zeros(T + 1, dtype=int)
    t = 0
    for si, st in enumerate(traj.stages):
        for _ in range(knots[si]):
            node_stage[t] = si
            t += 1
    node_stage[T] = term_stage

    NC = len(contact_slots)
    contact_active = np.zeros((T + 1, NC))
    contact_refs = []
    for cs in contact_slots:
        r = np.zeros(cs.ref_dim)
        if cs.ref_dim == 7:
            r[6] = 1.0
        contact_refs.append(np.tile(r, (T + 1, 1)))

    for t in range(T + 1):
        for k_idx, cost in stage_slot_idx[node_stage[t]]:
            weight[t, k_idx] = cost.weight
            active[t, k_idx] = 1.0 if cost.active else 0.0
            ref = _encode_ref(cost, nx, nu)
            if len(ref):
                refs[k_idx][t] = ref
        for c_idx, con in stage_contact_idx[node_stage[t]]:
            contact_active[t, c_idx] = 1.0
            if contact_slots[c_idx].ref_dim == 7:
                contact_refs[c_idx][t] = np.concatenate([con.position, con.orientation])
            else:
                contact_refs[c_idx][t] = np.asarray(con.position, dtype=np.float64)

    s_lb = np.asarray(traj.platform.u_lb, dtype=np.float64)
    s_ub = np.asarray(traj.platform.u_ub, dtype=np.float64)

    act_w, lbs, ubs = [], [], []
    for k_idx, (slot, cost) in enumerate(zip(slots, slot_specs)):
        if slot.name == BARRIER_SLOT:
            weight[:T, k_idx] = 1e-3     # reference barrier_weight_
            active[:T, k_idx] = 1.0
            act_w.append(np.asarray(act.barrier_quad_weights(s_lb, s_ub, squash_smooth)))
            lbs.append(s_lb.copy())
            ubs.append(s_ub.copy())
            continue
        w = cost.act_weights if cost.act_weights is not None else np.ones(slot.nr)
        lb = cost.lower_bound if cost.lower_bound is not None else np.full(slot.nr, -np.inf)
        ub = cost.upper_bound if cost.upper_bound is not None else np.full(slot.nr, np.inf)
        act_w.append(np.asarray(w, dtype=np.float64))
        lbs.append(np.asarray(lb, dtype=np.float64))
        ubs.append(np.asarray(ub, dtype=np.float64))

    # host (numpy) leaves: safe to close over in jit (baked literals) and
    # converted on device on solver entry — see as_device()
    cvt = lambda a: np.asarray(a, dtype=dtype)
    params = ProblemParams(
        x0=cvt(traj.initial_state),
        node=NodeParams(
            weight=cvt(weight), active=cvt(active),
            refs=tuple(cvt(r) for r in refs),
            contact_active=cvt(contact_active) if NC else None,
            contact_refs=tuple(cvt(r) for r in contact_refs),
        ),
        glob=GlobalParams(
            act_w=tuple(cvt(a) for a in act_w),
            lb=tuple(cvt(a) for a in lbs),
            ub=tuple(cvt(a) for a in ubs),
            squash_smooth=cvt(squash_smooth),
            s_lb=cvt(s_lb), s_ub=cvt(s_ub),
        ),
    )
    return spec, params
