"""Rigid-body dynamics: RNEA, CRBA, forward dynamics, frame kinematics.

TPU-native replacement for the Pinocchio algorithms the reference consumes
through Crocoddyl's ``DifferentialActionModelFreeFwdDynamics``
(/root/reference/src/factory/diff-action.cpp:34-35). Design notes:

- The kinematic tree is STATIC (closed-over ``RobotModel``): per-joint loops
  unroll at trace time, producing straight-line XLA with fixed shapes.
- Everything is written for a single (q, v) and batched with ``vmap`` — the
  throughput axis on TPU is thousands of concurrent problems, not one big
  robot (nv <= ~11 for all reference robots).
- Forward dynamics is mass-matrix based (CRBA + Cholesky) rather than ABA:
  it exposes M for the contact KKT solver and maps to batched matmuls /
  triangular solves, which XLA fuses well on the MXU/VPU.
- Derivatives come from ``jax.jacfwd`` over these functions (exact, fused);
  analytic RNEA-derivative kernels are a later optimization.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

from ..ops import smallmat
from . import lie, spatial
from .model import PRISMATIC, REVOLUTE, RobotModel


def _joint_kinematics(model: RobotModel, j: int, qj, dtype):
    """Pose of body j+1's frame in its parent body frame and the motion
    subspace S (expressed in the child body frame)."""
    jp = jnp.asarray(model.joint_p[j], dtype=dtype)
    jR = jnp.asarray(model.joint_R[j], dtype=dtype)
    axis = jnp.asarray(model.joint_axis[j], dtype=dtype)
    if model.joint_type[j] == REVOLUTE:
        R = jR @ lie.exp3(axis * qj)
        p = jp
        S = jnp.concatenate([jnp.zeros(3, dtype=dtype), axis])
    elif model.joint_type[j] == PRISMATIC:
        R = jR
        p = jp + jR @ (axis * qj)
        S = jnp.concatenate([axis, jnp.zeros(3, dtype=dtype)])
    else:  # pragma: no cover
        raise NotImplementedError
    return p, R, S


def _tree_kinematics(model: RobotModel, q, v):
    """Per-body local transforms, subspaces and local spatial velocities.

    Returns (Xp, Xr): pose of body i in its parent (i >= 1), S list, and the
    local velocity of every body (body 0 = base, twist = v[:6]).
    """
    dtype = q.dtype
    nj = model.nj
    Xp: List = [None] * (nj + 1)
    Xr: List = [None] * (nj + 1)
    S: List = [None] * (nj + 1)
    vel: List = [None] * (nj + 1)
    vel[0] = v[..., :6]
    for j in range(nj):
        p, R, Sj = _joint_kinematics(model, j, q[..., 7 + j], dtype)
        b = j + 1
        Xp[b], Xr[b], S[b] = p, R, Sj
        vparent = vel[model.parent[j]]
        vel[b] = spatial.motion_to_child(p, R, vparent) + Sj * v[..., 6 + j]
    return Xp, Xr, S, vel


def _gravity_accel(model: RobotModel, quat, dtype):
    """The -g base 'acceleration' trick: linear part R^T (0,0,+g) in the base
    local frame (matches pinocchio's a_gf[0] = -model.gravity)."""
    gw = jnp.array([0.0, 0.0, model.gravity], dtype=dtype)
    return jnp.concatenate([lie.quat_rotate_inv(quat, gw), jnp.zeros(3, dtype=dtype)])


def rnea(model: RobotModel, q, v, a, f_ext=None):
    """Inverse dynamics: generalized force tau such that the tree undergoes
    acceleration ``a`` (tangent layout [base twist dot (6), qddot]) under
    gravity and optional external forces.

    f_ext: optional (nj+1, 6) array of spatial forces applied to each body,
    expressed in the body's LOCAL frame (subtracted, pinocchio convention).
    Returns tau with layout [base wrench (6, local frame), joint torques].
    """
    dtype = q.dtype
    nj = model.nj
    Xp, Xr, S, vel = _tree_kinematics(model, q, v)

    acc: List = [None] * (nj + 1)
    acc[0] = a[..., :6] + _gravity_accel(model, q[..., 3:7], dtype)
    for j in range(nj):
        b = j + 1
        aparent = acc[model.parent[j]]
        Svdot = S[b] * v[..., 6 + j]
        acc[b] = (
            spatial.motion_to_child(Xp[b], Xr[b], aparent)
            + S[b] * a[..., 6 + j]
            + spatial.motion_cross(vel[b], Svdot)
        )

    # body bias forces
    force: List = [None] * (nj + 1)
    for b in range(nj + 1):
        I6 = jnp.asarray(model.inertia[b], dtype=dtype)
        f = I6 @ acc[b] + spatial.motion_cross_force(vel[b], I6 @ vel[b])
        if f_ext is not None:
            f = f - f_ext[b]
        force[b] = f

    # backward sweep
    tau_j = [None] * nj
    for j in reversed(range(nj)):
        b = j + 1
        tau_j[j] = jnp.sum(S[b] * force[b], axis=-1)
        parent = model.parent[j]
        force[parent] = force[parent] + spatial.force_to_parent(Xp[b], Xr[b], force[b])

    parts = [force[0]] + [t[..., None] for t in tau_j]
    return jnp.concatenate(parts, axis=-1) if nj else force[0]


def bias_force(model: RobotModel, q, v, f_ext=None):
    """Nonlinear effects b(q, v): gravity + Coriolis/centrifugal (- ext)."""
    return rnea(model, q, v, jnp.zeros(model.nv, dtype=q.dtype), f_ext)


def _xform_p2c(p, R):
    """6x6 motion transform mapping parent-frame motion to child frame."""
    Rt = R.T
    top = jnp.concatenate([Rt, -Rt @ lie.hat(p)], axis=-1)
    bot = jnp.concatenate([jnp.zeros_like(Rt), Rt], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def crba(model: RobotModel, q):
    """Composite rigid-body algorithm: joint-space mass matrix (nv x nv).

    Row/col 0:6 correspond to the free-flyer base (S_base = identity).
    The matrix is assembled from per-entry scalars with ONE final stack —
    ``.at[i, j].set`` in a loop would emit a chain of full-tensor
    dynamic-update-slice copies on TPU (each padded to (8, 128) tiles)."""
    dtype = q.dtype
    nj = model.nj
    nv = model.nv
    Xp, Xr, S, _ = _tree_kinematics(model, q, jnp.zeros(nv, dtype=dtype))

    Ic: List = [jnp.asarray(model.inertia[b], dtype=dtype) for b in range(nj + 1)]
    for j in reversed(range(nj)):
        b = j + 1
        X = _xform_p2c(Xp[b], Xr[b])
        Ic[model.parent[j]] = Ic[model.parent[j]] + X.T @ Ic[b] @ X
    if nj == 0:
        return Ic[0]

    ent = {}         # (6+j, 6+jj) strict-lower joint-joint entries
    base_cols = {}   # row 6+j -> (..., 6) base-coupling block
    for j in range(nj):
        b = j + 1
        F = Ic[b] @ S[b]
        ent[(6 + j, 6 + j)] = jnp.sum(S[b] * F, axis=-1)
        body = b
        while body != 0:
            jj = body - 1
            F = spatial.force_to_parent(Xp[body], Xr[body], F)
            body = model.parent[jj]
            if body != 0:
                ent[(6 + j, 6 + body - 1)] = jnp.sum(S[body] * F, axis=-1)
        base_cols[6 + j] = F

    zero = jnp.zeros_like(q[..., 0])

    def entry(i, c):
        if i < 6 and c < 6:
            return Ic[0][..., i, c]
        if i >= 6 and c < 6:
            return base_cols[i][..., c]
        if i < 6:
            return base_cols[c][..., i]
        return ent.get((max(i, c), min(i, c)), zero)

    rows = [jnp.stack([entry(i, c) for c in range(nv)], axis=-1)
            for i in range(nv)]
    return jnp.stack(rows, axis=-2)


def fwd_dynamics(model: RobotModel, q, v, tau, f_ext=None):
    """Forward dynamics a = M(q)^{-1} (tau - b(q, v)) via Cholesky.

    Functional equivalent of pinocchio ABA as used inside the reference's
    free-dynamics action model; O(nv^3) but nv <= 11 and fully batched.
    The solve is trace-time unrolled (ops.smallmat) — XLA's batched linalg
    on (N, nv, nv) pays a ~25x tile-padding tax on TPU."""
    if f_ext is not None:
        M = crba(model, q)
        b = bias_force(model, q, v, f_ext)
        return smallmat.solve_psd(M, tau - b)
    return _fwd_dynamics_free(model, q, v, tau)


from functools import partial as _partial  # noqa: E402 (local import order)


@_partial(jax.custom_jvp, nondiff_argnums=(0,))
def _fwd_dynamics_free(model: RobotModel, q, v, tau):
    M = crba(model, q)
    b = bias_force(model, q, v)
    return smallmat.solve_psd(M, tau - b)


@_fwd_dynamics_free.defjvp
def _fwd_dynamics_free_jvp(model, primals, tangents):
    """Analytic derivative via the implicit function theorem (the structure
    of pinocchio's computeABADerivatives, replacing the reference stack's
    analytical ABA derivatives — /root/reference/src/factory/
    diff-action.cpp:34-35):

        rnea(q, v, a) = tau   =>   da = M^{-1} (dtau - d[rnea]|_a (dq, dv))

    Under ``jax.linearize`` the primal work (CRBA, one Cholesky
    factorization, the solve for a) is hoisted and each tangent costs one
    RNEA-jvp plus one cached triangular solve — instead of forward-mode
    through CRBA AND the unrolled factorization per tangent, which measured
    ~3x slower on the v5e for the ndx+nu = 27 tangents of a node
    linearization."""
    q, v, tau = primals
    dq, dv, dtau = tangents
    M = crba(model, q)
    chol = smallmat.CholFactor(M)
    b = bias_force(model, q, v)
    a = chol.solve(tau - b)
    _, dres = jax.jvp(lambda qq, vv: rnea(model, qq, vv, a), (q, v), (dq, dv))
    da = chol.solve(dtau - dres)
    return a, da


# ---------------------------------------------------------------------------
# Frame kinematics (for operational-space costs)
# ---------------------------------------------------------------------------

def body_world_placements(model: RobotModel, q):
    """World pose (p, R) of every body frame."""
    dtype = q.dtype
    nj = model.nj
    pw: List = [None] * (nj + 1)
    Rw: List = [None] * (nj + 1)
    pw[0] = q[..., :3]
    Rw[0] = lie.quat_to_rot(q[..., 3:7])
    for j in range(nj):
        b = j + 1
        p, R, _ = _joint_kinematics(model, j, q[..., 7 + j], dtype)
        parent = model.parent[j]
        pw[b] = pw[parent] + Rw[parent] @ p
        Rw[b] = Rw[parent] @ R
    return pw, Rw


def frame_placement(model: RobotModel, q, frame_id: int):
    """World pose (p, R) of an operational frame."""
    f = model.frames[frame_id]
    pw, Rw = body_world_placements(model, q)
    fp = jnp.asarray(f.p, dtype=q.dtype)
    fR = jnp.asarray(f.R, dtype=q.dtype)
    return pw[f.body] + Rw[f.body] @ fp, Rw[f.body] @ fR


def frame_velocity(model: RobotModel, q, v, frame_id: int):
    """Spatial velocity of a frame, expressed in the frame (LOCAL convention,
    as the reference's frame-velocity costs use —
    /root/reference/src/factory/cost.cpp:131-132)."""
    f = model.frames[frame_id]
    _, _, _, vel = _tree_kinematics(model, q, v)
    fp = jnp.asarray(f.p, dtype=q.dtype)
    fR = jnp.asarray(f.R, dtype=q.dtype)
    return spatial.motion_to_child(fp, fR, vel[f.body])


# ---------------------------------------------------------------------------
# Contact dynamics (KKT-constrained forward dynamics)
# ---------------------------------------------------------------------------

def frame_jacobian_local(model: RobotModel, q, frame_id: int):
    """LOCAL-frame Jacobian J (6, nv): v_frame = J @ v. Exact via one
    jacfwd of the (linear-in-v) frame velocity."""
    nv = model.nv
    z = jnp.zeros(nv, dtype=q.dtype)
    _, jvp = jax.linearize(lambda vv: frame_velocity(model, q, vv, frame_id), z)
    return jax.vmap(jvp)(jnp.eye(nv, dtype=q.dtype)).T


def frame_accel_drift(model: RobotModel, q, v, frame_id: int):
    """Spatial acceleration of a frame under zero joint acceleration (the
    J̇v drift), expressed in the frame (LOCAL). The coordinate time
    derivative of the body-frame twist IS the body-frame spatial
    acceleration, so one manifold jvp along qdot is exact."""
    from . import lie as _lie

    nv = model.nv
    dtype = q.dtype

    def f(dq):
        p2, q2 = _lie.se3_mul(q[..., :3], q[..., 3:7],
                              *_lie.exp6(dq[..., :6]))
        qq = jnp.concatenate([p2, q2, q[..., 7:] + dq[..., 6:]], axis=-1)
        return frame_velocity(model, qq, v, frame_id)

    z = jnp.zeros(nv, dtype=dtype)
    _, drift = jax.jvp(f, (z,), (v,))
    return drift


def contact_fwd_dynamics(model: RobotModel, q, v, tau, J_rows, a0_rows,
                         active, damping: float = 0.0):
    """Constrained forward dynamics with per-contact activity masks.

    Solves  M a + b = tau + Jc' lam ;  Jc a + a0 = 0  for the ACTIVE rows
    (crocoddyl ``DifferentialActionModelContactFwdDynamics`` semantics, used
    by the reference's contact stages, /root/reference/src/factory/
    diff-action.cpp:31-32). Inactive rows are masked out of the Schur
    complement, which reduces EXACTLY to free dynamics with lam = 0 — so one
    uniform compiled structure serves contact and non-contact nodes.

    J_rows: (nc, nv) stacked constraint Jacobians; a0_rows: (nc,) desired
    -(Jc a) values incl. Baumgarte terms; active: (nc,) float mask.
    Returns (a, lam). Derivatives use the analytic IFT rule below (the
    contact analog of pinocchio's computeConstrainedDynamicsDerivatives).
    """
    return _contact_fwd_core(model, float(damping), q, v, tau, J_rows,
                             a0_rows, active)


def _contact_primal(model, damping, q, v, tau, J_rows, a0_rows, active):
    M = crba(model, q)
    b = bias_force(model, q, v)
    chol = smallmat.CholFactor(M)
    free_acc = chol.solve(tau - b)                   # unconstrained a

    Jm = active[:, None] * J_rows
    MinvJt = chol.solve_mat(Jm.T)                    # (nv, nc)
    G = Jm @ MinvJt
    nc = J_rows.shape[0]
    I = jnp.eye(nc, dtype=q.dtype)
    # inactive rows/cols are zero in G; a unit diagonal there yields lam = 0
    G = G + jnp.diag(1.0 - active) + damping * I
    rhs = Jm @ free_acc + active * a0_rows
    gchol = smallmat.CholFactor(G)
    lam = -gchol.solve(rhs)
    a = free_acc + MinvJt @ lam
    return a, lam, chol, gchol, Jm


from functools import partial as _partial2  # noqa: E402


@_partial2(jax.custom_jvp, nondiff_argnums=(0, 1))
def _contact_fwd_core(model, damping, q, v, tau, J_rows, a0_rows, active):
    a, lam, _, _, _ = _contact_primal(model, damping, q, v, tau, J_rows,
                                      a0_rows, active)
    return a, lam


@_contact_fwd_core.defjvp
def _contact_fwd_core_jvp(model, damping, primals, tangents):
    """IFT derivative of the masked KKT system. With D = diag(1-active) +
    damping*I the primal solves

        rnea(q, v, a) - tau - Jm' lam = 0
        Jm a + active*a0 + D lam      = 0

    whose differential (active treated as a mask, zero tangent) gives

        G dlam = -(dJm a + Jm M^{-1} (dtau + dJm' lam - drnea) + active*da0)
        da     = M^{-1} (dtau + dJm' lam + Jm' dlam - drnea)

    reusing the primal factorizations of M and G — each tangent costs one
    RNEA-jvp plus two cached triangular solves instead of forward-mode
    through CRBA, both Cholesky factorizations and the Schur assembly."""
    q, v, tau, J_rows, a0_rows, active = primals
    dq, dv, dtau, dJ, da0, _dactive = tangents
    a, lam, chol, gchol, Jm = _contact_primal(model, damping, q, v, tau,
                                              J_rows, a0_rows, active)
    _, drnea = jax.jvp(lambda qq, vv: rnea(model, qq, vv, a), (q, v), (dq, dv))
    dJm = active[:, None] * dJ
    r = dtau + dJm.T @ lam - drnea          # (nv,)
    Minv_r = chol.solve(r)
    rhs = dJm @ a + Jm @ Minv_r + active * da0
    dlam = -gchol.solve(rhs)
    da = Minv_r + chol.solve(Jm.T @ dlam)
    return (a, lam), (da, dlam)


# ---------------------------------------------------------------------------
# Diagnostics (used by the energy-conservation tests)
# ---------------------------------------------------------------------------

def kinetic_energy(model: RobotModel, q, v):
    M = crba(model, q)
    return 0.5 * v @ M @ v


def potential_energy(model: RobotModel, q):
    pw, Rw = body_world_placements(model, q)
    e = jnp.zeros((), dtype=q.dtype)
    for b in range(model.nj + 1):
        I6 = jnp.asarray(model.inertia[b], dtype=q.dtype)
        m = I6[0, 0]
        # I6[3:, :3] = m * hat(com); extract the skew components
        mc = jnp.stack([I6[5, 1], I6[3, 2], I6[4, 0]])
        com_world = pw[b] + Rw[b] @ jnp.where(m > 0, mc / jnp.maximum(m, 1e-12), 0.0)
        e = e + m * model.gravity * com_world[2]
    return e
