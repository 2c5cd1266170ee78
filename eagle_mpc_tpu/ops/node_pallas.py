"""Pallas-fused per-node linearization (batch-in-lanes TPU kernel).

THE round-5 perf lever (VERDICT r4 item 1): the fixed tick's ~68 ms/iteration
floor at B=512 is ~85 % dispatch-bound node math — `P.calc_diff_all` (~37 ms)
and the rollout bodies — thousands of tiny XLA ops on (B, T)-shaped operands,
each paying fixed dispatch/HBM-roundtrip overhead that dwarfs its arithmetic.
This kernel fuses the ENTIRE per-node linearization — squash, multicopter
allocation, RNEA/CRBA forward dynamics, the symplectic-Euler step, the
manifold-tangent sweep, and the Gauss-Newton cost assembly — into ONE
VMEM-resident Pallas program over the flattened (B*T) node set.

It is the hot loop of the reference solver (per-node calc/calcDiff inside
crocoddyl's SolverFDDP::computeDirection, consumed by the reference at
/root/reference/src/sbfddp.cpp:241-255) re-expressed for the TPU VPU.

Layout — **batch in lanes** (the idiom validated by ops/riccati_pallas.py):
every physical scalar is a (BT,)-lane vector, small vectors/matrices are
Python lists (of lists) of lane vectors, and all small-dimension loops unroll
at trace time. The tangent sweep rides `jax.linearize` + `vmap` over the
ndx+nu basis directions INSIDE the kernel, so the linear ops carry a leading
tangent dim — (27, BT) tiles with full lane occupancy — while the primal runs
once per lane tile. No operand is ever indexed in a tiled (sublane/lane)
dimension: outputs are assembled by stacking leading-dim rows (the
middle-dim-slice relayout trap measured at 300x in the riccati kernel).

Scope (dispatch falls back to the XLA path otherwise):
- free dynamics (no contact slots), symplectic-Euler integrator,
- every non-contact cost kind: STATE / CONTROL (the Carrot/Rail MPC tick
  menus, /root/reference/src/mpc-controllers/carrot-mpc.cpp:250-296,
  rail-mpc.cpp:132-152) plus the four operational-frame residuals via a
  quaternion-chain FK (WeightedMpc and free-dynamics offline missions).
  Contact specs (friction cone / KKT dynamics) keep the XLA path.

Numerical parity with `ocp.problem.node_calc_diff` is pinned by
tests/test_node_pallas.py (f64 interpret mode, ~1e-10; f32 on-TPU solves by
the bench health asserts). Honest scalar-fetch timing on both sides lives in
tools/profile_node_pallas.py.
"""

from __future__ import annotations

import functools
import os
from typing import List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
_EPS2 = 1e-8


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


# ---------------------------------------------------------------------------
# lane-scalar math: quantities are Python lists of (..., BT)-shaped arrays
# (a leading tangent dim appears automatically under linearize + vmap)
# ---------------------------------------------------------------------------

def _safe(x):
    return jnp.where(x < _EPS2, jnp.ones_like(x), x)


def _dot(a: Sequence, b: Sequence):
    acc = a[0] * b[0]
    for i in range(1, len(a)):
        acc = acc + a[i] * b[i]
    return acc


def _cross(a, b):
    return [a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0]]


def _matvec(M, v):
    """M: list of rows (lists); entries may be python floats (skipped when
    exactly 0) or lane vectors."""
    out = []
    for row in M:
        acc = None
        for c, vc in zip(row, v):
            if isinstance(c, float) and c == 0.0:
                continue
            term = c * vc
            acc = term if acc is None else acc + term
        out.append(0.0 if acc is None else acc)
    return out


def _matTvec(M, v):
    n = len(M[0])
    out = []
    for j in range(n):
        acc = None
        for i in range(len(M)):
            c = M[i][j]
            if isinstance(c, float) and c == 0.0:
                continue
            term = c * v[i]
            acc = term if acc is None else acc + term
        out.append(0.0 if acc is None else acc)
    return out


def _matmul(A, B):
    n, k, m = len(A), len(B), len(B[0])
    out = [[None] * m for _ in range(n)]
    for i in range(n):
        for j in range(m):
            acc = None
            for p in range(k):
                a, b = A[i][p], B[p][j]
                if (isinstance(a, float) and a == 0.0) or \
                   (isinstance(b, float) and b == 0.0):
                    continue
                term = a * b
                acc = term if acc is None else acc + term
            out[i][j] = 0.0 if acc is None else acc
    return out


def _matT(A):
    return [[A[i][j] for i in range(len(A))] for j in range(len(A[0]))]


def _static_hat(w: np.ndarray) -> List[List[float]]:
    return [[0.0, -float(w[2]), float(w[1])],
            [float(w[2]), 0.0, -float(w[0])],
            [-float(w[1]), float(w[0]), 0.0]]


# ---- quaternions (x, y, z, w) — mirrors dynamics/lie.py -------------------

def _quat_conj(q):
    return [-q[0], -q[1], -q[2], q[3]]


def _quat_mul(q1, q2):
    x1, y1, z1, w1 = q1
    x2, y2, z2, w2 = q2
    return [w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2]


def _quat_normalize(q):
    n = jnp.sqrt(_dot(q, q))
    return [qi / n for qi in q]


def _quat_rotate(q, v):
    qv = q[:3]
    t = _cross(qv, v)
    t = [2.0 * ti for ti in t]
    c = _cross(qv, t)
    return [v[i] + q[3] * t[i] + c[i] for i in range(3)]


def _quat_rotate_inv(q, v):
    return _quat_rotate(_quat_conj(q), v)


def _quat_exp(w):
    t2 = _dot(w, w)
    t = jnp.sqrt(_safe(t2))
    small = t2 < _EPS2
    sinc_half = jnp.where(small, 0.5 - t2 / 48.0, jnp.sin(0.5 * t) / t)
    cos_half = jnp.where(small, 1.0 - t2 / 8.0, jnp.cos(0.5 * t))
    return [w[0] * sinc_half, w[1] * sinc_half, w[2] * sinc_half, cos_half]


def _atan2_pos(n, qw):
    """atan2(n, qw) for n, qw >= 0, using only Mosaic-lowerable primitives
    (atan2/atan/asin are unimplemented in the Pallas TPU lowering): a
    polynomial initial guess (~1e-5) + 3 Newton corrections on
    f(phi) = qw sin(phi) - n cos(phi), each quadratic — the result is
    converged to machine precision in f64, so the interpret-mode parity
    tests pin the SAME math the TPU runs."""
    r = jnp.sqrt(_safe(n * n + qw * qw))
    nn = n / r
    ww = qw / r
    lo = jnp.minimum(nn, ww)
    hi = jnp.maximum(nn, ww)
    t = lo / _safe(hi)
    t2 = t * t
    # Abramowitz & Stegun 4.4.49-grade minimax on [0, 1]
    p = t * (0.99997726 + t2 * (-0.33262347 + t2 * (0.19354346
             + t2 * (-0.11643287 + t2 * (0.05265332 - t2 * 0.01172120)))))
    phi = jnp.where(nn <= ww, p, 0.5 * jnp.pi - p)
    for _ in range(3):
        s, c = jnp.sin(phi), jnp.cos(phi)
        phi = phi - (ww * s - nn * c) / (ww * c + nn * s)
    return phi


def _quat_log(q):
    qv, qw = q[:3], q[3]
    sign = jnp.where(qw >= 0, 1.0, -1.0)
    qv = [v * sign for v in qv]
    qw = qw * sign
    n2 = _dot(qv, qv)
    n = jnp.sqrt(_safe(n2))
    angle = 2.0 * _atan2_pos(n, qw)
    qw_safe = jnp.maximum(qw, 0.5)
    small_scale = 2.0 / qw_safe * (1.0 - n2 / (3.0 * qw_safe * qw_safe))
    scale = jnp.where(n2 < _EPS2, small_scale, angle / n)
    return [v * scale for v in qv]


def _hat_rows(w):
    z = 0.0
    return [[z, -w[2], w[1]], [w[2], z, -w[0]], [-w[1], w[0], z]]


def _v_coeffs(w):
    t2 = _dot(w, w)
    t2s = _safe(t2)
    t = jnp.sqrt(t2s)
    small = t2 < _EPS2
    b = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(t)) / t2s)
    c = jnp.where(small, 1.0 / 6.0 - t2 / 120.0, (t - jnp.sin(t)) / (t2s * t))
    return b, c, t2, t2s, t, small


def _exp6(xi):
    v, w = xi[:3], xi[3:]
    b, c, _, _, _, _ = _v_coeffs(w)
    W = _hat_rows(w)
    W2 = _matmul(W, W)
    Wv = _matvec(W, v)
    W2v = _matvec(W2, v)
    p = [v[i] + b * Wv[i] + c * W2v[i] for i in range(3)]
    return p, _quat_exp(w)


def _log6(p, q):
    w = _quat_log(q)
    t2 = _dot(w, w)
    t2s = _safe(t2)
    t = jnp.sqrt(t2s)
    small = t2 < _EPS2
    half = 0.5 * t
    half_sin = jnp.sin(jnp.where(small, jnp.ones_like(half), half))
    d = jnp.where(small, 1.0 / 12.0 + t2 / 720.0,
                  (1.0 - half * jnp.cos(half) / half_sin) / t2s)
    W = _hat_rows(w)
    W2 = _matmul(W, W)
    Wp = _matvec(W, p)
    W2p = _matvec(W2, p)
    v = [p[i] - 0.5 * Wp[i] + d * W2p[i] for i in range(3)]
    return v + w


def _se3_mul(p1, q1, p2, q2):
    r = _quat_rotate(q1, p2)
    return ([p1[i] + r[i] for i in range(3)],
            _quat_normalize(_quat_mul(q1, q2)))


def _se3_inv(p, q):
    qi = _quat_conj(q)
    r = _quat_rotate(qi, p)
    return [-ri for ri in r], qi


# ---- state manifold (mirrors dynamics/state.py) ----------------------------

def _integrate(x, dx, nq, nv):
    p, quat, qj, v = x[:3], x[3:7], x[7:nq], x[nq:]
    ep, eq = _exp6(dx[:6])
    p2, q2 = _se3_mul(p, quat, ep, eq)
    return (p2 + q2 + [qj[i] + dx[6 + i] for i in range(nq - 7)]
            + [v[i] + dx[nv + i] for i in range(nv)])


def _state_diff(x0, x1, nq, nv):
    ip, iq = _se3_inv(x0[:3], x0[3:7])
    dp, dq = _se3_mul(ip, iq, x1[:3], x1[3:7])
    xi = _log6(dp, dq)
    return (xi + [x1[7 + i] - x0[7 + i] for i in range(nq - 7)]
            + [x1[nq + i] - x0[nq + i] for i in range(nv)])


# ---------------------------------------------------------------------------
# static kernel model: per-joint trig-coefficient matrices (trace-time numpy)
# ---------------------------------------------------------------------------

def _np_rot_to_quat(R: np.ndarray) -> Tuple[float, ...]:
    """Host-side rotation matrix -> (x, y, z, w) quaternion (Shepperd)."""
    R = np.asarray(R, float)
    tr = np.trace(R)
    cands = []
    s_w = 1.0 + tr
    cands.append((s_w, np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0],
                                 R[1, 0] - R[0, 1], s_w])))
    s_x = 1.0 + R[0, 0] - R[1, 1] - R[2, 2]
    cands.append((s_x, np.array([s_x, R[0, 1] + R[1, 0], R[0, 2] + R[2, 0],
                                 R[2, 1] - R[1, 2]])))
    s_y = 1.0 - R[0, 0] + R[1, 1] - R[2, 2]
    cands.append((s_y, np.array([R[0, 1] + R[1, 0], s_y, R[1, 2] + R[2, 1],
                                 R[0, 2] - R[2, 0]])))
    s_z = 1.0 - R[0, 0] - R[1, 1] + R[2, 2]
    cands.append((s_z, np.array([R[0, 2] + R[2, 0], R[1, 2] + R[2, 1], s_z,
                                 R[1, 0] - R[0, 1]])))
    s, q = max(cands, key=lambda c: c[0])
    q = q / (2.0 * np.sqrt(s))
    q = q / np.linalg.norm(q)
    return tuple(map(float, q))


class _KJoint(NamedTuple):
    parent: int
    prismatic: bool
    p: Tuple[float, ...]            # static translation (revolute)
    C0: tuple                       # R(theta) = C0 + sin*C1 + cos*C2
    C1: tuple
    C2: tuple
    R_static: tuple                 # prismatic rotation
    axis_world: Tuple[float, ...]   # jR @ axis (prismatic translation dir)
    S: Tuple[float, ...]            # motion subspace in child frame
    jRq: Tuple[float, ...] = ()     # static quat of the joint placement
    axis: Tuple[float, ...] = ()    # joint axis (joint frame)


class _KModel(NamedTuple):
    nj: int
    nq: int
    nv: int
    joints: Tuple[_KJoint, ...]
    inertia: tuple                  # (nj+1) static 6x6 nested tuples
    gravity: float


def _build_kmodel(model) -> _KModel:
    from ..dynamics.model import PRISMATIC, REVOLUTE

    joints = []
    for j in range(model.nj):
        jp = np.asarray(model.joint_p[j], float)
        jR = np.asarray(model.joint_R[j], float)
        ax = np.asarray(model.joint_axis[j], float)
        A = np.array(_static_hat(ax))
        if model.joint_type[j] == REVOLUTE:
            C0 = jR @ (np.eye(3) + A @ A)
            C1 = jR @ A
            C2 = -jR @ (A @ A)
            S = (0.0, 0.0, 0.0) + tuple(map(float, ax))
            joints.append(_KJoint(
                parent=model.parent[j], prismatic=False,
                p=tuple(map(float, jp)),
                C0=tuple(map(tuple, C0)), C1=tuple(map(tuple, C1)),
                C2=tuple(map(tuple, C2)),
                R_static=tuple(map(tuple, jR)),
                axis_world=tuple(map(float, jR @ ax)), S=S,
                jRq=_np_rot_to_quat(jR), axis=tuple(map(float, ax))))
        elif model.joint_type[j] == PRISMATIC:
            S = tuple(map(float, ax)) + (0.0, 0.0, 0.0)
            joints.append(_KJoint(
                parent=model.parent[j], prismatic=True,
                p=tuple(map(float, jp)),
                C0=(), C1=(), C2=(),
                R_static=tuple(map(tuple, jR)),
                axis_world=tuple(map(float, jR @ ax)), S=S,
                jRq=_np_rot_to_quat(jR), axis=tuple(map(float, ax))))
        else:  # pragma: no cover
            raise NotImplementedError
    return _KModel(
        nj=model.nj, nq=model.nq, nv=model.nv, joints=tuple(joints),
        inertia=tuple(tuple(map(tuple, np.asarray(I, float)))
                      for I in model.inertia),
        gravity=float(model.gravity))


def _joint_pose(kj: _KJoint, qj):
    """(p list3, R 3x3 lane lists, S static list6) of one joint at angle qj."""
    if kj.prismatic:
        R = [[float(c) for c in row] for row in kj.R_static]
        p = [kj.p[i] + kj.axis_world[i] * qj for i in range(3)]
    else:
        s, c = jnp.sin(qj), jnp.cos(qj)
        R = [[kj.C0[i][k] + s * kj.C1[i][k] + c * kj.C2[i][k]
              for k in range(3)] for i in range(3)]
        p = [float(v) for v in kj.p]
    return p, R, list(kj.S)


# ---- spatial algebra on list-of-6 motion/force vectors ---------------------

def _motion_to_child(p, R, m):
    v, w = m[:3], m[3:]
    pxw = _cross(p, w)
    t = [v[i] - pxw[i] for i in range(3)]
    return _matTvec(R, t) + _matTvec(R, w)


def _motion_cross(m1, m2):
    v1, w1 = m1[:3], m1[3:]
    v2, w2 = m2[:3], m2[3:]
    a = _cross(w1, v2)
    b = _cross(v1, w2)
    return [a[i] + b[i] for i in range(3)] + _cross(w1, w2)


def _motion_cross_force(m, f):
    v, w = m[:3], m[3:]
    fo, tau = f[:3], f[3:]
    a = _cross(w, tau)
    b = _cross(v, fo)
    return _cross(w, fo) + [a[i] + b[i] for i in range(3)]


def _force_to_parent(p, R, f):
    fo, tau = f[:3], f[3:]
    Rf = _matvec(R, fo)
    Rt = _matvec(R, tau)
    pxRf = _cross(p, Rf)
    return Rf + [Rt[i] + pxRf[i] for i in range(3)]


def _xform_p2c(p, R):
    """6x6 motion transform parent -> child: [[R^T, -R^T hat(p)], [0, R^T]]."""
    Rt = _matT(R)
    hp = _hat_rows(p) if not all(isinstance(c, float) for c in p) \
        else _static_hat(np.asarray(p))
    top_r = _matmul(Rt, hp)
    X = [[0.0] * 6 for _ in range(6)]
    for i in range(3):
        for j in range(3):
            X[i][j] = Rt[i][j]
            X[i][3 + j] = -top_r[i][j] if not (
                isinstance(top_r[i][j], float) and top_r[i][j] == 0.0) else 0.0
            X[3 + i][3 + j] = Rt[i][j]
    return X


# ---- RNEA / CRBA / Cholesky (mirrors dynamics/rbd.py) ----------------------

def _tree_kin(km: _KModel, x):
    nq, nv = km.nq, km.nv
    v = x[nq:]
    Xp = [None] * (km.nj + 1)
    Xr = [None] * (km.nj + 1)
    S = [None] * (km.nj + 1)
    vel = [None] * (km.nj + 1)
    vel[0] = list(v[:6])
    for j, kj in enumerate(km.joints):
        b = j + 1
        p, R, Sj = _joint_pose(kj, x[7 + j])
        Xp[b], Xr[b], S[b] = p, R, Sj
        vparent = vel[kj.parent]
        vb = _motion_to_child(p, R, vparent)
        vel[b] = [vb[i] + Sj[i] * v[6 + j] for i in range(6)]
    return Xp, Xr, S, vel


def _rnea(km: _KModel, x, a, kin=None):
    """Inverse dynamics (layout [base wrench (6, local), joint torques])."""
    nq = km.nq
    quat = x[3:7]
    Xp, Xr, S, vel = kin if kin is not None else _tree_kin(km, x)
    v = x[nq:]

    g_lin = _quat_rotate_inv(quat, [0.0, 0.0, km.gravity])
    acc = [None] * (km.nj + 1)
    acc[0] = [a[i] + g_lin[i] for i in range(3)] + [a[3], a[4], a[5]]
    for j, kj in enumerate(km.joints):
        b = j + 1
        aparent = acc[kj.parent]
        Svdot = [S[b][i] * v[6 + j] for i in range(6)]
        ac = _motion_to_child(Xp[b], Xr[b], aparent)
        mc = _motion_cross(vel[b], Svdot)
        acc[b] = [ac[i] + S[b][i] * a[6 + j] + mc[i] for i in range(6)]

    force = [None] * (km.nj + 1)
    for b in range(km.nj + 1):
        I6 = km.inertia[b]
        Ia = _matvec(I6, acc[b])
        Iv = _matvec(I6, vel[b])
        cf = _motion_cross_force(vel[b], Iv)
        force[b] = [Ia[i] + cf[i] for i in range(6)]

    tau_j = [None] * km.nj
    for j in reversed(range(km.nj)):
        b = j + 1
        tau_j[j] = _dot(S[b], force[b])
        fp = _force_to_parent(Xp[b], Xr[b], force[b])
        parent = km.joints[j].parent
        force[parent] = [force[parent][i] + fp[i] for i in range(6)]
    return list(force[0]) + tau_j


def _crba(km: _KModel, x, kin=None):
    """Mass matrix as an nv x nv list-of-lists (symmetric)."""
    nv = km.nv
    Xp, Xr, S, _ = kin if kin is not None else _tree_kin(km, x)
    Ic = [[[float(c) for c in row] for row in km.inertia[b]]
          for b in range(km.nj + 1)]
    for j in reversed(range(km.nj)):
        b = j + 1
        X = _xform_p2c(Xp[b], Xr[b])
        Xt = _matT(X)
        Ic_p = _matmul(Xt, _matmul(Ic[b], X))
        par = km.joints[j].parent
        Ic[par] = [[Ic[par][i][k] + Ic_p[i][k] for k in range(6)]
                   for i in range(6)]
    if km.nj == 0:
        return Ic[0]

    ent = {}
    base_cols = {}
    for j in range(km.nj):
        b = j + 1
        F = _matvec(Ic[b], S[b])
        ent[(6 + j, 6 + j)] = _dot(S[b], F)
        body = b
        while body != 0:
            jj = body - 1
            F = _force_to_parent(Xp[body], Xr[body], F)
            body = km.joints[jj].parent
            if body != 0:
                ent[(6 + j, 6 + body - 1)] = _dot(S[body], F)
        base_cols[6 + j] = F

    def entry(i, c):
        if i < 6 and c < 6:
            return Ic[0][i][c]
        if i >= 6 and c < 6:
            return base_cols[i][c]
        if i < 6:
            return base_cols[c][i]
        return ent.get((max(i, c), min(i, c)), 0.0)

    return [[entry(i, c) for c in range(nv)] for i in range(nv)]


def _chol(M, n):
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        acc = M[j][j]
        for k in range(j):
            acc = acc - L[j][k] * L[j][k]
        d = jnp.sqrt(acc)
        L[j][j] = d
        inv_d = 1.0 / d
        for i in range(j + 1, n):
            acc = M[i][j]
            for k in range(j):
                acc = acc - L[i][k] * L[j][k]
            L[i][j] = acc * inv_d
    return L


def _chol_solve(L, b):
    n = len(L)
    y = [None] * n
    for i in range(n):
        acc = b[i]
        for k in range(i):
            acc = acc - L[i][k] * y[k]
        y[i] = acc / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        acc = y[i]
        for k in range(i + 1, n):
            acc = acc - L[k][i] * x[k]
        x[i] = acc / L[i][i]
    return x


def _fwd_dyn(km: _KModel, x, tau):
    """a = M(q)^{-1} (tau - b(q, v)) — lane version of rbd.fwd_dynamics."""
    kin = _tree_kin(km, x)
    nv = km.nv
    bias = _rnea(km, x, [0.0] * nv, kin=kin)
    M = _crba(km, x, kin=kin)
    rhs = [tau[i] - bias[i] for i in range(nv)]
    L = _chol(M, nv)
    return _chol_solve(L, rhs)


# ---- actuation / squash / costs -------------------------------------------

def _smooth_sat(s, lb, ub, smooth):
    out = []
    for i in range(len(s)):
        d = smooth * (ub[i] - lb[i])
        a = d * d
        slo = s[i] - lb[i]
        shi = s[i] - ub[i]
        out.append(0.5 * (jnp.sqrt(a + slo * slo) - jnp.sqrt(a + shi * shi)
                          + lb[i] + ub[i]))
    return out


def _activation(kind, r, w, lb, ub):
    """Lane version of ocp.costs.activation on row lists. Returns
    (a lane-scalar, Ar rows, Arr rows)."""
    from ..ocp import costs as C

    if kind == C.QUAD:
        return 0.5 * _dot(r, r), list(r), [1.0 + 0.0 * r[0]] * len(r)
    if kind == C.WQUAD:
        wr = [w[i] * r[i] for i in range(len(r))]
        return 0.5 * _dot(wr, r), wr, list(w)
    if kind in (C.QBARRIER, C.WQBARRIER):
        a_acc = None
        Ar, Arr = [], []
        for i in range(len(r)):
            rlo = jnp.minimum(r[i] - lb[i], 0.0)
            rhi = jnp.maximum(r[i] - ub[i], 0.0)
            viol = rlo + rhi
            mask = (viol != 0.0).astype(viol.dtype)
            if kind == C.QBARRIER:
                term = 0.5 * viol * viol
                Ar.append(viol)
                Arr.append(mask)
            else:
                term = 0.5 * w[i] * viol * viol
                Ar.append(w[i] * viol)
                Arr.append(w[i] * mask)
            a_acc = term if a_acc is None else a_acc + term
        return a_acc, Ar, Arr
    raise ValueError(kind)  # pragma: no cover


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

class _SlotInfo(NamedTuple):
    kind: str
    activation: str
    nr: int
    ref_dim: int
    # frame-cost statics (operational frame attached to a body):
    frame_body: int = -1
    fp: Tuple[float, ...] = ()      # frame translation in the body frame
    fRq: Tuple[float, ...] = ()     # frame rotation as a static quaternion
    fR: tuple = ()                  # frame rotation matrix (velocity xform)


def _fk_quat(km: _KModel, x):
    """World placement (p, quat) of every body — the quaternion-chain FK.

    Equivalent to rbd.body_world_placements but composing quaternions
    directly (q_joint of a revolute joint about its static axis is
    [axis sin(theta/2), cos(theta/2)]), so frame residuals never need a
    lane-layout rot_to_quat."""
    pw = [None] * (km.nj + 1)
    qw = [None] * (km.nj + 1)
    pw[0] = list(x[:3])
    qw[0] = list(x[3:7])
    for j, kj in enumerate(km.joints):
        b = j + 1
        th = x[7 + j]
        if kj.prismatic:
            q_local = [float(c) for c in kj.jRq]
            p_local = [kj.p[i] + kj.axis_world[i] * th for i in range(3)]
        else:
            half = 0.5 * th
            sh, ch = jnp.sin(half), jnp.cos(half)
            q_ax = [kj.axis[0] * sh, kj.axis[1] * sh, kj.axis[2] * sh, ch]
            q_local = _quat_mul([float(c) for c in kj.jRq], q_ax)
            p_local = [float(c) for c in kj.p]
        r = _quat_rotate(qw[kj.parent], p_local)
        pw[b] = [pw[kj.parent][i] + r[i] for i in range(3)]
        qw[b] = _quat_mul(qw[kj.parent], q_local)
    return pw, qw


def dyn_next_lanes(km: _KModel, tau_f, nu: int, dt: float, use_squash: bool,
                   xx, ss, s_lb, s_ub, smooth):
    """Squash -> allocation -> free dynamics -> symplectic Euler (lane
    lists). The shared primal step of the linearization and rollout
    kernels."""
    n_rot = len(tau_f[0])
    u = _smooth_sat(ss, s_lb, s_ub, smooth) if use_squash else ss
    base = _matvec(tau_f, u[:n_rot])
    tau = base + u[n_rot:]
    a = _fwd_dyn(km, xx, tau)
    nq, nv = km.nq, km.nv
    v = xx[nq:]
    vnext = [v[i] + a[i] * dt for i in range(nv)]
    dx = [vnext[i] * dt for i in range(nv)] + [a[i] * dt for i in range(nv)]
    return _integrate(xx, dx, nq, nv)


def residual_rows_lanes(km: _KModel, slots, nu: int, xx, ss, srefs):
    """Stacked residual rows of all slots at one evaluation point.

    STATE/CONTROL plus the four operational-frame residual kinds (matching
    ocp.costs.residual semantics; the reference factory's cost types,
    /root/reference/src/factory/cost.cpp:37-169). Frame poses come from the
    quaternion-chain FK; relative rotations are quaternion products, so
    log3(Rref^T R) becomes quat_log(conj(qref) * qf) — identical math,
    no matrix-to-quaternion conversion in lane layout."""
    from ..ocp import costs as C

    nq, nv = km.nq, km.nv
    need_pose = any(sl.kind in (C.FRAME_PLACEMENT, C.FRAME_TRANSLATION,
                                C.FRAME_ROTATION) for sl in slots)
    need_vel = any(sl.kind == C.FRAME_VELOCITY for sl in slots)
    pw = qw = vel = None
    if need_pose:
        pw, qw = _fk_quat(km, xx)
    if need_vel:
        _, _, _, vel = _tree_kin(km, xx)

    def frame_pose(sl):
        b = sl.frame_body
        r = _quat_rotate(qw[b], [float(c) for c in sl.fp])
        p = [pw[b][i] + r[i] for i in range(3)]
        qf = _quat_mul(qw[b], [float(c) for c in sl.fRq])
        return p, qf

    rows = []
    for k, sl in enumerate(slots):
        ref = srefs[k]
        if sl.kind == C.STATE:
            rows.extend(_state_diff(ref, xx, nq, nv))
        elif sl.kind == C.CONTROL:
            # pre-squash input (reference semantics)
            rows.extend([ss[i] - ref[i] for i in range(nu)])
        elif sl.kind == C.FRAME_TRANSLATION:
            p, _ = frame_pose(sl)
            rows.extend([p[i] - ref[i] for i in range(3)])
        elif sl.kind == C.FRAME_ROTATION:
            _, qf = frame_pose(sl)
            rows.extend(_quat_log(_quat_mul(_quat_conj(ref), qf)))
        elif sl.kind == C.FRAME_PLACEMENT:
            p, qf = frame_pose(sl)
            pref, qref = ref[:3], ref[3:7]
            dp = [p[i] - pref[i] for i in range(3)]
            t_rel = _quat_rotate_inv(qref, dp)
            q_rel = _quat_mul(_quat_conj(qref), qf)
            rows.extend(_log6(t_rel, q_rel))
        elif sl.kind == C.FRAME_VELOCITY:
            b = sl.frame_body
            vf = _motion_to_child([float(c) for c in sl.fp],
                                  [[float(c) for c in row] for row in sl.fR],
                                  vel[b])
            rows.extend([vf[i] - ref[i] for i in range(6)])
        else:  # pragma: no cover
            raise ValueError(sl.kind)
    return rows


def node_cost_lanes(slots, dt: float, rows, w, act, actw, lbs, ubs):
    """Discrete running cost from pre-computed residual rows: sum over
    slots of dt * weight * active * activation(r)."""
    cost = None
    off = 0
    for k, sl in enumerate(slots):
        r = [rows[off + i] for i in range(sl.nr)]
        a, _, _ = _activation(sl.activation, r, actw[k], lbs[k], ubs[k])
        wk = dt * w[k] * act[k]
        cost = wk * a if cost is None else cost + wk * a
        off += sl.nr
    return cost


def _spec_slot_info(spec) -> Tuple[_SlotInfo, ...]:
    from ..ocp import costs as C

    infos = []
    for s in spec.slots:
        if s.kind in (C.FRAME_PLACEMENT, C.FRAME_TRANSLATION,
                      C.FRAME_ROTATION, C.FRAME_VELOCITY):
            fr = spec.model.frames[s.frame_id]
            infos.append(_SlotInfo(
                s.kind, s.activation, s.nr, s.ref_dim,
                frame_body=fr.body,
                fp=tuple(map(float, np.asarray(fr.p, float))),
                fRq=_np_rot_to_quat(fr.R),
                fR=tuple(map(tuple, np.asarray(fr.R, float)))))
        else:
            infos.append(_SlotInfo(s.kind, s.activation, s.nr, s.ref_dim))
    return tuple(infos)


_SUPPORTED_KINDS = None


def supported(spec) -> bool:
    """Kernel scope: free dynamics, Euler; all slot kinds except the
    friction cone (which needs the contact KKT forces)."""
    global _SUPPORTED_KINDS
    from ..ocp import costs as C
    from ..ocp import problem as P

    if _SUPPORTED_KINDS is None:
        _SUPPORTED_KINDS = (C.STATE, C.CONTROL, C.FRAME_PLACEMENT,
                            C.FRAME_TRANSLATION, C.FRAME_ROTATION,
                            C.FRAME_VELOCITY)
    return (spec.integrator == P.EULER and not spec.contacts
            and all(s.kind in _SUPPORTED_KINDS for s in spec.slots))


def _node_kernel(*refs, km: _KModel, slots: Tuple[_SlotInfo, ...],
                 tau_f: tuple, nu: int, dt: float, use_squash: bool):
    """One grid step: full linearization of BT nodes.

    Input refs (lane-trailing blocks): x (nx, BT), s (nu, BT),
    weight (K, BT), active (K, BT), smooth (1, BT), s_lb (nu, BT),
    s_ub (nu, BT), then per slot: ref_k, act_w_k, lb_k, ub_k.
    Output refs: cost (1, BT), xnext (nx, BT), Fx, Fu, Lx, Lu, Lxx, Lxu,
    Luu (matrix dims leading, BT trailing)."""
    from ..ocp import costs as C

    K = len(slots)
    n_in = 7 + 4 * K
    (x_r, s_r, w_r, act_r, smooth_r, slb_r, sub_r) = refs[:7]
    slot_refs = refs[7:n_in]
    (cost_o, xnext_o, Fx_o, Fu_o, Lx_o, Lu_o, Lxx_o, Lxu_o, Luu_o) = refs[n_in:]

    nq, nv = km.nq, km.nv
    nx = nq + nv
    ndx = 2 * nv
    nz = ndx + nu
    dtype = x_r.dtype

    x = [x_r[i] for i in range(nx)]
    s = [s_r[i] for i in range(nu)]
    smooth = smooth_r[0]
    s_lb = [slb_r[i] for i in range(nu)]
    s_ub = [sub_r[i] for i in range(nu)]
    srefs = []
    actw = []
    lbs = []
    ubs = []
    for k in range(K):
        srefs.append([slot_refs[4 * k][i] for i in range(slots[k].ref_dim)])
        actw.append([slot_refs[4 * k + 1][i] for i in range(slots[k].nr)])
        lbs.append([slot_refs[4 * k + 2][i] for i in range(slots[k].nr)])
        ubs.append([slot_refs[4 * k + 3][i] for i in range(slots[k].nr)])

    def dyn_next(xx, ss):
        return dyn_next_lanes(km, tau_f, nu, dt, use_squash, xx, ss,
                              s_lb, s_ub, smooth)

    def residual_rows(xx, ss):
        return residual_rows_lanes(km, slots, nu, xx, ss, srefs)

    # primal next state (constant inside fun, mirroring node_calc_diff)
    xnext0 = dyn_next(x, s)

    def fun(z):
        dx = [z[i] for i in range(ndx)]
        ds = [z[ndx + i] for i in range(nu)]
        xx = _integrate(x, dx, nq, nv)
        ss = [s[i] + ds[i] for i in range(nu)]
        xnext = dyn_next(xx, ss)
        rows = _state_diff(xnext0, xnext, nq, nv) + residual_rows(xx, ss)
        # tuple output: each row stays a (BT,) vector; J rows stay
        # leading-dim-indexable (no middle-dim slices downstream)
        return tuple(rows)

    z0 = jnp.zeros((nz,) + x[0].shape, dtype)
    val0, jvp = jax.linearize(fun, z0)
    basis = jnp.broadcast_to(
        jnp.eye(nz, dtype=dtype).reshape((nz, nz) + (1,) * x[0].ndim),
        (nz, nz) + x[0].shape)
    J_rows = jax.vmap(jvp)(basis)      # tuple of (nz, BT) rows

    # dynamics Jacobians
    Fx_o[...] = jnp.stack([J_rows[i][:ndx] for i in range(ndx)], axis=0)
    Fu_o[...] = jnp.stack([J_rows[i][ndx:] for i in range(ndx)], axis=0)
    xnext_o[...] = jnp.stack(xnext0, axis=0)

    # Gauss-Newton assembly over the stacked residual rows
    cost = None
    g = None                    # (nz, BT)
    H = None                    # (nz, nz, BT)
    off = ndx
    for k, sl in enumerate(slots):
        r = [val0[off + i] for i in range(sl.nr)]
        a, Ar, Arr = _activation(sl.activation, r, actw[k], lbs[k], ubs[k])
        wk = dt * w_r[k] * act_r[k]
        cost = wk * a if cost is None else cost + wk * a
        for i in range(sl.nr):
            Jr = J_rows[off + i]              # (nz, BT)
            gi = (wk * Ar[i]) * Jr
            g = gi if g is None else g + gi
            hi = (wk * Arr[i]) * (Jr[:, None] * Jr[None, :])
            H = hi if H is None else H + hi
        off += sl.nr

    cost_o[...] = cost[None]
    Lx_o[...] = g[:ndx]
    Lu_o[...] = g[ndx:]
    Lxx_o[...] = H[:ndx, :ndx]
    Lxu_o[...] = H[:ndx, ndx:]
    Luu_o[...] = H[ndx:, ndx:]


# ---------------------------------------------------------------------------
# host-side wrapper: flatten (B, T) nodes into lanes, pad, call, unflatten
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=32)
def _kernel_builder(spec, BT: int, dtype_name: str):
    km = _build_kmodel(spec.model)
    slots = _spec_slot_info(spec)
    tau_f = spec.tau_f
    nu, nx = spec.nu, spec.model.nx
    ndx = spec.state.ndx
    K = len(slots)
    dtype = jnp.dtype(dtype_name)

    kern = functools.partial(_node_kernel, km=km, slots=slots, tau_f=tau_f,
                             nu=nu, dt=float(spec.dt),
                             use_squash=spec.use_squash)

    def mk2(d):
        return pl.BlockSpec((d, BT), lambda i: (0, i))

    def mk3(d1, d2):
        return pl.BlockSpec((d1, d2, BT), lambda i: (0, 0, i))

    in_specs = [mk2(nx), mk2(nu), mk2(K), mk2(K), mk2(1), mk2(nu), mk2(nu)]
    for sl in slots:
        in_specs += [mk2(max(sl.ref_dim, 1)), mk2(sl.nr), mk2(sl.nr),
                     mk2(sl.nr)]
    out_specs = [mk2(1), mk2(nx), mk3(ndx, ndx), mk3(ndx, nu), mk2(ndx),
                 mk2(nu), mk3(ndx, ndx), mk3(ndx, nu), mk3(nu, nu)]

    def call(Np, inputs):
        nb = Np // BT
        out_shape = [
            jax.ShapeDtypeStruct((1, Np), dtype),
            jax.ShapeDtypeStruct((nx, Np), dtype),
            jax.ShapeDtypeStruct((ndx, ndx, Np), dtype),
            jax.ShapeDtypeStruct((ndx, nu, Np), dtype),
            jax.ShapeDtypeStruct((ndx, Np), dtype),
            jax.ShapeDtypeStruct((nu, Np), dtype),
            jax.ShapeDtypeStruct((ndx, ndx, Np), dtype),
            jax.ShapeDtypeStruct((ndx, nu, Np), dtype),
            jax.ShapeDtypeStruct((nu, nu, Np), dtype),
        ]
        interpret = _interpret()
        return pl.pallas_call(
            kern,
            grid=(nb,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
            # the linearize-under-vmap tangent pass keeps a deep live set of
            # (27, BT) intermediates: the default 16M scoped-vmem limit
            # overflows (measured 21.4M at the flagship shape) — raise it
            # (v5e VMEM is 128M; 64M leaves pipeline headroom)
            compiler_params=(pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=64 * 1024 * 1024) if not interpret else None),
        )(*inputs)

    return call


def _calc_diff_lanes(spec, xs_n, us_n, weight_n, active_n, refs_n, act_w,
                     lb, ub, smooth, s_lb, s_ub):
    """Batched node linearization via the Pallas kernel.

    Node-axis-leading inputs: xs_n/us_n (N, nx/nu); weight/active (N, K);
    refs_n per slot (N, ref_dim); act_w/lb/ub per slot (N, nr); smooth (N,);
    s_lb/s_ub (N, nu). Returns NodeDerivatives with leading N."""
    from ..ocp import problem as P

    N = xs_n.shape[0]
    dtype = xs_n.dtype
    # lane-tile size: 256 amortizes per-op overhead (~10% over 128 at the
    # flagship shape) but doubles the tangent-pass VMEM stack, which scales
    # with the model and the slot set: measured 21.4M at BT=128 for
    # nz=27/nj=3, 101M at BT=256 for nz=33/nj=5, and an over-limit stack at
    # BT=256 for the frame-cost weighted spec once the backward kernel
    # shares the program — big models and frame-FK specs stay at 128 lanes
    from ..ocp import costs as _C
    nz = spec.state.ndx + spec.nu
    has_frames = any(s.kind not in (_C.STATE, _C.CONTROL)
                     for s in spec.slots)
    BT = int(os.environ.get("EAGLE_MPC_TPU_NODE_BT", "0")) or \
        (2 * LANES if (N >= 2 * LANES and nz <= 28 and not has_frames)
         else LANES)
    Np = ((N + BT - 1) // BT) * BT

    def lanes(a):
        # (N, d...) -> (d..., Np), edge-padded so padded lanes stay finite
        a = jnp.moveaxis(a, 0, -1)
        if Np != N:
            pad = [(0, 0)] * (a.ndim - 1) + [(0, Np - N)]
            a = jnp.pad(a, pad, mode="edge")
        return a

    inputs = [lanes(xs_n), lanes(us_n), lanes(weight_n), lanes(active_n),
              lanes(smooth[:, None]), lanes(s_lb), lanes(s_ub)]
    for k in range(len(spec.slots)):
        rk = refs_n[k]
        if rk.shape[-1] == 0:   # ref-less slot: dummy lane row
            rk = jnp.zeros(rk.shape[:-1] + (1,), dtype)
        inputs += [lanes(rk), lanes(act_w[k]), lanes(lb[k]), lanes(ub[k])]

    call = _kernel_builder(spec, BT, jnp.dtype(dtype).name)
    outs = call(Np, inputs)

    def unlanes(a):
        return jnp.moveaxis(a[..., :N], -1, 0)

    cost, xnext, Fx, Fu, Lx, Lu, Lxx, Lxu, Luu = outs
    return P.NodeDerivatives(
        cost=unlanes(cost)[:, 0], xnext=unlanes(xnext),
        Fx=unlanes(Fx), Fu=unlanes(Fu), Lx=unlanes(Lx), Lu=unlanes(Lu),
        Lxx=unlanes(Lxx), Lxu=unlanes(Lxu), Luu=unlanes(Luu))


# ---------------------------------------------------------------------------
# custom_vmap dispatch: XLA per-node path unbatched, Pallas when vmapped
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=32)
def _dispatcher(spec):
    from ..ocp import problem as P

    T = spec.T
    K = len(spec.slots)

    def xla_path(xs, us, weight, active, refs, act_w, lb, ub, smooth,
                 s_lb, s_ub):
        glob = P.GlobalParams(act_w=act_w, lb=lb, ub=ub,
                              squash_smooth=smooth, s_lb=s_lb, s_ub=s_ub)

        def one(w_t, a_t, r_t, x, u):
            view = P.NodeView(w_t, a_t, r_t, None, ())
            return P.node_calc_diff(spec, view, glob, x, u)

        return jax.vmap(one)((weight), (active), tuple(refs), xs, us)

    @jax.custom_batching.custom_vmap
    def core(xs, us, weight, active, refs, act_w, lb, ub, smooth,
             s_lb, s_ub):
        """Unbatched: (T, ...) node arrays -> NodeDerivatives (T, ...)."""
        return xla_path(xs, us, weight, active, refs, act_w, lb, ub,
                        smooth, s_lb, s_ub)

    @core.def_vmap
    def _core_vmap(axis_size, in_batched, xs, us, weight, active, refs,
                   act_w, lb, ub, smooth, s_lb, s_ub):
        B = axis_size

        def bc(x, batched):
            x = jnp.asarray(x)
            return x if batched else jnp.broadcast_to(x[None],
                                                      (B,) + x.shape)

        (xsb, usb, wb, ab) = (bc(a, f) for a, f in zip(
            (xs, us, weight, active), in_batched[:4]))
        refsb = tuple(bc(r, f) for r, f in zip(refs, in_batched[4]))
        awb = tuple(bc(r, f) for r, f in zip(act_w, in_batched[5]))
        lbb = tuple(bc(r, f) for r, f in zip(lb, in_batched[6]))
        ubb = tuple(bc(r, f) for r, f in zip(ub, in_batched[7]))
        smoothb = bc(smooth, in_batched[8])
        slbb = bc(s_lb, in_batched[9])
        subb = bc(s_ub, in_batched[10])

        N = B * T
        flat = lambda a: a.reshape((N,) + a.shape[2:])
        # per-problem glob params broadcast over the T node axis
        rep = lambda a: flat(jnp.broadcast_to(a[:, None],
                                              (B, T) + a.shape[1:]))
        derivs = _calc_diff_lanes(
            spec, flat(xsb), flat(usb), flat(wb), flat(ab),
            tuple(flat(r) for r in refsb),
            tuple(rep(a) for a in awb), tuple(rep(a) for a in lbb),
            tuple(rep(a) for a in ubb), rep(smoothb[:, None])[:, 0],
            rep(slbb), rep(subb))
        unflat = lambda a: a.reshape((B, T) + a.shape[1:])
        out = jax.tree_util.tree_map(unflat, derivs)
        return out, jax.tree_util.tree_map(lambda _: True, out)

    return core


def calc_diff_running(spec, params, xs, us):
    """Drop-in for the running-node part of ``P.calc_diff_all`` — dispatches
    to the fused kernel under vmap (scenario batches), XLA otherwise."""
    from ..ocp import problem as P

    T = spec.T
    node = params.node
    core = _dispatcher(spec)
    return core(xs[:T], us, node.weight[:T], node.active[:T],
                tuple(r[:T] for r in node.refs),
                tuple(params.glob.act_w), tuple(params.glob.lb),
                tuple(params.glob.ub), params.glob.squash_smooth,
                params.glob.s_lb, params.glob.s_ub)
