"""Independent NumPy oracle: a slow, dumb, obviously-correct re-derivation
of the whole solve pipeline, used to cross-check the XLA solver.

Redundancy-channel analog of the reference's pure-Python ``SolverSquashFDDP``
(/root/reference/bindings/python/eagle_mpc/utils/solver_squash.py:59-79),
taken further because this repo also replaces Crocoddyl/Pinocchio: every
layer is re-derived with DIFFERENT formulations so a shared bug is unlikely:

- dynamics: classical world-frame Newton-Euler vector mechanics (forces at
  the COM, torques projected on world joint axes) — the package uses
  body-local Featherstone spatial algebra (dynamics/rbd.py);
- mass matrix: RNEA columns ``M e_i = rnea(q, 0, e_i) - rnea(q, 0, 0)`` —
  the package uses CRBA;
- derivatives: central finite differences on the manifold — the package
  uses forward-mode autodiff;
- solver: plain sequential Python loops with numpy linalg — the package is
  a vmapped XLA program with masked while_loops.

Conventions shared with the package (they are the SPEC, fixed by pinocchio/
crocoddyl usage in the reference, /root/reference/src/trajectory.cpp:47-52):
state x = [p, quat(x,y,z,w), q_joints | v_lin_local, omega_local, qdot];
tangent dx = [xi_SE3 (6), dq_j | dv]; tau = [base wrench (local), joint
torques]; costs are Gauss-Newton (residual-Jacobian) quadratics.

Pure NumPy — jax is never imported here.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# Quaternions (x, y, z, w) and SE(3)
# ---------------------------------------------------------------------------

def quat_mul(a, b):
    ax, ay, az, aw = a
    bx, by, bz, bw = b
    return np.array([
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
        aw * bw - ax * bx - ay * by - az * bz,
    ])


def quat_conj(q):
    return np.array([-q[0], -q[1], -q[2], q[3]])


def quat_to_rot(q):
    x, y, z, w = q / np.linalg.norm(q)
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])


def quat_exp(w):
    """Rotation-vector -> quaternion."""
    t = np.linalg.norm(w)
    if t < 1e-12:
        v = 0.5 * w
        return np.array([v[0], v[1], v[2], 1.0]) / math.sqrt(1 + v @ v)
    axis = w / t
    s = math.sin(t / 2)
    return np.array([axis[0] * s, axis[1] * s, axis[2] * s, math.cos(t / 2)])


def quat_log(q):
    """Quaternion -> rotation vector."""
    q = q / np.linalg.norm(q)
    if q[3] < 0:
        q = -q
    n = np.linalg.norm(q[:3])
    if n < 1e-12:
        return 2.0 * q[:3]
    return 2.0 * math.atan2(n, q[3]) * q[:3] / n


def hat(w):
    return np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0.0]])


def se3_exp(xi):
    """Twist [v, w] -> (p, quat)."""
    v, w = xi[:3], xi[3:]
    t = np.linalg.norm(w)
    W = hat(w)
    if t < 1e-8:
        V = np.eye(3) + 0.5 * W + W @ W / 6.0
    else:
        V = (np.eye(3) + (1 - math.cos(t)) / t**2 * W
             + (t - math.sin(t)) / t**3 * (W @ W))
    return V @ v, quat_exp(w)


def se3_log(p, q):
    w = quat_log(q)
    t = np.linalg.norm(w)
    W = hat(w)
    if t < 1e-8:
        Vinv = np.eye(3) - 0.5 * W + W @ W / 12.0
    else:
        Vinv = (np.eye(3) - 0.5 * W
                + (1 - t * math.cos(t / 2) / (2 * math.sin(t / 2))) / t**2 * (W @ W))
    return np.concatenate([Vinv @ p, w])


# ---------------------------------------------------------------------------
# State manifold
# ---------------------------------------------------------------------------

class StateNp:
    def __init__(self, nq: int, nv: int):
        self.nq, self.nv = nq, nv
        self.nx = nq + nv
        self.ndx = 2 * nv

    def integrate(self, x, dx):
        p, quat, qj = x[:3], x[3:7], x[7:self.nq]
        v = x[self.nq:]
        ep, eq = se3_exp(dx[:6])
        p2 = p + quat_to_rot(quat) @ ep
        q2 = quat_mul(quat, eq)
        return np.concatenate([p2, q2 / np.linalg.norm(q2),
                               qj + dx[6:self.nv], v + dx[self.nv:]])

    def diff(self, x0, x1):
        p0, q0 = x0[:3], x0[3:7]
        p1, q1 = x1[:3], x1[3:7]
        R0 = quat_to_rot(q0)
        dp = R0.T @ (p1 - p0)
        dq = quat_mul(quat_conj(q0), q1)
        xi = se3_log(dp, dq)
        return np.concatenate([xi, x1[7:self.nq] - x0[7:self.nq],
                               x1[self.nq:] - x0[self.nq:]])


# ---------------------------------------------------------------------------
# World-frame Newton-Euler dynamics
# ---------------------------------------------------------------------------

class DynamicsNp:
    """Classical vector-mechanics rigid-body dynamics over the same
    RobotModel data (tree structure + per-body spatial inertias)."""

    def __init__(self, model):
        self.model = model
        self.nj = model.nj
        self.nv = model.nv
        # unpack spatial inertias: [[m I, (m hat(c))^T], [m hat(c), I_origin]]
        self.mass, self.com, self.I_com = [], [], []
        for b in range(self.nj + 1):
            I6 = np.asarray(model.inertia[b], dtype=np.float64)
            m = I6[0, 0]
            mc = np.array([I6[5, 1], I6[3, 2], I6[4, 0]])
            c = mc / m if m > 0 else np.zeros(3)
            I_origin = I6[3:, 3:]
            Ic = I_origin + m * hat(c) @ hat(c)   # parallel axis to COM
            self.mass.append(m)
            self.com.append(c)
            self.I_com.append(Ic)
        self.g = np.array([0.0, 0.0, -model.gravity])

    def _fk(self, q):
        """World pose of every body + world joint axes/anchors."""
        m = self.model
        pw = [q[:3]]
        Rw = [quat_to_rot(q[3:7])]
        axis_w, anchor_w = [], []
        for j in range(self.nj):
            jp = np.asarray(m.joint_p[j])
            jR = np.asarray(m.joint_R[j])
            a = np.asarray(m.joint_axis[j])
            parent = m.parent[j]
            if m.joint_type[j] == 0:      # REVOLUTE (model.REVOLUTE == 0)
                Rj = jR @ _rodrigues(a, q[7 + j])
                pj = jp
            else:                          # PRISMATIC
                Rj = jR
                pj = jp + jR @ (a * q[7 + j])
            pw.append(pw[parent] + Rw[parent] @ pj)
            Rw.append(Rw[parent] @ Rj)
            anchor_w.append(pw[parent] + Rw[parent] @ jp)
            axis_w.append(Rw[-1] @ a)     # axis in the CHILD frame -> world
        return pw, Rw, axis_w, anchor_w

    def _vel_acc(self, q, v, a):
        """World angular/linear velocity + acceleration of every body frame
        origin. ``v``/``a`` in the package's tangent layout (base twist and
        its derivative in the base LOCAL frame)."""
        m = self.model
        pw, Rw, axis_w, anchor_w = self._fk(q)
        R0 = Rw[0]
        w = [R0 @ v[3:6]]
        vel = [R0 @ v[:3]]
        wd = [R0 @ a[3:6]]
        # d/dt (R0 v_local) = R0 a_local + w x (R0 v_local)
        vd = [R0 @ a[:3] + np.cross(w[0], vel[0])]
        for j in range(self.nj):
            parent = m.parent[j]
            r = pw[j + 1] - pw[parent]
            if m.joint_type[j] == 0:  # revolute
                wj = w[parent] + axis_w[j] * v[6 + j]
                vj = vel[parent] + np.cross(w[parent], r)
                # axis_w moves with the parent+joint rotation
                axis_dot = np.cross(wj, axis_w[j])
                wdj = wd[parent] + axis_w[j] * a[6 + j] + np.cross(w[parent], axis_w[j]) * v[6 + j]
                vdj = (vd[parent] + np.cross(wd[parent], r)
                       + np.cross(w[parent], np.cross(w[parent], r)))
                del axis_dot
            else:  # prismatic
                wj = w[parent]
                vj = (vel[parent] + np.cross(w[parent], r)
                      + axis_w[j] * v[6 + j])
                wdj = wd[parent]
                vdj = (vd[parent] + np.cross(wd[parent], r)
                       + np.cross(w[parent], np.cross(w[parent], r))
                       + axis_w[j] * a[6 + j]
                       + 2 * np.cross(w[parent], axis_w[j] * v[6 + j]))
            w.append(wj)
            vel.append(vj)
            wd.append(wdj)
            vd.append(vdj)
        return pw, Rw, axis_w, anchor_w, w, vel, wd, vd

    def rnea(self, q, v, a):
        """tau such that the tree undergoes tangent acceleration ``a`` under
        gravity; layout [base wrench (local, [f; torque]), joint torques]."""
        m = self.model
        (pw, Rw, axis_w, anchor_w, w, vel, wd, vd) = self._vel_acc(q, v, a)
        # per-body force/torque at its COM (world frame)
        F, T, pcom = [], [], []
        for b in range(self.nj + 1):
            c_w = Rw[b] @ self.com[b]
            p_c = pw[b] + c_w
            a_c = vd[b] + np.cross(wd[b], c_w) + np.cross(w[b], np.cross(w[b], c_w))
            I_w = Rw[b] @ self.I_com[b] @ Rw[b].T
            F.append(self.mass[b] * (a_c - self.g))
            T.append(I_w @ wd[b] + np.cross(w[b], I_w @ w[b]))
            pcom.append(p_c)
        # subtree force accumulation
        subtree = [[b] for b in range(self.nj + 1)]
        for j in reversed(range(self.nj)):
            subtree[m.parent[j]].extend(subtree[j + 1])
        tau = np.zeros(self.nv)
        for j in range(self.nj):
            tj = 0.0
            for b in subtree[j + 1]:
                if m.joint_type[j] == 0:   # revolute: moment about the anchor
                    tj += axis_w[j] @ (T[b] + np.cross(pcom[b] - anchor_w[j], F[b]))
                else:                       # prismatic: force along the axis
                    tj += axis_w[j] @ F[b]
            tau[6 + j] = tj
        f_tot = np.sum(F, axis=0)
        t_tot = np.zeros(3)
        for b in range(self.nj + 1):
            t_tot += T[b] + np.cross(pcom[b] - pw[0], F[b])
        R0 = Rw[0]
        tau[:3] = R0.T @ f_tot
        tau[3:6] = R0.T @ t_tot
        return tau

    def mass_matrix(self, q):
        """M from RNEA columns (the dumb, obviously-correct construction)."""
        nv = self.nv
        b0 = self.rnea(q, np.zeros(nv), np.zeros(nv))
        M = np.zeros((nv, nv))
        for i in range(nv):
            e = np.zeros(nv)
            e[i] = 1.0
            M[:, i] = self.rnea(q, np.zeros(nv), e) - b0
        return 0.5 * (M + M.T)

    def fwd_dynamics(self, q, v, tau):
        M = self.mass_matrix(q)
        b = self.rnea(q, v, np.zeros(self.nv))
        return np.linalg.solve(M, tau - b)

    # frame kinematics for costs -------------------------------------------
    def frame_placement(self, q, frame_id):
        f = self.model.frames[frame_id]
        pw, Rw, _, _ = self._fk(q)
        return pw[f.body] + Rw[f.body] @ np.asarray(f.p), Rw[f.body] @ np.asarray(f.R)

    def frame_velocity_local(self, q, v, frame_id):
        f = self.model.frames[frame_id]
        (pw, Rw, _, _, w, vel, _, _) = self._vel_acc(q, v, np.zeros(self.nv))
        b = f.body
        p_f = pw[b] + Rw[b] @ np.asarray(f.p)
        R_f = Rw[b] @ np.asarray(f.R)
        v_f = vel[b] + np.cross(w[b], p_f - pw[b])
        return np.concatenate([R_f.T @ v_f, R_f.T @ w[b]])

    # contact dynamics (independent formulations of the rbd.py kernels) ----
    def frame_jacobian_local(self, q, frame_id):
        """J (6, nv) by columns — the frame twist is linear in v."""
        J = np.zeros((6, self.nv))
        for i in range(self.nv):
            e = np.zeros(self.nv)
            e[i] = 1.0
            J[:, i] = self.frame_velocity_local(q, e, frame_id)
        return J

    def frame_accel_drift(self, q, v, frame_id, eps=1e-6):
        """Jdot v: central difference of the body-frame twist along the
        configuration flow (rbd.frame_accel_drift uses a manifold jvp)."""
        st = StateNp(self.model.nq, self.nv)
        x = np.concatenate([q, v])
        dx = np.concatenate([v * eps, np.zeros(self.nv)])
        qp = st.integrate(x, dx)[: self.model.nq]
        qm = st.integrate(x, -dx)[: self.model.nq]
        return (self.frame_velocity_local(qp, v, frame_id)
                - self.frame_velocity_local(qm, v, frame_id)) / (2 * eps)

    def contact_fwd_dynamics_kkt(self, q, v, tau, J, a0, active):
        """Constrained dynamics by the DENSE KKT system over the active rows

            [[M, -Ja^T], [Ja, 0]] [a; lam_a] = [tau - b; -a0_a]

        — deliberately not the masked Schur complement of
        rbd.contact_fwd_dynamics, so the two can cross-check each other.
        Returns (a, lam) with lam zero on inactive rows."""
        M = self.mass_matrix(q)
        b = self.rnea(q, v, np.zeros(self.nv))
        idx = np.where(np.asarray(active) > 0.5)[0]
        nv, nc = self.nv, len(idx)
        lam = np.zeros(J.shape[0])
        if nc == 0:
            return np.linalg.solve(M, tau - b), lam
        K = np.zeros((nv + nc, nv + nc))
        K[:nv, :nv] = M
        K[:nv, nv:] = -J[idx].T
        K[nv:, :nv] = J[idx]
        sol = np.linalg.solve(K, np.concatenate([tau - b, -a0[idx]]))
        lam[idx] = sol[nv:]
        return sol[:nv], lam


def _rodrigues(axis, angle):
    W = hat(axis)
    return np.eye(3) + math.sin(angle) * W + (1 - math.cos(angle)) * (W @ W)


# ---------------------------------------------------------------------------
# Problem evaluation (costs from the ProblemSpec/ProblemParams pytrees)
# ---------------------------------------------------------------------------

class OracleProblem:
    """NumPy evaluation of a StackedProblem (spec, params) — symplectic
    Euler only (every MPC config and the oracle test missions use Euler)."""

    def __init__(self, spec, params):
        if spec.integrator != "euler":
            raise NotImplementedError("oracle supports the Euler integrator")
        self.spec = spec
        self.state = StateNp(spec.model.nq, spec.model.nv)
        self.dyn = DynamicsNp(spec.model)
        self.tau_f = np.asarray(spec.tau_f, dtype=np.float64)
        leaves = lambda t: np.asarray(t, dtype=np.float64)
        self.x0 = leaves(params.x0)
        self.weight = leaves(params.node.weight)
        self.active = leaves(params.node.active)
        self.refs = [leaves(r) for r in params.node.refs]
        self.act_w = [leaves(a) for a in params.glob.act_w]
        self.lb = [leaves(a) for a in params.glob.lb]
        self.ub = [leaves(a) for a in params.glob.ub]
        self.s_lb = leaves(params.glob.s_lb)
        self.s_ub = leaves(params.glob.s_ub)
        self.smooth = float(params.glob.squash_smooth)
        if spec.contacts:
            self.contact_active = leaves(params.node.contact_active)
            self.contact_refs = [leaves(r) for r in params.node.contact_refs]

    # -- squash / actuation --------------------------------------------------
    def squash(self, s):
        if not self.spec.use_squash:
            return s
        d = self.smooth * (self.s_ub - self.s_lb)
        a = d * d
        return 0.5 * (np.sqrt(a + (s - self.s_lb) ** 2)
                      - np.sqrt(a + (s - self.s_ub) ** 2) + self.s_lb + self.s_ub)

    def _tau(self, s):
        u = self.squash(s)
        n_rot = self.tau_f.shape[1]
        return np.concatenate([self.tau_f @ u[:n_rot], u[n_rot:]])

    # -- contact-constrained dynamics ------------------------------------------
    def _contact_rows(self, t, x):
        """Stacked constraint rows at node t (mirrors problem._contact_rows:
        LOCAL-frame point/spatial acceleration with Baumgarte terms)."""
        st = self.state
        q, v = x[: st.nq], x[st.nq :]
        Js, a0s, acts = [], [], []
        for ci, c in enumerate(self.spec.contacts):
            J6 = self.dyn.frame_jacobian_local(q, c.frame_id)
            drift = self.dyn.frame_accel_drift(q, v, c.frame_id)
            vf = self.dyn.frame_velocity_local(q, v, c.frame_id)
            p, R = self.dyn.frame_placement(q, c.frame_id)
            ref = self.contact_refs[ci][t]
            kp, kd = c.gains
            if c.dim == 3:
                a0 = (drift[:3] + np.cross(vf[3:], vf[:3])
                      + kp * (R.T @ (p - ref[:3])) + kd * vf[:3])
                Js.append(J6[:3])
            else:
                Rref = quat_to_rot(ref[3:7])
                err = se3_log(Rref.T @ (p - ref[:3]),
                              rot_to_quat_np(Rref.T @ R))
                a0 = drift + kp * err + kd * vf
                Js.append(J6)
            a0s.append(a0)
            acts.append(np.full(c.dim, self.contact_active[t, ci]))
        return np.vstack(Js), np.concatenate(a0s), np.concatenate(acts)

    def _fwd(self, t, x, tau):
        """(a, lam): free or contact-constrained forward dynamics."""
        st = self.state
        q, v = x[: st.nq], x[st.nq :]
        if not self.spec.contacts:
            return self.dyn.fwd_dynamics(q, v, tau), np.zeros(0)
        J, a0, active = self._contact_rows(t, x)
        return self.dyn.contact_fwd_dynamics_kkt(q, v, tau, J, a0, active)

    def _contact_force_local(self, t, x, s, contact_id):
        _, lam = self._fwd(t, x, self._tau(s))
        off = 0
        for ci, c in enumerate(self.spec.contacts):
            if ci == contact_id:
                return lam[off : off + c.dim]
            off += c.dim
        raise KeyError(contact_id)

    # -- residuals / activations ---------------------------------------------
    def _residual(self, slot, ref, x, s, terminal, t=0):
        st = self.state
        k = slot.kind
        if k == "state":
            return self.state.diff(ref, x)
        if k == "control":
            if terminal:
                return np.zeros(slot.nr)
            return s - ref
        if k == "friction_cone":
            if terminal or not self.spec.contacts or slot.contact_id < 0:
                return np.zeros(slot.nr)
            f_local = self._contact_force_local(t, x, s, slot.contact_id)
            _, R = self.dyn.frame_placement(
                x[: st.nq], self.spec.contacts[slot.contact_id].frame_id)
            A = np.asarray(slot.cone_A, dtype=np.float64)
            return A @ (R @ f_local[:3])
        q = x[:st.nq]
        if k == "frame_translation":
            p, _ = self.dyn.frame_placement(q, slot.frame_id)
            return p - ref
        if k == "frame_rotation":
            _, R = self.dyn.frame_placement(q, slot.frame_id)
            Rref = quat_to_rot(ref)
            from_R = Rref.T @ R
            return quat_log(rot_to_quat_np(from_R))
        if k == "frame_placement":
            p, R = self.dyn.frame_placement(q, slot.frame_id)
            pref, qref = ref[:3], ref[3:7]
            Rref = quat_to_rot(qref)
            return se3_log(Rref.T @ (p - pref), rot_to_quat_np(Rref.T @ R))
        if k == "frame_velocity":
            return self.dyn.frame_velocity_local(q, x[st.nq:], slot.frame_id) - ref
        raise NotImplementedError(k)

    def _activation(self, kind, r, w, lb, ub):
        if kind == "quad":
            return 0.5 * r @ r
        if kind == "wquad":
            return 0.5 * (w * r) @ r
        viol = np.minimum(r - lb, 0.0) + np.maximum(r - ub, 0.0)
        if kind == "qbarrier":
            return 0.5 * viol @ viol
        if kind == "wqbarrier":
            return 0.5 * (w * viol) @ viol
        raise NotImplementedError(kind)

    def point_cost(self, t, x, s, terminal):
        total = 0.0
        for k, slot in enumerate(self.spec.slots):
            wk = self.weight[t, k] * self.active[t, k]
            if wk == 0.0:
                continue
            r = self._residual(slot, self.refs[k][t], x, s, terminal, t)
            total += wk * self._activation(slot.activation, r,
                                           self.act_w[k], self.lb[k], self.ub[k])
        return total

    # -- node evaluation -------------------------------------------------------
    def node_calc(self, t, x, s):
        """(xnext, cost): symplectic Euler, cost quadrature dt * l(x, s).
        Contact nodes use the dense-KKT constrained dynamics."""
        st = self.state
        dt = self.spec.dt
        a, _ = self._fwd(t, x, self._tau(s))
        v = x[st.nq:]
        vnext = v + a * dt
        dx = np.concatenate([vnext * dt, a * dt])
        return self.state.integrate(x, dx), dt * self.point_cost(t, x, s, False)

    def terminal_cost(self, x):
        return self.point_cost(self.spec.T, x, np.zeros(self.spec.nu), True)

    def total_cost(self, xs, us):
        c = sum(self.node_calc(t, xs[t], us[t])[1] for t in range(self.spec.T))
        return c + self.terminal_cost(xs[self.spec.T])

    # -- finite-difference derivatives (central, manifold) ---------------------
    def node_calc_diff(self, t, x, s, eps=1e-6):
        st = self.state
        ndx, nu = st.ndx, self.spec.nu
        xnext0, _ = self.node_calc(t, x, s)

        def perturbed(i, h):
            if i < ndx:
                dz = np.zeros(ndx)
                dz[i] = h
                return self.state.integrate(x, dz), s
            ds = np.zeros(nu)
            ds[i - ndx] = h
            return x, s + ds

        # dynamics Jacobians
        Fxu = np.zeros((ndx, ndx + nu))
        for i in range(ndx + nu):
            xp, sp = perturbed(i, eps)
            xm, sm = perturbed(i, -eps)
            fp, _ = self.node_calc(t, xp, sp)
            fm, _ = self.node_calc(t, xm, sm)
            Fxu[:, i] = self.state.diff(xnext0, fp) / (2 * eps) \
                - self.state.diff(xnext0, fm) / (2 * eps)
        Fx, Fu = Fxu[:, :ndx], Fxu[:, ndx:]

        # Gauss-Newton cost derivatives from residual Jacobians
        g = np.zeros(ndx + nu)
        H = np.zeros((ndx + nu, ndx + nu))
        cost = 0.0
        dtc = self.spec.dt
        for k, slot in enumerate(self.spec.slots):
            wk = dtc * self.weight[t, k] * self.active[t, k]
            if wk == 0.0:
                continue
            r0 = self._residual(slot, self.refs[k][t], x, s, False, t)
            Jr = np.zeros((slot.nr, ndx + nu))
            for i in range(ndx + nu):
                xp, sp = perturbed(i, eps)
                xm, sm = perturbed(i, -eps)
                rp = self._residual(slot, self.refs[k][t], xp, sp, False, t)
                rm = self._residual(slot, self.refs[k][t], xm, sm, False, t)
                Jr[:, i] = (rp - rm) / (2 * eps)
            a, Ar, Arr = self._act_derivs(slot.activation, r0, k)
            cost += wk * a
            g += wk * (Jr.T @ Ar)
            H += wk * (Jr.T @ (Arr[:, None] * Jr))
        return dict(xnext=xnext0, cost=cost, Fx=Fx, Fu=Fu,
                    Lx=g[:ndx], Lu=g[ndx:],
                    Lxx=H[:ndx, :ndx], Lxu=H[:ndx, ndx:], Luu=H[ndx:, ndx:])

    def terminal_calc_diff(self, x, eps=1e-6):
        st = self.state
        ndx = st.ndx
        Lx = np.zeros(ndx)
        Lxx = np.zeros((ndx, ndx))
        cost = 0.0
        t = self.spec.T
        s0 = np.zeros(self.spec.nu)
        for k, slot in enumerate(self.spec.slots):
            wk = self.weight[t, k] * self.active[t, k]
            if wk == 0.0:
                continue
            r0 = self._residual(slot, self.refs[k][t], x, s0, True)
            Jr = np.zeros((slot.nr, ndx))
            for i in range(ndx):
                dz = np.zeros(ndx)
                dz[i] = eps
                rp = self._residual(slot, self.refs[k][t],
                                    self.state.integrate(x, dz), s0, True, t)
                dz[i] = -eps
                rm = self._residual(slot, self.refs[k][t],
                                    self.state.integrate(x, dz), s0, True, t)
                Jr[:, i] = (rp - rm) / (2 * eps)
            a, Ar, Arr = self._act_derivs(slot.activation, r0, k)
            cost += wk * a
            Lx += wk * (Jr.T @ Ar)
            Lxx += wk * (Jr.T @ (Arr[:, None] * Jr))
        return cost, Lx, Lxx

    def _act_derivs(self, kind, r, k):
        w, lb, ub = self.act_w[k], self.lb[k], self.ub[k]
        if kind == "quad":
            return 0.5 * r @ r, r, np.ones_like(r)
        if kind == "wquad":
            return 0.5 * (w * r) @ r, w * r, w
        viol = np.minimum(r - lb, 0.0) + np.maximum(r - ub, 0.0)
        mask = (viol != 0.0).astype(float)
        if kind == "qbarrier":
            return 0.5 * viol @ viol, viol, mask
        return 0.5 * (w * viol) @ viol, w * viol, w * mask


def rot_to_quat_np(R):
    """Rotation matrix -> quaternion (x, y, z, w), Shepperd's method."""
    t = np.trace(R)
    if t > 0:
        s = math.sqrt(t + 1.0) * 2
        return np.array([(R[2, 1] - R[1, 2]) / s, (R[0, 2] - R[2, 0]) / s,
                         (R[1, 0] - R[0, 1]) / s, 0.25 * s])
    i = int(np.argmax(np.diag(R)))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = math.sqrt(max(R[i, i] - R[j, j] - R[k, k] + 1.0, 1e-16)) * 2
    quat = np.zeros(4)
    quat[i] = 0.25 * s
    quat[j] = (R[j, i] + R[i, j]) / s
    quat[k] = (R[k, i] + R[i, k]) / s
    quat[3] = (R[k, j] - R[j, k]) / s
    return quat


# ---------------------------------------------------------------------------
# Sequential FDDP / SbFDDP
# ---------------------------------------------------------------------------

def _cho_solve(L, b):
    """Solve L L^T x = b (b vector or matrix)."""
    y = np.linalg.solve(L, b)
    return np.linalg.solve(L.T, y)

@dataclass
class OracleTrace:
    cost: List[float] = field(default_factory=list)
    steplength: List[float] = field(default_factory=list)
    k0: Optional[np.ndarray] = None     # iteration-1 feedforward gains (T, nu)
    K0: Optional[np.ndarray] = None     # iteration-1 feedback gains


class OracleFddp:
    """Sequential FDDP matching solvers/fddp.py semantics (incl. the
    documented |d0| stationarity test and non-negative stop value)."""

    def __init__(self, prob: OracleProblem, th_acceptstep=0.1,
                 th_acceptnegstep=2.0, th_grad=1e-12, th_stop_gaps=1.0,
                 reg_min=1e-9, reg_max=1e9, reg_factor=10.0,
                 n_alphas=10):
        self.p = prob
        self.th_acceptstep = th_acceptstep
        self.th_acceptnegstep = th_acceptnegstep
        self.th_grad = th_grad
        self.th_stop_gaps = th_stop_gaps
        self.reg_min, self.reg_max, self.reg_factor = reg_min, reg_max, reg_factor
        self.alphas = [0.5 ** k for k in range(n_alphas)]
        self.trace = OracleTrace()

    # -- pieces ---------------------------------------------------------------
    def _calc_diff(self, xs, us):
        T = self.p.spec.T
        derivs = [self.p.node_calc_diff(t, xs[t], us[t]) for t in range(T)]
        term = self.p.terminal_calc_diff(xs[T])
        cost = sum(d["cost"] for d in derivs) + term[0]
        return derivs, term, cost

    def _gaps(self, xs, derivs, feasible):
        T = self.p.spec.T
        fs = np.zeros((T + 1, self.p.state.ndx))
        if feasible:
            return fs
        fs[0] = self.p.state.diff(xs[0], self.p.x0)
        for t in range(T):
            fs[t + 1] = self.p.state.diff(xs[t + 1], derivs[t]["xnext"])
        return fs

    def _backward(self, derivs, term, fs, xreg, ureg, feasible):
        T = self.p.spec.T
        ndx, nu = self.p.state.ndx, self.p.spec.nu
        _, LxT, LxxT = term
        Vxx = LxxT + xreg * np.eye(ndx)
        Vx = LxT + (0 if feasible else Vxx @ fs[T])
        ks = np.zeros((T, nu))
        Ks = np.zeros((T, nu, ndx))
        Qus, Quuks = np.zeros((T, nu)), np.zeros((T, nu))
        Vxs = np.zeros((T + 1, ndx))
        Vxxs = np.zeros((T + 1, ndx, ndx))
        Vxs[T], Vxxs[T] = Vx, Vxx
        for t in reversed(range(T)):
            d = derivs[t]
            Qx = d["Lx"] + d["Fx"].T @ Vx
            Qu = d["Lu"] + d["Fu"].T @ Vx
            Qxx = d["Lxx"] + d["Fx"].T @ Vxx @ d["Fx"]
            Qxu = d["Lxu"] + d["Fx"].T @ Vxx @ d["Fu"]
            Quu = d["Luu"] + d["Fu"].T @ Vxx @ d["Fu"] + ureg * np.eye(nu)
            try:
                L = np.linalg.cholesky(Quu)
            except np.linalg.LinAlgError:
                return None
            k = _cho_solve(L, Qu)
            K = _cho_solve(L, Qxu.T)
            Quuk = Quu @ k
            Vx = Qx + K.T @ Quuk - 2.0 * (K.T @ Qu)
            Vxx = Qxx - Qxu @ K
            Vxx = 0.5 * (Vxx + Vxx.T) + xreg * np.eye(ndx)
            Vx = Vx + (0 if feasible else Vxx @ fs[t])
            ks[t], Ks[t] = k, K
            Qus[t], Quuks[t] = Qu, Quuk
            Vxs[t], Vxxs[t] = Vx, Vxx
        return dict(k=ks, K=Ks, Qu=Qus, Quuk=Quuks, Vx=Vxs, Vxx=Vxxs)

    def _forward(self, xs, us, bp, fs, alpha, feasible):
        T = self.p.spec.T
        st = self.p.state
        xs_try = np.zeros_like(xs)
        us_try = np.zeros_like(us)
        keep_gaps = (not feasible) and alpha != 1.0
        xnext = self.p.x0.copy()
        cost = 0.0
        for t in range(T):
            try:
                with np.errstate(all="ignore"):
                    x_try = st.integrate(xnext, fs[t] * (alpha - 1.0)) \
                        if keep_gaps else xnext
                    dx = st.diff(xs[t], x_try)
                    u_try = us[t] - alpha * bp["k"][t] - bp["K"][t] @ dx
                    xnext, c = self.p.node_calc(t, x_try, u_try)
            except (ValueError, FloatingPointError):   # rollout blow-up
                return None
            xs_try[t], us_try[t] = x_try, u_try
            cost += c
            if not (np.isfinite(cost) and np.isfinite(xnext).all()):
                return None
        xT = st.integrate(xnext, fs[T] * (alpha - 1.0)) if keep_gaps else xnext
        xs_try[T] = xT
        cost += self.p.terminal_cost(xT)
        if not np.isfinite(cost):
            return None
        return xs_try, us_try, cost

    # -- main loop --------------------------------------------------------------
    def solve(self, xs, us, maxiter, th_stop, reg_init=1e-9, feasible=False):
        xs, us = np.array(xs), np.array(us)
        xreg = ureg = reg_init
        stop_val = np.inf
        for it in range(maxiter):
            derivs, term, cost = self._calc_diff(xs, us)
            fs = self._gaps(xs, derivs, feasible)
            gap_norm = np.abs(fs).max()
            bp = self._backward(derivs, term, fs, xreg, ureg, feasible)
            while bp is None and xreg < self.reg_max:
                xreg = min(xreg * self.reg_factor, self.reg_max)
                ureg = min(ureg * self.reg_factor, self.reg_max)
                bp = self._backward(derivs, term, fs, xreg, ureg, feasible)
            if bp is None:
                return xs, us, cost, False, it
            if it == 0 and self.trace.k0 is None:
                self.trace.k0, self.trace.K0 = bp["k"].copy(), bp["K"].copy()
            dg = float(np.sum(bp["Qu"] * bp["k"]))
            dq = -float(np.sum(bp["k"] * bp["Quuk"]))
            if not feasible:
                dg -= float(np.sum(bp["Vx"] * fs))
                dq += float(np.einsum("ti,tij,tj->", fs, bp["Vxx"], fs))

            accepted = False
            steplength = self.alphas[-1]
            for alpha in self.alphas:
                out = self._forward(xs, us, bp, fs, alpha, feasible)
                if out is None:
                    continue
                xs_try, us_try, cost_try = out
                d0, d1 = dg, dq
                if not feasible:
                    dxs = np.stack([self.p.state.diff(xs_try[t], xs[t])
                                    for t in range(self.p.spec.T + 1)])
                    dv = -float(np.einsum("ti,tij,tj->", fs, bp["Vxx"], dxs))
                    d0, d1 = dg + dv, dq - 2.0 * dv
                dV = cost - cost_try
                dVexp = alpha * (d0 + 0.5 * alpha * d1)
                if dVexp >= 0:
                    ok = abs(d0) < self.th_grad or dV > self.th_acceptstep * dVexp
                else:
                    ok = dV > self.th_acceptnegstep * dVexp
                if ok:
                    xs, us, cost_new = xs_try, us_try, cost_try
                    steplength = alpha
                    accepted = True
                    if alpha == 1.0:
                        feasible = True
                    break
            if accepted:
                stop_val = cost - cost_new
                cost = cost_new
                self.trace.cost.append(cost)
                self.trace.steplength.append(steplength)
            if steplength > 0.5:
                xreg = max(xreg / self.reg_factor, self.reg_min)
                ureg = max(ureg / self.reg_factor, self.reg_min)
            elif steplength <= 0.01:
                xreg = min(xreg * self.reg_factor, self.reg_max)
                ureg = min(ureg * self.reg_factor, self.reg_max)
                if xreg >= self.reg_max:
                    return xs, us, cost, feasible, it + 1
            if accepted and 0 <= stop_val < th_stop and gap_norm < self.th_stop_gaps:
                return xs, us, cost, feasible, it + 1
        return xs, us, cost, feasible, maxiter


class OracleSbFddp:
    """Sequential SbFDDP homotopy (reference solve loop,
    /root/reference/src/sbfddp.cpp:192-226) over the NumPy FDDP."""

    def __init__(self, prob: OracleProblem, smooth_init=0.1, smooth_mult=0.5,
                 convergence_init=1e-2, convergence_stop=1e-3,
                 convergence_mult=0.1):
        self.prob = prob
        self.smooth_init, self.smooth_mult = smooth_init, smooth_mult
        self.convergence_init = convergence_init
        self.convergence_stop = convergence_stop
        self.convergence_mult = convergence_mult

    def _barrier_slot(self):
        for i, s in enumerate(self.prob.spec.slots):
            if s.name == "barrier":
                return i
        return None

    def _set_homotopy(self, smooth):
        self.prob.smooth = smooth
        k = self._barrier_slot()
        if k is not None:
            d = smooth * (self.prob.s_ub - self.prob.s_lb)
            self.prob.act_w[k] = 1.0 / (d * d)

    def solve(self, xs, us, maxiter=100):
        smooth = self.smooth_init
        convergence = self.convergence_init
        feasible = False
        fddp = OracleFddp(self.prob)
        self.fddp = fddp
        while convergence >= self.convergence_stop * (1 - 1e-12):
            self._set_homotopy(smooth)
            xs, us, cost, feasible, _ = fddp.solve(xs, us, maxiter, convergence,
                                                   feasible=False)
            smooth *= self.smooth_mult
            convergence *= self.convergence_mult
        self._set_homotopy(smooth / self.smooth_mult)
        us_squash = np.stack([self.prob.squash(u) for u in us])
        return xs, us, us_squash, cost, feasible
