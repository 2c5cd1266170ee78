"""Contact dynamics tests: KKT constraint satisfaction, mask semantics,
drift correctness, and the contact missions (monkey_bar / eagle_catch)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eagle_mpc_tpu.config import specs
from eagle_mpc_tpu.dynamics import rbd
from eagle_mpc_tpu.dynamics.state import State
from eagle_mpc_tpu.ocp import problem as P
from eagle_mpc_tpu.solvers import sbfddp

MISSIONS = os.path.join(os.path.dirname(__file__), "..", "missions")


@pytest.fixture(scope="module")
def arm_model():
    traj = specs.load_trajectory(
        "hexacopter370_flying_arm_3/trajectories/displacement.yaml",
        yaml_dir=MISSIONS)
    return traj.model


@pytest.fixture(scope="module")
def rand_state(arm_model):
    st = State(arm_model.nq, arm_model.nv)
    rng = np.random.default_rng(5)
    x = st.rand(rng)
    return jnp.asarray(x)


class TestContactDynamics:
    def test_active_contact_satisfies_constraint(self, arm_model, rand_state):
        """J a + a0 = 0 must hold exactly for the active contact rows."""
        m = arm_model
        st = State(m.nq, m.nv)
        q, v = rand_state[: m.nq], rand_state[m.nq :]
        fid = m.frame_id("flying_arm_3__gripper")
        tau = jnp.asarray(np.random.default_rng(1).normal(size=m.nv))

        J6 = rbd.frame_jacobian_local(m, q, fid)
        drift = rbd.frame_accel_drift(m, q, v, fid)
        vf = rbd.frame_velocity(m, q, v, fid)
        J = J6[:3]
        a0 = drift[:3] + jnp.cross(vf[3:], vf[:3])
        a, lam = rbd.contact_fwd_dynamics(m, q, v, tau, J, a0,
                                          jnp.ones(3))
        residual = J @ a + a0
        np.testing.assert_allclose(np.asarray(residual), 0.0, atol=1e-8)
        assert lam.shape == (3,)

    def test_inactive_mask_equals_free_dynamics(self, arm_model, rand_state):
        m = arm_model
        q, v = rand_state[: m.nq], rand_state[m.nq :]
        fid = m.frame_id("flying_arm_3__gripper")
        tau = jnp.asarray(np.random.default_rng(2).normal(size=m.nv))
        J6 = rbd.frame_jacobian_local(m, q, fid)
        a0 = jnp.zeros(3)
        a_con, lam = rbd.contact_fwd_dynamics(m, q, v, tau, J6[:3], a0,
                                              jnp.zeros(3))
        a_free = rbd.fwd_dynamics(m, q, v, tau)
        np.testing.assert_allclose(np.asarray(a_con), np.asarray(a_free),
                                   atol=1e-10)
        np.testing.assert_allclose(np.asarray(lam), 0.0, atol=1e-12)

    def test_6d_contact_pins_frame(self, arm_model, rand_state):
        """A 6-D contact with zero drift target nulls the full frame
        spatial acceleration."""
        m = arm_model
        q, v = rand_state[: m.nq], rand_state[m.nq :]
        fid = m.frame_id("flying_arm_3__gripper")
        tau = jnp.asarray(np.random.default_rng(3).normal(size=m.nv))
        J6 = rbd.frame_jacobian_local(m, q, fid)
        drift = rbd.frame_accel_drift(m, q, v, fid)
        a, lam = rbd.contact_fwd_dynamics(m, q, v, tau, J6, drift,
                                          jnp.ones(6))
        np.testing.assert_allclose(np.asarray(J6 @ a + drift), 0.0, atol=1e-8)

    def test_drift_matches_finite_difference(self, arm_model, rand_state):
        """frame_accel_drift == d/dt (local frame velocity) under qddot=0."""
        m = arm_model
        st = State(m.nq, m.nv)
        fid = m.frame_id("flying_arm_3__gripper")
        x = rand_state
        q, v = x[: m.nq], x[m.nq :]
        drift = np.asarray(rbd.frame_accel_drift(m, q, v, fid))

        eps = 1e-6
        dx = jnp.concatenate([v, jnp.zeros(m.nv)]) * eps
        x2 = st.integrate(x, dx)
        v1 = np.asarray(rbd.frame_velocity(m, q, v, fid))
        v2 = np.asarray(rbd.frame_velocity(m, x2[: m.nq], v, fid))
        np.testing.assert_allclose(drift, (v2 - v1) / eps, rtol=1e-4, atol=1e-5)


class TestContactMissions:
    def test_monkey_bar_solves_and_holds_bar(self):
        traj = specs.load_trajectory(
            "hexacopter370_flying_arm_3/trajectories/monkey_bar.yaml",
            yaml_dir=MISSIONS)
        assert traj.has_contact
        spec, params = P.from_trajectory(traj, dt_ms=40, use_squash=True,
                                         integrator="IntegratedActionModelEuler")
        assert len(spec.contacts) == 1 and spec.contacts[0].dim == 3
        res = jax.jit(lambda p: sbfddp.solve(spec, p, maxiter=150))(params)
        assert not bool(res.failed)
        assert np.isfinite(float(res.cost))

        # during the contact stage the gripper must stay where it started:
        # the contact is acceleration-level with zero Baumgarte gains, so it
        # pins the initial contact point (crocoddyl semantics — the declared
        # position only enters through non-zero gains)
        fid = spec.contacts[0].frame_id
        p0, _ = rbd.frame_placement(spec.model, params.x0[: spec.model.nq], fid)
        p0 = np.asarray(p0)
        # acceleration-level constraint + Euler => bounded position drift
        # (this is why Baumgarte gains exist; the mission uses [0, 0] like
        # the reference's monkey_bar). Check loose position hold plus the
        # exact invariant: J a + a0 = 0 at contact nodes.
        n_hang = 1200 // 40
        glob = sbfddp._set_homotopy(spec, params, float(res.smooth)).glob
        for t, tol in ((1, 1e-2), (n_hang // 2, 6e-2), (n_hang - 1, 9e-2)):
            p, _ = rbd.frame_placement(spec.model, res.xs[t][: spec.model.nq], fid)
            np.testing.assert_allclose(np.asarray(p), p0, atol=tol)
            view = P.node_view(params.node, t)
            x = res.xs[t]
            q, v = x[: spec.model.nq], x[spec.model.nq :]
            J, a0, act_rows = P._contact_rows(spec, view, x)
            from eagle_mpc_tpu.ocp import actuation as ocp_act
            u_sq = P.squash(spec, glob, res.us[t])
            tau = ocp_act.actuation_tau(
                jnp.asarray(spec.tau_f_np, dtype=x.dtype), u_sq)
            acc, lam = rbd.contact_fwd_dynamics(spec.model, q, v, tau, J, a0,
                                                act_rows)
            np.testing.assert_allclose(np.asarray(J @ acc + a0), 0.0, atol=1e-6)

        # final perch target
        xT = np.asarray(res.xs[-1])
        np.testing.assert_allclose(xT[:3], [1.0, 0, 0.5], atol=0.1)

    def test_eagle_catch_cone_forces(self):
        traj = specs.load_trajectory(
            "hexacopter370_flying_arm_3/trajectories/eagle_catch.yaml",
            yaml_dir=MISSIONS)
        spec, params = P.from_trajectory(traj, dt_ms=50, use_squash=True,
                                         integrator="IntegratedActionModelEuler")
        cone_slots = [k for k, s in enumerate(spec.slots)
                      if s.kind == "friction_cone"]
        assert cone_slots and spec.slots[cone_slots[0]].contact_id == 0
        res = jax.jit(lambda p: sbfddp.solve(spec, p, maxiter=150))(params)
        assert not bool(res.failed)
        assert np.isfinite(float(res.cost))

        # contact nodes: recompute forces along the solution; the world
        # normal force (cone row -1) should be non-negative-ish
        ca = np.asarray(params.node.contact_active)
        contact_nodes = np.where(ca[:, 0] == 1.0)[0]
        assert len(contact_nodes) > 0
        view = P.node_view(params.node, int(contact_nodes[len(contact_nodes)//2]))
        t = int(contact_nodes[len(contact_nodes) // 2])
        glob = sbfddp._set_homotopy(spec, params, float(res.smooth)).glob
        _, _, forces = P._dam(spec, view, glob, res.xs[t], res.us[t])
        f_local = np.asarray(forces[0])
        _, R = rbd.frame_placement(spec.model, res.xs[t][: spec.model.nq],
                                   spec.contacts[0].frame_id)
        f_world = np.asarray(R) @ f_local
        assert f_world[2] > -1e-6, f"normal force {f_world}"


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
