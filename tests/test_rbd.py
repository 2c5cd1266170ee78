"""Dynamics validation: RNEA/CRBA consistency, energy conservation, analytic
limit cases — the finite-difference/oracle test layer SURVEY.md §4 calls for."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eagle_mpc_tpu.dynamics import rbd, urdf
from eagle_mpc_tpu.dynamics.state import State

ROBOTS = os.path.join(os.path.dirname(__file__), "..", "robots")


@pytest.fixture(scope="module")
def hexarm():
    return urdf.build_model(
        os.path.join(ROBOTS, "hexacopter370_description/urdf/hexacopter370_flying_arm_3.urdf")
    )


@pytest.fixture(scope="module")
def iris():
    return urdf.build_model(os.path.join(ROBOTS, "iris_description/robots/iris.urdf"))


def rand_qv(model, seed=0, v_scale=1.0):
    r = np.random.default_rng(seed)
    st = State(model.nq, model.nv)
    x = st.rand(r)
    q, v = x[: model.nq], x[model.nq :] * v_scale
    return jnp.asarray(q), jnp.asarray(v)


class TestConsistency:
    def test_rnea_crba_match(self, hexarm):
        """RNEA is affine in qddot with coefficient matrix M: rnea(q,v,a) =
        M(q) a + rnea(q,v,0) for any a."""
        q, v = rand_qv(hexarm, 1)
        r = np.random.default_rng(2)
        a = jnp.asarray(r.normal(size=hexarm.nv))
        M = rbd.crba(hexarm, q)
        lhs = rbd.rnea(hexarm, q, v, a)
        rhs = M @ a + rbd.rnea(hexarm, q, v, jnp.zeros(hexarm.nv))
        np.testing.assert_allclose(lhs, rhs, atol=1e-9)

    def test_mass_matrix_spd(self, hexarm):
        q, _ = rand_qv(hexarm, 3)
        M = rbd.crba(hexarm, q)
        np.testing.assert_allclose(M, M.T, atol=1e-12)
        assert np.all(np.linalg.eigvalsh(M) > 0)

    def test_mass_matrix_vs_rnea_columns(self, hexarm):
        """M column j == rnea(q, 0, e_j) without gravity (set g by subtracting
        the pure-gravity term)."""
        q, _ = rand_qv(hexarm, 4)
        z = jnp.zeros(hexarm.nv)
        g_term = rbd.rnea(hexarm, q, z, z)
        M = rbd.crba(hexarm, q)
        for j in range(hexarm.nv):
            ej = z.at[j].set(1.0)
            col = rbd.rnea(hexarm, q, z, ej) - g_term
            np.testing.assert_allclose(M[:, j], col, atol=1e-9, err_msg=f"col {j}")

    def test_fwd_inverse_roundtrip(self, hexarm):
        q, v = rand_qv(hexarm, 5)
        r = np.random.default_rng(6)
        tau = jnp.asarray(r.normal(size=hexarm.nv))
        a = rbd.fwd_dynamics(hexarm, q, v, tau)
        tau2 = rbd.rnea(hexarm, q, v, a)
        np.testing.assert_allclose(tau2, tau, atol=1e-8)


class TestPhysics:
    def test_free_fall_point_mass(self, iris):
        """Unactuated base at a random orientation: linear acceleration is
        gravity expressed in the body frame, no rotation."""
        q, _ = rand_qv(iris, 7)
        v = jnp.zeros(iris.nv)
        a = rbd.fwd_dynamics(iris, q, v, jnp.zeros(iris.nv))
        from eagle_mpc_tpu.dynamics.lie import quat_rotate_inv

        g_local = quat_rotate_inv(q[3:7], jnp.array([0.0, 0.0, -9.81]))
        np.testing.assert_allclose(a[:3], g_local, atol=1e-9)
        np.testing.assert_allclose(a[3:], np.zeros(3), atol=1e-9)

    def test_hover_equilibrium(self, iris):
        """Upright hover: an upward body-frame thrust equal to m*g yields zero
        acceleration."""
        st = State(iris.nq, iris.nv)
        x = st.zero()
        m = float(iris.inertia[0][0, 0])
        tau = jnp.zeros(iris.nv).at[2].set(m * 9.81)
        a = rbd.fwd_dynamics(iris, x[: iris.nq], x[iris.nq :], tau)
        np.testing.assert_allclose(a, np.zeros(iris.nv), atol=1e-9)

    def test_energy_conservation(self, hexarm):
        """Unactuated flight: total energy is conserved along an RK4 rollout
        (the strongest global test of M, b and the integrator together)."""
        st = State(hexarm.nq, hexarm.nv)
        q, v = rand_qv(hexarm, 8, v_scale=0.5)
        x = jnp.concatenate([q, v])

        def xdot(x):
            q, v = x[: hexarm.nq], x[hexarm.nq :]
            a = rbd.fwd_dynamics(hexarm, q, v, jnp.zeros(hexarm.nv))
            return v, a

        def rk4_step(x, dt):
            # manifold RK4: stage tangents composed through integrate
            v1, a1 = xdot(x)
            x2 = st.integrate(x, jnp.concatenate([v1, a1]) * (dt / 2))
            v2, a2 = xdot(x2)
            x3 = st.integrate(x, jnp.concatenate([v2, a2]) * (dt / 2))
            v3, a3 = xdot(x3)
            x4 = st.integrate(x, jnp.concatenate([v3, a3]) * dt)
            v4, a4 = xdot(x4)
            dx = (
                jnp.concatenate([v1, a1])
                + 2 * jnp.concatenate([v2, a2])
                + 2 * jnp.concatenate([v3, a3])
                + jnp.concatenate([v4, a4])
            ) * (dt / 6)
            return st.normalize(st.integrate(x, dx))

        def energy(x):
            q, v = x[: hexarm.nq], x[hexarm.nq :]
            return rbd.kinetic_energy(hexarm, q, v) + rbd.potential_energy(hexarm, q)

        e0 = energy(x)
        step = jax.jit(lambda x: rk4_step(x, 1e-3))
        for _ in range(200):
            x = step(x)
        e1 = energy(x)
        assert abs(e1 - e0) < 1e-5 * max(1.0, abs(e0))

    def test_momentum_conservation_no_gravity(self, hexarm):
        """With gravity off and no actuation, spatial momentum of the whole
        system (expressed in the world frame) is constant."""
        import dataclasses

        model = dataclasses.replace(hexarm, gravity=0.0)
        st = State(model.nq, model.nv)
        q, v = rand_qv(model, 9, v_scale=0.5)
        x = jnp.concatenate([q, v])

        def momentum_world(x):
            q, v = x[: model.nq], x[model.nq :]
            # total momentum = sum of body momenta mapped to world
            from eagle_mpc_tpu.dynamics import spatial

            _, _, _, vel = rbd._tree_kinematics(model, q, v)
            pw, Rw = rbd.body_world_placements(model, q)
            h = jnp.zeros(6, dtype=q.dtype)
            for b in range(model.nj + 1):
                I6 = jnp.asarray(model.inertia[b], dtype=q.dtype)
                h = h + spatial.force_to_parent(pw[b], Rw[b], I6 @ vel[b])
            return h

        def xdot(x):
            q, v = x[: model.nq], x[model.nq :]
            a = rbd.fwd_dynamics(model, q, v, jnp.zeros(model.nv))
            return jnp.concatenate([v, a])

        h0 = momentum_world(x)
        dt = 5e-4
        for _ in range(100):
            k1 = xdot(x)
            x2 = st.integrate(x, k1 * (dt / 2))
            k2 = xdot(x2)
            x3 = st.integrate(x, k2 * (dt / 2))
            k3 = xdot(x3)
            x4 = st.integrate(x, k3 * dt)
            k4 = xdot(x4)
            x = st.normalize(st.integrate(x, (k1 + 2 * k2 + 2 * k3 + k4) * (dt / 6)))
        h1 = momentum_world(x)
        np.testing.assert_allclose(h1, h0, atol=1e-5)


class TestFrames:
    def test_gripper_placement_zero_config(self, hexarm):
        """At the zero configuration the hanging 3-link arm's gripper is
        directly below the base at the authored offsets."""
        st = State(hexarm.nq, hexarm.nv)
        x = st.zero()
        fid = hexarm.frame_id("flying_arm_3__gripper")
        p, R = rbd.frame_placement(hexarm, x[: hexarm.nq], fid)
        # mount at -0.05, links 3 x 0.12 hanging down
        np.testing.assert_allclose(p, [0, 0, -0.05 - 3 * 0.12], atol=1e-12)
        np.testing.assert_allclose(R, np.eye(3), atol=1e-12)

    def test_frame_velocity_matches_fd(self, hexarm):
        """Local frame velocity == numerical derivative of the placement:
        v_lin = R^T dp/dt, omega = vee(R^T dR/dt)."""
        st = State(hexarm.nq, hexarm.nv)
        q, v = rand_qv(hexarm, 10)
        fid = hexarm.frame_id("flying_arm_3__gripper")
        vel = rbd.frame_velocity(hexarm, q, v, fid)

        eps = 1e-7
        x = jnp.concatenate([q, v])
        dx = jnp.concatenate([v * eps, jnp.zeros(hexarm.nv)])
        q2 = st.integrate(x, dx)[: hexarm.nq]
        p1, R1 = rbd.frame_placement(hexarm, q, fid)
        p2, R2 = rbd.frame_placement(hexarm, q2, fid)
        v_lin = np.asarray(R1).T @ (np.asarray(p2) - np.asarray(p1)) / eps
        dR = np.asarray(R1).T @ np.asarray(R2)
        w = np.array([dR[2, 1] - dR[1, 2], dR[0, 2] - dR[2, 0], dR[1, 0] - dR[0, 1]]) / (2 * eps)
        np.testing.assert_allclose(vel[:3], v_lin, atol=1e-5)
        np.testing.assert_allclose(vel[3:], w, atol=1e-5)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
