"""Unit tests for Lie-group primitives (quaternion / SO(3) / SE(3))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eagle_mpc_tpu.dynamics import lie


def rng(seed=0):
    return np.random.default_rng(seed)


def random_quat(r, n=()):
    q = r.normal(size=n + (4,))
    return jnp.asarray(q / np.linalg.norm(q, axis=-1, keepdims=True))


class TestQuaternion:
    def test_mul_identity(self):
        r = rng()
        q = random_quat(r)
        e = lie.quat_identity(q.dtype)
        np.testing.assert_allclose(lie.quat_mul(q, e), q, atol=1e-12)
        np.testing.assert_allclose(lie.quat_mul(e, q), q, atol=1e-12)

    def test_mul_matches_rotation_composition(self):
        r = rng(1)
        q1, q2 = random_quat(r), random_quat(r)
        R12 = lie.quat_to_rot(lie.quat_mul(q1, q2))
        np.testing.assert_allclose(R12, lie.quat_to_rot(q1) @ lie.quat_to_rot(q2), atol=1e-12)

    def test_rotate_matches_matrix(self):
        r = rng(2)
        q = random_quat(r)
        v = jnp.asarray(r.normal(size=(3,)))
        np.testing.assert_allclose(lie.quat_rotate(q, v), lie.quat_to_rot(q) @ v, atol=1e-12)
        np.testing.assert_allclose(lie.quat_rotate_inv(q, lie.quat_rotate(q, v)), v, atol=1e-12)

    def test_rot_quat_roundtrip(self):
        r = rng(3)
        for _ in range(20):
            q = random_quat(r)
            q2 = lie.rot_to_quat(lie.quat_to_rot(q))
            # q and -q are the same rotation
            sign = jnp.sign(jnp.dot(q, q2))
            np.testing.assert_allclose(q2 * sign, q, atol=1e-9)

    def test_exp_log_roundtrip(self):
        r = rng(4)
        w = jnp.asarray(r.normal(size=(3,)))
        np.testing.assert_allclose(lie.quat_log(lie.quat_exp(w)), w, atol=1e-10)
        # small angles
        w = jnp.asarray([1e-9, -2e-9, 3e-10])
        np.testing.assert_allclose(lie.quat_log(lie.quat_exp(w)), w, atol=1e-15)
        # zero is exactly zero and differentiable
        g = jax.jacobian(lie.quat_log)(lie.quat_identity(jnp.float64))
        assert np.all(np.isfinite(g))

    def test_log_shortest_path(self):
        r = rng(5)
        q = random_quat(r)
        np.testing.assert_allclose(lie.quat_log(-q), lie.quat_log(q), atol=1e-12)
        assert np.linalg.norm(lie.quat_log(q)) <= np.pi + 1e-9


class TestSO3:
    def test_exp3_matches_quat_exp(self):
        r = rng(6)
        w = jnp.asarray(r.normal(size=(3,)))
        np.testing.assert_allclose(lie.exp3(w), lie.quat_to_rot(lie.quat_exp(w)), atol=1e-12)

    def test_log3_roundtrip(self):
        r = rng(7)
        w = jnp.asarray(r.normal(size=(3,))) * 0.7
        np.testing.assert_allclose(lie.log3(lie.exp3(w)), w, atol=1e-9)

    def test_exp3_at_zero_differentiable(self):
        J = jax.jacobian(lie.exp3)(jnp.zeros(3))
        assert np.all(np.isfinite(J))
        # dR/dw at 0 = hat generators
        np.testing.assert_allclose(J[..., 0], lie.hat(jnp.array([1.0, 0, 0])), atol=1e-12)


class TestSE3:
    def test_exp_log_roundtrip(self):
        r = rng(8)
        xi = jnp.asarray(r.normal(size=(6,)))
        p, q = lie.exp6(xi)
        np.testing.assert_allclose(lie.log6(p, q), xi, atol=1e-9)

    def test_exp6_small(self):
        xi = jnp.asarray([1e-9, 2e-9, -1e-9, 1e-10, 0.0, -1e-10])
        p, q = lie.exp6(xi)
        np.testing.assert_allclose(lie.log6(p, q), xi, atol=1e-15)
        J = jax.jacobian(lambda x: lie.exp6(x)[0])(jnp.zeros(6))
        assert np.all(np.isfinite(J))

    def test_group_ops(self):
        r = rng(9)
        p1, q1 = jnp.asarray(r.normal(size=3)), random_quat(r)
        p2, q2 = jnp.asarray(r.normal(size=3)), random_quat(r)
        pc, qc = lie.se3_mul(p1, q1, p2, q2)
        # inverse composes to identity
        pi, qi = lie.se3_inv(pc, qc)
        pe, qe = lie.se3_mul(pc, qc, pi, qi)
        np.testing.assert_allclose(pe, np.zeros(3), atol=1e-12)
        np.testing.assert_allclose(np.abs(qe[3]), 1.0, atol=1e-12)

    def test_interpolate_endpoints(self):
        r = rng(10)
        p0, q0 = jnp.asarray(r.normal(size=3)), random_quat(r)
        p1, q1 = jnp.asarray(r.normal(size=3)), random_quat(r)
        pa, qa = lie.se3_interpolate(p0, q0, p1, q1, 0.0)
        np.testing.assert_allclose(pa, p0, atol=1e-12)
        pb, qb = lie.se3_interpolate(p0, q0, p1, q1, 1.0)
        np.testing.assert_allclose(pb, p1, atol=1e-9)
        sign = jnp.sign(jnp.dot(qb, q1))
        np.testing.assert_allclose(qb * sign, q1, atol=1e-9)

    def test_interpolate_geodesic_halfway(self):
        # Pure rotation about z: halfway should be half the angle.
        p0, q0 = jnp.zeros(3), lie.quat_identity(jnp.float64)
        q1 = lie.quat_exp(jnp.array([0.0, 0.0, 1.0]))
        _, qh = lie.se3_interpolate(p0, q0, p0, q1, 0.5)
        np.testing.assert_allclose(lie.quat_log(qh), [0.0, 0.0, 0.5], atol=1e-10)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
