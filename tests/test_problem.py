"""StackedProblem tests: construction from missions, node evaluation, and
derivative correctness vs finite differences."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eagle_mpc_tpu.config import specs
from eagle_mpc_tpu.ocp import costs as C
from eagle_mpc_tpu.ocp import problem as P

MISSIONS = os.path.join(os.path.dirname(__file__), "..", "missions")


@pytest.fixture(scope="module")
def flagship():
    traj = specs.load_trajectory(
        "hexacopter370_flying_arm_3/trajectories/displacement.yaml", yaml_dir=MISSIONS)
    spec, params = P.from_trajectory(traj, dt_ms=20, use_squash=True,
                                     integrator="IntegratedActionModelEuler")
    return traj, spec, params


class TestConstruction:
    def test_knots_and_terminal(self, flagship):
        traj, spec, params = flagship
        # stages: 2000ms(T), 0ms, 2000ms(T), 0ms @ dt=20
        # -> 100 + 1 + (100-1) + 0 = 200 running nodes; terminal = wp2
        assert spec.T == 200
        knots, term = P.stage_knots(traj.stages, 20)
        assert list(knots) == [100, 1, 99, 0]
        assert term == 3
        # barrier slot appended for squash problems
        assert spec.slots[-1].name == P.BARRIER_SLOT
        # wp2 slots active only at terminal
        wp2_slot = next(i for i, s in enumerate(spec.slots) if s.name == "wp2/gripper_pose")
        active = np.asarray(params.node.active[:, wp2_slot])
        assert active[-1] == 1.0 and active[:-1].sum() == 0

    def test_slot_sharing_across_stages(self, flagship):
        traj, spec, params = flagship
        # nav_wp1 and nav_wp2 have identical reg_state costs -> shared slot
        names = [s.name for s in spec.slots]
        assert "nav_wp1/reg_state" in names
        assert "nav_wp2/reg_state" not in names
        # barrier slot active on all running nodes with reference weight
        w = np.asarray(params.node.weight[:, -1])
        assert np.allclose(w[:-1], 1e-3) and w[-1] == 0.0


class TestEvaluation:
    def test_calc_all_finite(self, flagship):
        traj, spec, params = flagship
        T = spec.T
        xs = jnp.tile(params.x0, (T + 1, 1))
        us = jnp.zeros((T, spec.nu))
        costs, xnexts, cost_T = P.calc_all(spec, params, xs, us)
        assert costs.shape == (T,)
        assert np.all(np.isfinite(costs)) and np.isfinite(cost_T)
        assert xnexts.shape == (T, spec.state.nx)

    def test_rollout_falls_without_thrust(self, flagship):
        traj, spec, params = flagship
        # squash(0) with lb=0 gives ~hover-less thrust; mostly falls
        view = P.node_view(params.node, 0)
        x = params.x0
        # large negative s -> squashed thrust ~ 0 -> free fall
        s = jnp.concatenate([jnp.full(6, -100.0), jnp.zeros(3)])
        xn, cost, u_sq = P.node_calc(spec, view, params.glob, x, s)
        assert u_sq[0] < 0.2  # squashed near min thrust
        assert xn[spec.state.nq + 2] < -0.1  # falling vz after 20 ms

    def test_squash_bounds(self, flagship):
        traj, spec, params = flagship
        s = jnp.asarray(np.random.default_rng(0).normal(size=spec.nu) * 100)
        u = P.squash(spec, params.glob, s)
        assert np.all(u >= np.asarray(params.glob.s_lb) - 1e-6)
        assert np.all(u <= np.asarray(params.glob.s_ub) + 1e-6)


class TestDerivatives:
    @pytest.mark.parametrize("integrator", ["IntegratedActionModelEuler",
                                            "IntegratedActionModelRK4"])
    def test_node_derivatives_vs_fd(self, integrator):
        traj = specs.load_trajectory(
            "hexacopter370_flying_arm_3/trajectories/displacement.yaml", yaml_dir=MISSIONS)
        spec, params = P.from_trajectory(traj, dt_ms=20, use_squash=True,
                                         integrator=integrator)
        st = spec.state
        r = np.random.default_rng(3)
        x = st.rand(r)
        s = jnp.asarray(r.normal(size=spec.nu))
        view = P.node_view(params.node, 0)

        d = P.node_calc_diff(spec, view, params.glob, x, s)
        xnext0, cost0, _ = P.node_calc(spec, view, params.glob, x, s)
        np.testing.assert_allclose(d.xnext, xnext0, atol=1e-12)
        np.testing.assert_allclose(d.cost, cost0, atol=1e-12)

        eps = 1e-6
        ndx, nu = st.ndx, spec.nu
        Fx_fd = np.zeros((ndx, ndx))
        Lx_fd = np.zeros(ndx)
        for i in range(ndx):
            dz = jnp.zeros(ndx).at[i].set(eps)
            xp = st.integrate(x, dz)
            xm = st.integrate(x, -dz)
            xnp_, cp, _ = P.node_calc(spec, view, params.glob, xp, s)
            xnm, cm, _ = P.node_calc(spec, view, params.glob, xm, s)
            Fx_fd[:, i] = (st.diff(xnext0, xnp_) - st.diff(xnext0, xnm)) / (2 * eps)
            Lx_fd[i] = (cp - cm) / (2 * eps)
        np.testing.assert_allclose(d.Fx, Fx_fd, atol=1e-5)
        np.testing.assert_allclose(d.Lx, Lx_fd, atol=1e-5)

        Fu_fd = np.zeros((ndx, nu))
        Lu_fd = np.zeros(nu)
        for i in range(nu):
            du = jnp.zeros(nu).at[i].set(eps)
            xnp_, cp, _ = P.node_calc(spec, view, params.glob, x, s + du)
            xnm, cm, _ = P.node_calc(spec, view, params.glob, x, s - du)
            Fu_fd[:, i] = (st.diff(xnext0, xnp_) - st.diff(xnext0, xnm)) / (2 * eps)
            Lu_fd[i] = (cp - cm) / (2 * eps)
        np.testing.assert_allclose(d.Fu, Fu_fd, atol=1e-5)
        np.testing.assert_allclose(d.Lu, Lu_fd, atol=1e-5)

        # GN Hessians: symmetric, PSD
        np.testing.assert_allclose(d.Lxx, d.Lxx.T, atol=1e-10)
        np.testing.assert_allclose(d.Luu, d.Luu.T, atol=1e-10)
        assert np.min(np.linalg.eigvalsh(np.asarray(d.Lxx))) > -1e-9
        assert np.min(np.linalg.eigvalsh(np.asarray(d.Luu))) > -1e-9

    def test_terminal_derivatives_vs_fd(self, flagship):
        traj, spec, params = flagship
        st = spec.state
        r = np.random.default_rng(4)
        x = st.rand(r)
        view = P.node_view(params.node, spec.T)
        cost, Lx, Lxx = P.terminal_calc_diff(spec, view, params.glob, x)
        c0 = P.terminal_calc(spec, view, params.glob, x)
        np.testing.assert_allclose(cost, c0, atol=1e-12)
        eps = 1e-6
        Lx_fd = np.zeros(st.ndx)
        for i in range(st.ndx):
            dz = jnp.zeros(st.ndx).at[i].set(eps)
            cp = P.terminal_calc(spec, view, params.glob, st.integrate(x, dz))
            cm = P.terminal_calc(spec, view, params.glob, st.integrate(x, -dz))
            Lx_fd[i] = (cp - cm) / (2 * eps)
        np.testing.assert_allclose(Lx, Lx_fd, atol=1e-4)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
