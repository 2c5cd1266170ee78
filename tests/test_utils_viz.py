"""Tests: platform presets, rotor-geometry recovery, 3-D display, and the
task-activated carrot controller (reference python-utils parity layer,
/root/reference/bindings/python/eagle_mpc/utils/{aerial_manipulation,
visualizer,mpc_controllers}.py)."""

import os

import numpy as np
import pytest

from eagle_mpc_tpu.config import specs
from eagle_mpc_tpu.mpc import TaskActivatedCarrotMpc
from eagle_mpc_tpu.utils import hexarotor370_params, hexarotor680_params
from eagle_mpc_tpu.viz import MulticopterDisplay, rotor_geometry

MISSIONS = os.path.join(os.path.dirname(__file__), "..", "missions")


class TestPlatformPresets:
    def test_hexarotor680_allocation(self):
        p = hexarotor680_params()
        assert p.tau_f.shape == (6, 6)
        # planar ring: all thrust axes vertical, z-force row all ones
        np.testing.assert_allclose(p.tau_f[2], 1.0, atol=1e-12)
        np.testing.assert_allclose(p.tau_f[:2], 0.0, atol=1e-12)
        # alternating spin: yaw row signs follow (-1)^i * cm/cf
        yaw = p.tau_f[5]
        np.testing.assert_allclose(yaw, [(-1.0) ** i * p.cm / p.cf
                                         for i in range(6)], rtol=1e-12)
        # symmetric ring: roll/pitch torque rows sum to zero
        np.testing.assert_allclose(p.tau_f[3:5].sum(axis=1), 0.0, atol=1e-12)
        assert p.u_ub[0] == pytest.approx(2.53 * 9.81)

    def test_hexarotor370_allocation(self):
        p = hexarotor370_params(n_arm_joints=3, arm_effort_limit=1.0)
        assert p.tau_f.shape == (6, 6)
        assert p.nu == 9
        np.testing.assert_allclose(p.tau_f[2], 1.0, atol=1e-6)  # z-yaw rotors
        # identified constants
        assert p.cf == pytest.approx(4.138394792004922e-06)
        assert p.max_thrust == pytest.approx(20.6991)
        np.testing.assert_allclose(p.u_lb[6:], -1.0)

    def test_hover_thrust_balances(self):
        """Equal rotor thrusts produce pure vertical force, zero torque."""
        for p in (hexarotor680_params(), hexarotor370_params()):
            u = np.ones(6)
            wrench = p.tau_f @ u
            np.testing.assert_allclose(wrench[:2], 0.0, atol=1e-9)
            np.testing.assert_allclose(wrench[3:], 0.0, atol=1e-9)
            assert wrench[2] == pytest.approx(6.0)


class TestRotorGeometry:
    def test_roundtrip_from_tau_f(self):
        """For planar rings p ⟂ d, so geometry recovery is exact: rebuilding
        the allocation from (pos, dir, spin) reproduces tau_f."""
        p = hexarotor680_params()
        pos, d, spins = rotor_geometry(p)
        np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-12)
        tau_f = np.zeros((6, 6))
        for i in range(6):
            tau_f[:3, i] = d[i]
            tau_f[3:, i] = np.cross(pos[i], d[i]) + \
                spins[i] * (p.cm / p.cf) * d[i]
        np.testing.assert_allclose(tau_f, p.tau_f, atol=1e-9)
        # arm length recovered
        np.testing.assert_allclose(np.linalg.norm(pos, axis=1), 0.34,
                                   atol=1e-9)

    def test_yaml_platform(self):
        mp = specs.load_mpc_params("iris/mpc/mpc.yaml", yaml_dir=MISSIONS)
        pos, d, spins = rotor_geometry(mp.platform)
        assert pos.shape == (4, 3)
        assert set(np.sign(spins)) == {-1.0, 1.0}


class TestDisplay:
    def test_static_and_animate(self):
        import matplotlib

        matplotlib.use("Agg")
        mp = specs.load_mpc_params("iris/mpc/mpc.yaml", yaml_dir=MISSIONS)
        disp = MulticopterDisplay(mp.model, mp.platform,
                                  frame_names=[mp.platform.base_link_name],
                                  cog=True)
        n = 12
        xs = np.tile(np.concatenate([np.zeros(3), [0, 0, 0, 1],
                                     np.zeros(mp.model.nv)]), (n, 1))
        xs[:, 2] = np.linspace(0.0, 1.0, n)
        us = np.full((n - 1, 4), 2.0)
        fig, ax = disp.display(xs, us, n_frames=4)
        assert fig is not None
        anim = disp.animate(xs, us, stride=4)
        assert anim is not None
        import matplotlib.pyplot as plt

        plt.close("all")


class TestTaskActivatedCarrot:
    @pytest.fixture(scope="class")
    def setup(self):
        traj = specs.load_trajectory("iris/trajectories/hover.yaml",
                                     yaml_dir=MISSIONS)
        mp = specs.load_mpc_params("iris/mpc/mpc.yaml", yaml_dir=MISSIONS)
        nx = traj.model.nx
        n_ref = traj.duration // 40 + 1
        ref = np.tile(np.asarray(traj.initial_state), (n_ref, 1))
        ref[:, 2] = np.linspace(0.0, 1.0, n_ref)
        ctrl = TaskActivatedCarrotMpc(mpc_params=mp, trajectory=traj,
                                      state_ref=ref, dt_ref=40)
        return traj, ctrl

    def test_slots(self, setup):
        traj, ctrl = setup
        names = [s.name for s in ctrl.spec.slots]
        # one slot per (stage, cost) + terminal carrot + solver barrier
        n_mission = sum(len(s.costs) for s in traj.stages)
        assert len(names) == n_mission + 2
        assert names[-2] == "task_carrot"
        assert names[-1] == "barrier"
        assert all("/" in n for n in names[:n_mission])

    def test_update_activates_stage_costs(self, setup):
        traj, ctrl = setup
        T = ctrl.spec.T
        params = ctrl.update_problem(0.0, ctrl.params0)
        active = np.asarray(params.node.active)
        slot_stage = np.asarray(ctrl._slot_stage)
        K = ctrl._n_mission_slots

        # node times 0..T*dt; stage boundaries at t_ini
        t_stages = np.asarray(ctrl._t_stages)
        node_time = np.arange(T + 1) * ctrl.dt
        expect_stage = np.clip(
            np.searchsorted(t_stages, node_time, side="right") - 1,
            0, len(traj.stages) - 1)
        for k in range(K):
            np.testing.assert_array_equal(
                active[:, k], (slot_stage[k] == expect_stage).astype(float),
                err_msg=f"slot {k}")

        # iris hover: first stage is a transition -> terminal carrot active
        # exactly when the LAST node is still inside it
        last_stage = expect_stage[-1]
        carrot_expect = np.zeros(T + 1)
        if traj.stages[last_stage].transition:
            carrot_expect[T] = 1.0
        np.testing.assert_array_equal(active[:, K], carrot_expect)

    def test_solve_tick(self, setup):
        """One jitted MPC tick must run and stay finite."""
        import jax
        import jax.numpy as jnp

        traj, ctrl = setup
        T, nu = ctrl.spec.T, ctrl.spec.nu
        x0 = jnp.asarray(traj.initial_state)
        xs = jnp.tile(x0, (T + 1, 1))
        us = jnp.zeros((T, nu), dtype=x0.dtype)

        def tick(t, x, xs, us):
            p = ctrl.update_problem(t, ctrl.params0._replace(x0=x))
            return ctrl.solve(p, xs, us)

        res = jax.jit(tick)(jnp.asarray(0.0, x0.dtype), x0, xs, us)
        assert bool(jnp.all(jnp.isfinite(res.us_squash)))
        assert bool(jnp.isfinite(res.cost))
