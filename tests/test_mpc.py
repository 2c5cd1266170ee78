"""MPC controller tests: update semantics (carrot/rail/weighted) + closed
loop tracking + box solvers (the §3.4 parity layer of SURVEY.md)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eagle_mpc_tpu.config import specs
from eagle_mpc_tpu.mpc import CarrotMpc, RailMpc, WeightedMpc, run_closed_loop
from eagle_mpc_tpu.mpc import weighted as weighted_mod
from eagle_mpc_tpu.ocp import problem as P
from eagle_mpc_tpu.sim import AerialSimulator
from eagle_mpc_tpu.solvers import fddp, sbfddp

MISSIONS = os.path.join(os.path.dirname(__file__), "..", "missions")
DT = 40  # ms


@pytest.fixture(scope="module")
def iris_setup():
    traj = specs.load_trajectory("iris/trajectories/hover.yaml", yaml_dir=MISSIONS)
    spec, params = P.from_trajectory(traj, dt_ms=DT, use_squash=True,
                                     integrator="IntegratedActionModelEuler")
    res = jax.jit(lambda p: sbfddp.solve(spec, p, maxiter=100))(params)
    mp = specs.load_mpc_params("iris/mpc/mpc.yaml", yaml_dir=MISSIONS)
    return traj, mp, np.asarray(res.xs), np.asarray(res.us)


class TestCarrotUpdate:
    def test_slots_and_structure(self, iris_setup):
        traj, mp, xs, us = iris_setup
        ctrl = CarrotMpc(mpc_params=mp, trajectory=traj, state_ref=xs, dt_ref=DT)
        names = [s.name for s in ctrl.spec.slots]
        assert names == ["state_reg", "control_reg", "state_limits",
                         "carrot_state", "carrot_tail", "barrier"]
        assert ctrl.spec.T == mp.knots - 1

    def test_carrot_activity_and_refs(self, iris_setup):
        """iris hover = 'approach' transition stage (1100 ms) then a
        0-duration 'hover' stage. Per carrot-mpc.cpp:330-359: carrot is
        inactive inside a transition stage (except the last node), active in
        the hover window, and the hold tail takes over past the end."""
        traj, mp, xs, us = iris_setup
        ctrl = CarrotMpc(mpc_params=mp, trajectory=traj, state_ref=xs, dt_ref=DT)
        T = ctrl.spec.T
        t_stages = np.asarray(ctrl._t_stages)   # [0, 1100, 1140] at dt=20
        assert list(t_stages) == [0, 1100, 1100 + mp.dt]

        # t = 0: all nodes in the transition stage -> only the last node
        # carries the carrot, no tail
        params = ctrl.update_problem(0.0, ctrl.params0)
        active = np.asarray(params.node.active)
        expect = np.zeros(T + 1)
        expect[T] = 1.0
        np.testing.assert_array_equal(active[:, 3], expect)
        np.testing.assert_array_equal(active[:, 4], 0.0)

        # t = 600: nodes straddle both boundaries
        t0 = 600.0
        params = ctrl.update_problem(t0, ctrl.params0)
        active = np.asarray(params.node.active)
        node_time = t0 + np.arange(T + 1) * mp.dt
        in_hover = (node_time >= 1100) & (node_time < 1100 + mp.dt)
        beyond = node_time >= 1100 + mp.dt
        expect_carrot = in_hover.astype(float)
        expect_carrot[T] = 1.0 if not beyond[T] else 0.0
        np.testing.assert_array_equal(active[:, 3], expect_carrot)
        np.testing.assert_array_equal(active[:, 4], beyond.astype(float))

        # interpolation: node k sits halfway between reference samples when
        # its time is mid-interval (DT=40 refs, dt=20 nodes)
        ref = np.asarray(params.node.refs[3])
        k = 1  # time 620 ms -> between refs 15 (600) and 16 (640), alpha=0.5
        expect_pos = 0.5 * (xs[15][:3] + xs[16][:3])
        np.testing.assert_allclose(ref[k][:3], expect_pos, atol=1e-9)

        # past the end: hold last configuration at zero velocity
        params_late = ctrl.update_problem(float(traj.duration + 1000),
                                          ctrl.params0)
        active_late = np.asarray(params_late.node.active)
        assert np.all(active_late[:, 3] == 0) and np.all(active_late[:, 4] == 1)
        tail = np.asarray(params_late.node.refs[4])
        nq = ctrl.state.nq
        np.testing.assert_allclose(tail[:, :nq], np.tile(xs[-1][:nq], (T + 1, 1)))
        np.testing.assert_allclose(tail[:, nq:], 0.0)


class TestRailUpdate:
    def test_refs_follow_trajectory(self, iris_setup):
        traj, mp, xs, us = iris_setup
        ctrl = RailMpc(mpc_params=mp, state_ref=xs, dt_ref=DT)
        params = ctrl.update_problem(0.0, ctrl.params0)
        ref = np.asarray(params.node.refs[0])
        np.testing.assert_allclose(ref[0], xs[0], atol=1e-12)
        np.testing.assert_allclose(ref[2], xs[1], atol=1e-12)  # node2 @40ms = ref1

    def test_hold_is_yaw_only(self, iris_setup):
        traj, mp, xs, us = iris_setup
        xs_mod = xs.copy()
        # tilt the final attitude; the rail hold should strip roll/pitch
        q = np.array([0.3, 0.2, 0.1, 0.9])
        xs_mod[-1, 3:7] = q / np.linalg.norm(q)
        ctrl = RailMpc(mpc_params=mp, state_ref=xs_mod, dt_ref=DT)
        params = ctrl.update_problem(float(traj.duration + 10000), ctrl.params0)
        ref = np.asarray(params.node.refs[0])
        quat = np.array([0.0, 0.0, xs_mod[-1, 5], xs_mod[-1, 6]])
        quat /= np.linalg.norm(quat)
        np.testing.assert_allclose(ref[0, 3:7], quat, atol=1e-12)
        np.testing.assert_allclose(ref[0, ctrl.state.nq:], 0.0)


class TestWeightedUpdate:
    def test_merge_transitions(self, iris_setup):
        traj, mp, xs, us = iris_setup
        import dataclasses
        s0 = dataclasses.replace(traj.stages[0], name="a", transition=True,
                                 duration=500, t_ini=0)
        s1 = dataclasses.replace(traj.stages[0], name="b", transition=False,
                                 duration=1500, t_ini=500)
        merged = weighted_mod.merge_transition_stages((s0, s1))
        assert len(merged) == 1
        assert merged[0].duration == 2000 and merged[0].t_ini == 0

    def test_weight_schedule(self, iris_setup):
        """weight = w_stage * exp(alpha*(t - t_end)/1000) * beta, saturated
        past the trajectory end (weighted-mpc.cpp:233-245)."""
        traj, mp, xs, us = iris_setup
        ctrl = WeightedMpc(mpc_params=mp, trajectory=traj, dt_ref=DT)
        params = ctrl.update_problem(0.0, ctrl.params0)
        w = np.asarray(params.node.weight)
        a = np.asarray(params.node.active)
        K = ctrl._n_mission_slots
        dur = traj.duration
        node_time = np.arange(ctrl.spec.T + 1) * mp.dt
        stage_end = float(ctrl._stage_end[0])
        for i in (0, 5, ctrl.spec.T):
            t = node_time[i]
            wt = 0.0 if t > dur else (t - stage_end) / 1000.0
            expect = np.exp(ctrl.alpha * wt) * ctrl.beta
            for k in range(K):
                if ctrl._slot_exempt[k]:
                    continue
                got = w[i, k] / float(ctrl._slot_stage_weight[k])
                np.testing.assert_allclose(got, expect, rtol=1e-12)
        assert np.all(a[:, :K] == 1.0)  # single-stage mission: all active


class TestClosedLoop:
    def test_carrot_tracks(self, iris_setup):
        traj, mp, xs, us = iris_setup
        ctrl = CarrotMpc(mpc_params=mp, trajectory=traj, state_ref=xs, dt_ref=DT)
        T = ctrl.spec.T
        # offline solve is coarser than the MPC horizon: hold-pad the warm
        # start to T+1 states / T controls
        pad = T + 1 - xs.shape[0]
        xs_w = jnp.asarray(np.vstack([xs, np.tile(xs[-1], (pad, 1))]))
        us_w = jnp.asarray(np.vstack([us, np.tile(us[-1], (pad, 1))]))[:T]
        sim = AerialSimulator.from_platform(mp.model, mp.platform, dt_ms=10)
        n = 30
        out = jax.jit(lambda x0, a, b: run_closed_loop(
            ctrl, sim, x0, a, b, n_steps=n, dt_sim_ms=10.0))(
            jnp.asarray(xs[0]), xs_w, us_w)
        # the approach stage is a transition: the carrot aims only the final
        # node, so the plant follows its own optimum loosely along the
        # reference — assert coarse agreement + monotone climb progress
        t_end = n * 10
        ref = xs[t_end // DT + (1 if t_end % DT else 0)]
        err = np.linalg.norm(np.asarray(out.states[-1][:3]) - ref[:3])
        assert err < 0.25, f"tracking error {err}"
        z = np.asarray(out.states[:, 2])
        assert z[-1] > 0.15 and z[-1] > z[0]
        assert np.all(np.asarray(out.solve_iters) <= 2 * 2)  # iters<=2/stage


class TestRk4ClosedLoop:
    def test_carrot_tracks_with_rk4_nodes(self, iris_setup):
        """Closed-loop carrot MPC with IntegratedActionModelRK4 selected
        through the mpc config (reference int-action factory,
        src/factory/int-action.cpp:24-36) — the controller problem uses RK4
        nodes end-to-end, not just the node-derivative test."""
        import dataclasses

        traj, mp, xs, us = iris_setup
        mp_rk4 = dataclasses.replace(
            mp, integration_method="IntegratedActionModelRK4")
        ctrl = CarrotMpc(mpc_params=mp_rk4, trajectory=traj, state_ref=xs,
                         dt_ref=DT)
        assert ctrl.spec.integrator == P.RK4
        T = ctrl.spec.T
        pad = T + 1 - xs.shape[0]
        xs_w = jnp.asarray(np.vstack([xs, np.tile(xs[-1], (pad, 1))]))
        us_w = jnp.asarray(np.vstack([us, np.tile(us[-1], (pad, 1))]))[:T]
        sim = AerialSimulator.from_platform(mp.model, mp.platform, dt_ms=10)
        n = 12
        out = jax.jit(lambda x0, a, b: run_closed_loop(
            ctrl, sim, x0, a, b, n_steps=n, dt_sim_ms=10.0))(
            jnp.asarray(xs[0]), xs_w, us_w)
        states = np.asarray(out.states)
        assert np.all(np.isfinite(states))
        z = states[:, 2]
        assert z[-1] > z[0]  # climbs along the hover mission
        u = np.asarray(out.controls)
        lb = np.asarray(ctrl.params0.glob.s_lb)
        ub = np.asarray(ctrl.params0.glob.s_ub)
        assert np.all(u >= lb - 1e-9) and np.all(u <= ub + 1e-9)


class TestBoxSolvers:
    @pytest.fixture(scope="class")
    def hover_nosquash(self):
        traj = specs.load_trajectory("iris/trajectories/hover.yaml",
                                     yaml_dir=MISSIONS)
        return P.from_trajectory(traj, dt_ms=40, use_squash=False,
                                 integrator="IntegratedActionModelEuler")

    @pytest.mark.parametrize("solver", ["box_fddp", "box_ddp"])
    def test_converges_within_bounds(self, hover_nosquash, solver):
        spec, params = hover_nosquash
        fn = fddp.solve_box_fddp if solver == "box_fddp" else fddp.solve_box_ddp
        xs0, us0 = fddp.default_init(spec, params)
        # hover-thrust warm start (realistic usage; the plain-DDP variant's
        # unconditional first accept diverges from a zero-control cold start,
        # matching the reference solveDDP's !is_feasible_ branch)
        m = float(spec.model.inertia[0][0, 0])
        us0 = us0 + m * 9.81 / spec.nu
        res = jax.jit(lambda p: fn(spec, fddp.SolverSettings(), p, xs0, us0,
                                   jnp.asarray(200), jnp.asarray(1e-6)))(params)
        assert not bool(res.failed)
        u = np.asarray(res.us)
        lb, ub = np.asarray(params.glob.s_lb), np.asarray(params.glob.s_ub)
        assert np.all(u >= lb - 1e-9) and np.all(u <= ub + 1e-9)
        xT = np.asarray(res.xs[-1])
        np.testing.assert_allclose(xT[:3], [0, 0, 2.5], atol=0.1)

    def test_box_fddp_closed_loop_via_mpc_yaml(self, iris_setup):
        """Closed-loop carrot MPC driving SolverBoxFDDP selected through the
        mpc.yaml solver key — the dispatch at mpc/base.py (reference
        selection at src/mpc-controllers/carrot-mpc.cpp:232-242). The spec
        is built WITHOUT the squash/barrier slot; bounds are enforced by the
        projected-QP backward pass + clamped rollouts."""
        import dataclasses

        traj, mp, xs, us = iris_setup
        mp_box = dataclasses.replace(mp, solver="SolverBoxFDDP", iters=3)
        ctrl = CarrotMpc(mpc_params=mp_box, trajectory=traj, state_ref=xs,
                         dt_ref=DT)
        assert not ctrl.use_squash
        assert "barrier" not in [s.name for s in ctrl.spec.slots]
        T = ctrl.spec.T
        pad = T + 1 - xs.shape[0]
        xs_w = jnp.asarray(np.vstack([xs, np.tile(xs[-1], (pad, 1))]))
        # warm-start controls at hover thrust (box solvers consume RAW
        # controls — the offline us are pre-squash decision variables)
        m = float(mp.model.inertia[0][0, 0])
        us_w = jnp.full((T, ctrl.spec.nu), m * 9.81 / mp.platform.nu,
                        dtype=xs_w.dtype)
        sim = AerialSimulator.from_platform(mp.model, mp.platform, dt_ms=10)
        n = 20
        out = jax.jit(lambda x0, a, b: run_closed_loop(
            ctrl, sim, x0, a, b, n_steps=n, dt_sim_ms=10.0))(
            jnp.asarray(xs[0]), xs_w, us_w)
        states = np.asarray(out.states)
        assert np.all(np.isfinite(states))
        # bounds hold on every applied control
        u = np.asarray(out.controls)
        lb = np.asarray(ctrl.params0.glob.s_lb)
        ub = np.asarray(ctrl.params0.glob.s_ub)
        assert np.all(u >= lb - 1e-9) and np.all(u <= ub + 1e-9)
        # coarse tracking: the plant climbs along the hover mission
        z = states[:, 2]
        assert z[-1] > z[0] and z[-1] > 0.1
        assert np.all(np.asarray(out.solve_iters) <= 3)

    def test_boxqp_matches_active_set(self):
        """BoxQP vs brute-force active-set enumeration on random QPs."""
        rng = np.random.default_rng(3)
        for _ in range(20):
            n = 4
            A = rng.normal(size=(n, n))
            H = A @ A.T + 0.1 * np.eye(n)
            q = rng.normal(size=n)
            lo, hi = -np.ones(n) * 0.5, np.ones(n) * 0.5
            x, free = fddp._boxqp(jnp.asarray(H), jnp.asarray(q),
                                  jnp.asarray(lo), jnp.asarray(hi),
                                  jnp.zeros(n), 30)
            # brute force over clamp patterns
            best, bestf = None, np.inf
            import itertools
            for pattern in itertools.product([-1, 0, 1], repeat=n):
                xx = np.where(np.array(pattern) == -1, lo,
                              np.where(np.array(pattern) == 1, hi, 0.0)).astype(float)
                f_idx = [i for i in range(n) if pattern[i] == 0]
                if f_idx:
                    Hff = H[np.ix_(f_idx, f_idx)]
                    rhs = -(q[f_idx] + H[np.ix_(f_idx, range(n))] @ xx
                            - Hff @ xx[f_idx])
                    xf = np.linalg.solve(Hff, rhs)
                    xx[f_idx] = xf
                if np.any(xx < lo - 1e-12) or np.any(xx > hi + 1e-12):
                    continue
                f = 0.5 * xx @ H @ xx + q @ xx
                if f < bestf:
                    bestf, best = f, xx
            fval = 0.5 * np.asarray(x) @ H @ np.asarray(x) + q @ np.asarray(x)
            assert fval <= bestf + 1e-6, (fval, bestf)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
