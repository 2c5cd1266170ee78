"""Solver convergence tests: SbFDDP on real missions (the golden-behavior
layer — cost decrease, gap closure, bound satisfaction, waypoint reach)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eagle_mpc_tpu.config import specs
from eagle_mpc_tpu.dynamics import rbd
from eagle_mpc_tpu.ocp import problem as P
from eagle_mpc_tpu.solvers import fddp, sbfddp

MISSIONS = os.path.join(os.path.dirname(__file__), "..", "missions")


@pytest.fixture(scope="module")
def iris_hover():
    traj = specs.load_trajectory("iris/trajectories/hover.yaml", yaml_dir=MISSIONS)
    spec, params = P.from_trajectory(traj, dt_ms=40, use_squash=True,
                                     integrator="IntegratedActionModelEuler")
    res = jax.jit(lambda p: sbfddp.solve(spec, p, maxiter=100))(params)
    return traj, spec, params, res


class TestSbFddpHover:
    def test_converges(self, iris_hover):
        _, _, _, res = iris_hover
        assert not bool(res.failed)
        assert int(res.iters) < 60
        assert np.isfinite(float(res.cost))

    def test_reaches_target(self, iris_hover):
        _, spec, _, res = iris_hover
        xT = np.asarray(res.xs[-1])
        np.testing.assert_allclose(xT[:3], [0, 0, 2.5], atol=5e-2)
        assert np.linalg.norm(xT[spec.state.nq:]) < 0.05

    def test_controls_within_bounds(self, iris_hover):
        _, _, params, res = iris_hover
        u = np.asarray(res.us_squash)
        assert np.all(u >= np.asarray(params.glob.s_lb) - 1e-9)
        assert np.all(u <= np.asarray(params.glob.s_ub) + 1e-9)

    def test_mean_thrust_matches_impulse_balance(self, iris_hover):
        traj, spec, params, res = iris_hover
        # vertical climb starting and ending at rest: integral of (thrust - mg)
        # over the horizon vanishes, so the MEAN total thrust equals m*g
        m = float(traj.model.inertia[0][0, 0])
        mean_thrust = float(np.mean(np.sum(np.asarray(res.us_squash), axis=1)))
        assert abs(mean_thrust - m * 9.81) / (m * 9.81) < 0.05

    def test_feasible_gap_closed(self, iris_hover):
        _, spec, params, res = iris_hover
        # rollout of us from x0 must match xs (dynamic feasibility) — under
        # the squash smoothness the homotopy ended at
        params = sbfddp._set_homotopy(spec, params, res.smooth)
        st = spec.state
        views = P.running_views(params.node, spec.T)
        def step(x, inp):
            view, u = inp
            xn, _, _ = P.node_calc(spec, view, params.glob, x, u)
            return xn, xn
        _, xs_roll = jax.lax.scan(step, params.x0, (views, res.us))
        err = jax.vmap(st.diff)(res.xs[1:], xs_roll)
        assert float(jnp.max(jnp.abs(err))) < 1e-6


class TestSbFddpFlagship:
    def test_displacement_mission(self):
        traj = specs.load_trajectory(
            "hexacopter370_flying_arm_3/trajectories/displacement.yaml",
            yaml_dir=MISSIONS)
        spec, params = P.from_trajectory(traj, dt_ms=50, use_squash=True,
                                         integrator="IntegratedActionModelEuler")
        res = jax.jit(lambda p: sbfddp.solve(spec, p, maxiter=100))(params)
        assert not bool(res.failed)
        fid = spec.model.frame_id("flying_arm_3__gripper")
        pg, _ = rbd.frame_placement(spec.model, res.xs[-1][: spec.model.nq], fid)
        np.testing.assert_allclose(np.asarray(pg), [2.0, 0.5, 1.0], atol=0.05)
        u = np.asarray(res.us_squash)
        assert np.all(u >= np.asarray(params.glob.s_lb) - 1e-9)
        assert np.all(u <= np.asarray(params.glob.s_ub) + 1e-9)


class TestIterTrace:
    """Per-iteration telemetry — the CallbackVerbose parity layer (the
    reference drives callbacks from its solver loop at
    /root/reference/src/sbfddp.cpp:303-307)."""

    @pytest.fixture(scope="class")
    def traced_solve(self, iris_hover):
        _, spec, params, _ = iris_hover
        st = sbfddp.SbFddpSettings(
            solver=fddp.SolverSettings(record_trace=True))
        res = jax.jit(lambda p: sbfddp.solve(spec, p, maxiter=40,
                                             settings=st))(params)
        return spec, res

    def test_trace_populated(self, traced_solve):
        _, res = traced_solve
        assert res.trace is not None
        used = np.asarray(res.trace.accepted) != -1
        assert used.sum() == int(res.iters)

    def test_accepted_costs_monotone_within_stage(self, traced_solve):
        """FDDP accepted steps decrease cost monotonically inside one
        homotopy stage (the barrier weights change between stages, so only
        within-stage monotonicity is guaranteed)."""
        _, res = traced_solve
        tr = res.trace
        acc = np.asarray(tr.accepted)
        phase = np.asarray(tr.phase)
        cost = np.asarray(tr.cost)
        for ph in np.unique(phase[acc == 1]):
            c = cost[(acc == 1) & (phase == ph)]
            assert np.all(np.diff(c) <= 1e-9), (ph, c)

    def test_final_trace_cost_matches_result(self, traced_solve):
        _, res = traced_solve
        tr = res.trace
        used = np.asarray(tr.accepted) != -1
        last_cost = np.asarray(tr.cost)[used][-1]
        np.testing.assert_allclose(last_cost, float(res.cost), rtol=1e-10)

    def test_format_trace_renders(self, traced_solve):
        _, res = traced_solve
        s = fddp.format_trace(res.trace)
        lines = s.splitlines()
        assert "cost" in lines[0] and "gap_norm" in lines[0]
        assert len(lines) == 1 + int(res.iters)

    def test_steplengths_are_alphas(self, traced_solve):
        _, res = traced_solve
        tr = res.trace
        used = np.asarray(tr.accepted) != -1
        steps = np.asarray(tr.steplength)[used]
        alphas = np.asarray(fddp.SolverSettings().alphas)
        assert np.all(np.isin(steps, alphas))

    def test_trace_disabled_returns_none(self, iris_hover):
        _, _, _, res = iris_hover
        assert res.trace is None


class TestBatchedSolve:
    def test_vmap_over_perturbed_x0(self, iris_hover):
        """The TPU throughput axis: a batch of scenarios with perturbed
        initial states, solved by one vmapped program; per-element
        convergence must match the scalar solve."""
        _, spec, params, res_single = iris_hover
        B = 4
        r = np.random.default_rng(0)
        noise = r.normal(size=(B, spec.state.nx)) * 0.05
        noise[:, 3:7] = 0  # keep quaternion valid
        x0s = jnp.asarray(np.asarray(params.x0)[None] + noise)
        batch_params = jax.vmap(lambda x0: params._replace(x0=x0))(x0s)

        solve = jax.jit(jax.vmap(lambda p: sbfddp.solve(spec, p, maxiter=60)))
        res = solve(batch_params)
        assert res.xs.shape[0] == B
        assert not np.any(np.asarray(res.failed))
        # all land near the same hover target (perturbed starts -> looser tol)
        np.testing.assert_allclose(np.asarray(res.xs[:, -1, :3]),
                                   np.tile([0, 0, 2.5], (B, 1)), atol=0.2)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
