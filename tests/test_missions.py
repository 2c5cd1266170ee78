"""Mission corpus tests: every YAML asset loads, builds a problem, and
evaluates; representative missions per robot family solve to their targets
(the golden-behavior sweep of SURVEY.md §4)."""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eagle_mpc_tpu.config import specs
from eagle_mpc_tpu.ocp import problem as P
from eagle_mpc_tpu.solvers import fddp, sbfddp

MISSIONS = os.path.join(os.path.dirname(__file__), "..", "missions")

ALL_TRAJECTORIES = sorted(
    os.path.relpath(p, MISSIONS)
    for p in glob.glob(os.path.join(MISSIONS, "*", "trajectories", "*.yaml")))
ALL_MPC = sorted(
    os.path.relpath(p, MISSIONS)
    for p in glob.glob(os.path.join(MISSIONS, "*", "mpc", "*.yaml")))

EXPECT_NU = {
    "iris": 4, "iris_px4": 4, "hexacopter370": 6,
    "hexacopter370_flying_arm_3": 9, "hexacopter680_flying_arm_2": 8,
    "hextilt": 6, "hextilt_flying_arm_5": 11,
}


class TestCorpusLoads:
    @pytest.mark.parametrize("rel", ALL_TRAJECTORIES)
    def test_trajectory_builds_and_evaluates(self, rel):
        traj = specs.load_trajectory(rel, yaml_dir=MISSIONS)
        robot = rel.split(os.sep)[0]
        assert traj.nu == EXPECT_NU[robot]
        assert traj.model.nx == len(traj.initial_state)
        spec, params = P.from_trajectory(traj, dt_ms=100, use_squash=True,
                                         integrator="IntegratedActionModelEuler")
        xs, us = fddp.default_init(spec, params)
        costs, xnexts, cT = P.calc_all(spec, params, xs, us)
        assert np.all(np.isfinite(np.asarray(costs)))
        assert np.all(np.isfinite(np.asarray(xnexts)))
        assert np.isfinite(float(cT))

    @pytest.mark.parametrize("rel", ALL_MPC)
    def test_mpc_config_loads(self, rel):
        mp = specs.load_mpc_params(rel, yaml_dir=MISSIONS)
        robot = rel.split(os.sep)[0]
        assert mp.platform.nu == EXPECT_NU[robot]
        assert mp.knots > 1 and mp.dt > 0 and mp.iters >= 1
        assert mp.solver in ("SolverSbFDDP", "SolverBoxFDDP", "SolverBoxDDP")

    def test_problem_params_from_file(self):
        """hexacopter370 displacement carries in-file problem_params."""
        traj = specs.load_trajectory("hexacopter370/trajectories/displacement.yaml",
                                     yaml_dir=MISSIONS)
        assert traj.problem_params.dt == 10
        assert traj.problem_params.use_squash is True
        spec, params = P.from_trajectory(traj)   # no explicit overrides
        assert abs(spec.dt - 0.010) < 1e-12


SOLVE_CASES = [
    # (mission, dt_ms, target_base_pos, atol)
    ("iris_px4/trajectories/displacement.yaml", 60, [2.0, 1.0, 1.5], 0.08),
    ("hexacopter680_flying_arm_2/trajectories/hover.yaml", 60, [0, 0, 2.0], 0.08),
    ("hextilt/trajectories/hover.yaml", 60, [0, 0, 2.0], 0.08),
    ("hextilt_flying_arm_5/trajectories/push_slide.yaml", 70, [1.4, 0, 1.0], 0.1),
    ("hexacopter370/trajectories/passthrough.yaml", 60, [2.0, 0, 1.5], 0.1),
]


class TestCorpusSolves:
    @pytest.mark.parametrize("rel,dt,target,atol", SOLVE_CASES,
                             ids=[c[0].split("/")[0] + "/" + c[0].split("/")[-1]
                                  for c in SOLVE_CASES])
    def test_solves_to_target(self, rel, dt, target, atol):
        traj = specs.load_trajectory(rel, yaml_dir=MISSIONS)
        spec, params = P.from_trajectory(traj, dt_ms=dt, use_squash=True,
                                         integrator="IntegratedActionModelEuler")
        res = jax.jit(lambda p: sbfddp.solve(spec, p, maxiter=150))(params)
        assert not bool(res.failed)
        xT = np.asarray(res.xs[-1])
        np.testing.assert_allclose(xT[:3], target, atol=atol)
        u = np.asarray(res.us_squash)
        lb, ub = np.asarray(params.glob.s_lb), np.asarray(params.glob.s_ub)
        assert np.all(u >= lb - 1e-9) and np.all(u <= ub + 1e-9)

    def test_rk4_mission_solves_to_target(self):
        """RK4 as a first-class mission integrator, end-to-end (reference
        IntegratedActionModelRK4 selection, src/factory/int-action.cpp:24-36;
        node-derivative parity is covered by tests/test_problem.py — this
        pins the full solve path)."""
        traj = specs.load_trajectory("iris/trajectories/hover.yaml",
                                     yaml_dir=MISSIONS)
        spec, params = P.from_trajectory(traj, dt_ms=60, use_squash=True,
                                         integrator="IntegratedActionModelRK4")
        assert spec.integrator == P.RK4
        res = jax.jit(lambda p: sbfddp.solve(spec, p, maxiter=100))(params)
        assert bool(res.feasible) and not bool(res.failed)
        xT = np.asarray(res.xs[-1])
        np.testing.assert_allclose(xT[:3], [0.0, 0.0, 2.5], atol=0.08)
        u = np.asarray(res.us_squash)
        lb, ub = np.asarray(params.glob.s_lb), np.asarray(params.glob.s_ub)
        assert np.all(u >= lb - 1e-9) and np.all(u <= ub + 1e-9)
        # RK4 at the same dt must agree with Euler on the terminal state
        # (same physics, higher-order quadrature)
        spec_e, params_e = P.from_trajectory(
            traj, dt_ms=60, use_squash=True,
            integrator="IntegratedActionModelEuler")
        res_e = jax.jit(lambda p: sbfddp.solve(spec_e, p, maxiter=100))(params_e)
        np.testing.assert_allclose(xT[:3], np.asarray(res_e.xs[-1])[:3],
                                   atol=0.05)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
