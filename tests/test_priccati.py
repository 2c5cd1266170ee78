"""Time-parallel Riccati (associative scan) vs the sequential backward pass.

The two must agree to round-off on the same LQR subproblem — gains, value
gradients/Hessians, and full solves (solvers/priccati.py equivalence
argument)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eagle_mpc_tpu.config import specs
from eagle_mpc_tpu.ocp import problem as P
from eagle_mpc_tpu.solvers import fddp, priccati

MISSIONS = os.path.join(os.path.dirname(__file__), "..", "missions")


@pytest.fixture(scope="module")
def problem():
    traj = specs.load_trajectory("iris/trajectories/hover.yaml",
                                 yaml_dir=MISSIONS)
    spec, params = P.from_trajectory(traj, dt_ms=100, use_squash=True,
                                     integrator="IntegratedActionModelEuler")
    return spec, params


def _candidate(spec, params, seed=0):
    rng = np.random.default_rng(seed)
    T = spec.T
    xs = np.tile(np.asarray(params.x0), (T + 1, 1))
    xs[:, :3] += 0.1 * rng.standard_normal((T + 1, 3))
    xs[:, 7:] += 0.05 * rng.standard_normal((T + 1, xs.shape[1] - 7))
    us = 0.1 * rng.standard_normal((T, spec.nu))
    return jnp.asarray(xs), jnp.asarray(us)


@pytest.mark.parametrize("feasible", [False, True])
@pytest.mark.parametrize("reg", [1e-9, 1e-3])
def test_backward_pass_matches_sequential(problem, feasible, reg):
    spec, params = problem
    xs, us = _candidate(spec, params)
    feas = jnp.asarray(feasible)
    xreg = jnp.asarray(reg, xs.dtype)
    ureg = jnp.asarray(reg, xs.dtype)

    derivs, term = P.calc_diff_all(spec, params, xs, us)
    fs = fddp._gaps(spec, params, xs, derivs, feas)

    bp_seq = fddp._backward_pass(spec, derivs, term, fs, xreg, ureg, feas)
    bp_par = priccati.parallel_backward_pass(spec, derivs, term, fs,
                                             xreg, ureg, feas)

    assert bool(bp_seq.ok) and bool(bp_par.ok)
    np.testing.assert_allclose(bp_par.Vxx, bp_seq.Vxx, rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(bp_par.Vx, bp_seq.Vx, rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(bp_par.k, bp_seq.k, rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(bp_par.K, bp_seq.K, rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(bp_par.Qu, bp_seq.Qu, rtol=1e-8, atol=1e-9)


def test_full_solve_matches_sequential(problem):
    spec, params = problem
    xs0, us0 = fddp.default_init(spec, params)
    maxiter = jnp.asarray(30, jnp.int32)
    th = jnp.asarray(1e-9, xs0.dtype)

    seq = jax.jit(lambda p: fddp.solve_fddp(
        spec, fddp.SolverSettings(), p, xs0, us0, maxiter, th))(params)
    par = jax.jit(lambda p: fddp.solve_fddp(
        spec, fddp.SolverSettings(parallel_riccati=True), p, xs0, us0,
        maxiter, th))(params)

    assert bool(par.feasible) == bool(seq.feasible)
    # identical arithmetic path up to reductions: costs agree tightly
    np.testing.assert_allclose(float(par.cost), float(seq.cost),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(par.xs), np.asarray(seq.xs),
                               rtol=1e-4, atol=1e-6)


def test_long_horizon_scan(problem):
    """The parallel pass must stay finite and self-consistent on a long
    horizon (its raison d'être): T = 550 nodes at dt=2ms."""
    traj = specs.load_trajectory("iris/trajectories/hover.yaml",
                                 yaml_dir=MISSIONS)
    spec, params = P.from_trajectory(traj, dt_ms=2, use_squash=True,
                                     integrator="IntegratedActionModelEuler")
    assert spec.T >= 500
    xs, us = _candidate(spec, params, seed=1)
    derivs, term = P.calc_diff_all(spec, params, xs, us)
    fs = fddp._gaps(spec, params, xs, derivs, jnp.asarray(False))
    z = jnp.asarray(1e-9, xs.dtype)
    bp_par = priccati.parallel_backward_pass(spec, derivs, term, fs, z, z,
                                             jnp.asarray(False))
    bp_seq = fddp._backward_pass(spec, derivs, term, fs, z, z,
                                 jnp.asarray(False))
    assert bool(bp_par.ok)
    np.testing.assert_allclose(bp_par.k, bp_seq.k, rtol=1e-6, atol=1e-7)
