"""Pinning tests for the documented semantic deviations from the reference
solver (VERDICT r1 item 7).

The deviations (all selectable via SolverSettings flags so the reference
behavior stays testable):

- ``th_diverge = 1e8`` vs crocoddyl's raiseIfNaN bound of 1e30
  (/root/reference/src/sbfddp.cpp:444-448). This is the load-bearing one:
  the DDP polish's unconditional infeasible-accept (sbfddp.cpp:358-366,
  ``!is_feasible_`` branch) can RATCHET a pathological scenario's cost and
  pre-squash controls upward across warm-started MPC re-solves; at f32 the
  1e30 bound gives it 20+ decades of room.
- ``|d0| < th_grad`` vs the signed test (sbfddp.cpp:272), and the
  non-negative stop-value guard. No ISOLATED mission-level reproduction was
  found once the divergence bound is in place (the bound subsumes the
  blow-up path); they are kept as conservative hardening, and
  ``test_flags_equivalent_on_nominal`` demonstrates they do not change
  nominal behavior. Tight solver parity with reference semantics in the
  normal regime is separately pinned by tests/test_oracle.py.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eagle_mpc_tpu.config import specs
from eagle_mpc_tpu.mpc import CarrotMpc
from eagle_mpc_tpu.ocp import problem as P
from eagle_mpc_tpu.solvers import fddp, sbfddp

MISSIONS = os.path.join(os.path.dirname(__file__), "..", "missions")


@pytest.fixture(scope="module")
def flagship_ctrl():
    traj = specs.load_trajectory(
        "hexacopter370_flying_arm_3/trajectories/displacement.yaml",
        yaml_dir=MISSIONS)
    mp = specs.load_mpc_params("hexacopter370_flying_arm_3/mpc/mpc.yaml",
                               yaml_dir=MISSIONS)
    n_ref = traj.duration // 30 + 1
    ref = np.tile(np.asarray(traj.initial_state), (n_ref, 1))
    ref[:, 0] = np.linspace(0, 2, n_ref)
    ctrl = CarrotMpc(mpc_params=mp, trajectory=traj, state_ref=ref, dt_ref=30)
    return ctrl


def _repeated_resolve(ctrl, solver_settings, K=15, B=16):
    """The ratchet stress: B scenarios re-solved K times at the same
    (t, x0) with carried warm candidates, in float32 (where the reference's
    f64 margins are gone). Returns (max cost, max |pre-squash u|)."""
    params0 = jax.tree_util.tree_map(
        lambda x: np.asarray(x, np.float32) if hasattr(x, "astype") else x,
        ctrl.params0)
    spec = ctrl.spec
    T, nu = spec.T, spec.nu
    nx = spec.model.nx
    rng = np.random.default_rng(0)
    noise = rng.normal(size=(B, nx)).astype(np.float32) * 0.05
    noise[:, 3:7] = 0
    x0b = jnp.asarray(np.asarray(params0.x0, np.float32)[None] + noise)
    m = float(spec.model.inertia[0][0, 0])
    hover = m * 9.81 / 6
    st = sbfddp.SbFddpSettings(convergence_init=1e-3, solver=solver_settings)

    @jax.jit
    def chunk(params, x0b, xs, us):
        def tick(carry, _):
            xs, us = carry

            def one(x0, xs, us):
                p = ctrl.update_problem(0.0, params._replace(x0=x0))
                r = ctrl.solve(p, xs, us, settings=st)
                return r.xs, r.us, r.cost

            xs, us, cost = jax.vmap(one)(x0b, xs, us)
            return (xs, us), (cost.max(), jnp.abs(us).max())

        (_, _), (cmax, umax) = jax.lax.scan(tick, (xs, us), None, length=K)
        return cmax, umax

    xs = jnp.tile(x0b[:, None, :], (1, T + 1, 1))
    us = jnp.zeros((B, T, nu), jnp.float32).at[:, :, :6].set(hover)
    cmax, umax = chunk(params0, x0b, xs, us)
    return float(np.asarray(cmax).max()), float(np.asarray(umax).max())


class TestDivergenceGuard:
    def test_warm_resolve_bounded_with_defaults(self, flagship_ctrl):
        cmax, umax = _repeated_resolve(flagship_ctrl, fddp.SolverSettings())
        assert np.isfinite(cmax) and np.isfinite(umax)
        assert cmax < fddp.SolverSettings().th_diverge

    def test_reference_semantics_ratchet(self, flagship_ctrl):
        """With the reference's 1e30 divergence bound and acceptance
        semantics, the repeated f32 re-solve ratchets a scenario's cost past
        1e8 — the failure mode our tightened bound prevents."""
        ref_settings = fddp.SolverSettings(
            th_diverge=1e30, crocoddyl_signed_d0=True,
            crocoddyl_negstep_always=True, crocoddyl_signed_stop=True)
        cmax, _ = _repeated_resolve(flagship_ctrl, ref_settings)
        assert cmax > 1e8, "reference semantics no longer ratchet; " \
                           "re-evaluate whether the deviations are needed"


class TestNominalEquivalence:
    def test_flags_equivalent_on_nominal(self):
        """On a nominal offline solve (f64), the robustness deviations are
        inert: reference-semantics flags produce the same solution."""
        traj = specs.load_trajectory("iris/trajectories/hover.yaml",
                                     yaml_dir=MISSIONS)
        spec, params = P.from_trajectory(
            traj, dt_ms=100, use_squash=True,
            integrator="IntegratedActionModelEuler")
        ref_settings = sbfddp.SbFddpSettings(solver=fddp.SolverSettings(
            th_diverge=1e30, crocoddyl_signed_d0=True,
            crocoddyl_negstep_always=True, crocoddyl_signed_stop=True))
        r_ours = jax.jit(lambda p: sbfddp.solve(spec, p, maxiter=60))(params)
        r_ref = jax.jit(lambda p: sbfddp.solve(spec, p, maxiter=60,
                                               settings=ref_settings))(params)
        assert bool(r_ours.feasible) and bool(r_ref.feasible)
        # the non-negative stop guard refuses to declare convergence on a
        # cost-increasing accepted step: it never stops EARLIER than the
        # reference semantics and the extra iterations can only improve the
        # solution (measured on this mission: 2.3623 vs 2.4240, ~2.5% lower)
        assert int(r_ours.iters) >= int(r_ref.iters)
        assert float(r_ours.cost) <= float(r_ref.cost) * (1 + 1e-9)
        # both still solve the mission (same target, same bounds)
        np.testing.assert_allclose(np.asarray(r_ours.xs)[-1, :3],
                                   np.asarray(r_ref.xs)[-1, :3], atol=5e-2)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
