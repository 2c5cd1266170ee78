"""f32-vs-f64 numeric parity table (SURVEY.md §7 "numeric parity" plan,
VERDICT r1 item 6).

The TPU serving path runs float32 (with HIGHEST matmul precision, see
ocp.problem.highest_matmul); validation runs float64 on CPU. This suite
solves the benchmark corpus in BOTH dtypes and asserts the per-config
deltas stay within the published tolerances — the committed table lives in
BASELINE.md ("f32 vs f64 parity").

Interpreting the tolerances: DDP solutions are fixed points of the
iteration, not bitwise functions of the arithmetic — f32 changes which
alphas get accepted, so intermediate trajectories differ and only the
CONVERGED quantities are comparable. The contract asserted here is the one
serving cares about: same final cost (relative), same terminal state, same
applied first control.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eagle_mpc_tpu.config import specs
from eagle_mpc_tpu.ocp import problem as P
from eagle_mpc_tpu.solvers import sbfddp

MISSIONS = os.path.join(os.path.dirname(__file__), "..", "missions")

# (mission, dt_ms, rtol_cost, atol_xT, atol_u0) — the committed table in
# BASELINE.md, set at ~3x the measured f32/f64 deltas. atol_u0=None skips
# the first-control check: robots with REDUNDANT actuation (arm platforms,
# tilted rotors) have non-unique optimal controls, and f32 legitimately
# selects a different optimizer with the same terminal state (measured:
# hexacopter680_flying_arm_2 du0=2.78 with dxT=4.7e-5).
PARITY_CASES = [
    ("iris/trajectories/hover.yaml", 60, 1e-4, 1e-3, 5e-3),
    ("iris_px4/trajectories/displacement.yaml", 60, 5e-3, 5e-3, 5e-3),
    ("hexacopter370/trajectories/displacement.yaml", 60, 2e-3, 2e-3, 1e-2),
    ("hexacopter680_flying_arm_2/trajectories/hover.yaml", 60, 1.5e-1, 1e-3, None),
    ("hextilt/trajectories/hover.yaml", 60, 1e-3, 1e-3, 3e-1),
    ("hexacopter370_flying_arm_3/trajectories/displacement.yaml", 60,
     5e-1, 1e-3, None),
    # CONTACT mission (VERDICT r3 missing #4): eagle_catch solves the
    # masked contact KKT inside every catch node. Terminal state is tight
    # (measured dxT=4.2e-5); cost/u0 are informative only (arm redundancy,
    # measured dcost=0.17, du0=1.1 — the non-unique-optimizer class above).
    ("hexacopter370_flying_arm_3/trajectories/eagle_catch.yaml", 60,
     None, 1e-3, None),
]


def _solve(rel, dt_ms, dtype):
    traj = specs.load_trajectory(rel, yaml_dir=MISSIONS)
    spec, params = P.from_trajectory(traj, dt_ms=dt_ms, use_squash=True,
                                     integrator="IntegratedActionModelEuler",
                                     dtype=dtype)
    res = jax.jit(lambda p: sbfddp.solve(spec, p, maxiter=100))(params)
    return spec, res


class TestDtypeParity:
    @pytest.mark.parametrize("rel,dt,rtol_cost,atol_x,atol_u", PARITY_CASES,
                             ids=[c[0].split("/")[0] for c in PARITY_CASES])
    def test_f32_matches_f64(self, rel, dt, rtol_cost, atol_x, atol_u):
        _, r64 = _solve(rel, dt, jnp.float64)
        spec, r32 = _solve(rel, dt, jnp.float32)
        assert bool(r64.feasible), rel
        assert bool(r32.feasible), rel

        cost64, cost32 = float(r64.cost), float(r32.cost)
        dcost = abs(cost32 - cost64) / max(abs(cost64), 1e-9)
        xT64 = np.asarray(r64.xs)[-1]
        xT32 = np.asarray(r32.xs)[-1]
        dx = np.abs(xT32 - xT64).max()
        u064 = np.asarray(r64.us_squash)[0]
        u032 = np.asarray(r32.us_squash)[0]
        du = np.abs(u032 - u064).max()
        print(f"\nPARITY {rel}: dcost_rel={dcost:.2e} dxT={dx:.2e} du0={du:.2e}")

        if rtol_cost is not None:
            assert dcost < rtol_cost, (rel, cost32, cost64)
        assert dx < atol_x, (rel, dx)
        if atol_u is not None:
            assert du < atol_u, (rel, du)

    def test_monkey_bar_contact_invariant_both_dtypes(self):
        """monkey_bar is MULTIMODAL (a swing maneuver): cold f32 and f64
        solves land in different basins (measured dxT ~ 1.0 with both
        feasible, f32's cost lower), so optimizer-identity is not the
        contract. The mission contract IS: both dtypes converge feasibly
        AND hold the bar through the contact stage (the gripper pins the
        initial contact point — acceleration-level 3D contact with zero
        Baumgarte gains, crocoddyl semantics)."""
        from eagle_mpc_tpu.dynamics import rbd

        rel = "hexacopter370_flying_arm_3/trajectories/monkey_bar.yaml"
        traj = specs.load_trajectory(rel, yaml_dir=MISSIONS)
        # dt = 40 ms as in tests/test_contacts.py: the contact is
        # acceleration-level with zero Baumgarte gains, so the positional
        # drift of the pinned point grows with the discretization — at
        # dt = 60 the hold tolerance would have to be meaninglessly loose
        dt = 40
        for dtype in (jnp.float64, jnp.float32):
            spec, params = P.from_trajectory(
                traj, dt_ms=dt, use_squash=True,
                integrator="IntegratedActionModelEuler", dtype=dtype)
            res = jax.jit(lambda p: sbfddp.solve(spec, p, maxiter=150))(params)
            assert not bool(res.failed), dtype
            assert np.isfinite(float(res.cost)), dtype
            fid = spec.contacts[0].frame_id
            x0 = np.asarray(traj.initial_state)
            p0, _ = rbd.frame_placement(spec.model,
                                        jnp.asarray(x0[: spec.model.nq],
                                                    dtype), fid)
            n_hang = 1200 // dt
            for t, tol in ((1, 2e-2), (n_hang // 2, 0.1), (n_hang - 1, 0.15)):
                p, _ = rbd.frame_placement(
                    spec.model, res.xs[t][: spec.model.nq], fid)
                np.testing.assert_allclose(np.asarray(p), np.asarray(p0),
                                           atol=tol)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q", "-s"])
