"""Parity tests for the fused Pallas node-linearization kernel.

ops/node_pallas.py re-expresses the ENTIRE per-node linearization (squash,
allocation, RNEA/CRBA dynamics, Euler step, tangent sweep, Gauss-Newton
assembly) in lane layout inside one Pallas kernel — the reference hot loop
(per-node calc/calcDiff consumed at /root/reference/src/sbfddp.cpp:241-255).
These tests pin it against the XLA path (`P.node_calc_diff`) in float64
interpret mode on realistic MPC problems, and pin the full fixed-depth solve
with the kernel enabled against the default path.
"""

import os

import numpy as np

import jax
import jax.numpy as jnp

from eagle_mpc_tpu.config import specs
from eagle_mpc_tpu.mpc import CarrotMpc
from eagle_mpc_tpu.ocp import problem as P
from eagle_mpc_tpu.ops import node_pallas
from eagle_mpc_tpu.solvers import fddp, sbfddp

MISSIONS = os.path.join(os.path.dirname(__file__), "..", "missions")


def _controller(robot, mission, dt_ref):
    traj = specs.load_trajectory(f"{robot}/trajectories/{mission}.yaml",
                                 yaml_dir=MISSIONS)
    mp = specs.load_mpc_params(f"{robot}/mpc/mpc.yaml", yaml_dir=MISSIONS)
    n_ref = traj.duration // dt_ref + 1
    ref = np.tile(np.asarray(traj.initial_state), (n_ref, 1))
    ref[:, 0] = np.linspace(0.0, 1.5, n_ref)
    return CarrotMpc(mpc_params=mp, trajectory=traj, state_ref=ref,
                     dt_ref=dt_ref), traj


def _candidates(spec, x_base, B, seed=0):
    rng = np.random.default_rng(seed)
    nx, T, nu = spec.model.nx, spec.T, spec.nu
    xs = np.tile(np.asarray(x_base), (B, T + 1, 1))
    xs += rng.normal(size=xs.shape) * 0.03
    xs[..., 3:7] /= np.linalg.norm(xs[..., 3:7], axis=-1, keepdims=True)
    us = rng.normal(size=(B, T, nu)) * 0.5 + 1.0
    return jnp.asarray(xs), jnp.asarray(us)


def _compare(ctrl, B=2, tol=1e-10):
    spec = ctrl.spec
    assert node_pallas.supported(spec)
    xs_b, us_b = _candidates(spec, np.asarray(ctrl.params0.x0), B)
    t_b = jnp.linspace(500.0, 3000.0, B)

    def cd(t, x0, xs, us, pn):
        p = ctrl.update_problem(t, P.as_device(ctrl.params0)._replace(x0=x0))
        return P.calc_diff_all(spec, p, xs, us, pallas_nodes=pn)

    ref = jax.vmap(lambda t, xs, us: cd(t, xs[0], xs, us, False))(t_b, xs_b, us_b)
    pal = jax.vmap(lambda t, xs, us: cd(t, xs[0], xs, us, True))(t_b, xs_b, us_b)
    d_ref, d_pal = ref[0], pal[0]
    for name in d_ref._fields:
        a = np.asarray(getattr(d_ref, name))
        b = np.asarray(getattr(d_pal, name))
        scale = max(float(np.max(np.abs(a))), 1e-12)
        err = float(np.max(np.abs(a - b))) / scale
        assert err < tol, (name, err)


def test_parity_iris_carrot():
    """iris (free-flyer only, nj=0): the smallest kernel instantiation."""
    ctrl, _ = _controller("iris", "hover", 30)
    _compare(ctrl, B=2)


def test_parity_flagship_carrot():
    """hexacopter370_flying_arm_3 (nj=3, all 4 activations live): the
    benchmark workload's kernel."""
    ctrl, _ = _controller("hexacopter370_flying_arm_3", "displacement", 30)
    _compare(ctrl, B=2)


def test_parity_frame_costs():
    """Frame placement/velocity residuals (quaternion-chain FK) on the
    iris_px4 displacement OFFLINE spec — the round-5 scope extension that
    puts WeightedMpc and free-dynamics offline missions on the kernel."""
    from eagle_mpc_tpu.ocp import costs as C

    traj = specs.load_trajectory("iris_px4/trajectories/displacement.yaml",
                                 yaml_dir=MISSIONS)
    spec, params = P.from_trajectory(
        traj, dt_ms=60, use_squash=True,
        integrator="IntegratedActionModelEuler")
    assert any(s.kind in (C.FRAME_PLACEMENT, C.FRAME_VELOCITY)
               for s in spec.slots)
    assert node_pallas.supported(spec)
    B = 2
    xs_b, us_b = _candidates(spec, np.asarray(params.x0), B)
    pd = P.as_device(params)

    def cd(xs, us, pn):
        return P.calc_diff_all(spec, pd, xs, us, pallas_nodes=pn)

    ref = jax.vmap(lambda xs, us: cd(xs, us, False))(xs_b, us_b)
    pal = jax.vmap(lambda xs, us: cd(xs, us, True))(xs_b, us_b)
    for name in ref[0]._fields:
        a = np.asarray(getattr(ref[0], name))
        b = np.asarray(getattr(pal[0], name))
        scale = max(float(np.max(np.abs(a))), 1e-12)
        assert float(np.max(np.abs(a - b))) / scale < 1e-10, name


def test_unbatched_falls_back():
    """Unbatched dispatch must produce the XLA path result (identical)."""
    ctrl, _ = _controller("iris", "hover", 30)
    spec = ctrl.spec
    xs_b, us_b = _candidates(spec, np.asarray(ctrl.params0.x0), 1)
    p = ctrl.update_problem(1000.0, P.as_device(ctrl.params0))
    a = P.calc_diff_all(spec, p, xs_b[0], us_b[0], pallas_nodes=True)
    b = P.calc_diff_all(spec, p, xs_b[0], us_b[0], pallas_nodes=False)
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=0, atol=0)


def test_solve_fixed_equivalence():
    """The full fixed-depth SbFDDP tick with the fused kernels (node
    linearization alone, and + the rollout kernel) converges to the same
    solution as the default path (f64; op-order differences only)."""
    ctrl, _ = _controller("iris", "hover", 30)
    spec = ctrl.spec
    B = 2
    xs_b, us_b = _candidates(spec, np.asarray(ctrl.params0.x0), B, seed=3)

    def solve(pn, pr=False):
        ss = sbfddp.SbFddpSettings(
            convergence_init=1e-3,
            solver=fddp.SolverSettings(pallas_nodes=pn, pallas_rollout=pr))

        def one(t, xs, us):
            p = ctrl.update_problem(
                t, P.as_device(ctrl.params0)._replace(x0=xs[0]))
            return sbfddp.solve_fixed(spec, p, xs, us, depth=4, settings=ss)

        return jax.vmap(one)(jnp.full((B,), 800.0), xs_b, us_b)

    r0 = solve(False)
    for r1 in (solve(True), solve(True, True)):
        assert np.array_equal(np.asarray(r0.feasible),
                              np.asarray(r1.feasible))
        assert np.array_equal(np.asarray(r0.iters), np.asarray(r1.iters))
        np.testing.assert_allclose(np.asarray(r0.cost), np.asarray(r1.cost),
                                   rtol=1e-8)
        np.testing.assert_allclose(np.asarray(r0.xs), np.asarray(r1.xs),
                                   rtol=1e-6, atol=1e-8)


def test_unsupported_spec_falls_back():
    """A contact / frame-cost spec is out of kernel scope: calc_diff_all
    with pallas_nodes=True must silently use the XLA path."""
    traj = specs.load_trajectory(
        "hexacopter370_flying_arm_3/trajectories/monkey_bar.yaml",
        yaml_dir=MISSIONS)
    spec, params = P.from_trajectory(
        traj, dt_ms=40, use_squash=True,
        integrator="IntegratedActionModelEuler")
    assert not node_pallas.supported(spec)
    xs, us = fddp.default_init(spec, P.as_device(params))
    a = P.calc_diff_all(spec, P.as_device(params), xs, us, pallas_nodes=True)
    b = P.calc_diff_all(spec, P.as_device(params), xs, us, pallas_nodes=False)
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=0, atol=0)
