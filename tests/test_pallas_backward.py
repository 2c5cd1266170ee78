"""Parity tests for the Pallas-fused Riccati backward pass.

Strategy (SURVEY.md §4 model: cross-implementation pinning): the fused
batch-in-lanes kernel (ops/riccati_pallas.py) must reproduce the sequential
`lax.scan` recursion — first at the isolated-core level on random PD data,
then through the FULL batched SbFDDP solve on a real mission. Off-TPU the
kernel runs in pallas interpret mode, so these tests exercise the exact
dispatch path (`custom_vmap` -> `_pallas_backward`) the TPU uses.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eagle_mpc_tpu.config import specs
from eagle_mpc_tpu.ocp import problem as P
from eagle_mpc_tpu.ops import riccati_pallas as rp
from eagle_mpc_tpu.parallel import batch
from eagle_mpc_tpu.solvers import fddp, sbfddp

import os

MISSIONS = os.path.join(os.path.dirname(__file__), "..", "missions")


def _random_core_args(B, T, ndx, nu, seed=0, dtype=jnp.float64):
    rng = np.random.default_rng(seed)

    def sym(a):
        return 0.5 * (a + np.swapaxes(a, -1, -2))

    Fx = rng.normal(size=(B, T, ndx, ndx)) * 0.3 + np.eye(ndx)
    Fu = rng.normal(size=(B, T, ndx, nu)) * 0.3
    Lx = rng.normal(size=(B, T, ndx))
    Lu = rng.normal(size=(B, T, nu))
    A = rng.normal(size=(B, T, ndx, ndx))
    Lxx = sym(A @ np.swapaxes(A, -1, -2)) + np.eye(ndx)[None, None]
    Lxu = rng.normal(size=(B, T, ndx, nu)) * 0.1
    Au = rng.normal(size=(B, T, nu, nu))
    Luu = sym(Au @ np.swapaxes(Au, -1, -2)) + 2 * np.eye(nu)[None, None]
    fs = rng.normal(size=(B, T, ndx)) * 0.05
    VxT = rng.normal(size=(B, ndx))
    Av = rng.normal(size=(B, ndx, ndx))
    VxxT = sym(Av @ np.swapaxes(Av, -1, -2)) + np.eye(ndx)[None]
    xreg = np.full((B,), 1e-9)
    ureg = np.full((B,), 1e-9)
    feas = np.zeros((B,), bool)
    return [jnp.asarray(a, dtype) if a.dtype.kind == "f" else jnp.asarray(a)
            for a in (Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, fs, VxT, VxxT,
                      xreg, ureg, feas)]


class TestCoreParity:
    @pytest.mark.parametrize("dims", [(18, 9), (12, 4), (6, 4)])
    def test_matches_sequential_scan(self, dims):
        ndx, nu = dims
        args = _random_core_args(B=5, T=7, ndx=ndx, nu=nu)
        ref = jax.vmap(rp._scan_single)(*args)
        got = jax.vmap(rp.scan_core)(*args)  # custom_vmap -> pallas kernel
        for r, g in zip(ref, got):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=1e-12, atol=1e-12)

    def test_batch_padding_to_lane_tile(self):
        # B=5 pads to 128 lanes; padded lanes must not contaminate real ones
        args = _random_core_args(B=5, T=4, ndx=6, nu=4, seed=3)
        got = jax.vmap(rp.scan_core)(*args)
        assert all(bool(jnp.all(jnp.isfinite(g))) for g in got)

    def test_unbatched_call_uses_scan(self):
        args = _random_core_args(B=1, T=5, ndx=6, nu=4, seed=4)
        single = [a[0] for a in args]
        ref = rp._scan_single(*single)
        got = rp.scan_core(*single)
        for r, g in zip(ref, got):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=0, atol=0)

    def test_scan_single_matches_fddp_backward_pass(self):
        """_scan_single re-states fddp._backward_pass's step math (reg
        floor, gap handling) without sharing code; pin them against each
        other so a solver-semantics change cannot silently diverge the
        pallas_backward path (ADVICE r3)."""
        from eagle_mpc_tpu.solvers.fddp import BackwardPassData, _backward_pass

        class _Spec:
            pass

        ndx, nu, T = 12, 5, 6
        args = _random_core_args(B=1, T=T, ndx=ndx, nu=nu, seed=6)
        (Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, fs, VxT, VxxT,
         xreg, ureg, feas) = [a[0] for a in args]

        k, K, Qu, Quuk, Vx_r, Vxx_r = rp._scan_single(
            Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, fs, VxT, VxxT,
            xreg, ureg, feas)

        # drive the real solver backward pass with the same derivative
        # blocks; terminal (cost, Lx, Lxx) chosen so its internal
        # VxxT/VxT equal ours
        from types import SimpleNamespace
        derivs = P.NodeDerivatives(
            cost=jnp.zeros((T,)), xnext=jnp.zeros((T, 1)),
            Fx=Fx, Fu=Fu, Lx=Lx, Lu=Lu, Lxx=Lxx, Lxu=Lxu, Luu=Luu)
        spec = SimpleNamespace(
            state=SimpleNamespace(ndx=ndx), nu=nu)
        I = jnp.eye(ndx, dtype=VxxT.dtype)
        LxxT_in = VxxT - float(xreg) * I
        fs_full = jnp.concatenate([jnp.zeros((1, ndx)), fs], axis=0)
        # _backward_pass forms VxT = LxT + Vxx @ fs[-1] when infeasible;
        # invert that to target the same VxT: we must append the gap row
        # it consumes as fs[-1] — use zero so VxT == LxT directly
        fs_full = jnp.concatenate([fs, jnp.zeros((1, ndx))], axis=0)
        bp = _backward_pass(spec, derivs, (jnp.zeros(()), VxT, LxxT_in),
                            fs_full, xreg, ureg, feas)
        assert isinstance(bp, BackwardPassData)
        np.testing.assert_allclose(np.asarray(bp.k), np.asarray(k),
                                   rtol=1e-11, atol=1e-11)
        np.testing.assert_allclose(np.asarray(bp.K), np.asarray(K),
                                   rtol=1e-11, atol=1e-11)
        np.testing.assert_allclose(np.asarray(bp.Vx[:-1]), np.asarray(Vx_r),
                                   rtol=1e-10, atol=1e-10)
        np.testing.assert_allclose(np.asarray(bp.Vxx[:-1]), np.asarray(Vxx_r),
                                   rtol=1e-10, atol=1e-10)

    def test_feasible_flag_zeroes_gap_terms(self):
        args = _random_core_args(B=4, T=5, ndx=6, nu=4, seed=5)
        args[-1] = jnp.ones((4,), bool)  # feasible
        args[7] = jnp.zeros_like(args[7])  # fs zeroed as _gaps would
        ref = jax.vmap(rp._scan_single)(*args)
        got = jax.vmap(rp.scan_core)(*args)
        for r, g in zip(ref, got):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=1e-12, atol=1e-12)


class TestSolveParity:
    """Full batched SbFDDP solve: pallas_backward on vs off, same results."""

    @pytest.fixture(scope="class")
    def solves(self):
        traj = specs.load_trajectory("iris/trajectories/hover.yaml",
                                     yaml_dir=MISSIONS)
        spec, params = P.from_trajectory(
            traj, dt_ms=40, use_squash=True,
            integrator="IntegratedActionModelEuler")
        bparams = batch.perturbed_x0_batch(params, n=4, scale=0.05)
        out = {}
        for flag in (False, True):
            st = sbfddp.SbFddpSettings(
                solver=fddp.SolverSettings(pallas_backward=flag))
            solve = batch.make_batch_solver(spec, maxiter=40, settings=st)
            out[flag] = solve(bparams)
        return out

    def test_both_feasible(self, solves):
        for flag, res in solves.items():
            assert bool(jnp.all(res.feasible)), f"pallas_backward={flag}"

    def test_identical_convergence(self, solves):
        a, b = solves[False], solves[True]
        np.testing.assert_array_equal(np.asarray(a.iters), np.asarray(b.iters))
        np.testing.assert_allclose(np.asarray(b.cost), np.asarray(a.cost),
                                   rtol=1e-9)

    def test_trajectories_match(self, solves):
        a, b = solves[False], solves[True]
        np.testing.assert_allclose(np.asarray(b.xs), np.asarray(a.xs),
                                   rtol=1e-7, atol=1e-7)
        np.testing.assert_allclose(np.asarray(b.us), np.asarray(a.us),
                                   rtol=1e-7, atol=1e-7)
