"""Mesh sharding + batched solver tests on the virtual 8-device CPU mesh
(SURVEY.md §4: multi-device tests via xla_force_host_platform_device_count)."""

import jax
import jax.numpy as jnp
import numpy as np
import os
import pytest

from eagle_mpc_tpu.config import specs
from eagle_mpc_tpu.ocp import problem as P
from eagle_mpc_tpu.parallel import (batch_sharding, convergence_summary,
                                    make_batch_solver, make_mesh,
                                    perturbed_x0_batch, shard_batch)

MISSIONS = os.path.join(os.path.dirname(__file__), "..", "missions")


@pytest.fixture(scope="module")
def small_problem():
    traj = specs.load_trajectory("iris/trajectories/hover.yaml", yaml_dir=MISSIONS)
    return P.from_trajectory(traj, dt_ms=100, use_squash=True,
                             integrator="IntegratedActionModelEuler")


class TestMesh:
    def test_make_mesh_uses_all_devices(self):
        mesh = make_mesh()
        assert mesh.devices.size == len(jax.devices()) == 8

    def test_shard_batch_places_leading_axis(self, small_problem):
        spec, params = small_problem
        mesh = make_mesh()
        bp = perturbed_x0_batch(params, 16)
        bp = shard_batch(mesh, bp)
        sh = bp.x0.sharding
        assert sh.is_equivalent_to(batch_sharding(mesh), bp.x0.ndim)

    def test_shard_batch_replicates_divisible_non_batch_leaf(self):
        """A horizon-shaped (24, 3) leaf is divisible by the 8-device mesh
        but is NOT the batch — it must be replicated, not axis-0 sharded
        (the silent mis-sharding pinned by VERDICT r2 item 8)."""
        mesh = make_mesh()
        tree = {"x0": jnp.zeros((16, 13)), "horizon": jnp.zeros((24, 3)),
                "scalar": jnp.zeros(())}
        out = shard_batch(mesh, tree, batch_size=16)
        assert out["x0"].sharding.is_equivalent_to(batch_sharding(mesh), 2)
        assert out["horizon"].sharding.is_fully_replicated
        # inferred batch (largest leading axis) also picks 24 here — the
        # explicit contract is what prevents the false positive
        out2 = shard_batch(mesh, tree)
        assert out2["horizon"].sharding.is_equivalent_to(batch_sharding(mesh), 2)
        assert out2["x0"].sharding.is_fully_replicated

    def test_shard_batch_rejects_indivisible_batch(self):
        mesh = make_mesh()
        with pytest.raises(ValueError):
            shard_batch(mesh, {"x0": jnp.zeros((10, 3))}, batch_size=10)


class TestBatchedSolve:
    def test_sharded_matches_unsharded(self, small_problem):
        """SPMD partitioning must not change results: the mesh-sharded batch
        solve equals the single-device vmap bitwise (pure data parallel)."""
        spec, params = small_problem
        B = 16
        bp = perturbed_x0_batch(params, B, scale=0.02)

        plain = make_batch_solver(spec, maxiter=20)(bp)

        mesh = make_mesh()
        bp_sh = shard_batch(mesh, bp)
        sharded = make_batch_solver(spec, maxiter=20, mesh=mesh)(bp_sh)

        np.testing.assert_array_equal(np.asarray(plain.xs), np.asarray(sharded.xs))
        np.testing.assert_array_equal(np.asarray(plain.iters), np.asarray(sharded.iters))
        np.testing.assert_array_equal(np.asarray(plain.cost), np.asarray(sharded.cost))

    def test_diverged_element_does_not_poison_batch(self, small_problem):
        """Failure isolation (SURVEY.md §5): an absurd scenario may fail, the
        rest of the batch must still converge normally."""
        spec, params = small_problem
        B = 8
        bp = perturbed_x0_batch(params, B, scale=0.01)
        # poison element 3 with a non-finite initial state
        x0 = np.array(bp.x0)
        x0[3] = np.nan
        bp = bp._replace(x0=jnp.asarray(x0))
        res = make_batch_solver(spec, maxiter=20)(bp)
        ok = np.ones(B, dtype=bool)
        ok[3] = False
        assert np.all(np.asarray(res.feasible)[ok])
        assert np.all(np.isfinite(np.asarray(res.cost)[ok]))
        assert not bool(np.asarray(res.feasible)[3])

    def test_summary(self, small_problem):
        spec, params = small_problem
        res = make_batch_solver(spec, maxiter=30)(perturbed_x0_batch(params, 4))
        s = convergence_summary(res)
        assert s["n"] == 4 and 0.0 <= s["feasible_frac"] <= 1.0


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
