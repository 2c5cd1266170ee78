"""Multi-host execution tests: 2 emulated hosts x 2 CPU devices each via
jax.distributed (SURVEY.md §4's prescription: multi-process CPU simulation
so no real pod is needed in CI).

Validates the full multi-host pipeline end-to-end: process bootstrap over a
gRPC coordinator, a GLOBAL 4-device mesh spanning processes, per-host shard
materialization (no host holds the global batch), the sharded SbFDDP solve,
and psum-collective summaries — and pins the result against the same batch
solved single-process.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(__file__)
WORKER = os.path.join(HERE, "distributed_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def worker_results():
    port = _free_port()
    n_procs, n_local = 2, 2
    procs = []
    for pid in range(n_procs):
        env = os.environ.copy()
        env.pop("XLA_FLAGS", None)  # worker sets its own device count
        env.update({
            "EAGLE_MPC_COORDINATOR": f"127.0.0.1:{port}",
            "EAGLE_MPC_NUM_PROCS": str(n_procs),
            "EAGLE_MPC_PROC_ID": str(pid),
            "EAGLE_MPC_LOCAL_DEVICES": str(n_local),
            "EAGLE_MPC_GLOBAL_BATCH": "8",
            "JAX_CACHE_DIR": env.get("JAX_CACHE_DIR",
                                     os.path.expanduser("~/.cache/jax")),
        })
        procs.append(subprocess.Popen(
            [sys.executable, WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    results = []
    for p in procs:
        out, err = p.communicate(timeout=540)
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        line = [l for l in out.splitlines() if l.startswith("WORKER_RESULT ")]
        assert line, f"no result line in worker output:\n{out[-2000:]}"
        results.append(json.loads(line[-1][len("WORKER_RESULT "):]))
    return results


class TestMultiProcess:
    def test_topology(self, worker_results):
        for i, r in enumerate(worker_results):
            assert r["topo"]["process_count"] == 2
            assert r["topo"]["local_devices"] == 2
            assert r["topo"]["global_devices"] == 4

    def test_psum_summary_identical_across_hosts(self, worker_results):
        """The psum-reduced summary is replicated: every host must report
        the exact same numbers."""
        s0, s1 = (r["summary"] for r in worker_results)
        assert s0 == s1

    def test_matches_single_process(self, worker_results):
        """Ground truth: the same batch solved in THIS process (no
        distribution) must agree with the multi-host psum summary."""
        import jax
        import jax.numpy as jnp
        from eagle_mpc_tpu.config import specs
        from eagle_mpc_tpu.ocp import problem as P
        from eagle_mpc_tpu.solvers import sbfddp

        missions = os.path.join(HERE, "..", "missions")
        traj = specs.load_trajectory("iris/trajectories/hover.yaml",
                                     yaml_dir=missions)
        spec, params = P.from_trajectory(
            traj, dt_ms=200, use_squash=True,
            integrator="IntegratedActionModelEuler")
        B, nx = 8, spec.model.nx
        rng = np.random.default_rng(0)
        noise = rng.normal(size=(B, nx)) * 0.03
        noise[:, 3:7] = 0.0
        x0s = jnp.asarray(np.asarray(params.x0)[None] + noise)

        @jax.jit
        def solve_batch(params, x0s):
            def one(x0):
                return sbfddp.solve(spec, params._replace(x0=x0), maxiter=40)
            return jax.vmap(one)(x0s)

        res = solve_batch(params, x0s)
        s = worker_results[0]["summary"]
        assert s["n"] == B
        assert s["feasible_frac"] == float(np.asarray(res.feasible).mean())
        assert s["iters_max"] == int(np.asarray(res.iters).max())
        np.testing.assert_allclose(s["cost_mean"],
                                   float(np.asarray(res.cost).mean()),
                                   rtol=1e-6)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
