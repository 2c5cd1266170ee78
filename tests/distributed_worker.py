"""Worker process for the multi-host (jax.distributed) integration test.

Each worker is one emulated 'host' with 2 CPU devices; the job forms a
global 2-process x 2-device mesh, solves a sharded scenario batch, reduces
the summary with psum collectives, and prints it as JSON. Launched by
tests/test_distributed.py.
"""

import json
import os
import sys

# device count + platform must be fixed BEFORE backends initialize
n_local = int(os.environ["EAGLE_MPC_LOCAL_DEVICES"])
flags = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = (
    flags + f" --xla_force_host_platform_device_count={n_local}").strip()

affinity = os.environ.get("EAGLE_MPC_CPU_AFFINITY")
if affinity and hasattr(os, "sched_setaffinity"):
    # fair weak scaling on a shared box: one fixed core set per host
    os.sched_setaffinity(0, {int(c) for c in affinity.split(",")})

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from eagle_mpc_tpu.config import specs  # noqa: E402
from eagle_mpc_tpu.ocp import problem as P  # noqa: E402
from eagle_mpc_tpu.parallel import distributed as D  # noqa: E402
from eagle_mpc_tpu.parallel import mesh as mesh_mod  # noqa: E402
from eagle_mpc_tpu.solvers import sbfddp  # noqa: E402


def main():
    D.initialize()
    topo = D.process_summary()

    missions = os.path.join(os.path.dirname(__file__), "..", "missions")
    traj = specs.load_trajectory("iris/trajectories/hover.yaml",
                                 yaml_dir=missions)
    spec, params = P.from_trajectory(traj, dt_ms=200, use_squash=True,
                                     integrator="IntegratedActionModelEuler")

    mesh = mesh_mod.make_mesh()
    B = int(os.environ.get("EAGLE_MPC_GLOBAL_BATCH", "8"))
    nx = spec.model.nx

    # deterministic global batch, materialized shard-by-shard per host
    rng = np.random.default_rng(0)
    noise = rng.normal(size=(B, nx)) * 0.03
    noise[:, 3:7] = 0.0
    x0_g = np.asarray(params.x0)[None] + noise

    x0s = D.host_local_batch(B, lambda idx: x0_g[idx], mesh=mesh)

    bsh = mesh_mod.batch_sharding(mesh)
    rep = mesh_mod.replicated(mesh)

    solver_kind = os.environ.get("EAGLE_MPC_SOLVER", "while")

    if solver_kind == "fixed":
        # fixed-depth batch-aware solver: deterministic per-element work,
        # so weak scaling measures pure coordination overhead instead of
        # lockstep load imbalance (tools/scaling_bench.py selects this)
        from eagle_mpc_tpu.solvers import fddp as fddp_mod

        @jax.jit
        def solve_batch(params, x0s):
            params_b = jax.vmap(lambda x0: params._replace(x0=x0))(x0s)
            xs0 = jnp.tile(x0s[:, None, :], (1, spec.T + 1, 1))
            us0 = jnp.zeros((x0s.shape[0], spec.T, spec.nu), x0s.dtype)
            return sbfddp.solve_fixed_batched(spec, params_b, xs0, us0,
                                              depth=40, polish="fixed")
    else:
        @jax.jit
        def solve_batch(params, x0s):
            def one(x0):
                return sbfddp.solve(spec, params._replace(x0=x0), maxiter=40)
            return jax.vmap(one)(x0s)

    params_rep = jax.tree_util.tree_map(lambda a: jax.device_put(a, rep),
                                        P.as_device(params))
    res = solve_batch(params_rep, x0s)

    summarize = mesh_mod.make_sharded_summary(mesh)
    summary = summarize(res.feasible, res.failed, res.iters, res.cost)
    out = {"topo": topo, "summary": summary}

    reps = int(os.environ.get("EAGLE_MPC_TIME_REPS", "0"))
    if reps:
        import time
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            res = solve_batch(params_rep, x0s)
            # psum-summary fetch = global completion barrier
            summarize(res.feasible, res.failed, res.iters, res.cost)
            times.append(time.perf_counter() - t0)
        out["median_s"] = float(np.median(times))
        out["solves_per_s"] = B / out["median_s"]
    print("WORKER_RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
