"""Microbenchmark the per-node math on the current backend: which part of
node_calc / node_calc_diff burns the time (CRBA? Cholesky? frame kinematics?
residuals?). N = B*T parallel evaluations, the calc_all workload shape.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, reps=10):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=512 * 29)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import jax.scipy.linalg as jsl

    from eagle_mpc_tpu.config import specs
    from eagle_mpc_tpu.dynamics import rbd
    from eagle_mpc_tpu.ocp import costs as C
    from eagle_mpc_tpu.ocp import problem as P

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    missions = os.path.join(root, "missions")
    traj = specs.load_trajectory(
        "hexacopter370_flying_arm_3/trajectories/displacement.yaml",
        yaml_dir=missions)
    spec, params = P.from_trajectory(traj, dt_ms=30, use_squash=True,
                                     integrator="IntegratedActionModelEuler",
                                     dtype=jnp.float32)
    model = spec.model
    st = spec.state
    N = args.n
    rng = np.random.default_rng(0)
    x0 = np.asarray(traj.initial_state, dtype=np.float32)
    q = jnp.asarray(np.tile(x0[: st.nq], (N, 1)) +
                    0.01 * rng.normal(size=(N, st.nq)).astype(np.float32))
    q = q.at[:, 3:7].set(q[:, 3:7] / jnp.linalg.norm(q[:, 3:7], axis=1, keepdims=True))
    v = jnp.asarray(0.1 * rng.normal(size=(N, st.nv)).astype(np.float32))
    tau = jnp.asarray(rng.normal(size=(N, st.nv)).astype(np.float32))
    x = jnp.concatenate([q, v], axis=1)
    s = jnp.asarray(rng.normal(size=(N, spec.nu)).astype(np.float32))
    M = jax.jit(jax.vmap(lambda q: rbd.crba(model, q)))(q)
    view = P.node_view(params.node, 0)
    view = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a.astype(jnp.float32), (N,) + a.shape)
        if hasattr(a, "astype") else a, view)
    glob = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32) if hasattr(a, "astype") else a,
        params.glob)

    cases = {
        "crba": jax.jit(jax.vmap(lambda q: rbd.crba(model, q))),
        "bias(rnea)": jax.jit(jax.vmap(lambda q, v: rbd.bias_force(model, q, v))),
        "cho_factor+solve": jax.jit(jax.vmap(
            lambda M, t: jsl.cho_solve(jsl.cho_factor(M, lower=True), t))),
        "linalg_solve": jax.jit(jax.vmap(lambda M, t: jnp.linalg.solve(M, t))),
        "fwd_dynamics": jax.jit(jax.vmap(
            lambda q, v, t: rbd.fwd_dynamics(model, q, v, t))),
        "frame_placement": jax.jit(jax.vmap(
            lambda q: rbd.frame_placement(model, q, spec.slots[0].frame_id
                                          if spec.slots[0].frame_id >= 0 else 1)[0])),
        "node_calc": jax.jit(jax.vmap(
            lambda view, x, s: P.node_calc(spec, view, glob, x, s))),
        "node_calc_diff": jax.jit(jax.vmap(
            lambda view, x, s: P.node_calc_diff(spec, view, glob, x, s))),
    }
    argmap = {
        "crba": (q,),
        "bias(rnea)": (q, v),
        "cho_factor+solve": (M, tau),
        "linalg_solve": (M, tau),
        "fwd_dynamics": (q, v, tau),
        "frame_placement": (q,),
        "node_calc": (view, x, s),
        "node_calc_diff": (view, x, s),
    }
    print(f"platform={jax.devices()[0].platform} N={N} nv={st.nv} nu={spec.nu}")
    for name, fn in cases.items():
        t0 = time.time()
        ms = timeit(fn, *argmap[name])
        print(f"  {name:18s} {ms:9.3f} ms   (wall {time.time()-t0:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
