"""Honest A/B of the fused node-linearization kernel (VERDICT r4 item 1).

Measures the batched `P.calc_diff_all` (the ~37 ms/iteration bottleneck of
the round-4 profile) with the XLA per-node path vs the fused Pallas kernel
(ops/node_pallas.py), then the full fixed tick both ways. Measurement rules
(BASELINE.md): scalar host fetch as the completion barrier on BOTH sides —
``block_until_ready`` does not reliably wait on tunneled TPU runtimes — and
the trivial round-trip floor measured first.

Usage: python tools/profile_node_pallas.py [--batch 512] [--cpu] [--reps 5]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--alphas", type=int, default=4)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--skip-tick", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR",
                                     os.path.expanduser("~/.cache/jax")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from eagle_mpc_tpu.config import specs
    from eagle_mpc_tpu.mpc import CarrotMpc
    from eagle_mpc_tpu.ocp import problem as P
    from eagle_mpc_tpu.solvers import fddp, sbfddp
    from tools.make_ref import load_ref

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    missions = os.path.join(root, "missions")
    dtype = jnp.float32
    np_dtype = np.float32
    dt_ref = 30

    traj = specs.load_trajectory(
        "hexacopter370_flying_arm_3/trajectories/displacement.yaml",
        yaml_dir=missions)
    mp = specs.load_mpc_params("hexacopter370_flying_arm_3/mpc/mpc.yaml",
                               yaml_dir=missions)
    ref, _ = load_ref("hexacopter370_flying_arm_3", "displacement", dt_ref,
                      traj=traj)
    ctrl = CarrotMpc(mpc_params=mp, trajectory=traj, state_ref=ref,
                     dt_ref=dt_ref)
    params0 = jax.tree_util.tree_map(
        lambda x: np.asarray(x, np_dtype) if hasattr(x, "astype") else x,
        ctrl.params0)
    spec = ctrl.spec
    T, nu, nx = spec.T, spec.nu, mp.model.nx

    B = args.batch
    rng = np.random.default_rng(0)
    noise = rng.normal(size=(B, nx)).astype(np_dtype) * 0.05
    noise[:, 3:7] = 0.0
    x0b = jnp.asarray(ref[100].astype(np_dtype)[None] + noise)
    m = float(mp.model.inertia[0][0, 0])
    hover = m * 9.81 / mp.platform.n_rotors
    xs = jnp.tile(x0b[:, None, :], (1, T + 1, 1))
    us = jnp.zeros((B, T, nu), dtype=dtype)
    us = us.at[:, :, : mp.platform.n_rotors].set(hover)
    t_ms = jnp.full((B,), 3000.0, dtype=dtype)

    def scalar_time(fn, *a):
        out = fn(*a)
        _ = float(out)
        ts = []
        for _i in range(args.reps):
            t0 = time.perf_counter()
            out = fn(*a)
            _ = float(out)
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) * 1e3

    @jax.jit
    def trivial(x0b):
        return jnp.sum(x0b * 2.0)

    def make_cd(pn):
        @jax.jit
        def cd(params, t_ms, x0b, xs, us):
            def one(t, x0, xs, us):
                p = ctrl.update_problem(t, params._replace(x0=x0))
                derivs, term = P.calc_diff_all(spec, p, xs, us,
                                               pallas_nodes=pn)
                return (jnp.sum(derivs.cost) + term[0]
                        + jnp.sum(derivs.Fx[0]) + jnp.sum(derivs.Lxx[-1]))
            return jnp.sum(jax.vmap(one)(t_ms, x0b, xs, us))
        return cd

    def make_tick(pn, pr=False, pb=False):
        ss = fddp.SolverSettings(pallas_nodes=pn, pallas_rollout=pr,
                                 pallas_backward=pb)
        sbs = sbfddp.SbFddpSettings(convergence_init=1e-3, solver=ss)

        @jax.jit
        def tick(params, t_ms, x0b, xs, us):
            def one(t, x0, xs, us):
                p = ctrl.update_problem(t, params._replace(x0=x0))
                r = sbfddp.solve_fixed(spec, p, xs, us, depth=2, settings=sbs,
                                       n_alphas=args.alphas,
                                       polish="while_fixed", polish_maxiter=1)
                return r.cost + jnp.sum(r.us_squash)
            return jnp.sum(jax.vmap(one)(t_ms, x0b, xs, us))
        return tick

    phases = [
        ("trivial (floor)", trivial, (x0b,)),
        ("calc_diff XLA", make_cd(False), (params0, t_ms, x0b, xs, us)),
        ("calc_diff PALLAS", make_cd(True), (params0, t_ms, x0b, xs, us)),
    ]
    if not args.skip_tick:
        phases += [
            ("tick XLA", make_tick(False), (params0, t_ms, x0b, xs, us)),
            ("tick PALLAS", make_tick(True), (params0, t_ms, x0b, xs, us)),
            ("tick PALLAS+ROLL", make_tick(True, True),
             (params0, t_ms, x0b, xs, us)),
            ("tick ALL-KERNELS", make_tick(True, True, True),
             (params0, t_ms, x0b, xs, us)),
        ]
    platform = jax.devices()[0].platform
    print(f"platform={platform} B={B} T={T} f32 scalar-fetch reps={args.reps}")
    for name, fn, a in phases:
        t0 = time.time()
        try:
            ms = scalar_time(fn, *a)
        except Exception as e:
            print(f"  {name:18s} FAILED: {type(e).__name__}: {e}",
                  flush=True)
            continue
        print(f"  {name:18s} {ms:9.2f} ms   (compile+run wall "
              f"{time.time()-t0:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
