"""Round benchmark: batched carrot-MPC solves/s/chip on the flagship robot.

Headline metric (BASELINE.json): SbFDDP carrot-MPC re-solves per second per
chip on hexacopter370_flying_arm_3 (horizon 30 knots x 30 ms, Euler, 2
solver iterations per tick — the reference's real-time budget,
/root/reference/yaml/hexacopter370_flying_arm_3/mpc/mpc.yaml). One "solve"
is a full MPC tick: parameter update (stage lookup + reference re-aiming)
plus the warm-started 2-iteration SbFDDP solve. Scenarios are batched
(vmap) and the batch is what saturates the chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is against the 1000 solves/s/chip north-star target.

Usage: python bench.py [--batch B] [--reps R] [--dtype f32|f64]
"""

import argparse
import json
import os
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--dtype", choices=["f32", "f64"], default="f32")
    ap.add_argument("--cpu", action="store_true", help="force CPU platform")
    ap.add_argument("--unroll", type=int, default=1, help="T-axis scan unroll")
    ap.add_argument("--alphas", type=int, default=10, help="line-search steps")
    args = ap.parse_args()

    import jax

    # persistent compile cache: the tick program is large (while_loop solver
    # over T=30), and the host here is small — never pay XLA twice.
    # User-scoped default path so a shared host can't collide on /tmp perms.
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR",
                                     os.path.expanduser("~/.cache/jax")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.dtype == "f64":
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from eagle_mpc_tpu.config import specs
    from eagle_mpc_tpu.mpc import CarrotMpc

    root = os.path.dirname(os.path.abspath(__file__))
    missions = os.path.join(root, "missions")
    dtype = jnp.float64 if args.dtype == "f64" else jnp.float32
    dt_ref = 30

    traj = specs.load_trajectory(
        "hexacopter370_flying_arm_3/trajectories/displacement.yaml",
        yaml_dir=missions)
    mp = specs.load_mpc_params("hexacopter370_flying_arm_3/mpc/mpc.yaml",
                               yaml_dir=missions)

    # synthetic reference path (straight-line glide to the waypoint): the
    # tick cost is independent of reference quality at a fixed iteration
    # budget, and the bench must not pay a full offline solve
    n_ref = traj.duration // dt_ref + 1
    ref = np.tile(np.asarray(traj.initial_state), (n_ref, 1))
    ref[:, 0] = np.linspace(0.0, 2.0, n_ref)
    ref[:, 1] = np.linspace(0.0, 0.5, n_ref)

    ctrl = CarrotMpc(mpc_params=mp, trajectory=traj, state_ref=ref, dt_ref=dt_ref)
    # rebuild params at the bench dtype
    params0 = jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if hasattr(x, "astype") else x, ctrl.params0)

    T, nu, nx = ctrl.spec.T, ctrl.spec.nu, mp.model.nx
    m = float(mp.model.inertia[0][0, 0])
    hover = m * 9.81 / mp.platform.n_rotors

    B = args.batch
    rng = np.random.default_rng(0)
    noise = rng.normal(size=(B, nx)) * 0.05
    noise[:, 3:7] = 0.0
    x0b = jnp.asarray(np.asarray(traj.initial_state)[None] + noise, dtype=dtype)
    xs_w = jnp.tile(x0b[:, None, :], (1, T + 1, 1))
    us_w = jnp.zeros((B, T, nu), dtype=dtype)
    us_w = us_w.at[:, :, : mp.platform.n_rotors].set(hover)
    t_ms = jnp.zeros((B,), dtype=dtype)

    from eagle_mpc_tpu.solvers import fddp, sbfddp

    settings = sbfddp.SbFddpSettings(
        convergence_init=1e-3,
        solver=fddp.SolverSettings(scan_unroll=args.unroll,
                                   n_alphas=args.alphas))

    def tick(t, x0, xs, us):
        params = ctrl.update_problem(t, params0._replace(x0=x0))
        res = ctrl.solve(params, xs, us, settings=settings)
        return res.xs, res.us, res.us_squash[0], res.cost

    step = jax.jit(jax.vmap(tick))

    # warm-up / compile
    t0 = time.time()
    out = step(t_ms, x0b, xs_w, us_w)
    jax.block_until_ready(out)
    compile_s = time.time() - t0

    # steady-state timing: feed each tick's candidate to the next (the real
    # MPC warm-start pattern)
    xs_w, us_w = out[0], out[1]
    times = []
    for _ in range(args.reps):
        t0 = time.time()
        out = step(t_ms, x0b, xs_w, us_w)
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    med = float(np.median(times))
    solves_per_s = B / med

    platform = jax.devices()[0].platform
    print(f"# platform={platform} dtype={args.dtype} B={B} T={T} "
          f"compile={compile_s:.1f}s median_tick={med*1e3:.2f}ms "
          f"p50_latency_per_solve={med/B*1e6:.1f}us "
          f"cost_finite={bool(np.all(np.isfinite(np.asarray(out[3]))))}",
          file=sys.stderr)
    print(json.dumps({
        "metric": "carrot_mpc_solves_per_s_per_chip_hexacopter370_flying_arm_3",
        "value": round(solves_per_s, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / 1000.0, 3),
    }))


if __name__ == "__main__":
    main()
