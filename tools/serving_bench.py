"""Single-robot serving latency: ONE robot re-solved every control tick.

The reference's canonical real-time workload
(/root/reference/examples/python/mpc.py:49-61): per tick, set x0 from the
plant, updateProblem(t), warm-started 2-iteration SbFDDP solve, apply
us_squash[0]. Budget: the 30 ms node duration of the flagship MPC config
(20 ms for iris_px4); the demo itself re-solves every 2 ms of sim time.

Two numbers are reported per platform:

- ``device_tick``: latency of one tick when the loop lives ON DEVICE
  (plant + solver in one program; K chained ticks in a lax.scan, scalar
  fetch, divided by K). This is the on-robot configuration: the controller
  and simulator/plant-model share the accelerator.
- ``roundtrip_tick``: one jit call per tick with x0 uploaded from host and
  u0 fetched back — the configuration where sensors/actuators force a host
  hop every tick. On a tunneled/remote accelerator this is dominated by
  transport, not compute.

Usage: python tools/serving_bench.py [--cpu] [--ticks 50]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--ticks", type=int, default=50)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--while-solver", action="store_true",
                    help="round-3 while-loop tick instead of the fixed path")
    ap.add_argument("--t0", type=float, default=3500.0,
                    help="mission time (ms) of the first tick — the default "
                         "crosses the wp2 stage transition + carrot tail, "
                         "matching bench.py's realistic region")
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
    from eagle_mpc_tpu.sim import AerialSimulator
    from eagle_mpc_tpu.solvers import fddp, sbfddp

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    missions = os.path.join(root, "missions")
    dt_ref = 30
    traj = specs.load_trajectory(
        "hexacopter370_flying_arm_3/trajectories/displacement.yaml",
        yaml_dir=missions)
    mp = specs.load_mpc_params("hexacopter370_flying_arm_3/mpc/mpc.yaml",
                               yaml_dir=missions)
    # offline reference: the cached real solve when present (the artifact
    # bench.py tracks), else the synthetic glide (VERDICT r3 weak #6)
    from tools.make_ref import ref_path

    rp = ref_path("hexacopter370_flying_arm_3", "displacement", dt_ref)
    if os.path.exists(rp):
        with np.load(rp) as z:
            ref = z["xs"].copy()
    else:
        n_ref = traj.duration // dt_ref + 1
        ref = np.tile(np.asarray(traj.initial_state), (n_ref, 1))
        ref[:, 0] = np.linspace(0.0, 2.0, n_ref)
        args.t0 = 0.0  # synthetic glide has no transition to cross
    ctrl = CarrotMpc(mpc_params=mp, trajectory=traj, state_ref=ref, dt_ref=dt_ref)
    params0 = jax.tree_util.tree_map(
        lambda x: np.asarray(x, np.float32) if hasattr(x, "astype") else x,
        ctrl.params0)
    sim = AerialSimulator.from_platform(mp.model, mp.platform, dt_ms=2)
    spec = ctrl.spec
    T, nu = spec.T, spec.nu
    settings = sbfddp.SbFddpSettings(convergence_init=1e-3,
                                     solver=fddp.SolverSettings())
    K = args.ticks

    # start at the realistic-region state (on the tracked reference at t0)
    i0 = min(int(args.t0 // dt_ref), ref.shape[0] - 1)
    x0 = jnp.asarray(np.asarray(ref[i0], np.float32))
    m = float(mp.model.inertia[0][0, 0])
    hover = m * 9.81 / mp.platform.n_rotors
    xs0 = jnp.tile(x0, (T + 1, 1))
    us0 = jnp.zeros((T, nu), jnp.float32).at[:, :6].set(hover)

    def one_tick(t_ms, x, xs, us):
        p = ctrl.update_problem(t_ms, jax.tree_util.tree_map(jnp.asarray, params0)._replace(x0=x))
        r = ctrl.solve(p, xs, us, settings=settings,
                       fixed=not args.while_solver)
        u = r.us_squash[0]
        x_next = sim.step(x, u)
        return x_next, r.xs, r.us, u, r.cost

    # --- device-resident loop -------------------------------------------
    @jax.jit
    def run_k(x, xs, us):
        def step(carry, k):
            x, xs, us = carry
            x, xs, us, u, cost = one_tick(args.t0 + k * 2.0, x, xs, us)
            return (x, xs, us), cost
        (x, xs, us), costs = jax.lax.scan(step, (x, xs, us), jnp.arange(K, dtype=jnp.float32))
        return costs, x, xs, us

    t0 = time.time()
    costs, x, xs, us = run_k(x0, xs0, us0)
    _ = np.asarray(costs)
    compile_s = time.time() - t0
    ts = []
    for _i in range(args.reps):
        t0 = time.perf_counter()
        costs, x, xs, us = run_k(x0, xs0, us0)
        _ = np.asarray(costs)
        ts.append((time.perf_counter() - t0) / K)
    device_tick_ms = float(np.median(ts)) * 1e3

    # --- host-in-the-loop (x0 upload + u0 fetch per tick) ---------------
    tick_jit = jax.jit(one_tick)
    x_h = np.asarray(x0)
    xs_c, us_c = xs0, us0
    out = tick_jit(jnp.asarray(0.0, jnp.float32), jnp.asarray(x_h), xs_c, us_c)
    _ = np.asarray(out[3])
    ts = []
    for k in range(args.reps * 5):
        t0 = time.perf_counter()
        x_next, xs_c, us_c, u, cost = tick_jit(
            jnp.asarray(args.t0 + k * 2.0, jnp.float32),
            jnp.asarray(x_h), xs_c, us_c)
        u_h = np.asarray(u)          # actuator fetch = true barrier
        ts.append(time.perf_counter() - t0)
        x_h = np.asarray(x_next)
    roundtrip_tick_ms = float(np.median(ts)) * 1e3

    platform = jax.devices()[0].platform
    budget = mp.dt
    print(f"platform={platform} compile={compile_s:.1f}s "
          f"device_tick={device_tick_ms:.2f}ms "
          f"roundtrip_tick={roundtrip_tick_ms:.2f}ms "
          f"budget={budget}ms "
          f"device_ok={device_tick_ms <= budget} "
          f"roundtrip_ok={roundtrip_tick_ms <= budget} "
          f"final_cost={float(np.asarray(costs)[-1]):.3f}")


if __name__ == "__main__":
    main()
