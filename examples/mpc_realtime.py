#!/usr/bin/env python3
"""Real-time closed-loop MPC serving demo: the compiled MPC tick dispatched
by the NATIVE periodic executor (csrc/rt_executor.cpp) with deadline-miss
accounting — the production version of the reference demo's ad-hoc timing
loop (/root/reference/examples/python/mpc.py:49-74).

    python examples/mpc_realtime.py [robot] [mission] [--period 20]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("robot", nargs="?", default="iris")
    ap.add_argument("mission", nargs="?", default="hover")
    ap.add_argument("--dt", type=int, default=40)
    ap.add_argument("--period", type=float, default=20.0,
                    help="control period [ms]")
    ap.add_argument("--ticks", type=int, default=100)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--smoke", action="store_true",
                    help="CI mode: few ticks on CPU, assert sane serving")
    args = ap.parse_args()
    if args.smoke:
        args.robot, args.mission = "iris", "hover"
        args.dt, args.period, args.ticks, args.cpu = 60, 50.0, 5, True

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from eagle_mpc_tpu.config import specs
    from eagle_mpc_tpu.mpc import CarrotMpc
    from eagle_mpc_tpu.ocp import problem as P
    from eagle_mpc_tpu.sim import AerialSimulator
    from eagle_mpc_tpu.solvers import sbfddp
    from eagle_mpc_tpu.utils import log
    from eagle_mpc_tpu.utils.rt_executor import RealTimeExecutor

    missions = os.path.join(os.path.dirname(__file__), "..", "missions")
    traj = specs.load_trajectory(f"{args.robot}/trajectories/{args.mission}.yaml",
                                 yaml_dir=missions)
    mp = specs.load_mpc_params(f"{args.robot}/mpc/mpc.yaml", yaml_dir=missions)

    spec, params = P.from_trajectory(traj, dt_ms=args.dt, use_squash=True,
                                     integrator="IntegratedActionModelEuler",
                                     dtype=jnp.float32)
    res = jax.jit(lambda p: sbfddp.solve(spec, p, maxiter=200))(params)
    jax.block_until_ready(res)
    xs_off = np.asarray(res.xs)
    us_off = np.asarray(res.us)

    ctrl = CarrotMpc(mpc_params=mp, trajectory=traj, state_ref=xs_off,
                     dt_ref=args.dt)
    T = ctrl.spec.T
    pad = max(0, T + 1 - len(xs_off))
    xs = jnp.asarray(np.vstack([xs_off, np.tile(xs_off[-1], (pad, 1))])[: T + 1],
                     dtype=jnp.float32)
    us = jnp.asarray(np.vstack([us_off, np.tile(us_off[-1], (pad, 1))])[: T],
                     dtype=jnp.float32)
    sim = AerialSimulator.from_platform(mp.model, mp.platform, dt_ms=args.period)

    settings = ctrl.solver_settings()
    params0 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32) if hasattr(a, "astype") else a,
        ctrl.params0)

    @jax.jit
    def update(t_ms, x):
        return ctrl.update_problem(t_ms, params0._replace(x0=x))

    @jax.jit
    def solve(p, xs, us):
        return ctrl.solve(p, xs, us, settings=settings)

    @jax.jit
    def plant(x, u):
        return sim.step(x, u)

    # warm up compiles outside the timed loop
    x = jnp.asarray(xs_off[0], dtype=jnp.float32)
    p = update(0.0, x)
    r = solve(p, xs, us)
    x2 = plant(x, r.us_squash[0])
    jax.block_until_ready((p, r, x2))

    period_s = args.period / 1000.0
    log.info(f"serving {args.ticks} ticks @ {args.period:.0f} ms "
             f"on {jax.devices()[0].platform}")
    with RealTimeExecutor(period_s=period_s) as ex:
        t_ms = 0.0
        for i in range(args.ticks):
            lateness = ex.wait_next()
            t0 = ex.now()
            p = update(t_ms, x)
            jax.block_until_ready(p)
            t1 = ex.now()
            r = solve(p, xs, us)
            jax.block_until_ready(r)
            t2 = ex.now()
            xs, us = r.xs, r.us
            x = plant(x, r.us_squash[0])
            t_ms += args.period
            ex.record(t1 - t0, t2 - t1, float(r.cost), int(r.iters))
        stats = ex.stats()
    log.info(str(stats))
    rt_ok = stats.total_avg <= period_s
    log.info(f"real-time at {args.period:.0f} ms period: "
             f"{'YES' if rt_ok else 'NO'} "
             f"(avg tick {stats.total_avg * 1e3:.2f} ms)")
    err = np.linalg.norm(np.asarray(x)[:3] - xs_off[-1][:3])
    log.info(f"plant vs trajectory end after {args.ticks} ticks: {err:.3f} m")
    if args.smoke:
        assert np.all(np.isfinite(np.asarray(x))), "smoke: plant diverged"
        assert stats.n == args.ticks
        print("SMOKE OK")


if __name__ == "__main__":
    main()
