#!/usr/bin/env python3
"""Closed-loop MPC demo — the reference's examples/python/mpc.py on the
TPU-native stack: offline SbFDDP solve, then a Carrot/Rail/Weighted
controller tracking it against the RK4 plant, the WHOLE loop as one
compiled program.

    python examples/mpc.py [robot] [mission] [--controller carrot]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("robot", nargs="?", default="hexacopter370_flying_arm_3")
    ap.add_argument("mission", nargs="?", default="displacement")
    ap.add_argument("--controller", choices=["carrot", "rail", "weighted"],
                    default="carrot")
    ap.add_argument("--dt", type=int, default=20, help="trajectory dt [ms]")
    ap.add_argument("--dt-sim", type=float, default=2.0, help="plant dt [ms]")
    ap.add_argument("--horizon-factor", type=float, default=1.2,
                    help="simulate this fraction of the mission duration")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--f64", action="store_true")
    ap.add_argument("--plot", default=None)
    ap.add_argument("--smoke", action="store_true",
                    help="CI mode: tiny closed loop on CPU, assert tracking")
    args = ap.parse_args()
    if args.smoke:
        args.robot, args.mission = "iris", "hover"
        args.dt, args.dt_sim, args.cpu = 60, 20.0, True
        args.horizon_factor = 0.15

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.f64:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from eagle_mpc_tpu.config import specs
    from eagle_mpc_tpu.mpc import CarrotMpc, RailMpc, WeightedMpc, run_closed_loop
    from eagle_mpc_tpu.ocp import problem as P
    from eagle_mpc_tpu.sim import AerialSimulator
    from eagle_mpc_tpu.solvers import sbfddp
    from eagle_mpc_tpu.utils import log

    missions = os.path.join(os.path.dirname(__file__), "..", "missions")
    traj = specs.load_trajectory(f"{args.robot}/trajectories/{args.mission}.yaml",
                                 yaml_dir=missions)
    mp = specs.load_mpc_params(f"{args.robot}/mpc/mpc.yaml", yaml_dir=missions)
    dtype = jnp.float64 if args.f64 else jnp.float32

    # offline reference solve
    spec, params = P.from_trajectory(traj, dt_ms=args.dt, use_squash=True,
                                     integrator="IntegratedActionModelEuler",
                                     dtype=dtype)
    res = jax.jit(lambda p: sbfddp.solve(spec, p, maxiter=400))(params)
    jax.block_until_ready(res)
    log.info(f"offline solve: iters={int(res.iters)} feasible={bool(res.feasible)}")
    xs_off = np.asarray(res.xs)
    us_off = np.asarray(res.us)

    if args.controller == "carrot":
        ctrl = CarrotMpc(mpc_params=mp, trajectory=traj, state_ref=xs_off,
                         dt_ref=args.dt)
    elif args.controller == "rail":
        ctrl = RailMpc(mpc_params=mp, state_ref=xs_off, dt_ref=args.dt)
    else:
        ctrl = WeightedMpc(mpc_params=mp, trajectory=traj, dt_ref=args.dt)

    T = ctrl.spec.T
    pad = max(0, T + 1 - len(xs_off))
    xs_w = jnp.asarray(np.vstack([xs_off, np.tile(xs_off[-1], (pad, 1))])[: T + 1],
                       dtype=dtype)
    us_w = jnp.asarray(np.vstack([us_off, np.tile(us_off[-1], (pad, 1))])[: T],
                       dtype=dtype)
    sim = AerialSimulator.from_platform(mp.model, mp.platform, dt_ms=args.dt_sim)
    n_steps = int(traj.duration / args.dt_sim * args.horizon_factor)

    loop = jax.jit(lambda x0, a, b: run_closed_loop(
        ctrl, sim, x0, a, b, n_steps=n_steps, dt_sim_ms=args.dt_sim))
    t0 = time.time()
    out = loop(jnp.asarray(xs_off[0], dtype=dtype), xs_w, us_w)
    jax.block_until_ready(out)
    log.info(f"closed loop ({n_steps} ticks): compile+run {time.time() - t0:.1f}s")
    t0 = time.time()
    out = loop(jnp.asarray(xs_off[0], dtype=dtype), xs_w, us_w)
    jax.block_until_ready(out)
    wall = time.time() - t0
    log.info(f"steady: {wall:.2f}s total, {wall / n_steps * 1e3:.2f} ms/tick "
             f"(sim dt {args.dt_sim} ms)")

    t_sim = np.arange(1, n_steps + 1) * args.dt_sim
    ref_idx = np.clip((t_sim // args.dt).astype(int), 0, len(xs_off) - 1)
    errs = np.linalg.norm(np.asarray(out.states[1:, :3]) - xs_off[ref_idx][:, :3],
                          axis=1)
    log.info(f"tracking error: mean {errs.mean():.4f} m, max {errs.max():.4f} m")
    if args.smoke:
        assert np.all(np.isfinite(np.asarray(out.states))), "smoke: diverged"
        assert errs.mean() < 0.5, f"smoke: tracking error {errs.mean():.3f} m"
        print("SMOKE OK")

    if args.plot:
        from eagle_mpc_tpu.viz import plots

        os.makedirs(args.plot, exist_ok=True)
        dt_s = args.dt_sim / 1000.0
        plots.save_fig(plots.plot_states(np.asarray(out.states), dt_s,
                                         mp.model.nq),
                       os.path.join(args.plot, "cl_states.png"))
        plots.save_fig(plots.plot_controls(np.asarray(out.controls), dt_s,
                                           mp.platform.n_rotors),
                       os.path.join(args.plot, "cl_controls.png"))
        plots.save_fig(plots.plot_solver_telemetry(np.asarray(out.costs),
                                                   np.asarray(out.solve_iters),
                                                   dt_s),
                       os.path.join(args.plot, "cl_telemetry.png"))
        log.info(f"figures written to {args.plot}/")


if __name__ == "__main__":
    main()
