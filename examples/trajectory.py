#!/usr/bin/env python3
"""Offline trajectory generation demo — the reference's
examples/python/trajectory.py on the TPU-native stack.

    python examples/trajectory.py [robot] [mission] [--dt 20] [--plot out/]

Loads a mission YAML, builds the StackedProblem, solves with SbFDDP and
reports convergence + saves plots.
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
    ap.add_argument("--dt", type=int, default=20)
    ap.add_argument("--maxiter", type=int, default=400)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--f64", action="store_true")
    ap.add_argument("--plot", default=None, help="directory for output figures")
    ap.add_argument("--verbose", action="store_true",
                    help="print per-iteration solver telemetry "
                         "(CallbackVerbose equivalent)")
    ap.add_argument("--smoke", action="store_true",
                    help="CI mode: tiny mission on CPU, assert convergence")
    args = ap.parse_args()
    if args.smoke:
        args.robot, args.mission = "iris", "hover"
        args.dt, args.maxiter, args.cpu = 60, 60, True

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.f64:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from eagle_mpc_tpu.config import specs
    from eagle_mpc_tpu.ocp import problem as P
    from eagle_mpc_tpu.solvers import fddp, sbfddp
    from eagle_mpc_tpu.utils import log

    missions = os.path.join(os.path.dirname(__file__), "..", "missions")
    traj = specs.load_trajectory(f"{args.robot}/trajectories/{args.mission}.yaml",
                                 yaml_dir=missions)
    dtype = jnp.float64 if args.f64 else jnp.float32
    spec, params = P.from_trajectory(traj, dt_ms=args.dt, use_squash=True,
                                     integrator="IntegratedActionModelEuler",
                                     dtype=dtype)
    log.info(f"{args.robot}/{args.mission}: T={spec.T} nodes, dt={args.dt} ms, "
             f"nx={traj.model.nx}, nu={traj.nu}, contacts={len(spec.contacts)}")

    settings = sbfddp.SbFddpSettings(
        solver=fddp.SolverSettings(record_trace=args.verbose))
    solve = jax.jit(lambda p: sbfddp.solve(spec, p, maxiter=args.maxiter,
                                           settings=settings))
    t0 = time.time()
    res = solve(params)
    jax.block_until_ready(res)
    log.info(f"compile+solve: {time.time() - t0:.1f}s")
    t0 = time.time()
    res = solve(params)
    jax.block_until_ready(res)
    log.info(f"steady solve: {(time.time() - t0) * 1e3:.1f} ms | "
             f"iters={int(res.iters)} cost={float(res.cost):.4f} "
             f"feasible={bool(res.feasible)}")
    if args.verbose:
        print(fddp.format_trace(res.trace))
    if args.smoke:
        assert bool(res.feasible) and not bool(res.failed), "smoke: not converged"
        import numpy as _np
        assert _np.isfinite(float(res.cost))
        print("SMOKE OK")

    if args.plot:
        from eagle_mpc_tpu.viz import plots

        os.makedirs(args.plot, exist_ok=True)
        dt_s = args.dt / 1000.0
        plots.save_fig(plots.plot_states(np.asarray(res.xs), dt_s, traj.model.nq),
                       os.path.join(args.plot, "states.png"))
        plots.save_fig(plots.plot_controls(np.asarray(res.us_squash), dt_s,
                                           traj.platform.n_rotors),
                       os.path.join(args.plot, "controls.png"))
        plots.save_fig(plots.plot_trajectory_3d(np.asarray(res.xs)),
                       os.path.join(args.plot, "traj3d.png"))
        log.info(f"figures written to {args.plot}/")


if __name__ == "__main__":
    main()
