#!/usr/bin/env python3
"""Batched scenario solving — the TPU dimension the reference lacks:
thousands of perturbed-x0 SbFDDP solves as one sharded SPMD program.

    python examples/batch_scenarios.py [robot] [mission] [--batch 1024]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("robot", nargs="?", default="iris")
    ap.add_argument("mission", nargs="?", default="hover")
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--dt", type=int, default=40)
    ap.add_argument("--maxiter", type=int, default=60)
    ap.add_argument("--noise", type=float, default=0.05)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--smoke", action="store_true",
                    help="CI mode: tiny batch on CPU, assert convergence")
    args = ap.parse_args()
    if args.smoke:
        args.robot, args.mission = "iris", "hover"
        args.batch, args.dt, args.maxiter, args.cpu = 8, 60, 40, True

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from eagle_mpc_tpu.config import specs
    from eagle_mpc_tpu.ocp import problem as P
    from eagle_mpc_tpu.parallel import (convergence_summary, make_batch_solver,
                                        make_mesh, perturbed_x0_batch,
                                        shard_batch)
    from eagle_mpc_tpu.utils import log

    missions = os.path.join(os.path.dirname(__file__), "..", "missions")
    traj = specs.load_trajectory(f"{args.robot}/trajectories/{args.mission}.yaml",
                                 yaml_dir=missions)
    spec, params = P.from_trajectory(traj, dt_ms=args.dt, use_squash=True,
                                     integrator="IntegratedActionModelEuler",
                                     dtype=jnp.float32)

    n_dev = len(jax.devices())
    mesh = make_mesh() if n_dev > 1 else None
    log.info(f"{args.batch} scenarios on {n_dev} device(s) "
             f"({jax.devices()[0].platform})")

    bp = perturbed_x0_batch(params, args.batch, scale=args.noise)
    if mesh is not None:
        bp = shard_batch(mesh, bp)
    solve = make_batch_solver(spec, maxiter=args.maxiter, mesh=mesh)

    t0 = time.time()
    res = solve(bp)
    jax.block_until_ready(res)
    log.info(f"compile+solve: {time.time() - t0:.1f}s")
    t0 = time.time()
    res = solve(bp)
    jax.block_until_ready(res)
    wall = time.time() - t0
    s = convergence_summary(res)
    log.info(f"steady: {wall:.2f}s -> {args.batch / wall:.0f} solves/s | {s}")
    if args.smoke:
        assert s["feasible_frac"] >= 0.99, f"smoke: {s}"
        print("SMOKE OK")


if __name__ == "__main__":
    main()
