"""Generate and cache the offline reference solution for a mission.

The reference's closed-loop demo warm-starts the MPC from an actual offline
SbFDDP solve (/root/reference/examples/python/mpc.py:19-29). bench.py tracks
the same kind of reference; this tool produces it once (CPU, float64,
maxiter 400 — the demo budget) and caches it under ``missions/refs/`` so the
benchmark never pays an offline-solve compile.

Usage: python tools/make_ref.py [robot] [mission] [--dt 30]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def ref_path(robot: str, mission: str, dt_ms: int) -> str:
    return os.path.join(ROOT, "missions", "refs",
                        f"{robot}__{mission}__dt{dt_ms}.npz")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("robot", nargs="?", default="hexacopter370_flying_arm_3")
    ap.add_argument("mission", nargs="?", default="displacement")
    ap.add_argument("--dt", type=int, default=30)
    ap.add_argument("--maxiter", type=int, default=400)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from eagle_mpc_tpu.config import specs
    from eagle_mpc_tpu.ocp import problem as P
    from eagle_mpc_tpu.solvers import sbfddp

    missions = os.path.join(ROOT, "missions")
    traj = specs.load_trajectory(
        f"{args.robot}/trajectories/{args.mission}.yaml", yaml_dir=missions)
    spec, params = P.from_trajectory(traj, dt_ms=args.dt, use_squash=True,
                                     integrator="IntegratedActionModelEuler")
    res = jax.jit(lambda p: sbfddp.solve(spec, p, maxiter=args.maxiter))(params)
    jax.block_until_ready(res)
    assert bool(res.feasible), "offline solve did not converge feasibly"

    out = ref_path(args.robot, args.mission, args.dt)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez(out,
             xs=np.asarray(res.xs), us=np.asarray(res.us),
             us_squash=np.asarray(res.us_squash),
             dt_ms=args.dt, cost=float(res.cost), iters=int(res.iters))
    print(f"wrote {out}: T={spec.T} cost={float(res.cost):.4f} "
          f"iters={int(res.iters)} feasible={bool(res.feasible)}")


if __name__ == "__main__":
    main()
