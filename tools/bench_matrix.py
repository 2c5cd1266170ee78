"""Perf rows across the BASELINE config list (VERDICT r3 item 3).

bench.py measures ONE configuration (flagship carrot). This harness widens
the TPU perf surface to the rest of the BASELINE.md config list:

  flagship_carrot    hexacopter370_flying_arm_3 displacement, CarrotMpc
                     (sanity row — should reproduce bench.py)
  flagship_rail      same robot/mission, RailMpc
  flagship_weighted  same robot/mission, WeightedMpc
  iris_px4_carrot    iris_px4 displacement, knots=40 x dt=20
                     (/root/reference/yaml/iris_px4/mpc/mpc.yaml budget)
  monkey_bar_solve   batched OFFLINE contact solves (3-D gripper contact,
                     masked KKT dynamics) — the contact path's first perf row

Tick rows use the fixed-depth solver (the bench path): warm start
(depth 30, fixed polish), one settle chunk, then timed chunks of K ticks.
The offline contact row times the canonical while-loop SbFDDP at
maxiter=100 over a perturbed-x0 batch.

Prints one JSON line per row; paste the table into BASELINE.md.

Usage: python tools/bench_matrix.py [--batch 512] [--contact-batch 64]
         [--ticks 5] [--reps 2] [--rows flagship_carrot,...] [--cpu]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MISSIONS = os.path.join(ROOT, "missions")
WARM_DEPTH = 30


def _offline_ref(robot, mission, dt_ms, traj):
    from tools.make_ref import load_ref

    return load_ref(robot, mission, dt_ms, traj=traj)


def tick_row(name, robot, mission, controller, batch, ticks, reps, alphas,
             t0_frac=0.8):
    import jax
    import jax.numpy as jnp

    from eagle_mpc_tpu.config import specs
    from eagle_mpc_tpu.mpc import CarrotMpc, RailMpc, WeightedMpc
    from eagle_mpc_tpu.sim import AerialSimulator
    from eagle_mpc_tpu.solvers import fddp, sbfddp

    dtype = jnp.float32
    np_dtype = np.float32
    traj = specs.load_trajectory(f"{robot}/trajectories/{mission}.yaml",
                                 yaml_dir=MISSIONS)
    mp = specs.load_mpc_params(f"{robot}/mpc/mpc.yaml", yaml_dir=MISSIONS)
    dt_ref = mp.dt
    ref, ref_kind = _offline_ref(robot, mission, dt_ref, traj)
    # every TPU perf row tracks a REAL cached offline solve (VERDICT r4
    # item 4; run tools/make_ref.py for missing missions)
    assert ref_kind == "offline", (robot, mission, dt_ref)

    if controller == "carrot":
        ctrl = CarrotMpc(mpc_params=mp, trajectory=traj, state_ref=ref,
                         dt_ref=dt_ref)
    elif controller == "rail":
        ctrl = RailMpc(mpc_params=mp, state_ref=ref, dt_ref=dt_ref)
    else:
        ctrl = WeightedMpc(mpc_params=mp, trajectory=traj, dt_ref=dt_ref)

    params0 = jax.tree_util.tree_map(
        lambda x: np.asarray(x, np_dtype) if hasattr(x, "astype") else x,
        ctrl.params0)
    sim = AerialSimulator.from_platform(mp.model, mp.platform, dt_ms=2)
    spec = ctrl.spec
    T, nu, nx = spec.T, spec.nu, mp.model.nx
    dt_sim = 2.0

    # the serving tick config: fused node/rollout kernels on TPU (the
    # round-5 bench defaults; interpret mode is slow on CPU)
    on_tpu = jax.devices()[0].platform == "tpu"
    ss = fddp.SolverSettings(pallas_nodes=on_tpu, pallas_rollout=on_tpu,
                             pallas_backward=on_tpu)
    sbs_tick = sbfddp.SbFddpSettings(convergence_init=1e-3, solver=ss)
    sbs_warm = sbfddp.SbFddpSettings(solver=ss)

    def run_chunk(params, t0_ms, xb, xs, us):
        def tick(carry, _):
            t_ms, xb, xs, us = carry

            def one(t, x0, xs, us):
                p = ctrl.update_problem(t, params._replace(x0=x0))
                r = sbfddp.solve_fixed(spec, p, xs, us, depth=mp.iters,
                                       settings=sbs_tick, n_alphas=alphas)
                x_next = sim.step(x0, r.us_squash[0])
                return x_next, r.xs, r.us, r.cost, r.feasible

            xb, xs, us, cost, feas = jax.vmap(one)(
                jnp.full((xb.shape[0],), t_ms, dtype), xb, xs, us)
            return (t_ms + dt_sim, xb, xs, us), (cost.mean(),
                                                 feas.astype(dtype).mean())

        (t_ms, xb, xs, us), (costs, feas) = jax.lax.scan(
            tick, (t0_ms, xb, xs, us), None, length=ticks)
        return costs, feas, t_ms, xb, xs, us

    def warm_fn(params, t_ms, xb, xs, us):
        def one(t, x0, xs, us):
            p = ctrl.update_problem(t, params._replace(x0=x0))
            r = sbfddp.solve_fixed(spec, p, xs, us, depth=WARM_DEPTH,
                                   settings=sbs_warm, polish="fixed")
            return r.xs, r.us, r.cost, r.feasible

        xs, us, cost, feas = jax.vmap(one)(
            jnp.full((xb.shape[0],), t_ms, dtype), xb, xs, us)
        return cost.mean(), feas.astype(dtype).mean(), xs, us

    # start the timed region at t0_frac of the mission (inside the tracked
    # trajectory, past the initial transient)
    t0_ms = float(traj.duration) * t0_frac
    t_warm = t0_ms - ticks * dt_sim
    i0 = min(int(t_warm // dt_ref), ref.shape[0] - 1)
    rng = np.random.default_rng(0)
    noise = rng.normal(size=(batch, nx)).astype(np_dtype) * 0.05
    noise[:, 3:7] = 0.0
    x0b = jnp.asarray(ref[i0].astype(np_dtype)[None] + noise)
    m = float(mp.model.inertia[0][0, 0])
    hover = m * 9.81 / mp.platform.n_rotors
    xs0 = jnp.tile(x0b[:, None, :], (1, T + 1, 1))
    us0 = jnp.zeros((batch, T, nu), dtype)
    us0 = us0.at[:, :, : mp.platform.n_rotors].set(hover)
    t_warm = jnp.asarray(t_warm, dtype)

    jchunk = jax.jit(run_chunk, donate_argnums=(2, 3, 4))
    jwarm = jax.jit(warm_fn)
    t0 = time.time()
    chunk_c = jchunk.lower(params0, t_warm, x0b, xs0, us0).compile()
    warm_c = jwarm.lower(params0, t_warm, x0b, xs0, us0).compile()
    compile_s = time.time() - t0

    t0 = time.time()
    _, wfeas, xs, us = warm_c(params0, t_warm, x0b, xs0, us0)
    costs, feas, t_ms, xb, xs, us = chunk_c(params0, t_warm, x0b, xs, us)
    _ = np.asarray(costs)
    warm_s = time.time() - t0

    times = []
    for _r in range(reps):
        t0 = time.time()
        costs, feas, t_ms, xb, xs, us = chunk_c(params0, t_ms, xb, xs, us)
        costs_h = np.asarray(costs)
        times.append(time.time() - t0)
    med = float(np.median(times))

    # tracking health vs the reference trajectory (weighted has no state
    # reference — feasibility + finite cost are its contract)
    feas_h = float(np.asarray(feas)[-1])
    row = {"row": name, "robot": robot, "mission": mission,
           "controller": controller, "B": batch, "K": ticks,
           "T": T, "dt_ms": mp.dt, "iters": mp.iters, "ref": ref_kind,
           "compile_s": round(compile_s, 1), "warm_s": round(warm_s, 1),
           "tick_ms": round(med / ticks * 1e3, 2),
           "solves_per_s": round(batch * ticks / med, 1),
           "feasible_frac": feas_h,
           "final_mean_cost": float(costs_h[-1])}
    if controller in ("carrot", "rail"):
        t_fin = float(t_ms)
        t_ref = np.arange(ref.shape[0]) * float(dt_ref)
        i = int(np.clip(np.searchsorted(t_ref, t_fin), 1, len(t_ref) - 1))
        a = np.clip((t_fin - t_ref[i - 1]) / (t_ref[i] - t_ref[i - 1]), 0, 1)
        ref_pos = (1 - a) * ref[i - 1, :3] + a * ref[i, :3]
        err = np.linalg.norm(np.asarray(xb)[:, :3] - ref_pos[None], axis=1)
        row["track_err_mean_m"] = float(err.mean())
        row["track_err_max_m"] = float(err.max())
        assert row["feasible_frac"] >= 0.99, row
        assert row["track_err_mean_m"] < 0.5, row
    else:
        assert row["feasible_frac"] >= 0.99, row
        assert np.isfinite(row["final_mean_cost"]), row
    return row


def contact_row(batch, reps, mission="monkey_bar", solver="while",
                noise_sd=0.02):
    """Batched offline contact solves (3-D gripper KKT dynamics).

    ``solver``: "while" — the canonical reference-faithful while-loop
    SbFDDP at maxiter=100 (the round-4 row); "fixed" — the batch-aware
    fixed-depth driver (sbfddp.solve_fixed_batched, depth=100 per homotopy
    stage with done-masking + bounded fixed polish), VERDICT r4 item 5:
    the while solver's lockstep ladder pays the expensive nested-loop
    iteration body to the slowest element, where the fixed body is one
    backward pass + one batched-alpha rollout per iteration."""
    import jax
    import jax.numpy as jnp

    from eagle_mpc_tpu.config import specs
    from eagle_mpc_tpu.ocp import problem as P
    from eagle_mpc_tpu.solvers import fddp, sbfddp

    traj = specs.load_trajectory(
        f"hexacopter370_flying_arm_3/trajectories/{mission}.yaml",
        yaml_dir=MISSIONS)
    spec, params = P.from_trajectory(traj, dt_ms=40, use_squash=True,
                                     integrator="IntegratedActionModelEuler",
                                     dtype=jnp.float32)
    params = jax.tree_util.tree_map(
        lambda x: np.asarray(x, np.float32) if hasattr(x, "astype") else x,
        params)
    nx = traj.model.nx
    rng = np.random.default_rng(0)
    noise = rng.normal(size=(batch, nx)).astype(np.float32) * noise_sd
    noise[:, 3:7] = 0.0
    x0b = jnp.asarray(np.asarray(traj.initial_state, np.float32)[None] + noise)

    if solver == "while":
        @jax.jit
        def solve_batch(x0b):
            def one(x0):
                r = sbfddp.solve(spec, params._replace(x0=jnp.asarray(x0)),
                                 maxiter=100)
                return r.cost, r.feasible, r.failed, r.iters
            return jax.vmap(one)(x0b)
    else:
        @jax.jit
        def solve_batch(x0b):
            xs0 = jnp.tile(x0b[:, None, :], (1, spec.T + 1, 1))
            us0 = jnp.zeros((batch, spec.T, spec.nu), jnp.float32)
            params_b = jax.vmap(
                lambda x0: P.as_device(params)._replace(x0=x0))(x0b)
            r = sbfddp.solve_fixed_batched(spec, params_b, xs0, us0,
                                           depth=100, polish="fixed")
            return r.cost, r.feasible, r.failed, r.iters

    t0 = time.time()
    cost, feas, failed, iters = solve_batch(x0b)
    _ = float(np.asarray(cost).sum())
    first_s = time.time() - t0
    times = []
    for _r in range(reps):
        t0 = time.time()
        cost, feas, failed, iters = solve_batch(x0b)
        _ = float(np.asarray(cost).sum())
        times.append(time.time() - t0)
    med = float(np.median(times))
    feas_h = np.asarray(feas)
    row = {"row": f"{mission}_solve_{solver}",
           "robot": "hexacopter370_flying_arm_3",
           "mission": mission, "controller": f"offline_{solver}",
           "B": batch, "T": spec.T, "contacts": len(spec.contacts),
           "compile+first_s": round(first_s, 1),
           "solve_batch_s": round(med, 2),
           "solves_per_s": round(batch / med, 2),
           "feasible_frac": float(feas_h.mean()),
           "failed_frac": float(np.asarray(failed).mean()),
           "iters_mean": float(np.asarray(iters).mean())}
    # the swing maneuver is multimodal and genuinely sensitive: a few
    # percent of the +-0.02-perturbed scenarios fail to converge (measured
    # 3/64 on the v5e) — the health bar is "the batch overwhelmingly
    # solves", not perfection
    assert row["failed_frac"] <= 0.08, row
    assert row["feasible_frac"] >= 0.90, row
    return row


ROWS = ["flagship_carrot", "flagship_rail", "flagship_weighted",
        "iris_px4_carrot", "hexacopter680_carrot", "hextilt_fa5_carrot",
        "monkey_bar_solve", "monkey_bar_fixed", "eagle_catch_fixed"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--contact-batch", type=int, default=64)
    ap.add_argument("--ticks", type=int, default=5)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--alphas", type=int, default=10)
    ap.add_argument("--rows", default=",".join(ROWS))
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR",
                                     os.path.expanduser("~/.cache/jax")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    flag = ("hexacopter370_flying_arm_3", "displacement")
    specs_map = {
        "flagship_carrot": lambda: tick_row(
            "flagship_carrot", *flag, "carrot", args.batch, args.ticks,
            args.reps, args.alphas),
        "flagship_rail": lambda: tick_row(
            "flagship_rail", *flag, "rail", args.batch, args.ticks,
            args.reps, args.alphas),
        "flagship_weighted": lambda: tick_row(
            "flagship_weighted", *flag, "weighted", args.batch, args.ticks,
            args.reps, args.alphas),
        "iris_px4_carrot": lambda: tick_row(
            "iris_px4_carrot", "iris_px4", "displacement", "carrot",
            args.batch, args.ticks, args.reps, args.alphas),
        "hexacopter680_carrot": lambda: tick_row(
            "hexacopter680_carrot", "hexacopter680_flying_arm_2", "hover",
            "carrot", args.batch, args.ticks, args.reps, args.alphas),
        "hextilt_fa5_carrot": lambda: tick_row(
            "hextilt_fa5_carrot", "hextilt_flying_arm_5", "push_slide",
            "carrot", args.batch, args.ticks, args.reps, args.alphas),
        "monkey_bar_solve": lambda: contact_row(args.contact_batch, args.reps),
        "monkey_bar_fixed": lambda: contact_row(
            args.contact_batch, args.reps, solver="fixed"),
        "eagle_catch_fixed": lambda: contact_row(
            args.contact_batch, args.reps, mission="eagle_catch",
            solver="fixed"),
    }
    for name in args.rows.split(","):
        t0 = time.time()
        row = specs_map[name]()
        row["wall_s"] = round(time.time() - t0, 1)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
