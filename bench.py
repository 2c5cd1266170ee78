"""Round benchmark: batched carrot-MPC solves/s/chip on the flagship robot.

Headline metric (BASELINE.json): SbFDDP carrot-MPC re-solves per second per
chip on hexacopter370_flying_arm_3 (horizon 30 knots x 30 ms, Euler, 2
solver iterations per tick — the reference's real-time budget,
/root/reference/yaml/hexacopter370_flying_arm_3/mpc/mpc.yaml). One "solve"
is a full closed-loop MPC tick: parameter update at the advancing mission
time, the warm-started 2-iteration SbFDDP solve, and an RK4 plant step that
produces the next tick's state (the reference demo loop,
examples/python/mpc.py:49-61). Scenarios are batched (vmap); B parallel
closed loops run K chained ticks.

Solver path (round 4): the tick uses the FIXED-DEPTH solver
(solvers.sbfddp.solve_fixed) — no data-dependent while_loops, alpha ladder
folded into one batched rollout, DDP polish on the cheap while path (exits
immediately for feasible candidates). The warm-start solve is its own
fixed-depth program (deterministic cost, VERDICT r3 item 2). --while-solver
restores the round-3 while-loop path for comparison.

Measurement integrity (tunneled TPU runtimes):
- The K ticks run INSIDE one compiled program (lax.scan) and the timing is
  closed by a host fetch of the per-tick cost vector — `block_until_ready`
  alone does not reliably wait on tunneled backends, and per-call dispatch
  overhead must not pollute a throughput metric.
- Nothing closes over eager device arrays (slow dispatch path); parameters
  are numpy trace literals or explicit arguments.

Workload realism (VERDICT r2 item 5):
- The MPC tracks the ACTUAL offline SbFDDP solution (cached
  missions/refs/*.npz, produced by tools/make_ref.py), not a synthetic path
  (--synthetic-ref restores the old glide for comparison).
- The timed region starts at t0 = 3500 ms: the 870 ms horizon then crosses
  the wp2 stage transition (t_stages 4030/4060 ms) AND activates the
  carrot-tail hold for nodes past the trajectory end — the parameter-update
  paths a steady-state tick never exercises.
- The run asserts closed-loop health on the benchmarked platform/dtype:
  every scenario feasible and a position tracking-error bound vs the
  offline reference (--no-assert to disable, e.g. for stress configs).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} plus
auxiliary keys: "steady_synthetic_solves_per_s" (the round-2/3 steady-state
methodology, so the artifact chain stays comparable across rounds — VERDICT
r3 weak #3), "warm_s", "tick_ms", "compile_s", "solver". vs_baseline is
against the 1000 solves/s/chip north-star target.

Usage: python bench.py [--batch B] [--ticks K] [--reps R] [--dtype f32|f64]
                       [--sweep 512,1024,...] [--while-solver] [--alphas N]
                       [--skip-steady] [--cpu]
"""

import argparse
import json
import os
import sys
import time
from typing import NamedTuple, Optional

import numpy as np

ROOT = os.path.dirname(os.path.abspath(__file__))

# flagship workload constants
ROBOT = "hexacopter370_flying_arm_3"
MISSION = "displacement"
DT_REF = 30            # ms between offline reference samples (= mpc dt)
T0_DEFAULT = 3500.0    # ms — horizon spans the wp2 transition + carrot tail
DT_SIM = 2.0           # ms between re-solves (reference demo cadence, mpc.py:43)
WARM_MAXITER = 30      # warm-start budget (reference does a full solve at t=0)


class Workload(NamedTuple):
    run_chunk_fn: object     # tick chunk (fixed: (params,t0,xb,xs,us); while: (+schedule))
    warm_fn: Optional[object]  # fixed path: one-shot warm solve; while: None
    chunk_args: tuple
    warm_args: tuple
    state_ref: np.ndarray    # (N, nx) tracked reference
    t_ref: np.ndarray        # (N,) ms
    meta: dict


def _load_ref(traj, synthetic: bool):
    """Offline reference: cached real solve, else synthetic glide
    (single implementation: tools.make_ref.load_ref)."""
    from tools.make_ref import load_ref

    return load_ref(ROBOT, MISSION, DT_REF, traj=traj, synthetic=synthetic)


def build_workload(batch: int, ticks: int, dtype_str: str = "f32",
                   t0_ms: float = T0_DEFAULT, synthetic_ref: bool = False,
                   parallel_riccati: bool = False,
                   scan_unroll: int = 1,
                   pallas_backward: bool = False,
                   pallas_nodes: bool = False,
                   pallas_rollout: bool = False,
                   solver_kind: str = "fixed",
                   n_alphas: int = 4,
                   polish_iters: Optional[int] = 1) -> Workload:
    """Build the flagship closed-loop chunk program + its argument sets.

    Shared by bench.py and tools/compile_bench.py. jax must already be
    configured (platform/x64) by the caller. ``solver_kind``: "fixed" (the
    round-4 fixed-depth tick, default) or "while" (the round-3 while-loop
    solver sharing one program between warm and tick via HomotopySchedule).

    ``polish_iters``: per-tick DDP-polish budget cap (measured knob,
    BASELINE.md r4): the polish's first iteration restores dynamic
    feasibility; the default cap of 1 is a DOCUMENTED deviation from the
    reference's shared iters budget (pinned by tests/test_fixed.py::
    TestPolishBudget and by this bench's closed-loop health asserts —
    feas 1.000, identical tracking envelope). None = reference budget.
    """
    import jax
    import jax.numpy as jnp

    from eagle_mpc_tpu.config import specs
    from eagle_mpc_tpu.mpc import CarrotMpc
    from eagle_mpc_tpu.sim import AerialSimulator
    from eagle_mpc_tpu.solvers import fddp, sbfddp

    missions = os.path.join(ROOT, "missions")
    dtype = jnp.float64 if dtype_str == "f64" else jnp.float32
    np_dtype = np.float64 if dtype_str == "f64" else np.float32

    traj = specs.load_trajectory(f"{ROBOT}/trajectories/{MISSION}.yaml",
                                 yaml_dir=missions)
    mp = specs.load_mpc_params(f"{ROBOT}/mpc/mpc.yaml", yaml_dir=missions)
    ref, ref_kind = _load_ref(traj, synthetic_ref)

    ctrl = CarrotMpc(mpc_params=mp, trajectory=traj, state_ref=ref,
                     dt_ref=DT_REF)
    params0 = jax.tree_util.tree_map(
        lambda x: np.asarray(x, np_dtype) if hasattr(x, "astype") else x,
        ctrl.params0)
    sim = AerialSimulator.from_platform(mp.model, mp.platform, dt_ms=2)

    T, nu, nx = ctrl.spec.T, ctrl.spec.nu, mp.model.nx
    m = float(mp.model.inertia[0][0, 0])
    hover = m * 9.81 / mp.platform.n_rotors

    solver_settings = fddp.SolverSettings(parallel_riccati=parallel_riccati,
                                          scan_unroll=scan_unroll,
                                          pallas_backward=pallas_backward,
                                          pallas_nodes=pallas_nodes,
                                          pallas_rollout=pallas_rollout)
    settings = sbfddp.SbFddpSettings(solver=solver_settings)
    sbs_tick = sbfddp.SbFddpSettings(convergence_init=1e-3,
                                     solver=solver_settings)

    if solver_kind == "fixed":
        spec = ctrl.spec

        def run_chunk(params, t0_ms, xb, xs, us):
            """K chained closed-loop MPC ticks for B scenarios (fixed-depth
            solver, per-element vmap, while-polish). Measured FASTER per
            tick than the batch-aware scalar-cond driver (376 vs 409 ms
            realistic / 236 vs 264 ms steady at B=512 on the v5e — the
            per-tick lax.cond costs more than it saves); the batch-aware
            driver still owns the WARM solve, where its bounded polish is
            a 60x win."""

            def tick(carry, _):
                t_ms, xb, xs, us = carry

                def one(t, x0, xs, us):
                    p = ctrl.update_problem(t, params._replace(x0=x0))
                    r = sbfddp.solve_fixed(spec, p, xs, us, depth=mp.iters,
                                           settings=sbs_tick,
                                           n_alphas=n_alphas,
                                           polish="while_fixed",
                                           polish_maxiter=polish_iters)
                    x_next = sim.step(x0, r.us_squash[0])
                    return x_next, r.xs, r.us, r.cost, r.feasible

                xb, xs, us, cost, feas = jax.vmap(one)(
                    jnp.full((xb.shape[0],), t_ms, dtype), xb, xs, us)
                return (t_ms + DT_SIM, xb, xs, us), (cost.mean(),
                                                     feas.astype(dtype).mean())

            (t_ms, xb, xs, us), (costs, feas) = jax.lax.scan(
                tick, (t0_ms, xb, xs, us), None, length=ticks)
            return costs, feas, t_ms, xb, xs, us

        def warm_fn(params, t_ms, xb, xs, us):
            """One-shot warm-start solve at t_ms (full ladder, full
            homotopy, deterministic fixed depth — VERDICT r3 item 2)."""
            t_full = jnp.full((xb.shape[0],), t_ms, dtype)
            params_b = jax.vmap(
                lambda t, x0: ctrl.update_problem(
                    t, params._replace(x0=x0)))(t_full, xb)
            r = sbfddp.solve_fixed_batched(spec, params_b, xs, us,
                                           depth=WARM_MAXITER,
                                           settings=settings, polish="fixed")
            return r.cost.mean(), r.feasible.astype(dtype).mean(), r.xs, r.us

    else:
        # round-3 while-loop path: ONE schedule length L = 3 serves both
        # phases (VERDICT r2 item 2):
        #   tick: [FDDP @ th=1e-3, DDP polish, no-op pad], maxiter 2
        #   warm: [FDDP @ 1e-2, FDDP @ 1e-3, DDP polish], maxiter 30
        tick_schedule = sbfddp.HomotopySchedule.from_settings(
            sbs_tick, maxiter=mp.iters, n_pad=1, dtype=dtype)
        warm_schedule = sbfddp.HomotopySchedule.from_settings(
            settings, maxiter=WARM_MAXITER, n_pad=0, dtype=dtype)
        assert len(tick_schedule.smooth) == len(warm_schedule.smooth)
        warm_fn = None

        def run_chunk(schedule, params, t0_ms, xb, xs, us):
            """K chained closed-loop MPC ticks for B scenarios."""

            def tick(carry, _):
                t_ms, xb, xs, us = carry

                def one(t, x0, xs, us):
                    p = ctrl.update_problem(t, params._replace(x0=x0))
                    r = ctrl.solve(p, xs, us, settings=settings,
                                   schedule=schedule)
                    x_next = sim.step(x0, r.us_squash[0])
                    return x_next, r.xs, r.us, r.cost, r.feasible

                xb, xs, us, cost, feas = jax.vmap(one)(
                    jnp.full((xb.shape[0],), t_ms, dtype), xb, xs, us)
                return (t_ms + DT_SIM, xb, xs, us), (cost.mean(),
                                                     feas.astype(dtype).mean())

            (t_ms, xb, xs, us), (costs, feas) = jax.lax.scan(
                tick, (t0_ms, xb, xs, us), None, length=ticks)
            return costs, feas, t_ms, xb, xs, us

    # initial batch: offline-reference state at the warm-start time + noise
    # (the benchmark harness pattern of /root/reference/benchmark/
    # problem-rates.cpp:13-25: perturbed initial states)
    B = batch
    t_warm = t0_ms - ticks * DT_SIM
    t_ref = np.arange(ref.shape[0], dtype=np.float64) * DT_REF
    x_at = np.empty(nx, np_dtype)
    i0 = min(int(t_warm // DT_REF), ref.shape[0] - 1)
    x_at[:] = ref[i0]
    rng = np.random.default_rng(0)
    noise = rng.normal(size=(B, nx)).astype(np_dtype) * 0.05
    noise[:, 3:7] = 0.0
    import jax.numpy as jnp  # noqa: F811 (local alias for arg building)
    x0b = jnp.asarray(x_at[None] + noise)
    xs0 = jnp.tile(x0b[:, None, :], (1, T + 1, 1))
    us0 = jnp.zeros((B, T, nu), dtype=dtype)
    us0 = us0.at[:, :, : mp.platform.n_rotors].set(hover)

    if solver_kind == "fixed":
        warm_args = (params0, jnp.asarray(t_warm, dtype), x0b, xs0, us0)
        chunk_args = (params0, jnp.asarray(t_warm, dtype), x0b, xs0, us0)
    else:
        warm_args = (warm_schedule, params0, jnp.asarray(t_warm, dtype),
                     x0b, xs0, us0)
        chunk_args = (tick_schedule, params0, jnp.asarray(t0_ms, dtype),
                      x0b, xs0, us0)
    meta = {"T": T, "nu": nu, "nx": nx, "B": B, "K": ticks,
            "ref_kind": ref_kind, "t0_ms": t0_ms,
            "budget_ms": mp.dt, "iters": mp.iters,
            "solver": solver_kind, "n_alphas": n_alphas}
    return Workload(run_chunk, warm_fn, chunk_args, warm_args,
                    np.asarray(ref, np.float64), t_ref, meta)


def _sample_ref_pos(state_ref, t_ref, t_ms):
    """Host-side reference position at time t (hold past the end)."""
    i = int(np.searchsorted(t_ref, t_ms, side="right"))
    if i >= len(t_ref):
        return state_ref[-1, :3]
    i1 = max(i, 1)
    a = (t_ms - t_ref[i1 - 1]) / (t_ref[i1] - t_ref[i1 - 1])
    return (1 - a) * state_ref[i1 - 1, :3] + a * state_ref[i1, :3]


def run_one(args, batch, synthetic_ref=None, t0_ms=None, assert_health=None):
    import jax
    import jax.numpy as jnp

    synthetic_ref = args.synthetic_ref if synthetic_ref is None else synthetic_ref
    t0_ms = args.t0 if t0_ms is None else t0_ms
    assert_health = (not args.no_assert) if assert_health is None else assert_health
    solver_kind = "while" if args.while_solver else "fixed"
    wl = build_workload(batch, args.ticks, args.dtype,
                        t0_ms=t0_ms, synthetic_ref=synthetic_ref,
                        parallel_riccati=args.priccati,
                        scan_unroll=args.unroll,
                        pallas_backward=args.pallas,
                        pallas_nodes=args.pallas_nodes,
                        pallas_rollout=args.pallas_rollout,
                        solver_kind=solver_kind,
                        n_alphas=args.alphas,
                        polish_iters=(None if args.polish_iters <= 0
                                      else args.polish_iters))
    K = args.ticks

    # AOT staging: trace / lower / XLA-compile measured separately so
    # compile-latency regressions are attributable (VERDICT r2 items 2-3)
    donate = (2, 3, 4) if solver_kind == "fixed" else (3, 4, 5)
    jfn = jax.jit(wl.run_chunk_fn, donate_argnums=donate)
    t0 = time.time()
    traced = jfn.trace(*wl.chunk_args)
    trace_s = time.time() - t0
    t0 = time.time()
    lowered = traced.lower()
    lower_s = time.time() - t0
    t0 = time.time()
    compiled = lowered.compile()
    compile_s = time.time() - t0
    try:
        flops = float((compiled.cost_analysis() or {}).get("flops", np.nan))
    except Exception:
        flops = float("nan")

    if solver_kind == "fixed":
        # warm program: separate (smaller) compile, then ONE warm solve +
        # one untimed settle chunk that advances the loop to t0
        jwarm = jax.jit(wl.warm_fn)
        t0 = time.time()
        warm_compiled = jwarm.lower(*wl.warm_args).compile()
        warm_compile_s = time.time() - t0
        params0, t_warm, xb, xs, us = wl.warm_args
        # host snapshots: the settle chunk DONATES these buffers, and the
        # steady-warm re-run below needs fresh copies of the same values
        snap = tuple(np.asarray(a) for a in (xb, xs, us))
        t0 = time.time()
        wcost, wfeas, xs, us = warm_compiled(params0, t_warm, xb, xs, us)
        _ = float(np.asarray(wcost))
        # settle: run the K-tick chunk once from t_warm -> t0 (same
        # compiled program as the timed region)
        costs, feas, t_ms, xb, xs, us = compiled(params0, t_warm, xb, xs, us)
        _ = np.asarray(costs)
        warm_s = time.time() - t0
        # steady warm cost: the first execution of a freshly compiled
        # program on the tunneled runtime carries volatile initialization
        # overhead (observed 3x swings); re-time the same program for the
        # deterministic number (VERDICT r3 item 2)
        t0 = time.time()
        wcost2, _, _, _ = warm_compiled(
            params0, t_warm, *(jnp.asarray(a) for a in snap))
        _ = float(np.asarray(wcost2))
        warm_steady_s = time.time() - t0
    else:
        warm_compile_s = 0.0
        t0 = time.time()
        costs, feas, t_ms, xb, xs, us = compiled(*wl.warm_args)
        _ = np.asarray(costs)
        warm_s = time.time() - t0
        warm_steady_s = float("nan")

    times = []
    params0 = wl.chunk_args[1] if solver_kind == "while" else wl.chunk_args[0]
    for _r in range(args.reps):
        t0 = time.time()
        if solver_kind == "fixed":
            costs, feas, t_ms, xb, xs, us = compiled(params0, t_ms, xb, xs, us)
        else:
            costs, feas, t_ms, xb, xs, us = compiled(
                wl.chunk_args[0], params0, t_ms, xb, xs, us)
        costs_h = np.asarray(costs)
        times.append(time.time() - t0)
    feas_h = np.asarray(feas)
    med = float(np.median(times))
    solves_per_s = batch * K / med

    # closed-loop health on the benchmarked platform/dtype: feasibility +
    # position tracking error vs the offline reference at the final time
    xb_h = np.asarray(xb)
    ref_pos = _sample_ref_pos(wl.state_ref, wl.t_ref, float(t_ms))
    pos_err = np.linalg.norm(xb_h[:, :3] - ref_pos[None], axis=1)
    health = {
        "feasible_frac": float(feas_h[-1]),
        "track_err_mean_m": float(pos_err.mean()),
        "track_err_max_m": float(pos_err.max()),
        "final_mean_cost": float(costs_h[-1]),
    }
    if assert_health:
        # bounds ~2x the measured envelope (VERDICT r3 weak #7): r3/r4
        # measured mean 0.079 m, max 0.167 m on the realistic region
        assert np.all(np.isfinite(costs_h)), "non-finite tick costs"
        assert health["feasible_frac"] >= 0.99, health
        assert health["track_err_mean_m"] < 0.16, health
        assert health["track_err_max_m"] < 0.35, health
        # warm-start regression guard (VERDICT r4 item 7): the fixed-depth
        # warm program is deterministic at ~7-12 s (B=512); a return to the
        # 64-540 s volatile era must FAIL the bench. warm_s additionally
        # carries first-execution tunnel noise — bound it loosely.
        if batch <= 1024 and solver_kind == "fixed":
            assert warm_steady_s < 30.0, {"warm_steady_s": warm_steady_s}
            assert warm_s < 120.0, {"warm_s": warm_s}

    stats = {"trace_s": round(trace_s, 1), "lower_s": round(lower_s, 1),
             "compile_s": round(compile_s, 1),
             "warm_compile_s": round(warm_compile_s, 1),
             "warm_s": round(warm_s, 1),
             "warm_steady_s": round(warm_steady_s, 1),
             "chunk_ms": round(med * 1e3, 1),
             "tick_ms": round(med / K * 1e3, 3),
             "flops_per_chunk": flops,
             "solves_per_s": round(solves_per_s, 1)}
    return stats, health, wl.meta


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--ticks", type=int, default=10, help="chained MPC ticks per rep")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--dtype", choices=["f32", "f64"], default="f32")
    ap.add_argument("--cpu", action="store_true", help="force CPU platform")
    ap.add_argument("--t0", type=float, default=T0_DEFAULT,
                    help="mission time (ms) at the start of the timed region")
    ap.add_argument("--synthetic-ref", action="store_true",
                    help="track the old synthetic glide instead of the "
                         "cached offline solve")
    ap.add_argument("--while-solver", action="store_true",
                    help="round-3 while-loop solver path (schedule-shared "
                         "warm/tick program) instead of the fixed-depth tick")
    ap.add_argument("--alphas", type=int, default=10,
                    help="line-search ladder depth for the fixed tick "
                         "(default: the reference's full 10-deep ladder — "
                         "affordable since the fused rollout kernel made "
                         "the ladder width cheap)")
    ap.add_argument("--polish-iters", type=int, default=1,
                    help="per-tick DDP polish budget cap (0 = reference "
                         "budget, i.e. the full iters)")
    ap.add_argument("--pallas", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="fuse the Riccati backward pass into one Pallas "
                         "kernel (ops/riccati_pallas.py; default ON on TPU "
                         "since round 5 — in context with the node/rollout "
                         "kernels it buys ~30 ms/tick, r3's standalone "
                         "parity verdict notwithstanding)")
    ap.add_argument("--pallas-nodes", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="fuse the per-node linearization sweep into one "
                         "Pallas kernel (ops/node_pallas.py; default ON "
                         "on TPU, OFF on CPU where interpret mode is slow)")
    ap.add_argument("--pallas-rollout",
                    action=argparse.BooleanOptionalAction, default=None,
                    help="fuse the batched-alpha line-search rollout into "
                         "one Pallas kernel (ops/rollout_pallas.py; same "
                         "default rule)")
    ap.add_argument("--priccati", action="store_true",
                    help="associative-scan (parallel-in-time) Riccati pass "
                         "(CPU only; refused on TPU — crashes the worker)")
    ap.add_argument("--no-assert", action="store_true")
    ap.add_argument("--skip-steady", action="store_true",
                    help="skip the second (synthetic steady-state) workload")
    ap.add_argument("--unroll", type=int, default=1,
                    help="lax.scan unroll factor for the horizon scans")
    ap.add_argument("--sweep", default=None,
                    help="comma-separated batch sizes; prints a solves/s-vs-"
                         "batch table instead of the single JSON metric")
    args = ap.parse_args()

    import jax

    # persistent compile cache: the tick program is large (while_loop solver
    # over T=30) — never pay XLA twice. User-scoped default path so a shared
    # host can't collide on /tmp permissions.
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR",
                                     os.path.expanduser("~/.cache/jax")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.dtype == "f64":
        jax.config.update("jax_enable_x64", True)

    platform = jax.devices()[0].platform
    # the fused node/rollout kernels are the round-5 default tick config on
    # TPU; on CPU they run in (slow) interpret mode, so default them off
    if args.pallas_nodes is None:
        args.pallas_nodes = platform == "tpu"
    if args.pallas_rollout is None:
        args.pallas_rollout = platform == "tpu"
    if args.pallas is None:
        args.pallas = platform == "tpu"

    if args.sweep:
        rows = []
        for b in [int(x) for x in args.sweep.split(",")]:
            stats, health, meta = run_one(args, b)
            flops_per_s = stats["flops_per_chunk"] / (stats["chunk_ms"] / 1e3)
            rows.append({"batch": b, **stats,
                         "tflops_per_s": round(flops_per_s / 1e12, 2),
                         **health})
            print(json.dumps(rows[-1]), flush=True)
        return

    stats, health, meta = run_one(args, args.batch)
    print(f"# platform={platform} dtype={args.dtype} B={meta['B']} "
          f"K={meta['K']} T={meta['T']} ref={meta['ref_kind']} "
          f"solver={meta['solver']} alphas={meta['n_alphas']} "
          f"t0={meta['t0_ms']:.0f}ms trace={stats['trace_s']}s "
          f"lower={stats['lower_s']}s compile={stats['compile_s']}s "
          f"warm_compile={stats['warm_compile_s']}s "
          f"warm={stats['warm_s']}s warm_steady={stats['warm_steady_s']}s "
          f"chunk={stats['chunk_ms']}ms "
          f"tick={stats['tick_ms']}ms "
          f"feasible_frac={health['feasible_frac']:.3f} "
          f"track_err_mean={health['track_err_mean_m']:.3f}m "
          f"track_err_max={health['track_err_max_m']:.3f}m "
          f"final_mean_cost={health['final_mean_cost']:.2f}",
          file=sys.stderr)

    steady = None
    if not args.skip_steady and not args.synthetic_ref:
        # second workload: the round-2/3 steady-state methodology
        # (synthetic glide, t0=20 ms) so the round-over-round artifact
        # chain stays comparable (VERDICT r3 weak #3)
        try:
            s_stats, s_health, _ = run_one(args, args.batch,
                                           synthetic_ref=True, t0_ms=20.0,
                                           assert_health=False)
            steady = s_stats["solves_per_s"]
            print(f"# steady-state synthetic workload: {steady} solves/s "
                  f"(tick {s_stats['tick_ms']} ms)", file=sys.stderr)
        except Exception as e:  # the headline metric must still print
            print(f"# steady-state workload failed: {e}", file=sys.stderr)

    out = {
        "metric": "carrot_mpc_solves_per_s_per_chip_hexacopter370_flying_arm_3",
        "value": stats["solves_per_s"],
        "unit": "solves/s",
        "vs_baseline": round(stats["solves_per_s"] / 1000.0, 3),
        "tick_ms": stats["tick_ms"],
        "warm_s": stats["warm_s"],
        "warm_steady_s": stats["warm_steady_s"],
        "compile_s": stats["compile_s"],
        "solver": meta["solver"],
    }
    if steady is not None:
        out["steady_synthetic_solves_per_s"] = steady
    print(json.dumps(out))


if __name__ == "__main__":
    main()
