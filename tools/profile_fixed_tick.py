"""Phase decomposition of the FIXED-DEPTH carrot-MPC tick (round 4 path).

Same honest-measurement rules as tools/profile_tick.py: scalar host fetch
as the completion barrier, no eager-closure captures, round-trip floor
measured first. Phases build up the tick from its parts so the residual
glue cost is attributable:

    update       parameter update only (carrot reference re-aim)
    stage d1/d2  fddp.solve_fixed, depth 1 / 2 (one homotopy stage)
    +polish      sbfddp.solve_fixed depth 2 (stage + while-polish + squash)
    full tick    + plant step (the bench.py per-tick body)

Usage: python tools/profile_fixed_tick.py [--batch 512] [--alphas 4] [--cpu]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--alphas", type=int, default=4)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--reps", type=int, default=5)
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
    dtype = jnp.float32
    np_dtype = np.float32
    dt_ref = 30

    traj = specs.load_trajectory(
        "hexacopter370_flying_arm_3/trajectories/displacement.yaml",
        yaml_dir=missions)
    mp = specs.load_mpc_params("hexacopter370_flying_arm_3/mpc/mpc.yaml",
                               yaml_dir=missions)
    n_ref = traj.duration // dt_ref + 1
    ref = np.tile(np.asarray(traj.initial_state), (n_ref, 1))
    ref[:, 0] = np.linspace(0.0, 2.0, n_ref)
    ctrl = CarrotMpc(mpc_params=mp, trajectory=traj, state_ref=ref, dt_ref=dt_ref)
    params0 = jax.tree_util.tree_map(
        lambda x: np.asarray(x, np_dtype) if hasattr(x, "astype") else x,
        ctrl.params0)
    sim = AerialSimulator.from_platform(mp.model, mp.platform, dt_ms=2)
    spec = ctrl.spec
    T, nu, nx = spec.T, spec.nu, mp.model.nx

    B = args.batch
    rng = np.random.default_rng(0)
    noise = rng.normal(size=(B, nx)).astype(np_dtype) * 0.05
    noise[:, 3:7] = 0.0
    x0b = jnp.asarray(np.asarray(traj.initial_state, np_dtype)[None] + noise)
    m = float(mp.model.inertia[0][0, 0])
    hover = m * 9.81 / mp.platform.n_rotors
    xs = jnp.tile(x0b[:, None, :], (1, T + 1, 1))
    us = jnp.zeros((B, T, nu), dtype=dtype)
    us = us.at[:, :, : mp.platform.n_rotors].set(hover)
    t_ms = jnp.zeros((B,), dtype=dtype)

    ss = fddp.SolverSettings()
    sbs = sbfddp.SbFddpSettings(convergence_init=1e-3, solver=ss)
    nA = args.alphas

    def scalar_time(fn, *a):
        out = fn(*a)
        _ = float(out)
        ts = []
        for _i in range(args.reps):
            t0 = time.perf_counter()
            out = fn(*a)
            _ = float(out)
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) * 1e3

    @jax.jit
    def trivial(x0b):
        return jnp.sum(x0b * 2.0)

    @jax.jit
    def update_only(params, t_ms, x0b):
        def one(t, x0):
            p = ctrl.update_problem(t, params._replace(x0=x0))
            return jnp.sum(p.node.weight) + jnp.sum(p.node.refs[0])
        return jnp.sum(jax.vmap(one)(t_ms, x0b))

    def make_stage(depth):
        @jax.jit
        def stage(params, t_ms, x0b, xs, us):
            def one(t, x0, xs, us):
                p = ctrl.update_problem(t, params._replace(x0=x0))
                p = sbfddp._set_homotopy(spec, p, sbs.smooth_init)
                r = fddp.solve_fixed(spec, ss, p, xs, us, depth,
                                     jnp.asarray(1e-3, dtype), sbs.reg_init,
                                     False, ddp=False, n_alphas=nA)
                return r.cost + jnp.sum(r.us)
            return jnp.sum(jax.vmap(one)(t_ms, x0b, xs, us))
        return stage

    def make_solve(polish):
        @jax.jit
        def solve(params, t_ms, x0b, xs, us):
            def one(t, x0, xs, us):
                p = ctrl.update_problem(t, params._replace(x0=x0))
                r = sbfddp.solve_fixed(spec, p, xs, us, depth=2, settings=sbs,
                                       n_alphas=nA, polish=polish)
                return r.cost + jnp.sum(r.us_squash)
            return jnp.sum(jax.vmap(one)(t_ms, x0b, xs, us))
        return solve

    @jax.jit
    def full_tick(params, t_ms, x0b, xs, us):
        def one(t, x0, xs, us):
            p = ctrl.update_problem(t, params._replace(x0=x0))
            r = sbfddp.solve_fixed(spec, p, xs, us, depth=2, settings=sbs,
                                   n_alphas=nA)
            x_next = sim.step(x0, r.us_squash[0])
            return r.cost + jnp.sum(x_next)
        return jnp.sum(jax.vmap(one)(t_ms, x0b, xs, us))

    phases = [
        ("trivial (floor)", trivial, (x0b,)),
        ("update", update_only, (params0, t_ms, x0b)),
        ("stage depth1", make_stage(1), (params0, t_ms, x0b, xs, us)),
        ("stage depth2", make_stage(2), (params0, t_ms, x0b, xs, us)),
        ("solve no-polish", make_solve("none"), (params0, t_ms, x0b, xs, us)),
        ("solve +polish", make_solve("while"), (params0, t_ms, x0b, xs, us)),
        ("full tick", full_tick, (params0, t_ms, x0b, xs, us)),
    ]
    platform = jax.devices()[0].platform
    print(f"platform={platform} B={B} T={T} alphas={nA} scalar-fetch")
    for name, fn, a in phases:
        t0 = time.time()
        ms = scalar_time(fn, *a)
        print(f"  {name:16s} {ms:9.2f} ms   (compile+run wall {time.time()-t0:.1f}s)",
              flush=True)


if __name__ == "__main__":
    main()
