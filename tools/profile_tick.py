"""Decompose the flagship carrot-MPC tick into phases and time each honestly.

Measurement notes (hard-won on the tunneled TPU runtime):
- ``block_until_ready`` does NOT reliably wait on this platform; every
  measurement here forces a SCALAR host fetch (``float(out)``), which cannot
  complete before the computation does.
- Functions must not close over eager device arrays (that switches the
  runtime to a ~25 ms/call slow dispatch path and poisons the process);
  everything is passed as explicit jit arguments or numpy trace constants.
- The per-call round-trip floor is measured first (``trivial``) — subtract
  it mentally from everything else.

Usage: python tools/profile_tick.py [--batch B] [--dtype f32]
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
    ap.add_argument("--dtype", choices=["f32", "f64"], default="f32")
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
    if args.dtype == "f64":
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from eagle_mpc_tpu.config import specs
    from eagle_mpc_tpu.mpc import CarrotMpc
    from eagle_mpc_tpu.ocp import problem as P
    from eagle_mpc_tpu.solvers import fddp, sbfddp

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    missions = os.path.join(root, "missions")
    dtype = jnp.float64 if args.dtype == "f64" else jnp.float32
    np_dtype = np.float64 if args.dtype == "f64" else np.float32
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

    settings = fddp.SolverSettings()
    sbs = sbfddp.SbFddpSettings(convergence_init=1e-3, solver=settings)

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

    def sum_all(t):
        return sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(t)
                   if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating))

    f32 = lambda v: jnp.asarray(v, dtype)

    @jax.jit
    def trivial(x0b):
        return jnp.sum(x0b * 2.0)

    @jax.jit
    def calc_all(params, x0b, xs, us):
        def one(x0, xs, us):
            p = params._replace(x0=x0)
            costs, xn, cT = P.calc_all(spec, p, xs, us)
            return jnp.sum(costs) + cT + jnp.sum(xn)
        return jnp.sum(jax.vmap(one)(x0b, xs, us))

    @jax.jit
    def calc_diff(params, x0b, xs, us):
        def one(x0, xs, us):
            p = params._replace(x0=x0)
            derivs, term = P.calc_diff_all(spec, p, xs, us)
            return sum_all(derivs) + term[0]
        return jnp.sum(jax.vmap(one)(x0b, xs, us))

    @jax.jit
    def backward(params, x0b, xs, us):
        def one(x0, xs, us):
            p = params._replace(x0=x0)
            derivs, term = P.calc_diff_all(spec, p, xs, us)
            fs = fddp._gaps(spec, p, xs, derivs, jnp.asarray(False))
            bp = fddp._backward_pass(spec, derivs, term, fs, f32(1e-9),
                                     f32(1e-9), jnp.asarray(False))
            return jnp.sum(bp.k) + jnp.sum(bp.K)
        return jnp.sum(jax.vmap(one)(x0b, xs, us))

    @jax.jit
    def direction(params, x0b, xs, us):
        def one(x0, xs, us):
            p = params._replace(x0=x0)
            cost, fs, bp, xr, ur, failed = fddp._compute_direction(
                spec, settings, p, xs, us, jnp.asarray(False), f32(1e-9),
                f32(1e-9))
            return cost + jnp.sum(bp.k) + jnp.sum(bp.K)
        return jnp.sum(jax.vmap(one)(x0b, xs, us))

    def make_fwd(n_alpha):
        @jax.jit
        def fwd(params, x0b, xs, us):
            def one(x0, xs, us):
                p = params._replace(x0=x0)
                derivs, term = P.calc_diff_all(spec, p, xs, us)
                fs = fddp._gaps(spec, p, xs, derivs, jnp.asarray(False))
                bp = fddp._backward_pass(spec, derivs, term, fs, f32(1e-9),
                                         f32(1e-9), jnp.asarray(False))
                alphas = jnp.asarray(settings.alphas[:n_alpha], dtype)

                def try_a(a):
                    _, _, c, _ = fddp._forward_pass(
                        spec, p, xs, us, bp, fs, a, jnp.asarray(False),
                        use_gaps=jnp.asarray(True))
                    return c
                return jnp.sum(jax.vmap(try_a)(alphas))
            return jnp.sum(jax.vmap(one)(x0b, xs, us))
        return fwd

    @jax.jit
    def fddp2(params, x0b, xs, us):
        def one(x0, xs, us):
            p = params._replace(x0=x0)
            r = fddp.solve_fddp(spec, settings, p, xs, us, 2, f32(1e-3))
            return r.cost + jnp.sum(r.us)
        return jnp.sum(jax.vmap(one)(x0b, xs, us))

    @jax.jit
    def tick(params, t_ms, x0b, xs, us):
        def one(t, x0, xs, us):
            p = ctrl.update_problem(t, params._replace(x0=x0))
            r = sbfddp.solve(spec, p, xs, us, maxiter=2, settings=sbs)
            return r.cost + jnp.sum(r.us)
        return jnp.sum(jax.vmap(one)(t_ms, x0b, xs, us))

    phases = [
        ("trivial (floor)", trivial, (x0b,)),
        ("calc_all", calc_all, (params0, x0b, xs, us)),
        ("calc_diff_all", calc_diff, (params0, x0b, xs, us)),
        ("+backward", backward, (params0, x0b, xs, us)),
        ("direction(+esc)", direction, (params0, x0b, xs, us)),
        ("+fwd x1", make_fwd(1), (params0, x0b, xs, us)),
        ("+fwd x10", make_fwd(10), (params0, x0b, xs, us)),
        ("fddp 2it", fddp2, (params0, x0b, xs, us)),
        ("tick (sbfddp)", tick, (params0, t_ms, x0b, xs, us)),
    ]
    platform = jax.devices()[0].platform
    print(f"platform={platform} B={B} T={T} dtype={args.dtype} scalar-fetch")
    for name, fn, a in phases:
        t0 = time.time()
        ms = scalar_time(fn, *a)
        print(f"  {name:16s} {ms:9.2f} ms   (compile+run wall {time.time()-t0:.1f}s)",
              flush=True)


if __name__ == "__main__":
    main()
