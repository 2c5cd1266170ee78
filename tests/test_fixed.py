"""Fixed-depth solver path (fddp.solve_fixed / sbfddp.solve_fixed) pinned
against the reference-faithful while-loop solvers.

The fixed path is the MPC-tick fast path (VERDICT r3 item 1): lax.scan over
a static iteration depth, batched-alpha line search, escalate-and-continue
regularization. Its semantics deviate from the while solvers ONLY when a
backward pass fails at the current regularization (the fixed path consumes
an iteration per escalation step instead of retrying inside the iteration);
on the mission corpus no escalation fires (the dtype-relative PD floor in
fddp._backward_pass), so results must match to roundoff.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eagle_mpc_tpu.config import specs
from eagle_mpc_tpu.mpc import CarrotMpc
from eagle_mpc_tpu.ocp import problem as P
from eagle_mpc_tpu.solvers import fddp, sbfddp

MISSIONS = os.path.join(os.path.dirname(__file__), "..", "missions")


@pytest.fixture(scope="module")
def hover_pair():
    traj = specs.load_trajectory("iris/trajectories/hover.yaml",
                                 yaml_dir=MISSIONS)
    spec, params = P.from_trajectory(traj, dt_ms=40, use_squash=True,
                                     integrator="IntegratedActionModelEuler")
    res_w = jax.jit(lambda p: sbfddp.solve(spec, p, maxiter=100))(params)
    depth = int(res_w.iters) + 8
    res_f = jax.jit(lambda p: sbfddp.solve_fixed(spec, p, depth=depth))(params)
    return spec, params, res_w, res_f


class TestFixedMatchesWhile:
    def test_hover_same_iterations(self, hover_pair):
        _, _, res_w, res_f = hover_pair
        assert int(res_f.iters) == int(res_w.iters)
        assert bool(res_f.feasible) and not bool(res_f.failed)

    def test_hover_same_solution(self, hover_pair):
        _, _, res_w, res_f = hover_pair
        assert abs(float(res_w.cost) - float(res_f.cost)) <= 1e-9 * float(res_w.cost)
        np.testing.assert_allclose(np.asarray(res_f.xs), np.asarray(res_w.xs),
                                   atol=1e-9)
        np.testing.assert_allclose(np.asarray(res_f.us_squash),
                                   np.asarray(res_w.us_squash), atol=1e-9)

    def test_hover_bounds(self, hover_pair):
        _, params, _, res_f = hover_pair
        u = np.asarray(res_f.us_squash)
        assert np.all(u >= np.asarray(params.glob.s_lb) - 1e-9)
        assert np.all(u <= np.asarray(params.glob.s_ub) + 1e-9)


@pytest.fixture(scope="module")
def flagship_tick():
    """Warm-started flagship carrot tick — the exact bench.py workload shape."""
    traj = specs.load_trajectory(
        "hexacopter370_flying_arm_3/trajectories/displacement.yaml",
        yaml_dir=MISSIONS)
    mp = specs.load_mpc_params("hexacopter370_flying_arm_3/mpc/mpc.yaml",
                               yaml_dir=MISSIONS)
    dt_ref = 30
    n_ref = traj.duration // dt_ref + 1
    ref = np.tile(np.asarray(traj.initial_state), (n_ref, 1))
    ref[:, 0] = np.linspace(0.0, 2.0, n_ref)
    ctrl = CarrotMpc(mpc_params=mp, trajectory=traj, state_ref=ref,
                     dt_ref=dt_ref)
    spec = ctrl.spec
    T, nu = spec.T, spec.nu
    x0 = jnp.asarray(traj.initial_state)
    xs0 = jnp.tile(x0, (T + 1, 1))
    m = float(mp.model.inertia[0][0, 0])
    hover = m * 9.81 / mp.platform.n_rotors
    us0 = jnp.zeros((T, nu)).at[:, : mp.platform.n_rotors].set(hover)
    p0 = ctrl.update_problem(0.0, P.as_device(ctrl.params0)._replace(x0=x0))
    warm = jax.jit(lambda p, xs, us: sbfddp.solve_fixed(
        spec, p, xs, us, depth=30))(p0, xs0, us0)
    return ctrl, spec, warm


class TestFixedTick:
    def test_warm_start_converges(self, flagship_tick):
        _, _, warm = flagship_tick
        assert bool(warm.feasible) and not bool(warm.failed)
        assert np.isfinite(float(warm.cost))

    def test_tick_matches_while(self, flagship_tick):
        ctrl, spec, warm = flagship_tick
        sbs = sbfddp.SbFddpSettings(convergence_init=1e-3)
        p1 = ctrl.update_problem(
            2.0, P.as_device(ctrl.params0)._replace(x0=warm.xs[1]))
        tick_w = jax.jit(lambda p, xs, us: sbfddp.solve(
            spec, p, xs, us, maxiter=2, settings=sbs))(p1, warm.xs, warm.us)
        tick_f = jax.jit(lambda p, xs, us: sbfddp.solve_fixed(
            spec, p, xs, us, depth=2, settings=sbs))(p1, warm.xs, warm.us)
        assert int(tick_f.iters) == int(tick_w.iters)
        np.testing.assert_allclose(np.asarray(tick_f.us_squash),
                                   np.asarray(tick_w.us_squash), atol=1e-9)
        np.testing.assert_allclose(np.asarray(tick_f.xs),
                                   np.asarray(tick_w.xs), atol=1e-9)

    def test_tick_vmaps(self, flagship_tick):
        ctrl, spec, warm = flagship_tick
        sbs = sbfddp.SbFddpSettings(convergence_init=1e-3)
        B = 4
        rng = np.random.default_rng(0)
        noise = rng.normal(size=(B, warm.xs.shape[1])) * 0.01
        noise[:, 3:7] = 0.0
        x0b = jnp.asarray(np.asarray(warm.xs[1])[None] + noise)
        params0 = ctrl.params0

        @jax.jit
        def batched(x0b):
            def one(x0):
                p = ctrl.update_problem(
                    2.0, P.as_device(params0)._replace(x0=x0))
                return sbfddp.solve_fixed(spec, p, warm.xs, warm.us,
                                          depth=2, settings=sbs)
            return jax.vmap(one)(x0b)

        res = batched(x0b)
        assert res.xs.shape[0] == B
        assert np.all(np.asarray(res.feasible))
        assert np.all(np.isfinite(np.asarray(res.cost)))


class TestBatchedDriver:
    def test_matches_vmapped_fixed_bitwise(self):
        """solve_fixed_batched (batch axis inside, scalar-cond polish) must
        be numerically IDENTICAL to vmap(solve_fixed(polish='fixed')) —
        same iteration body, different batching structure."""
        traj = specs.load_trajectory("iris/trajectories/hover.yaml",
                                     yaml_dir=MISSIONS)
        spec, params = P.from_trajectory(
            traj, dt_ms=40, use_squash=True,
            integrator="IntegratedActionModelEuler")
        B = 4
        rng = np.random.default_rng(0)
        noise = rng.normal(size=(B, traj.model.nx)) * 0.05
        noise[:, 3:7] = 0.0
        x0b = jnp.asarray(np.asarray(traj.initial_state)[None] + noise)
        params_b = jax.vmap(
            lambda x0: P.as_device(params)._replace(x0=x0))(x0b)
        xs0 = jnp.tile(x0b[:, None, :], (1, spec.T + 1, 1))
        us0 = jnp.zeros((B, spec.T, spec.nu))
        ra = jax.jit(lambda pb, xs, us: sbfddp.solve_fixed_batched(
            spec, pb, xs, us, depth=30))(params_b, xs0, us0)
        rb = jax.jit(jax.vmap(lambda p, xs, us: sbfddp.solve_fixed(
            spec, p, xs, us, depth=30, polish="fixed")))(params_b, xs0, us0)
        assert np.all(np.asarray(ra.feasible))
        np.testing.assert_array_equal(np.asarray(ra.iters),
                                      np.asarray(rb.iters))
        np.testing.assert_array_equal(np.asarray(ra.us_squash),
                                      np.asarray(rb.us_squash))
        np.testing.assert_array_equal(np.asarray(ra.xs), np.asarray(rb.xs))

    def test_polish_cond_skipped_when_feasible(self):
        """When every element ends the homotopy feasible, the scalar-cond
        polish must contribute zero iterations."""
        traj = specs.load_trajectory("iris/trajectories/hover.yaml",
                                     yaml_dir=MISSIONS)
        spec, params = P.from_trajectory(
            traj, dt_ms=40, use_squash=True,
            integrator="IntegratedActionModelEuler")
        B = 2
        x0b = jnp.tile(jnp.asarray(traj.initial_state)[None], (B, 1))
        params_b = jax.vmap(
            lambda x0: P.as_device(params)._replace(x0=x0))(x0b)
        xs0 = jnp.tile(x0b[:, None, :], (1, spec.T + 1, 1))
        us0 = jnp.zeros((B, spec.T, spec.nu))
        ra = jax.jit(lambda pb, xs, us: sbfddp.solve_fixed_batched(
            spec, pb, xs, us, depth=30))(params_b, xs0, us0)
        rp = jax.jit(jax.vmap(lambda p, xs, us: sbfddp.solve_fixed(
            spec, p, xs, us, depth=30, polish="none")))(params_b, xs0, us0)
        assert np.all(np.asarray(ra.feasible))
        np.testing.assert_array_equal(np.asarray(ra.iters),
                                      np.asarray(rp.iters))


class TestFixedBox:
    def test_box_fddp_fixed_matches_while(self):
        traj = specs.load_trajectory("iris/trajectories/hover.yaml",
                                     yaml_dir=MISSIONS)
        spec, params = P.from_trajectory(
            traj, dt_ms=40, use_squash=False,
            integrator="IntegratedActionModelEuler")
        xs0, us0 = fddp.default_init(spec, params)
        st = fddp.SolverSettings()
        res_w = jax.jit(lambda p: fddp.solve_box_fddp(
            spec, st, p, xs0, us0, 60, 1e-9))(params)
        depth = int(res_w.iters) + 6
        res_f = jax.jit(lambda p: fddp.solve_fixed(
            spec, st, p, xs0, us0, depth, 1e-9, box=True))(params)
        assert int(res_f.iters) == int(res_w.iters)
        np.testing.assert_allclose(np.asarray(res_f.us), np.asarray(res_w.us),
                                   atol=1e-8)
        u = np.asarray(res_f.us)
        assert np.all(u >= np.asarray(params.glob.s_lb) - 1e-9)
        assert np.all(u <= np.asarray(params.glob.s_ub) + 1e-9)


class TestPolishVariants:
    def test_polish_paths_agree(self):
        """polish="while" (tick path), "fixed" (cold-batch path) and
        "none" must agree whenever the homotopy stages end feasible (the
        polish is then per-element masked off in all three)."""
        traj = specs.load_trajectory("iris/trajectories/hover.yaml",
                                     yaml_dir=MISSIONS)
        spec, params = P.from_trajectory(
            traj, dt_ms=40, use_squash=True,
            integrator="IntegratedActionModelEuler")
        res = {}
        for polish in ("while", "fixed", "none"):
            res[polish] = jax.jit(lambda p, po=polish: sbfddp.solve_fixed(
                spec, p, depth=30, polish=po))(params)
        assert all(bool(r.feasible) for r in res.values())
        for polish in ("fixed", "none"):
            np.testing.assert_array_equal(
                np.asarray(res[polish].us_squash),
                np.asarray(res["while"].us_squash))

    def test_polish_fixed_recovers_infeasible(self):
        """A candidate that is still infeasible after a starved FDDP stage
        must be pushed to feasibility by the fixed-depth polish (the
        reference's solveDDP pass, src/sbfddp.cpp:217-219)."""
        traj = specs.load_trajectory("iris/trajectories/hover.yaml",
                                     yaml_dir=MISSIONS)
        spec, params = P.from_trajectory(
            traj, dt_ms=40, use_squash=True,
            integrator="IntegratedActionModelEuler")
        # depth 1: one FDDP iteration cannot close a cold start's gaps
        starved = jax.jit(lambda p: sbfddp.solve_fixed(
            spec, p, depth=1, polish="none"))(params)
        if bool(starved.feasible):  # pragma: no cover - safety net
            pytest.skip("cold start unexpectedly feasible after 1 iter")
        polished = jax.jit(lambda p: sbfddp.solve_fixed(
            spec, p, depth=1, polish="fixed"))(params)
        assert bool(polished.feasible)


class TestPolishBudget:
    def test_budget1_polish_restores_feasibility(self):
        """The bench's polish_maxiter=1 deviation (BASELINE.md r4): one
        DDP-polish iteration must restore dynamic feasibility of an
        infeasible post-stage candidate — the DDP accept is unconditional
        for infeasible candidates, so iteration 1 rolls the candidate out
        and the further budget only trims cost."""
        traj = specs.load_trajectory("iris/trajectories/hover.yaml",
                                     yaml_dir=MISSIONS)
        spec, params = P.from_trajectory(
            traj, dt_ms=40, use_squash=True,
            integrator="IntegratedActionModelEuler")
        starved = jax.jit(lambda p: sbfddp.solve_fixed(
            spec, p, depth=1, polish="none"))(params)
        assert not bool(starved.feasible)
        one = jax.jit(lambda p: sbfddp.solve_fixed(
            spec, p, depth=1, polish="while_fixed",
            polish_maxiter=1))(params)
        assert bool(one.feasible)
        # and the while_fixed body matches the while-solver polish exactly
        # when both get the same budget
        ref = jax.jit(lambda p: sbfddp.solve_fixed(
            spec, p, depth=1, polish="while", polish_maxiter=1))(params)
        np.testing.assert_allclose(np.asarray(one.us_squash),
                                   np.asarray(ref.us_squash), atol=1e-9)


class TestFixedDeviation:
    def test_escalation_consumes_iteration_but_recovers(self):
        """The ONE semantic deviation of the fixed path: a failed backward
        pass escalates regs and consumes an iteration instead of retrying
        in-place. Force failures by disabling the PD floor's headroom via a
        huge reg_max... instead, simplest trigger: feed a candidate whose
        derivatives are finite but Quu is indefinite at zero reg — the
        barrier-free box path with absurd negative control cost cannot be
        constructed from missions, so this pins behavior structurally: with
        maxiter masking the fixed solver must still converge on hover when
        given extra depth headroom."""
        traj = specs.load_trajectory("iris/trajectories/hover.yaml",
                                     yaml_dir=MISSIONS)
        spec, params = P.from_trajectory(
            traj, dt_ms=40, use_squash=True,
            integrator="IntegratedActionModelEuler")
        # high initial regularization: the schedule has to walk it down —
        # exercises the inc/dec reg logic across many masked iterations
        st = sbfddp.SbFddpSettings(reg_init=1e3)
        res = jax.jit(lambda p: sbfddp.solve_fixed(
            spec, p, depth=60, settings=st))(params)
        assert bool(res.feasible) and not bool(res.failed)
        xT = np.asarray(res.xs[-1])
        np.testing.assert_allclose(xT[:3], [0, 0, 2.5], atol=5e-2)

    def test_maxiter_mask_zero_is_noop(self):
        traj = specs.load_trajectory("iris/trajectories/hover.yaml",
                                     yaml_dir=MISSIONS)
        spec, params = P.from_trajectory(
            traj, dt_ms=40, use_squash=True,
            integrator="IntegratedActionModelEuler")
        xs0, us0 = fddp.default_init(spec, params)
        st = fddp.SolverSettings()
        res = jax.jit(lambda p: fddp.solve_fixed(
            spec, st, p, xs0, us0, 4, 1e-9, maxiter=0))(params)
        assert int(res.iters) == 0
        np.testing.assert_array_equal(np.asarray(res.xs), np.asarray(xs0))
        np.testing.assert_array_equal(np.asarray(res.us), np.asarray(us0))


class TestTickConfigDeviationBound:
    """Numerical pinning of the bench tick-config deviation (VERDICT r4
    item 3): the headline tick caps the DDP polish at polish_maxiter=1 on
    the cheap fixed-iteration body ("while_fixed"), where the reference
    shares the full iters budget with the FDDP stage
    (/root/reference/src/sbfddp.cpp:217-219). This test runs the BENCHED
    closed loop (flagship carrot, offline reference, t0 = 3500 ms — the
    wp2 stage transition + carrot-tail region, K = 10 chained ticks,
    B = 4 perturbed scenarios, f64) under both configs and bounds the
    closed-loop state/control divergence the cap introduces.

    The line-search ladder is NOT a deviation anymore: round 5 restored
    the reference's full 10-deep ladder as the bench default (the fused
    rollout kernel made ladder width cheap).
    """

    K_TICKS = 10
    T0_MS = 3500.0
    DT_SIM = 2.0

    @pytest.fixture(scope="class")
    def closed_loops(self):
        from eagle_mpc_tpu.sim import AerialSimulator
        from tools.make_ref import load_ref

        traj = specs.load_trajectory(
            "hexacopter370_flying_arm_3/trajectories/displacement.yaml",
            yaml_dir=MISSIONS)
        mp = specs.load_mpc_params(
            "hexacopter370_flying_arm_3/mpc/mpc.yaml", yaml_dir=MISSIONS)
        ref, kind = load_ref("hexacopter370_flying_arm_3", "displacement",
                             30, traj=traj)
        assert kind == "offline", "cached offline reference required"
        ctrl = CarrotMpc(mpc_params=mp, trajectory=traj, state_ref=ref,
                         dt_ref=30)
        sim = AerialSimulator.from_platform(mp.model, mp.platform, dt_ms=2)
        spec = ctrl.spec
        T, nu, nx = spec.T, spec.nu, mp.model.nx

        B = 4
        rng = np.random.default_rng(0)
        noise = rng.normal(size=(B, nx)) * 0.05
        noise[:, 3:7] = 0.0
        t_warm = self.T0_MS - self.K_TICKS * self.DT_SIM
        i0 = int(t_warm // 30)
        x0b = jnp.asarray(ref[i0][None] + noise)
        m = float(mp.model.inertia[0][0, 0])
        hover = m * 9.81 / mp.platform.n_rotors
        xs0 = jnp.tile(x0b[:, None, :], (1, T + 1, 1))
        us0 = jnp.zeros((B, T, nu), jnp.float64)
        us0 = us0.at[:, :, : mp.platform.n_rotors].set(hover)
        params0 = P.as_device(ctrl.params0)

        sbs_tick = sbfddp.SbFddpSettings(convergence_init=1e-3)

        def make_chunk(polish, polish_maxiter):
            @jax.jit
            def chunk(t0_ms, xb, xs, us):
                def tick(carry, _):
                    t_ms, xb, xs, us = carry

                    def one(t, x0, xs, us):
                        p = ctrl.update_problem(
                            t, params0._replace(x0=x0))
                        r = sbfddp.solve_fixed(
                            spec, p, xs, us, depth=mp.iters,
                            settings=sbs_tick, polish=polish,
                            polish_maxiter=polish_maxiter)
                        return (sim.step(x0, r.us_squash[0]), r.xs, r.us,
                                r.us_squash[0], r.feasible)

                    xb, xs, us, u0, feas = jax.vmap(one)(
                        jnp.full((xb.shape[0],), t_ms), xb, xs, us)
                    return (t_ms + self.DT_SIM, xb, xs, us), (xb, u0, feas)

                (_, xb, xs, us), (xb_hist, u0_hist, feas_hist) = \
                    jax.lax.scan(tick, (t0_ms, xb, xs, us), None,
                                 length=self.K_TICKS)
                return xb_hist, u0_hist, feas_hist

            return chunk

        # shared warm start (depth 30, fixed polish — the bench warm path)
        @jax.jit
        def warm(t, xb, xs, us):
            def one(t1, x0, xs, us):
                p = ctrl.update_problem(t1, params0._replace(x0=x0))
                return sbfddp.solve_fixed(spec, p, xs, us, depth=30,
                                          polish="fixed")
            return jax.vmap(one)(jnp.full((xb.shape[0],), t), xb, xs, us)

        w = warm(jnp.asarray(t_warm), x0b, xs0, us0)
        args = (jnp.asarray(t_warm), x0b, w.xs, w.us)
        bench_cfg = make_chunk("while_fixed", 1)(*args)
        ref_cfg = make_chunk("while", None)(*args)
        return bench_cfg, ref_cfg

    def test_feasibility_identical(self, closed_loops):
        (_, _, feas_b), (_, _, feas_r) = closed_loops
        assert np.array_equal(np.asarray(feas_b), np.asarray(feas_r))
        assert np.all(np.asarray(feas_b)[-1])

    def test_closed_loop_divergence_bounded(self, closed_loops):
        (xb_b, u0_b, _), (xb_r, u0_r, _) = closed_loops
        # position divergence of the PLANT trajectory between the two
        # polish configs over the K ticks (f64 — pure config effect).
        # Measured (round 5): max plant position divergence 4.8e-7 m, max
        # applied-control divergence 0.081 (the arm platform's controls are
        # non-unique — redundant actuation; the position trajectory is the
        # contract). Bounds at ~100x / ~10x the measured envelope.
        dpos = np.max(np.abs(np.asarray(xb_b)[..., :3]
                             - np.asarray(xb_r)[..., :3]))
        du = np.max(np.abs(np.asarray(u0_b) - np.asarray(u0_r)))
        assert dpos < 1e-4, dpos
        assert du < 1.0, du
