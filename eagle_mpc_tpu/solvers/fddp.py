"""DDP / FDDP solvers as compiled XLA programs.

TPU-native re-design of the Crocoddyl solver family the reference builds on
(SolverDDP/SolverFDDP + the fork's configurable stopping criteria used by
SbFDDP, /root/reference/src/sbfddp.cpp:228-315):

- Riccati backward pass: ``lax.scan`` over the horizon (the only true
  sequential dependency), with Levenberg regularization escalation in a
  ``lax.while_loop`` replacing the reference's try/catch-and-retry.
- Line search: ALL step lengths are rolled out in parallel (``vmap`` over
  the alpha axis) and the first acceptable one is selected — semantically
  identical to the reference's sequential early-exit loop, but on TPU the
  10 rollouts cost the wall-clock of one (the scan latency dominates, not
  FLOPs).
- Outer iterations: ``lax.while_loop``; a batch of problems vmaps the whole
  solver, and XLA's while-batching masks per-element updates so diverged
  scenarios cannot poison the batch.
- Everything (states, controls, value function, regs) is carried as arrays;
  NaN/non-PD detection replaces exceptions (a failed Cholesky yields NaNs
  that are detected and trigger regularization escalation).

Numerical semantics follow the reference: feasibility gaps, gap-aware
expected improvement, accept-negative-step branch, regularization schedule,
cost-reduction stopping criterion with gap test.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ocp import problem as P
from ..ops import smallmat


@dataclasses.dataclass(frozen=True)
class SolverSettings:
    """Static solver configuration (crocoddyl defaults)."""

    n_alphas: int = 10            # alphas = 2^-k, k = 0..9
    th_acceptstep: float = 0.1
    th_acceptnegstep: float = 2.0  # reference SbFDDP ctor value
    th_grad: float = 1e-12
    th_stepdec: float = 0.5
    th_stepinc: float = 0.01
    reg_min: float = 1e-9
    reg_max: float = 1e9
    reg_factor: float = 10.0
    th_stop_gaps: float = 1.0     # gap stopping test bound (sbfddp.cpp:27)
    boxqp_iters: int = 12         # projected-Newton iterations (box solvers)
    scan_unroll: int = 1          # lax.scan unroll for the T-axis scans
                                  # (TPU: amortizes per-step dispatch latency)
    parallel_riccati: bool = False  # associative-scan backward pass
                                    # (O(log T) depth; see solvers/priccati.py)
    pallas_backward: bool = False   # fuse the Riccati recursion into ONE
                                    # batch-in-lanes Pallas kernel under vmap
                                    # (ops/riccati_pallas.py; non-box only)
    pallas_nodes: bool = False      # fuse the per-node linearization sweep
                                    # into ONE batch-in-lanes Pallas kernel
                                    # under vmap (ops/node_pallas.py; free
                                    # dynamics + Euler + state/control slots)
    pallas_rollout: bool = False    # fuse the batched-alpha line-search
                                    # rollout into ONE grid-pipelined Pallas
                                    # kernel (ops/rollout_pallas.py; fixed
                                    # solver path, same scope as pallas_nodes)
    record_trace: bool = False    # return per-iteration IterTrace telemetry

    # --- deviation switches (default = this solver's robust semantics) ----
    # The reference semantics are selectable so regression tests can PIN the
    # failure modes the deviations prevent (see tests/test_deviations.py):
    crocoddyl_signed_d0: bool = False      # d0 < th_grad (src/sbfddp.cpp:272)
                                           # vs our |d0| < th_grad
    crocoddyl_negstep_always: bool = False  # negative-step acceptance also for
                                            # FEASIBLE candidates (reference) vs
                                            # our gap-closing-only gating
    crocoddyl_signed_stop: bool = False    # stop on stop_val < th_stop even if
                                           # negative (reference) vs >= 0 guard
    th_diverge: float = 1e8       # forward-pass divergence bound on cost and
                                  # |xnext|_inf. crocoddyl's raiseIfNaN uses
                                  # 1e30 (reference src/sbfddp.cpp:444-448);
                                  # at f32 that leaves a pathological scenario
                                  # 20+ decades of room to ratchet through the
                                  # DDP polish's infeasible-accept before the
                                  # guard bites (measured: frozen at 7e25 with
                                  # 1e30 vs recovering, |us| ~ 1e2, with 1e6).
                                  # 1e8 is far above any legitimate mission
                                  # cost while keeping divergence recoverable.

    @property
    def alphas(self):
        return tuple(0.5 ** k for k in range(self.n_alphas))


class BackwardPassData(NamedTuple):
    k: jnp.ndarray      # (T, nu) feedforward
    K: jnp.ndarray      # (T, nu, ndx) feedback
    Qu: jnp.ndarray     # (T, nu)
    Quuk: jnp.ndarray   # (T, nu)
    Vx: jnp.ndarray     # (T+1, ndx) gap-augmented value gradient
    Vxx: jnp.ndarray    # (T+1, ndx, ndx)
    ok: jnp.ndarray     # scalar bool — all finite


class IterTrace(NamedTuple):
    """Per-iteration solver telemetry — the TPU-native CallbackVerbose
    (reference: crocoddyl CallbackVerbose attached at
    src/mpc-controllers/carrot-mpc.cpp:244-247). Arrays have length
    ``maxiter``; entries past ``iters`` hold the fill value NaN (-1 for
    ints). Returned as data, printable on host via ``format_trace``."""

    cost: jnp.ndarray        # (maxiter,) cost after each iteration
    stop: jnp.ndarray        # (maxiter,) cost reduction of the accepted step
    steplength: jnp.ndarray  # (maxiter,) accepted alpha (last alpha if none)
    xreg: jnp.ndarray        # (maxiter,) state regularization after schedule
    gap_norm: jnp.ndarray    # (maxiter,) max |gap| of the candidate
    accepted: jnp.ndarray    # (maxiter,) int8: 1 accepted, 0 rejected, -1 unused
    phase: jnp.ndarray       # (maxiter,) int8: homotopy stage id; -2 = DDP polish


def _empty_trace(n: int, dtype) -> IterTrace:
    nan = jnp.full((n,), jnp.nan, dtype=dtype)
    return IterTrace(cost=nan, stop=nan, steplength=nan, xreg=nan,
                     gap_norm=nan,
                     accepted=jnp.full((n,), -1, jnp.int8),
                     phase=jnp.full((n,), -1, jnp.int8))


def concat_traces(traces) -> IterTrace:
    """Concatenate per-stage traces (SbFDDP homotopy stages + DDP polish)."""
    return IterTrace(*(jnp.concatenate(parts, axis=-1)
                       for parts in zip(*traces)))


def format_trace(trace: IterTrace, header: bool = True) -> str:
    """CallbackVerbose-style table of a recorded solve (host-side).

    Skips unused rows (accepted == -1). For a batched solve, index the batch
    element first (``jax.tree_util.tree_map(lambda a: a[i], trace)``)."""
    import numpy as np_

    cost = np_.asarray(trace.cost)
    stop = np_.asarray(trace.stop)
    step = np_.asarray(trace.steplength)
    xreg = np_.asarray(trace.xreg)
    gap = np_.asarray(trace.gap_norm)
    acc = np_.asarray(trace.accepted)
    phase = np_.asarray(trace.phase)
    lines = []
    if header:
        lines.append(f"{'iter':>4} {'phase':>6} {'cost':>14} {'stop':>12} "
                     f"{'step':>8} {'xreg':>10} {'gap_norm':>10} {'acc':>4}")
    it = 0
    for i in range(cost.shape[0]):
        if acc[i] == -1:
            continue
        it += 1
        ph = "ddp" if phase[i] == -2 else str(int(phase[i]))
        lines.append(f"{it:>4} {ph:>6} {cost[i]:>14.6e} {stop[i]:>12.4e} "
                     f"{step[i]:>8.4f} {xreg[i]:>10.2e} {gap[i]:>10.3e} "
                     f"{int(acc[i]):>4}")
    return "\n".join(lines)


class SolveResult(NamedTuple):
    xs: jnp.ndarray
    us: jnp.ndarray
    cost: jnp.ndarray
    iters: jnp.ndarray
    feasible: jnp.ndarray
    stop: jnp.ndarray          # cost reduction at the last accepted step
    gap_norm: jnp.ndarray
    xreg: jnp.ndarray
    failed: jnp.ndarray        # regularization blew past reg_max
    trace: Optional[IterTrace] = None  # set when settings.record_trace


class _IterState(NamedTuple):
    xs: jnp.ndarray
    us: jnp.ndarray
    cost: jnp.ndarray
    feasible: jnp.ndarray
    xreg: jnp.ndarray
    ureg: jnp.ndarray
    it: jnp.ndarray
    stop_val: jnp.ndarray
    gap_norm: jnp.ndarray
    done: jnp.ndarray
    failed: jnp.ndarray
    trace: IterTrace         # 0-length arrays unless settings.record_trace


def _check_priccati_backend(settings: SolverSettings) -> None:
    """Refuse ``parallel_riccati`` on the TPU backend: the associative-scan
    pass reproducibly crashes the TPU worker process (measured round 3,
    BASELINE.md knob verdict) — a user-reachable hard fault, not a slow
    path. CPU keeps the knob (pinned vs the sequential pass at 1e-8,
    tests/test_priccati.py). Set EAGLE_MPC_TPU_ALLOW_PRICCATI=1 to
    re-test after runtime upgrades.

    The check is deliberately COARSE: it keys on ``jax.default_backend()``,
    not on the devices a particular solve is placed on, so a deliberately
    CPU-placed solve on a TPU host is also refused (ADVICE r4). Detecting
    placement would require inspecting traced abstract values (which carry
    no committed device) — the env-var escape hatch is the supported
    override for that niche."""
    if not settings.parallel_riccati:
        return
    import os as _os
    if _os.environ.get("EAGLE_MPC_TPU_ALLOW_PRICCATI") == "1":
        return
    if jax.default_backend() == "tpu":
        raise RuntimeError(
            "parallel_riccati=True crashes the TPU runtime (reproducible "
            "worker fault, see BASELINE.md). Use the default sequential "
            "backward pass on TPU, or set EAGLE_MPC_TPU_ALLOW_PRICCATI=1 "
            "to override after a runtime upgrade.")


# ---------------------------------------------------------------------------
# Direction computation: derivatives, gaps, regularized Riccati recursion
# ---------------------------------------------------------------------------

def _gaps(spec, params, xs, derivs, feasible):
    """fs[0] = x0 (-) xs0 ; fs[t+1] = f(x_t,u_t) (-) xs_{t+1}; zero if the
    candidate is feasible (crocoddyl SolverDDP::calcDiff)."""
    st = spec.state
    f0 = st.diff(xs[0], params.x0)
    frest = jax.vmap(st.diff)(xs[1:], derivs.xnext)
    fs = jnp.concatenate([f0[None], frest], axis=0)
    return jnp.where(feasible, jnp.zeros_like(fs), fs)


def _boxqp(H, q, lo, hi, x0, n_iters):
    """Projected-Newton box QP: min 0.5 x'Hx + q'x  s.t. lo <= x <= hi.

    Fixed-iteration, mask-based variant of the Tassa/crocoddyl BoxQP used by
    the Box-DDP/FDDP backward pass — the clamped set is handled by masking
    rows/columns of H (nu <= ~11, so a dense masked solve beats any
    active-set bookkeeping on TPU). Infinite bounds degrade gracefully to
    the unconstrained Newton step. Returns (x, free_mask)."""
    dtype = H.dtype
    eps = jnp.asarray(1e-9, dtype)

    def clamped_set(x, g):
        return ((x <= lo + eps) & (g > 0)) | ((x >= hi - eps) & (g < 0))

    def fval(x):
        return 0.5 * x @ H @ x + q @ x

    # step-length ladder: the clipped Newton step can increase f, so pick the
    # best of a geometric set (incl. the current point) — monotone by
    # construction, and all candidates evaluate in one batched matmul
    ladder = 0.5 ** jnp.arange(8, dtype=dtype)

    def body(_, x):
        g = q + H @ x
        fmask = (~clamped_set(x, g)).astype(dtype)
        M = H * fmask[:, None] * fmask[None, :] + jnp.diag(1.0 - fmask)
        dx = smallmat.solve_psd(M, -g * fmask)
        cands = jnp.clip(x[None, :] + ladder[:, None] * dx[None, :], lo, hi)
        cands = jnp.concatenate([cands, x[None, :]], axis=0)
        fs = 0.5 * jnp.einsum("ai,ij,aj->a", cands, H, cands) + cands @ q
        return cands[jnp.argmin(fs)]

    x = jax.lax.fori_loop(0, n_iters, body, jnp.clip(x0, lo, hi))
    g = q + H @ x
    return x, ~clamped_set(x, g)


def _backward_pass(spec, derivs, term, fs, xreg, ureg, feasible,
                   box=None, unroll=1, use_pallas=False):
    """Riccati recursion. ``box=(us, lb, ub, qp_iters)`` switches the gain
    computation to the Box-DDP projected QP (crocoddyl SolverBoxDDP:
    feedforward from a BoxQP on the control bounds, feedback rows of the
    clamped dimensions zeroed). ``use_pallas`` routes the non-box recursion
    through ops/riccati_pallas.scan_core — identical math, fused into one
    VMEM-resident kernel when the solve is vmapped over a scenario batch."""
    ndx = spec.state.ndx
    nu = spec.nu
    _, LxT, LxxT = term
    dtype = LxT.dtype
    I_ndx = jnp.eye(ndx, dtype=dtype)
    I_nu = jnp.eye(nu, dtype=dtype)
    # dtype-relative PD floor: in f32 the roundoff of the Fu'VxxFu chain can
    # exceed Quu's PD margin, failing the Cholesky and driving the expensive
    # whole-pass regularization retry (observed: 12-13 retries/direction on
    # the v5e). A floor of 100*eps relative to the diagonal magnitude kills
    # those failures; at f64 it is ~2e-14 — semantically invisible, so the
    # reference's absolute-reg behavior (crocoddyl SolverDDP) is preserved
    # where it is validated.
    rel_eps = 100.0 * jnp.finfo(dtype).eps

    VxxT = LxxT + xreg * I_ndx
    VxT = LxT + jnp.where(feasible, 0.0, VxxT @ fs[-1])

    if use_pallas and box is None:
        from ..ops import riccati_pallas
        k, K, Qu, Quuk, Vx_r, Vxx_r = riccati_pallas.scan_core(
            derivs.Fx, derivs.Fu, derivs.Lx, derivs.Lu,
            derivs.Lxx, derivs.Lxu, derivs.Luu, fs[:-1],
            VxT, VxxT, xreg, ureg, feasible)
        Vx = jnp.concatenate([Vx_r, VxT[None]], axis=0)
        Vxx = jnp.concatenate([Vxx_r, VxxT[None]], axis=0)
        ok = (jnp.all(jnp.isfinite(k)) & jnp.all(jnp.isfinite(K))
              & jnp.all(jnp.isfinite(Vx)))
        return BackwardPassData(k, K, Qu, Quuk, Vx, Vxx, ok)

    def step(carry, inp):
        Vx, Vxx = carry
        if box is None:
            d, f = inp
        else:
            d, f, u_t = inp
        FxTV = d.Fx.T @ Vxx
        FuTV = d.Fu.T @ Vxx
        Qx = d.Lx + d.Fx.T @ Vx
        Qu = d.Lu + d.Fu.T @ Vx
        Qxx = d.Lxx + FxTV @ d.Fx
        Qxu = d.Lxu + FxTV @ d.Fu
        Quu_raw = d.Luu + FuTV @ d.Fu
        diag_floor = rel_eps * jnp.max(jnp.abs(jnp.diagonal(Quu_raw)))
        Quu = Quu_raw + (ureg + diag_floor) * I_nu
        if box is None:
            chol = smallmat.CholFactor(Quu)            # NaN on non-PD
            k = chol.solve(Qu)
            K = chol.solve_mat(Qxu.T)                  # (nu, ndx)
        else:
            _, lb_u, ub_u, qp_iters = box
            du, free = _boxqp(Quu, Qu, lb_u - u_t, ub_u - u_t,
                              jnp.zeros_like(u_t), qp_iters)
            k = -du
            fmask = free.astype(dtype)
            M = Quu * fmask[:, None] * fmask[None, :] + jnp.diag(1.0 - fmask)
            K = smallmat.solve_psd_mat(M, fmask[:, None] * Qxu.T)
        Quuk = Quu @ k
        Vx_n = Qx + K.T @ Quuk - 2.0 * (K.T @ Qu)
        Vxx_n = Qxx - Qxu @ K
        Vxx_n = 0.5 * (Vxx_n + Vxx_n.T) + xreg * I_ndx
        Vx_n = Vx_n + jnp.where(feasible, 0.0, Vxx_n @ f)
        return (Vx_n, Vxx_n), (k, K, Qu, Quuk, Vx_n, Vxx_n)

    xs_in = (derivs, fs[:-1]) if box is None else (derivs, fs[:-1], box[0])
    (_, _), outs = jax.lax.scan(step, (VxT, VxxT), xs_in,
                                reverse=True, unroll=unroll)
    k, K, Qu, Quuk, Vx_r, Vxx_r = outs
    Vx = jnp.concatenate([Vx_r, VxT[None]], axis=0)
    Vxx = jnp.concatenate([Vxx_r, VxxT[None]], axis=0)
    ok = jnp.all(jnp.isfinite(k)) & jnp.all(jnp.isfinite(K)) & jnp.all(jnp.isfinite(Vx))
    return BackwardPassData(k, K, Qu, Quuk, Vx, Vxx, ok)


def _compute_direction(spec, settings, params, xs, us, feasible, xreg, ureg,
                       box=False):
    """calcDiff + backward pass with regularization escalation on failure
    (reference loop at src/sbfddp.cpp:242-255)."""
    derivs, term = P.calc_diff_all(spec, params, xs, us,
                                   pallas_nodes=settings.pallas_nodes)
    cost = jnp.sum(derivs.cost) + term[0]
    fs = _gaps(spec, params, xs, derivs, feasible)
    box_info = (us, params.glob.s_lb, params.glob.s_ub,
                settings.boxqp_iters) if box else None

    if settings.parallel_riccati and box_info is None:
        from . import priccati

        def run_bp(xr, ur):
            return priccati.parallel_backward_pass(spec, derivs, term, fs,
                                                   xr, ur, feasible)
    else:
        def run_bp(xr, ur):
            return _backward_pass(spec, derivs, term, fs, xr, ur, feasible,
                                  box_info, unroll=settings.scan_unroll,
                                  use_pallas=settings.pallas_backward)

    # non-finite DERIVATIVES cannot be fixed by regularization — escalating
    # through the whole 1e-9..1e9 ladder (18 full backward re-runs, paid by
    # the entire vmapped batch in lockstep) would be pure waste; fail fast
    # instead (the reference would throw out of calcDiff here).
    derivs_ok = (jnp.all(jnp.isfinite(derivs.Fx)) & jnp.all(jnp.isfinite(derivs.Lxx))
                 & jnp.all(jnp.isfinite(derivs.Lu)) & jnp.isfinite(cost)
                 & jnp.all(jnp.isfinite(term[2])))

    # Escalation as a do-while with a single backward-pass instantiation:
    # iteration 0 runs at the incoming (xreg, ureg), later iterations
    # escalate first. One instantiation (vs. bp0 + loop body) halves the
    # compile weight of the dominant sub-program (VERDICT r2 item 2).
    dtype = xs.dtype
    T, ndx, nu = spec.T, spec.state.ndx, spec.nu
    bp_dummy = BackwardPassData(
        k=jnp.zeros((T, nu), dtype), K=jnp.zeros((T, nu, ndx), dtype),
        Qu=jnp.zeros((T, nu), dtype), Quuk=jnp.zeros((T, nu), dtype),
        Vx=jnp.zeros((T + 1, ndx), dtype),
        Vxx=jnp.zeros((T + 1, ndx, ndx), dtype),
        ok=jnp.asarray(False))

    def cond(c):
        i, xr, _, bp = c
        return (i == 0) | ((~bp.ok) & derivs_ok & (xr < settings.reg_max))

    def body(c):
        i, xr, ur, _ = c
        esc = i > 0
        xr = jnp.where(esc, jnp.minimum(xr * settings.reg_factor, settings.reg_max), xr)
        ur = jnp.where(esc, jnp.minimum(ur * settings.reg_factor, settings.reg_max), ur)
        return i + 1, xr, ur, run_bp(xr, ur)

    _, xreg, ureg, bp = jax.lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32), xreg, ureg, bp_dummy))
    failed = ~bp.ok
    return cost, fs, bp, xreg, ureg, failed


# ---------------------------------------------------------------------------
# Forward passes (rolled out for every alpha in parallel)
# ---------------------------------------------------------------------------

def _forward_pass(spec, params, xs, us, bp, fs, alpha, feasible, use_gaps,
                  box=False, unroll=1, th_diverge=1e30):
    """FDDP forward pass (crocoddyl SolverFDDP::forwardPass): the rollout
    starts from x0 and contracts the gaps by (alpha - 1) when infeasible.
    With ``use_gaps=False`` it is the plain DDP rollout
    (reference forwardPassDDP, src/sbfddp.cpp:416-460). ``box`` clamps the
    controls to the bounds (crocoddyl SolverBoxDDP::forwardPass).

    A rollout is DIVERGED when the running cost or |xnext|_inf is non-finite
    OR exceeds ``th_diverge`` — crocoddyl's raiseIfNaN also rejects values
    >= 1e30 (reference checks at src/sbfddp.cpp:444-448); without the
    magnitude bound, the DDP polish's unconditional infeasible-accept can
    ratchet a pathological scenario's controls unboundedly across
    warm-started MPC re-solves."""
    st = spec.state
    views = P.running_views(params.node, spec.T)
    keep_gaps = use_gaps & (~feasible) & (alpha != 1.0)
    th_div = jnp.asarray(th_diverge, dtype=xs.dtype)

    def step(carry, inp):
        xnext, cost_acc = carry
        x_t, u_t, k_t, K_t, f_t, view = inp
        x_try = jnp.where(keep_gaps, st.integrate(xnext, f_t * (alpha - 1.0)), xnext)
        dx = st.diff(x_t, x_try)
        u_try = u_t - alpha * k_t - K_t @ dx
        if box:
            u_try = jnp.clip(u_try, params.glob.s_lb, params.glob.s_ub)
        xn, c, _ = P.node_calc(spec, view, params.glob, x_try, u_try)
        return (xn, cost_acc + c), (x_try, u_try, c)

    init = (params.x0, jnp.zeros((), dtype=xs.dtype))
    (xnext, cost_try), (xs_try, us_try, cs) = jax.lax.scan(
        step, init, (xs[: spec.T], us, bp.k, bp.K, fs[:-1], views),
        unroll=unroll)
    xT_try = jnp.where(keep_gaps, st.integrate(xnext, fs[-1] * (alpha - 1.0)), xnext)
    cT = P.terminal_calc(spec, P.node_view(params.node, spec.T), params.glob, xT_try)
    cost_try = cost_try + cT
    # divergence detection VECTORIZED OVER THE HORIZON after the rollout —
    # crocoddyl's per-step raiseIfNaN (src/sbfddp.cpp:444-448) only
    # influences the accept decision, never the rollout itself, so the
    # checks need not live inside the sequential scan (measured ~30 ms/tick
    # of per-step guard reductions at B=512, BASELINE.md r4 profile).
    # NaN states propagate to later steps, so checking the stacked arrays
    # post-hoc flags exactly the same rollouts; the running-cost bound uses
    # the cumulative sums of the collected per-step costs. The prefix sums
    # ride a lower-triangular matmul: jnp.cumsum over the T axis lowers to
    # a sequential while loop on TPU (measured ~17 ms per instance at
    # B=512), the (T, T) tril contraction is one MXU op.
    tril = jnp.tril(jnp.ones((spec.T, spec.T), dtype=cs.dtype))
    cost_cum = tril @ cs
    diverged = (~jnp.all(jnp.isfinite(xs_try))
                | (jnp.max(jnp.abs(xs_try)) >= th_div)
                | ~jnp.all(jnp.isfinite(cost_cum))
                | (jnp.max(cost_cum) >= th_div)
                | ~jnp.isfinite(cost_try) | (cost_try >= th_div)
                | (jnp.max(jnp.abs(xT_try)) >= th_div))
    xs_try = jnp.concatenate([xs_try, xT_try[None]], axis=0)
    return xs_try, us_try, cost_try, diverged


def _expected_improvement_terms(bp, fs, feasible):
    """(dg, dq) of crocoddyl SolverFDDP::updateExpectedImprovement."""
    dg = jnp.sum(bp.Qu * bp.k)
    dq = -jnp.sum(bp.k * bp.Quuk)
    gap_dg = -jnp.sum(bp.Vx * fs)
    gap_dq = jnp.sum(fs * jnp.einsum("tij,tj->ti", bp.Vxx, fs))
    dg = dg + jnp.where(feasible, 0.0, gap_dg)
    dq = dq + jnp.where(feasible, 0.0, gap_dq)
    return dg, dq


def _expected_improvement(spec, bp, fs, xs, xs_try, dg, dq, feasible):
    """Per-candidate d = (d0, d1) (crocoddyl SolverFDDP::expectedImprovement:
    dv = -sum fs . Vxx . (xs_try (-) xs) when infeasible)."""
    st = spec.state
    dxs = jax.vmap(st.diff)(xs_try, xs)
    dv = -jnp.sum(fs * jnp.einsum("tij,tj->ti", bp.Vxx, dxs))
    dv = jnp.where(feasible, 0.0, dv)
    return dg + dv, dq - 2.0 * dv


# ---------------------------------------------------------------------------
# Main loops
# ---------------------------------------------------------------------------

@P.highest_matmul
def solve_fddp_or_ddp(spec, settings: SolverSettings, params, xs_init, us_init,
                      maxiter, th_stop, reg_init, feasible_init, *, ddp,
                      box: bool = False, trace_len: Optional[int] = None,
                      phase_id=0, final_cost_fallback: bool = True):
    """Shared outer loop for FDDP (gap-aware) and the DDP polish variant.

    All loop-carried quantities are arrays; vmap over ``params`` batches the
    whole solver. ``ddp`` may be a Python bool OR a traced boolean — the
    FDDP/DDP differences are data (selects), so ONE compiled body serves
    both, letting SbFDDP fold its homotopy stages + polish into a single
    ``lax.scan`` (one solver instantiation per program instead of
    n_stages + 1 — the dominant XLA compile cost).

    With ``settings.record_trace`` a fixed-length :class:`IterTrace` is
    carried through the loop and returned in ``SolveResult.trace`` — the
    reference drives CallbackVerbose from its iteration loop at
    /root/reference/src/sbfddp.cpp:303-307. ``trace_len`` must then be
    static (defaults to ``int(maxiter)``); ``phase_id`` labels the rows
    (homotopy stage, or -2 for the DDP polish)."""
    _check_priccati_backend(settings)
    params = P.as_device(params)
    dtype = xs_init.dtype
    alphas = jnp.asarray(settings.alphas, dtype=dtype)
    ddp = jnp.asarray(ddp)
    record = settings.record_trace
    if record and trace_len is None:
        if not isinstance(maxiter, int):
            raise ValueError("record_trace needs a static trace length: pass "
                             "a Python-int maxiter or an explicit trace_len")
        trace_len = int(maxiter)

    init = _IterState(
        xs=xs_init, us=us_init,
        cost=jnp.asarray(jnp.inf, dtype=dtype),
        feasible=jnp.asarray(feasible_init),
        xreg=jnp.asarray(reg_init, dtype=dtype),
        ureg=jnp.asarray(reg_init, dtype=dtype),
        it=jnp.zeros((), jnp.int32),
        stop_val=jnp.asarray(jnp.inf, dtype=dtype),
        gap_norm=jnp.asarray(jnp.inf, dtype=dtype),
        done=jnp.zeros((), bool),
        failed=jnp.zeros((), bool),
        trace=_empty_trace(trace_len if record else 0, dtype),
    )

    def cond(s: _IterState):
        return (s.it < maxiter) & ~s.done & ~s.failed

    def body(s: _IterState):
        cost, fs, bp, xreg, ureg, failed = _compute_direction(
            spec, settings, params, s.xs, s.us, s.feasible, s.xreg, s.ureg,
            box=box)
        gap_norm = jnp.max(jnp.abs(fs))

        dg, dq = _expected_improvement_terms(bp, fs, s.feasible)

        def try_alpha(alpha):
            xs_try, us_try, cost_try, diverged = _forward_pass(
                spec, params, s.xs, s.us, bp, fs, alpha, s.feasible,
                use_gaps=~ddp, box=box,
                unroll=settings.scan_unroll, th_diverge=settings.th_diverge)
            d0_f, d1_f = _expected_improvement(spec, bp, fs, s.xs, xs_try,
                                               dg, dq, s.feasible)
            d0 = jnp.where(ddp, dg, d0_f)
            d1 = jnp.where(ddp, dq, d1_f)
            dV = cost - cost_try
            dVexp = alpha * (d0 + 0.5 * alpha * d1)
            # Stationarity acceptance uses |d0| < th_grad, not the reference's
            # signed d0 < th_grad (src/sbfddp.cpp:272): under FDDP's gap
            # corrections d0 can go strongly NEGATIVE while dVexp stays
            # positive, and the signed test then accepts arbitrarily bad
            # cost blow-ups. The absolute test keeps the intended
            # "gradient ~ 0 -> accept and stop" semantics; the failure mode
            # is pinned by tests/test_deviations.py.
            if settings.crocoddyl_signed_d0:
                at_stationary = d0 < settings.th_grad
            else:
                at_stationary = jnp.abs(d0) < settings.th_grad
            accept_ddp = (dVexp >= 0) & (
                at_stationary | (~s.feasible)
                | (dV > settings.th_acceptstep * dVexp))
            # The negative-expected-improvement acceptance exists for GAP
            # CLOSING (reference src/sbfddp.cpp:280-289: an infeasible
            # candidate may pay cost to contract the defects). Applying
            # it to FEASIBLE candidates is a runaway hazard: when Quu is
            # near-singular the gains blow up, dVexp becomes hugely
            # negative, and the branch then accepts arbitrarily large
            # cost increases — observed as pre-squash controls ratcheting
            # to 1e5 over warm-started re-solves. Feasible candidates
            # have zero gaps, so the branch has nothing to buy there.
            neg_ok = dV > settings.th_acceptnegstep * dVexp
            if not settings.crocoddyl_negstep_always:
                neg_ok = (~s.feasible) & neg_ok
            accept_fddp = jnp.where(
                dVexp >= 0,
                at_stationary | (dV > settings.th_acceptstep * dVexp),
                neg_ok)
            accept = jnp.where(ddp, accept_ddp, accept_fddp) & ~diverged
            return xs_try, us_try, cost_try, accept

        # Sequential early-exit line search (the reference loop at
        # src/sbfddp.cpp:260-289): one rollout per round, stop at the first
        # accepted step. A warm-started MPC tick accepts alpha = 1 almost
        # always, so the batch pays ONE rollout instead of n_alphas —
        # measured 44 ms -> ~5 ms per iteration at B=512 on the v5e. Under
        # vmap the loop runs until every batch element has accepted (or the
        # ladder is exhausted), with accepted elements frozen by masking —
        # the selected step is identical to the all-alphas-in-parallel
        # variant (first acceptable alpha in descending order).
        n_alpha = len(settings.alphas)

        def ls_cond(c):
            j, found = c[0], c[1]
            return (j < n_alpha) & ~found

        def ls_body(c):
            j, found, xs_b, us_b, cost_b, step_b = c
            alpha = alphas[j]
            xs_t, us_t, cost_t, acc = try_alpha(alpha)
            take = acc & ~found
            xs_b = jnp.where(take, xs_t, xs_b)
            us_b = jnp.where(take, us_t, us_b)
            cost_b = jnp.where(take, cost_t, cost_b)
            step_b = jnp.where(take, alpha, step_b)
            return j + 1, found | acc, xs_b, us_b, cost_b, step_b

        (_, any_accept, xs_new, us_new, cost_new, steplength) = jax.lax.while_loop(
            ls_cond, ls_body,
            (jnp.zeros((), jnp.int32), jnp.zeros((), bool),
             s.xs, s.us, cost, alphas[-1]))
        feas_new = jnp.where(any_accept,
                             jnp.where(ddp, True,
                                       s.feasible | (steplength == 1.0)),
                             s.feasible)

        # regularization schedule (crocoddyl SolverDDP)
        dec = steplength > settings.th_stepdec
        inc = steplength <= settings.th_stepinc
        xreg = jnp.where(dec, jnp.maximum(xreg / settings.reg_factor, settings.reg_min), xreg)
        xreg = jnp.where(inc, jnp.minimum(xreg * settings.reg_factor, settings.reg_max), xreg)
        ureg = jnp.where(dec, jnp.maximum(ureg / settings.reg_factor, settings.reg_min), ureg)
        ureg = jnp.where(inc, jnp.minimum(ureg * settings.reg_factor, settings.reg_max), ureg)
        failed = failed | (inc & (xreg >= settings.reg_max))

        # stopping: cost-reduction criterion + gap test (fork semantics used
        # by SbFDDP: StopCriteriaCostReduction / StopTestGaps). The reduction
        # must be NON-NEGATIVE to count as convergence — the reference's
        # signed test would declare a cost-increasing accepted step (possible
        # on the unconditional infeasible first DDP accept) converged.
        # Pinned by tests/test_deviations.py.
        stop_val = jnp.where(any_accept, cost - cost_new, s.stop_val)
        if settings.crocoddyl_signed_stop:
            small_red = stop_val < th_stop
        else:
            small_red = (stop_val >= 0) & (stop_val < th_stop)
        done = any_accept & small_red & jnp.where(
            ddp, feas_new, gap_norm < settings.th_stop_gaps)

        trace = s.trace
        if record:
            i = s.it
            trace = IterTrace(
                cost=trace.cost.at[i].set(cost_new),
                stop=trace.stop.at[i].set(stop_val),
                steplength=trace.steplength.at[i].set(steplength),
                xreg=trace.xreg.at[i].set(xreg),
                gap_norm=trace.gap_norm.at[i].set(gap_norm),
                accepted=trace.accepted.at[i].set(any_accept.astype(jnp.int8)),
                phase=trace.phase.at[i].set(jnp.asarray(phase_id, jnp.int8)),
            )

        return _IterState(
            xs=xs_new, us=us_new, cost=cost_new, feasible=feas_new,
            xreg=xreg, ureg=ureg, it=s.it + 1, stop_val=stop_val,
            gap_norm=gap_norm, done=done, failed=failed, trace=trace)

    out = jax.lax.while_loop(cond, body, init)

    # final cost if never iterated (maxiter == 0): dynamics-free evaluation.
    # NOT cheap at batch scale — measured 78 ms per call at B=512 on the
    # v5e — so callers that never consume the zero-iteration cost (the
    # fixed tick's polish) disable it.
    if final_cost_fallback:
        cost_final = jnp.where(jnp.isfinite(out.cost), out.cost,
                               P.total_cost(spec, params, out.xs, out.us))
    else:
        cost_final = out.cost
    return SolveResult(
        xs=out.xs, us=out.us, cost=cost_final, iters=out.it,
        feasible=out.feasible, stop=out.stop_val, gap_norm=out.gap_norm,
        xreg=out.xreg, failed=out.failed,
        trace=out.trace if record else None)


def solve_fddp(spec, settings, params, xs_init, us_init, maxiter, th_stop,
               reg_init=1e-9, feasible=False, trace_len=None, phase_id=0):
    return solve_fddp_or_ddp(spec, settings, params, xs_init, us_init,
                             maxiter, th_stop, reg_init, feasible, ddp=False,
                             trace_len=trace_len, phase_id=phase_id)


def solve_ddp(spec, settings, params, xs_init, us_init, maxiter, th_stop,
              reg_init=1e-9, feasible=False, trace_len=None, phase_id=0):
    return solve_fddp_or_ddp(spec, settings, params, xs_init, us_init,
                             maxiter, th_stop, reg_init, feasible, ddp=True,
                             trace_len=trace_len, phase_id=phase_id)


def solve_box_fddp(spec, settings, params, xs_init, us_init, maxiter, th_stop,
                   reg_init=1e-9, feasible=False):
    """Box-FDDP (crocoddyl SolverBoxFDDP): gap-aware FDDP with control-bound
    projected-QP gains and clamped rollouts. Bounds live in
    ``params.glob.s_lb/s_ub``; the problem spec must NOT squash
    (``use_squash=False`` — box solvers consume raw controls, reference
    selection at src/mpc-controllers/carrot-mpc.cpp:236-241)."""
    return solve_fddp_or_ddp(spec, settings, params, xs_init, us_init,
                             maxiter, th_stop, reg_init, feasible, ddp=False,
                             box=True)


def solve_box_ddp(spec, settings, params, xs_init, us_init, maxiter, th_stop,
                  reg_init=1e-9, feasible=False):
    """Box-DDP (crocoddyl SolverBoxDDP): plain rollout variant."""
    return solve_fddp_or_ddp(spec, settings, params, xs_init, us_init,
                             maxiter, th_stop, reg_init, feasible, ddp=True,
                             box=True)


# ---------------------------------------------------------------------------
# Fixed-depth solver path (the MPC-tick fast path)
# ---------------------------------------------------------------------------
#
# The while-loop solver above is reference-faithful but structurally hostile
# to a vmapped TPU tick: nested data-dependent while_loops (outer iterations
# x regularization escalation x sequential line search) each re-enter
# sequential horizon scans, and under vmap every loop runs to the worst batch
# element in lockstep. Measured on the v5e (tools/profile_tick.py): the
# escalation do-while alone adds ~50 ms per iteration over its own backward
# pass even when it runs ONCE, and a single hard scenario makes all B
# elements pay the full alpha ladder.
#
# The reference's own MPC tick has a FIXED budget — 2 iterations, one
# homotopy stage (/root/reference/yaml/hexacopter370_flying_arm_3/mpc/
# mpc.yaml:6-10) — so the tick body can be fixed-depth by construction:
#
# - iterations: ``lax.scan`` over a static depth with done/maxiter masking
#   (no outer while_loop);
# - line search: ONE forward rollout with the alpha ladder folded into the
#   batch (vmap over alphas -> a single 29-step scan of 10x width), then
#   first-accepted selection — identical semantics to the reference's
#   sequential early-exit loop (src/sbfddp.cpp:260-289), bounded cost;
# - regularization escalation folded into the iteration: a failed backward
#   pass escalates the regs and consumes the iteration instead of re-running
#   the pass inside a retry loop (the dtype-relative PD floor in
#   ``_backward_pass`` makes failures rare; deviation pinned by
#   tests/test_fixed.py).

class _FixedCarry(NamedTuple):
    xs: jnp.ndarray
    us: jnp.ndarray
    cost: jnp.ndarray
    feasible: jnp.ndarray
    xreg: jnp.ndarray
    ureg: jnp.ndarray
    it: jnp.ndarray
    stop_val: jnp.ndarray
    gap_norm: jnp.ndarray
    done: jnp.ndarray
    failed: jnp.ndarray


def _tree_select(pred, a, b):
    return jax.tree_util.tree_map(lambda x, y: jnp.where(pred, x, y), a, b)


def _rollout_multi_pallas(spec, settings, params, xs, us, bp, fs, alphas,
                          feasible, ddp, box):
    """All line-search rollouts via the fused Pallas kernel
    (ops/rollout_pallas.py): the whole alpha ladder for this problem rides
    one grid-pipelined program; terminal node + divergence detection stay
    here (vectorized, as in :func:`_forward_pass`). Returns per-alpha
    (xs_try (A, T+1, nx), us_try, cost_try (A,), diverged (A,))."""
    from ..ops import rollout_pallas

    st = spec.state
    T = spec.T
    A = alphas.shape[0]
    dtype = xs.dtype
    node = params.node
    glob = params.glob
    bc = lambda a: jnp.broadcast_to(a[None], (A,) + a.shape)
    rep_t = lambda a: bc(jnp.broadcast_to(a[None], (T,) + a.shape))
    keep = (~ddp) & (~feasible) & (alphas != 1.0)

    xs_try_r, us_try, cs, xn = rollout_pallas.rollout_core(
        spec, box, bc(xs[:T]), bc(us), bc(bp.k), bc(bp.K), bc(fs),
        bc(params.x0), alphas, keep,
        bc(node.weight[:T]), bc(node.active[:T]),
        tuple(bc(r[:T]) for r in node.refs),
        tuple(rep_t(a) for a in glob.act_w),
        tuple(rep_t(a) for a in glob.lb),
        tuple(rep_t(a) for a in glob.ub),
        jnp.broadcast_to(glob.squash_smooth, (A,)).astype(dtype),
        bc(glob.s_lb), bc(glob.s_ub))

    def term(alpha_a, keep_a, xn_last):
        xT = jnp.where(keep_a,
                       st.integrate(xn_last, fs[-1] * (alpha_a - 1.0)),
                       xn_last)
        cT = P.terminal_calc(spec, P.node_view(node, T), glob, xT)
        return xT, cT

    xT_try, cT = jax.vmap(term)(alphas, keep, xn[:, -1])
    cost_try = jnp.sum(cs, axis=1) + cT
    th_div = jnp.asarray(settings.th_diverge, dtype)
    tril = jnp.tril(jnp.ones((T, T), dtype=cs.dtype))
    cost_cum = cs @ tril.T

    def dvg_one(xs_try, cc, ct, xT):
        return (~jnp.all(jnp.isfinite(xs_try))
                | (jnp.max(jnp.abs(xs_try)) >= th_div)
                | ~jnp.all(jnp.isfinite(cc)) | (jnp.max(cc) >= th_div)
                | ~jnp.isfinite(ct) | (ct >= th_div)
                | (jnp.max(jnp.abs(xT)) >= th_div))

    diverged = jax.vmap(dvg_one)(xs_try_r, cost_cum, cost_try, xT_try)
    xs_try_full = jnp.concatenate([xs_try_r, xT_try[:, None]], axis=1)
    return xs_try_full, us_try, cost_try, diverged


def _check_fixed_settings(settings: SolverSettings) -> None:
    """The fixed-depth path always runs the sequential (or Pallas) backward
    pass; silently ignoring ``parallel_riccati`` would give a user a
    different pass than requested (ADVICE r4)."""
    if settings.parallel_riccati:
        raise ValueError(
            "parallel_riccati is not supported on the fixed-depth solver "
            "path (solve_fixed / solve_fixed_batched / "
            "solve_while_fixed_body) — it always uses the sequential scan "
            "or, with pallas_backward=True, the fused Pallas kernel. Use "
            "solve_fddp_or_ddp for the associative-scan pass (CPU only).")


def _fixed_iteration(spec, settings, params, s: _FixedCarry, ddp, th_stop,
                     box, n_alphas):
    """One fixed-shape FDDP/DDP iteration (see module comment above)."""
    dtype = s.xs.dtype
    alphas = jnp.asarray(settings.alphas[:n_alphas], dtype=dtype)

    derivs, term = P.calc_diff_all(spec, params, s.xs, s.us,
                                   pallas_nodes=settings.pallas_nodes)
    cost = jnp.sum(derivs.cost) + term[0]
    fs = _gaps(spec, params, s.xs, derivs, s.feasible)
    gap_norm = jnp.max(jnp.abs(fs))
    box_info = (s.us, params.glob.s_lb, params.glob.s_ub,
                settings.boxqp_iters) if box else None

    derivs_ok = (jnp.all(jnp.isfinite(derivs.Fx))
                 & jnp.all(jnp.isfinite(derivs.Lxx))
                 & jnp.all(jnp.isfinite(derivs.Lu)) & jnp.isfinite(cost)
                 & jnp.all(jnp.isfinite(term[2])))
    bp = _backward_pass(spec, derivs, term, fs, s.xreg, s.ureg, s.feasible,
                        box_info, unroll=settings.scan_unroll,
                        use_pallas=settings.pallas_backward)
    bp_ok = bp.ok & derivs_ok

    dg, dq = _expected_improvement_terms(bp, fs, s.feasible)

    def decide(alpha, xs_try, cost_try, diverged):
        """Accept rule for one rolled-out candidate (shared by the XLA and
        Pallas rollout paths)."""
        d0_f, d1_f = _expected_improvement(spec, bp, fs, s.xs, xs_try,
                                           dg, dq, s.feasible)
        d0 = jnp.where(ddp, dg, d0_f)
        d1 = jnp.where(ddp, dq, d1_f)
        dV = cost - cost_try
        dVexp = alpha * (d0 + 0.5 * alpha * d1)
        if settings.crocoddyl_signed_d0:
            at_stationary = d0 < settings.th_grad
        else:
            at_stationary = jnp.abs(d0) < settings.th_grad
        accept_ddp = (dVexp >= 0) & (
            at_stationary | (~s.feasible)
            | (dV > settings.th_acceptstep * dVexp))
        neg_ok = dV > settings.th_acceptnegstep * dVexp
        if not settings.crocoddyl_negstep_always:
            neg_ok = (~s.feasible) & neg_ok
        accept_fddp = jnp.where(
            dVexp >= 0,
            at_stationary | (dV > settings.th_acceptstep * dVexp),
            neg_ok)
        return jnp.where(ddp, accept_ddp, accept_fddp) & ~diverged

    # the whole alpha ladder rides ONE rollout (vmap folds the alpha axis
    # into the node batch; with pallas_rollout, one fused kernel program);
    # first-accepted index = the reference's early-exit choice since alphas
    # descend
    use_roll = False
    if settings.pallas_rollout:
        from ..ops import rollout_pallas
        use_roll = rollout_pallas.supported(spec)
    if use_roll:
        xs_t, us_t, cost_t, dvg = _rollout_multi_pallas(
            spec, settings, params, s.xs, s.us, bp, fs, alphas,
            s.feasible, ddp, box)
        acc = jax.vmap(decide)(alphas, xs_t, cost_t, dvg)
    else:
        def try_alpha(alpha):
            xs_try, us_try, cost_try, diverged = _forward_pass(
                spec, params, s.xs, s.us, bp, fs, alpha, s.feasible,
                use_gaps=~ddp, box=box,
                unroll=settings.scan_unroll,
                th_diverge=settings.th_diverge)
            return (xs_try, us_try, cost_try,
                    decide(alpha, xs_try, cost_try, diverged))

        xs_t, us_t, cost_t, acc = jax.vmap(try_alpha)(alphas)
    acc = acc & bp_ok
    any_accept = jnp.any(acc)
    idx = jnp.argmax(acc)               # first True (alphas descending)
    xs_new = jnp.where(any_accept, xs_t[idx], s.xs)
    us_new = jnp.where(any_accept, us_t[idx], s.us)
    cost_new = jnp.where(any_accept, cost_t[idx], cost)
    steplength = jnp.where(any_accept, alphas[idx], alphas[-1])
    feas_new = jnp.where(any_accept,
                         jnp.where(ddp, True,
                                   s.feasible | (steplength == 1.0)),
                         s.feasible)

    # regularization schedule: the crocoddyl steplength schedule when the
    # backward pass succeeded; the escalation branch (xreg*factor, no step)
    # when it failed — the while-solver's retry loop folded into the
    # iteration (reference try/catch at src/sbfddp.cpp:242-255)
    dec = bp_ok & (steplength > settings.th_stepdec)
    inc = (bp_ok & (steplength <= settings.th_stepinc)) | ~bp_ok
    xreg = jnp.where(dec, jnp.maximum(s.xreg / settings.reg_factor, settings.reg_min), s.xreg)
    xreg = jnp.where(inc, jnp.minimum(xreg * settings.reg_factor, settings.reg_max), xreg)
    ureg = jnp.where(dec, jnp.maximum(s.ureg / settings.reg_factor, settings.reg_min), s.ureg)
    ureg = jnp.where(inc, jnp.minimum(ureg * settings.reg_factor, settings.reg_max), ureg)
    failed = (~derivs_ok) | (inc & (xreg >= settings.reg_max))

    stop_val = jnp.where(any_accept, cost - cost_new, s.stop_val)
    if settings.crocoddyl_signed_stop:
        small_red = stop_val < th_stop
    else:
        small_red = (stop_val >= 0) & (stop_val < th_stop)
    done = any_accept & small_red & jnp.where(
        ddp, feas_new, gap_norm < settings.th_stop_gaps)

    return _FixedCarry(
        xs=xs_new, us=us_new, cost=cost_new, feasible=feas_new,
        xreg=xreg, ureg=ureg, it=s.it + 1, stop_val=stop_val,
        gap_norm=gap_norm, done=done, failed=failed)


@P.highest_matmul
def solve_fixed(spec, settings: SolverSettings, params, xs_init, us_init,
                depth: int, th_stop, reg_init=1e-9, feasible_init=False, *,
                ddp=False, box: bool = False, maxiter=None,
                n_alphas: Optional[int] = None,
                final_cost_fallback: bool = True):
    """Fixed-depth FDDP/DDP solve: ``depth`` (static) iterations of
    :func:`_fixed_iteration` under one ``lax.scan``, with done/maxiter
    masking replacing early exit. ``maxiter`` (traced, <= depth) masks the
    tail iterations off so one compiled program serves smaller dynamic
    budgets. Semantics match :func:`solve_fddp_or_ddp` except that a failed
    backward pass consumes an iteration (escalate-and-continue) instead of
    retrying inside the iteration — equivalence on the mission corpus is
    pinned by tests/test_fixed.py."""
    _check_fixed_settings(settings)
    params = P.as_device(params)
    dtype = xs_init.dtype
    ddp = jnp.asarray(ddp)
    n_alphas = settings.n_alphas if n_alphas is None else n_alphas
    maxiter_dyn = jnp.asarray(depth if maxiter is None else maxiter, jnp.int32)

    init = _FixedCarry(
        xs=xs_init, us=us_init,
        cost=jnp.asarray(jnp.inf, dtype=dtype),
        feasible=jnp.asarray(feasible_init),
        xreg=jnp.asarray(reg_init, dtype=dtype),
        ureg=jnp.asarray(reg_init, dtype=dtype),
        it=jnp.zeros((), jnp.int32),
        stop_val=jnp.asarray(jnp.inf, dtype=dtype),
        gap_norm=jnp.asarray(jnp.inf, dtype=dtype),
        done=jnp.zeros((), bool),
        failed=jnp.zeros((), bool),
    )

    def body(s, i):
        active = (~s.done) & (~s.failed) & (i < maxiter_dyn)
        s2 = _fixed_iteration(spec, settings, params, s, ddp, th_stop,
                              box, n_alphas)
        return _tree_select(active, s2, s), None

    out, _ = jax.lax.scan(body, init, jnp.arange(depth, dtype=jnp.int32))

    # maxiter = 0 leaves cost at inf; the dynamics-free evaluation fixes it
    # up. Callers that never consume the zero-iteration cost (the SbFDDP
    # stage driver selects a real iteration's cost instead) disable this —
    # measured 78 ms per call at B=512 on the v5e, pure waste there.
    if final_cost_fallback:
        cost_final = jnp.where(jnp.isfinite(out.cost), out.cost,
                               P.total_cost(spec, params, out.xs, out.us))
    else:
        cost_final = out.cost
    return SolveResult(
        xs=out.xs, us=out.us, cost=cost_final, iters=out.it,
        feasible=out.feasible, stop=out.stop_val, gap_norm=out.gap_norm,
        xreg=out.xreg, failed=out.failed, trace=None)


@P.highest_matmul
def solve_while_fixed_body(spec, settings: SolverSettings, params, xs_init,
                           us_init, maxiter, th_stop, reg_init=1e-9,
                           feasible_init=False, *, ddp=False,
                           box: bool = False,
                           n_alphas: Optional[int] = None):
    """Early-exit while_loop over the FIXED iteration body: the while exits
    immediately when ``maxiter`` is 0 (under vmap: when every element's
    budget is 0 — the all-feasible polish case costs ~nothing), and a
    fired iteration costs the fixed body's single backward pass +
    batched-alpha rollout instead of the while-solver's nested retry
    loops. Semantics: identical per-element math to :func:`solve_fixed`,
    data-dependent trip count like :func:`solve_fddp_or_ddp`."""
    _check_fixed_settings(settings)
    params = P.as_device(params)
    dtype = xs_init.dtype
    ddp = jnp.asarray(ddp)
    n_alphas = settings.n_alphas if n_alphas is None else n_alphas
    maxiter = jnp.asarray(maxiter, jnp.int32)
    th_stop_a = jnp.asarray(th_stop, dtype=dtype)

    init = _FixedCarry(
        xs=xs_init, us=us_init,
        cost=jnp.asarray(jnp.inf, dtype=dtype),
        feasible=jnp.asarray(feasible_init),
        xreg=jnp.asarray(reg_init, dtype=dtype),
        ureg=jnp.asarray(reg_init, dtype=dtype),
        it=jnp.zeros((), jnp.int32),
        stop_val=jnp.asarray(jnp.inf, dtype=dtype),
        gap_norm=jnp.asarray(jnp.inf, dtype=dtype),
        done=jnp.zeros((), bool),
        failed=jnp.zeros((), bool),
    )

    def cond(s):
        return (s.it < maxiter) & ~s.done & ~s.failed

    def body(s):
        return _fixed_iteration(spec, settings, params, s, ddp, th_stop_a,
                                box, n_alphas)

    out = jax.lax.while_loop(cond, body, init)
    return SolveResult(
        xs=out.xs, us=out.us, cost=out.cost, iters=out.it,
        feasible=out.feasible, stop=out.stop_val, gap_norm=out.gap_norm,
        xreg=out.xreg, failed=out.failed, trace=None)


@P.highest_matmul
def solve_fixed_batched(spec, settings: SolverSettings, params_b, xs_b, us_b,
                        depth: int, th_stop, reg_init=1e-9,
                        feasible_init=None, *, ddp=False, box: bool = False,
                        maxiter=None, n_alphas: Optional[int] = None):
    """Batch-AWARE fixed-depth solve: like vmap(:func:`solve_fixed`) but
    with the scenario axis INSIDE the driver, so callers (the SbFDDP tick)
    can gate whole stages on scalar batch-wide predicates — a real XLA
    conditional that skips compute, where vmap(cond) degrades to a select
    that always pays both branches.

    ``params_b``: fully batched parameter pytree (every leaf with leading
    B — vmap of the controller's update_problem produces this).
    ``maxiter``: scalar or (B,) per-element iteration mask. Per-element
    math and masking are IDENTICAL to :func:`solve_fixed` (the iteration
    body is the same ``_fixed_iteration`` under vmap); equivalence is
    pinned by tests/test_fixed.py in f64."""
    _check_fixed_settings(settings)
    B = xs_b.shape[0]
    dtype = xs_b.dtype
    ddp = jnp.asarray(ddp)
    n_alphas = settings.n_alphas if n_alphas is None else n_alphas
    if feasible_init is None:
        feasible_init = jnp.zeros((B,), bool)
    else:
        feasible_init = jnp.broadcast_to(jnp.asarray(feasible_init), (B,))
    maxiter_b = jnp.broadcast_to(
        jnp.asarray(depth if maxiter is None else maxiter, jnp.int32), (B,))

    init = _FixedCarry(
        xs=xs_b, us=us_b,
        cost=jnp.full((B,), jnp.inf, dtype=dtype),
        feasible=feasible_init,
        xreg=jnp.full((B,), reg_init, dtype=dtype),
        ureg=jnp.full((B,), reg_init, dtype=dtype),
        it=jnp.zeros((B,), jnp.int32),
        stop_val=jnp.full((B,), jnp.inf, dtype=dtype),
        gap_norm=jnp.full((B,), jnp.inf, dtype=dtype),
        done=jnp.zeros((B,), bool),
        failed=jnp.zeros((B,), bool),
    )

    th_stop_a = jnp.asarray(th_stop, dtype=dtype)

    def body(s, i):
        active = (~s.done) & (~s.failed) & (i < maxiter_b)  # (B,)
        s2 = jax.vmap(
            lambda s1, p1: _fixed_iteration(spec, settings, p1, s1, ddp,
                                            th_stop_a, box, n_alphas)
        )(s, params_b)

        def sel(a, b):
            mask = active.reshape((B,) + (1,) * (a.ndim - 1))
            return jnp.where(mask, a, b)

        return jax.tree_util.tree_map(sel, s2, s), None

    out, _ = jax.lax.scan(body, init, jnp.arange(depth, dtype=jnp.int32))
    return SolveResult(
        xs=out.xs, us=out.us, cost=out.cost, iters=out.it,
        feasible=out.feasible, stop=out.stop_val, gap_norm=out.gap_norm,
        xreg=out.xreg, failed=out.failed, trace=None)


def default_init(spec, params, dtype=None):
    """Default candidate: x0 replicated, zero controls (infeasible start)."""
    dtype = dtype or params.x0.dtype
    xs = jnp.tile(params.x0, (spec.T + 1, 1)).astype(dtype)
    us = jnp.zeros((spec.T, spec.nu), dtype=dtype)
    return xs, us
