"""Time-parallel Riccati backward pass via associative scan.

The reference's Riccati recursion (crocoddyl SolverDDP backward pass, the
only true sequential dependency in a DDP iteration — SURVEY.md §3.2) runs
O(T) sequential steps. On TPU the horizon can instead be parallelized in
O(log T) depth with ``jax.lax.associative_scan``: the conditional
cost-to-go between two times is a quadratic in the boundary states, those
quadratics compose associatively (minimizing over the interior state), and
suffix-combining them yields every node's value function at once
(temporal-parallelization-of-LQT construction; each element is the
5-tuple (A, b, C, eta, J)).

Equivalence to the sequential pass: the LQR subproblem of one DDP/FDDP
iteration has stage quadratics (Lx, Lu, Lxx, Lxu, Luu), affine dynamics
``dx' = Fx dx + Fu du + f`` (f = feasibility gaps), per-node state
regularization xreg and control regularization ureg. Eliminating u with the
STAGE Hessian (Luu + ureg) at element init and then minimizing over
interior states commutes with the interleaved elimination the sequential
recursion performs, so (Vx, Vxx) — and the gains recomputed from them —
match ``fddp._backward_pass`` to round-off (validated by tests against the
sequential pass).

When it pays: the per-solve latency axis. For the reference's T≈30 horizons
batch parallelism already saturates the chip and the sequential scan is
fine; for long horizons (T ≥ a few hundred) or latency-critical single
solves, the log-depth scan wins. Enabled via
``SolverSettings(parallel_riccati=True)``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from .fddp import BackwardPassData


class _Element(NamedTuple):
    """Conditional cost-to-go between two horizon times as a quadratic:
    C(x, y) = min_u [...] represented by (A, b, C, eta, J) with
    V(x) = 0.5 x' J x - eta' x after full-suffix combination."""

    A: jnp.ndarray     # (n, n)
    b: jnp.ndarray     # (n,)
    C: jnp.ndarray     # (n, n)
    eta: jnp.ndarray   # (n,)
    J: jnp.ndarray     # (n, n)


def _sym(M):
    return 0.5 * (M + jnp.swapaxes(M, -1, -2))


def _combine(ei: _Element, ej: _Element) -> _Element:
    """Associative composition of two adjacent elements (ei earlier).

    Minimizes over the interior state shared by the two quadratics. Solves
    are batched into one LU each for M = I + C_i J_j and its transpose."""
    n = ei.A.shape[-1]
    I = jnp.eye(n, dtype=ei.A.dtype)
    mv = lambda A, v: jnp.einsum("...ij,...j->...i", A, v)
    M = I + ei.C @ ej.J                        # (I + C_i J_j)

    # solve(M, [A_i | b_i + C_i eta_j | C_i]) in one factorization
    rhs = jnp.concatenate(
        [ei.A, (ei.b + mv(ei.C, ej.eta))[..., None], ei.C], axis=-1)
    sol = jnp.linalg.solve(M, rhs)
    MA, Mb, MC = sol[..., :n], sol[..., n], sol[..., n + 1:]

    # (I + J_j C_i) = M', so reuse via transposed solve
    rhs_t = jnp.concatenate(
        [(ej.eta - mv(ej.J, ei.b))[..., None], ej.J], axis=-1)
    sol_t = jnp.linalg.solve(jnp.swapaxes(M, -1, -2), rhs_t)
    Ne, NJ = sol_t[..., 0], sol_t[..., 1:]

    AiT = jnp.swapaxes(ei.A, -1, -2)
    return _Element(
        A=ej.A @ MA,
        b=mv(ej.A, Mb) + ej.b,
        C=_sym(ej.A @ MC @ jnp.swapaxes(ej.A, -1, -2) + ej.C),
        eta=mv(AiT, Ne) + ei.eta,
        J=_sym(AiT @ NJ @ ei.A + ei.J),
    )


def _stage_elements(derivs, fs_next, xreg, ureg):
    """Per-node element: eliminate u with the stage Hessian, fold the gap
    into the affine term. derivs: NodeDerivatives stacked over T."""
    nu = derivs.Lu.shape[-1]
    ndx = derivs.Lx.shape[-1]
    dtype = derivs.Lx.dtype
    I_nu = jnp.eye(nu, dtype=dtype)
    I_nx = jnp.eye(ndx, dtype=dtype)

    def one(d, f_next):
        Luu_r = d.Luu + ureg * I_nu
        chol = jnp.linalg.cholesky(Luu_r)
        LuxT = jnp.swapaxes(d.Lxu, -1, -2)       # (nu, ndx)
        Ki = jsl.cho_solve((chol, True), LuxT)   # Luu^-1 Lux
        ki = jsl.cho_solve((chol, True), d.Lu)   # Luu^-1 Lu
        Ci = jsl.cho_solve((chol, True), jnp.swapaxes(d.Fu, -1, -2))
        return _Element(
            A=d.Fx - d.Fu @ Ki,
            b=f_next - d.Fu @ ki,
            C=_sym(d.Fu @ Ci),
            eta=-(d.Lx - d.Lxu @ ki),
            J=_sym(d.Lxx - d.Lxu @ Ki) + xreg * I_nx,
        )

    return jax.vmap(one)(derivs, fs_next)


def parallel_backward_pass(spec, derivs, term, fs, xreg, ureg,
                           feasible) -> BackwardPassData:
    """Drop-in replacement for the sequential ``fddp._backward_pass``
    (free-dynamics path; box-QP gains stay sequential)."""
    ndx = spec.state.ndx
    _, LxT, LxxT = term
    dtype = LxT.dtype
    I_ndx = jnp.eye(ndx, dtype=dtype)
    I_nu = jnp.eye(spec.nu, dtype=dtype)

    elems = _stage_elements(derivs, fs[1:], xreg, ureg)
    term_elem = _Element(
        A=jnp.zeros((ndx, ndx), dtype=dtype),
        b=jnp.zeros(ndx, dtype=dtype),
        C=jnp.zeros((ndx, ndx), dtype=dtype),
        eta=-LxT,
        J=LxxT + xreg * I_ndx,
    )
    all_elems = jax.tree.map(
        lambda s, t: jnp.concatenate([s, t[None]], axis=0), elems, term_elem)

    # suffix reduction: out[t] = e_t ∘ e_{t+1} ∘ ... ∘ e_T. With
    # reverse=True the scan folds from the right handing the LATER partial
    # product as the LEFT argument, so swap into _combine(earlier, later).
    suffix = jax.lax.associative_scan(lambda a, b: _combine(b, a),
                                      all_elems, reverse=True)

    Vxx = suffix.J                                         # (T+1, n, n)
    Vx_raw = -suffix.eta                                   # (T+1, n)
    gap = jnp.einsum("tij,tj->ti", Vxx, fs)
    Vx = Vx_raw + jnp.where(feasible, 0.0, gap)            # gap-corrected

    # per-node gains from V_{t+1}, identical formulas to the sequential pass
    def gains(d, Vx1, Vxx1):
        FuTV = jnp.swapaxes(d.Fu, -1, -2) @ Vxx1
        Qu = d.Lu + jnp.swapaxes(d.Fu, -1, -2) @ Vx1
        Qxu = d.Lxu + (jnp.swapaxes(d.Fx, -1, -2) @ Vxx1) @ d.Fu
        Quu = d.Luu + FuTV @ d.Fu + ureg * I_nu
        chol = jnp.linalg.cholesky(Quu)
        k = jsl.cho_solve((chol, True), Qu)
        K = jsl.cho_solve((chol, True), jnp.swapaxes(Qxu, -1, -2))
        return k, K, Qu, Quu @ k

    k, K, Qu, Quuk = jax.vmap(gains)(derivs, Vx[1:], Vxx[1:])
    ok = (jnp.all(jnp.isfinite(k)) & jnp.all(jnp.isfinite(K))
          & jnp.all(jnp.isfinite(Vx)))
    return BackwardPassData(k=k, K=K, Qu=Qu, Quuk=Quuk, Vx=Vx, Vxx=Vxx, ok=ok)
