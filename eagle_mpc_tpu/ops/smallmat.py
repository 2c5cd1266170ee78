"""Trace-time-unrolled linear algebra for tiny matrices (n <= ~24).

Why this exists — the TPU tiling argument (see /opt/skills/guides/
pallas_guide.md, "Tiling Constraints"): float32 tensors tile as (8, 128) on
the LAST TWO dims. A batched (N, 9, 9) Cholesky therefore

- pads every (9, 9) trailing block to (16, 128) — a ~25x memory blow-up on
  every intermediate, and
- lowers ``lax.linalg.cholesky`` / ``triangular_solve`` to an XLA While loop
  over columns with dynamic-update-slices — each iteration a full-tensor
  copy of that padded buffer.

Measured on the v5e: ``jsl.cho_factor + cho_solve`` on (67584, 9, 9) costs
~65 ms; the whole Riccati backward pass was >1 s per call because every scan
step paid this. The fix is to unroll the factorization at TRACE time over
the STATIC matrix dimension: every intermediate is a (batch,)-shaped array
(perfect lane utilization, no padded copies), and XLA fuses the O(n^3/6)
scalar chain into a handful of elementwise kernels.

These routines replace the used subset of Eigen/Pinocchio dense solves in
the reference stack (Crocoddyl's backward-pass Cholesky, contact-KKT solve,
BoxQP free-set solve). NaN semantics match ``jnp.linalg.cholesky``: a
non-PD matrix yields NaNs that the solver's regularization-escalation loop
detects (fddp._compute_direction).

All functions take (..., n, n) / (..., n[, m]) arrays with STATIC n, m and
batch over the leading dims.
"""

from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp


def _tri_rows(M) -> List[List]:
    """Lower-triangular Cholesky factor as a list-of-lists of (...)-shaped
    scalars; input (..., n, n) symmetric PD (upper triangle ignored)."""
    n = M.shape[-1]
    L: List[List] = [[None] * n for _ in range(n)]
    for j in range(n):
        acc = M[..., j, j]
        for k in range(j):
            acc = acc - L[j][k] * L[j][k]
        d = jnp.sqrt(acc)
        L[j][j] = d
        inv_d = 1.0 / d
        for i in range(j + 1, n):
            acc = M[..., i, j]
            for k in range(j):
                acc = acc - L[i][k] * L[j][k]
            L[i][j] = acc * inv_d
    return L


def _solve_rows(L: Sequence[Sequence], b, vector: bool):
    """Solve L L^T x = b given the row representation. ``b``: (..., n) if
    vector else (..., n, m)."""
    n = len(L)
    bi = (lambda i: b[..., i]) if vector else (lambda i: b[..., i, :])
    y = [None] * n
    for i in range(n):
        acc = bi(i)
        for k in range(i):
            acc = acc - (L[i][k] * y[k] if vector else L[i][k][..., None] * y[k])
        y[i] = acc / (L[i][i] if vector else L[i][i][..., None])
    x = [None] * n
    for i in reversed(range(n)):
        acc = y[i]
        for k in range(i + 1, n):
            acc = acc - (L[k][i] * x[k] if vector else L[k][i][..., None] * x[k])
        x[i] = acc / (L[i][i] if vector else L[i][i][..., None])
    return jnp.stack(x, axis=-1) if vector else jnp.stack(x, axis=-2)


def cholesky(M):
    """Lower Cholesky factor of a tiny symmetric PD matrix (..., n, n).
    NaN-propagating on non-PD input (like jnp.linalg.cholesky on TPU)."""
    L = _tri_rows(M)
    n = len(L)
    zero = jnp.zeros_like(M[..., 0, 0])
    rows = [jnp.stack([L[i][j] if j <= i else zero for j in range(n)], axis=-1)
            for i in range(n)]
    return jnp.stack(rows, axis=-2)


def solve_psd(M, b):
    """x = M^{-1} b for symmetric PD M (..., n, n), b (..., n)."""
    return _solve_rows(_tri_rows(M), b, vector=True)


def solve_psd_mat(M, B):
    """X = M^{-1} B for symmetric PD M (..., n, n), B (..., n, m)."""
    return _solve_rows(_tri_rows(M), B, vector=False)


class CholFactor:
    """Reusable factorization: factor once, solve many right-hand sides
    (the contact KKT pattern: M^{-1} tau, M^{-1} J^T)."""

    def __init__(self, M):
        self.rows = _tri_rows(M)

    def solve(self, b):
        return _solve_rows(self.rows, b, vector=True)

    def solve_mat(self, B):
        return _solve_rows(self.rows, B, vector=False)
