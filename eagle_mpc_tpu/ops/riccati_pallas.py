"""Pallas-fused Riccati backward pass (batch-in-lanes TPU kernel).

Why this exists — the round-2 ceiling analysis hypothesized the batched
tick was op-issue-bound on the backward recursion's small operands, and
that fusing the whole recursion into one VMEM-resident kernel was the
path past it. This module is that kernel. **The hypothesis was then
refuted by measurement** (BASELINE.md "pallas_backward knob verdict"):
because the solver keeps the batch axis leading and dense, XLA lowers
the scan's (B, 18, 18) products onto the MXU as batched GEMMs at ~20 %
MFU — 0.094 ms per backward pass at B=512, vs 23.9 ms for this kernel's
VPU lane-batched formulation (VPU peak is ~25x below MXU f32 peak). The
kernel is kept, default-off, as the validated scaffold for op shapes
where XLA's batched-GEMM lowering does fall off the MXU.

Layout: **batch in lanes**. Every Riccati operand is transposed to
batch-LAST, so a matrix element like `Vxx[i, k]` is a (BT,)-lane vector
and an (18, 18, BT) tensor tiles the VPU as 18 x ceil(18/8) vregs with
full lane occupancy (see the Pallas TPU docs on tiling constraints,
jax.readthedocs.io/en/latest/pallas/tpu/details.html: trailing dims
tile as (8, 128) for f32). Matrix products
are expressed as contractions over the STATIC matrix dimension (18 or 9
broadcast-FMA statements each), so the Mosaic program stays small while
the per-statement work is a full (18, BT) tile.

Recurrence structure: the grid is `(batch_tiles, T)` with T minormost —
TPU grids execute sequentially on a core, so the value-function carry
(Vx, Vxx) lives in VMEM scratch across grid steps, initialized from the
terminal node at t==0 and consumed in reverse node order via the
`T-1-t` index maps. One kernel instance therefore performs the entire
backward pass for its batch tile without touching HBM between nodes
except for the streamed per-node derivative blocks (double-buffered by
the pallas pipeline).

This replaces (batched) what crocoddyl's SolverDDP::backwardPass does
node-by-node on the CPU (reference consumer:
/root/reference/src/sbfddp.cpp:242-255 via crocoddyl). The math mirrors
`solvers/fddp._backward_pass`'s scan step exactly (same regularization,
same dtype-relative PD floor, same gap handling); parity is pinned by
tests/test_pallas_backward.py in interpret mode and by the f32 solve
tests on TPU.

Dispatch: `scan_core` is a `jax.custom_batching.custom_vmap` — the
unbatched call (single-robot serving path) stays the sequential
`lax.scan`; under `vmap` (the batched-scenario path, parallel/batch.py)
the batching rule reroutes to the Pallas kernel. The kernel runs in
interpret mode off-TPU so the same flag is testable on the CPU mesh.
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# pallas.tpu ships with jax itself (scratch shapes work in interpret mode
# too), so no import guard — a guarded fallback would leave _node_kernel's
# scratch parameters unbound and fail at call time anyway
from jax.experimental.pallas import tpu as pltpu

LANES = 128  # batch padding granularity (f32 lane tile)


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


# ---------------------------------------------------------------------------
# batch-in-lanes matrix helpers: operands (n, m, BT); contraction loops are
# unrolled over the static matrix dims, each statement a full-tile FMA
# ---------------------------------------------------------------------------



def _mTm(A, B):
    """(j, p, BT)^T-contract-(j, m, BT) -> (p, m, BT): sum_j A[j] (x) B[j]."""
    acc = A[0][:, None, :] * B[0][None, :, :]
    for j in range(1, A.shape[0]):
        acc = acc + A[j][:, None, :] * B[j][None, :, :]
    return acc


def _mTv(A, v):
    """(j, p, BT)^T (j, BT) -> (p, BT)."""
    acc = A[0] * v[0]
    for j in range(1, A.shape[0]):
        acc = acc + A[j] * v[j]
    return acc






def _chol_rows(M, n: int) -> List[List]:
    """Unrolled lane-wise Cholesky: M (n, n, BT) -> row list of (BT,)."""
    L: List[List] = [[None] * n for _ in range(n)]
    for j in range(n):
        acc = M[j, j]
        for k in range(j):
            acc = acc - L[j][k] * L[j][k]
        d = jnp.sqrt(acc)
        L[j][j] = d
        inv_d = 1.0 / d
        for i in range(j + 1, n):
            acc = M[i, j]
            for k in range(j):
                acc = acc - L[i][k] * L[j][k]
            L[i][j] = acc * inv_d
    return L


def _chol_solve_vec(L, b):
    """L L^T x = b with b (n, BT) given as row-indexable array."""
    n = len(L)
    y = [None] * n
    for i in range(n):
        acc = b[i]
        for k in range(i):
            acc = acc - L[i][k] * y[k]
        y[i] = acc / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        acc = y[i]
        for k in range(i + 1, n):
            acc = acc - L[k][i] * x[k]
        x[i] = acc / L[i][i]
    return jnp.stack(x, axis=0)


def _chol_solve_mat(L, B):
    """L L^T X = B with B (n, m, BT): each row a (m, BT) tile."""
    n = len(L)
    y = [None] * n
    for i in range(n):
        acc = B[i]
        for k in range(i):
            acc = acc - L[i][k] * y[k]
        y[i] = acc / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        acc = y[i]
        for k in range(i + 1, n):
            acc = acc - L[k][i] * x[k]
        x[i] = acc / L[i][i]
    return jnp.stack(x, axis=0)


# ---------------------------------------------------------------------------
# the kernel: one grid step = one node of the recursion for one batch tile
# ---------------------------------------------------------------------------

def _node_kernel(Fx, Fu, Lx, Lu, Lxx, LxuT, Luu, f, VxT, VxxT,
                 xreg, ureg, infeas,
                 k_o, K_o, Qu_o, Quuk_o, Vx_o, Vxx_o,
                 Vx_s, Vxx_s, *, nu: int, ndx: int, rel_eps: float):
    """Every contraction below indexes ONLY leading (non-tiled) dims —
    middle-dim slices like ``A[:, j]`` force sublane-strided relayouts in
    Mosaic (measured 300x slowdown in the first version of this kernel) —
    exploiting symmetry of Vxx/Quu/Lxx and taking Lxu pre-transposed."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():  # terminal boundary -> carry scratch
        Vx_s[...] = VxT[...]
        Vxx_s[...] = VxxT[...]

    Vx = Vx_s[...]            # (ndx, BT)
    Vxx = Vxx_s[...]          # (ndx, ndx, BT), symmetric
    fx = Fx[...][0]           # (ndx, ndx, BT)
    fu = Fu[...][0]           # (ndx, nu, BT)
    lx = Lx[...][0]
    lu = Lu[...][0]
    lxx = Lxx[...][0]         # symmetric
    lxuT = LxuT[...][0]       # (nu, ndx, BT) — pre-transposed outside
    luu = Luu[...][0]
    gap = f[...][0]           # (ndx, BT)
    xr = xreg[0]              # (BT,) — regs ship as (1, Bp) rows: a 1-D
    ur = ureg[0]              # operand tiled below its full extent trips a
    nf = infeas[0]            # Mosaic/XLA layout mismatch (T(512) vs T(256))
    dtype = Vx.dtype

    eye_x = jnp.eye(ndx, dtype=dtype)[:, :, None]
    eye_u = jnp.eye(nu, dtype=dtype)[:, :, None]

    VFx = _mTm(Vxx, fx)                       # V^T Fx = V Fx   (ndx, ndx, BT)
    VFu = _mTm(Vxx, fu)                       # V Fu            (ndx, nu, BT)
    Qx = lx + _mTv(fx, Vx)                    # (ndx, BT)
    Qu = lu + _mTv(fu, Vx)                    # (nu, BT)
    Qxx = lxx + _mTm(VFx, fx)                 # Lxx + Fx^T V Fx (ndx, ndx, BT)
    Qux = lxuT + _mTm(VFu, fx)                # Lxu^T + Fu^T V Fx (nu, ndx, BT)
    Quu_raw = luu + _mTm(VFu, fu)             # (nu, nu, BT)

    diag = jnp.stack([Quu_raw[i, i] for i in range(nu)], axis=0)
    floor = rel_eps * jnp.max(jnp.abs(diag), axis=0)       # (BT,)
    Quu = Quu_raw + eye_u * (ur + floor)

    L = _chol_rows(Quu, nu)
    k = _chol_solve_vec(L, Qu)                # (nu, BT)
    K = _chol_solve_mat(L, Qux)               # (nu, ndx, BT)
    Quuk = _mTv(Quu, k)                       # Quu symmetric -> Quu @ k

    Vx_n = Qx + _mTv(K, Quuk) - 2.0 * _mTv(K, Qu)
    # Vxx_n = sym(Qxx - Qxu K) + xreg I, with both transposes built from
    # leading-indexed contractions (Lxx and V are symmetric)
    QxxT = lxx + _mTm(fx, VFx)
    Vxx_n = 0.5 * (Qxx + QxxT - _mTm(Qux, K) - _mTm(K, Qux)) + eye_x * xr
    Vx_n = Vx_n + nf * _mTv(Vxx_n, gap)       # Vxx_n symmetric

    k_o[...] = k[None]
    K_o[...] = K[None]
    Qu_o[...] = Qu[None]
    Quuk_o[...] = Quuk[None]
    Vx_o[...] = Vx_n[None]
    Vxx_o[...] = Vxx_n[None]
    Vx_s[...] = Vx_n
    Vxx_s[...] = Vxx_n


def _pallas_backward(Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, fs, VxT, VxxT,
                     xreg, ureg, feasible):
    """Batched backward pass. Inputs batch-FIRST ((B, T, ...) etc.);
    outputs batch-first (k, K, Qu, Quuk, Vx_r, Vxx_r) matching the scan."""
    B, T = Fx.shape[0], Fx.shape[1]
    ndx, nu = Fx.shape[2], Fu.shape[3]
    dtype = Fx.dtype
    rel_eps = float(100.0 * jnp.finfo(dtype).eps)

    Bp = ((B + LANES - 1) // LANES) * LANES
    # lane tile capped at 256 (was 512): in programs that also carry the
    # round-5 node/rollout kernels, the 512-lane recursion's VMEM stack
    # collided with the scoped limit by kilobytes on slot-heavy specs
    # (measured: 65.42M vs a 65.41M limit on the weighted flagship)
    BT = next(bt for bt in (256, 128) if Bp % bt == 0)
    nb = Bp // BT

    def to_lanes(x):
        # (B, T, *dims) -> (T, *dims, Bp)
        x = jnp.moveaxis(x, 0, -1)
        if Bp != B:
            pad = [(0, 0)] * (x.ndim - 1) + [(0, Bp - B)]
            x = jnp.pad(x, pad)
        return x

    FxL = to_lanes(Fx); FuL = to_lanes(Fu)
    LxL = to_lanes(Lx); LuL = to_lanes(Lu)
    LxxL = to_lanes(Lxx); LuuL = to_lanes(Luu)
    LxuTL = to_lanes(jnp.swapaxes(Lxu, 2, 3))      # (T, nu, ndx, Bp)
    fsL = to_lanes(fs)                             # (T, ndx, Bp)
    VxTL = to_lanes(VxT[:, None])[0]               # (ndx, Bp)
    VxxTL = to_lanes(VxxT[:, None])[0]             # (ndx, ndx, Bp)
    pad1 = (0, Bp - B)
    xrL = jnp.pad(xreg, pad1)[None]
    urL = jnp.pad(ureg, pad1)[None]
    nfL = jnp.pad(1.0 - feasible.astype(dtype), pad1)[None]

    rev = lambda b, t: (T - 1 - t, 0, 0, b)
    rev3 = lambda b, t: (T - 1 - t, 0, b)
    term2 = lambda b, t: (0, b)
    term3 = lambda b, t: (0, 0, b)
    vec = lambda b, t: (0, b)

    in_specs = [
        pl.BlockSpec((1, ndx, ndx, BT), rev),    # Fx
        pl.BlockSpec((1, ndx, nu, BT), rev),     # Fu
        pl.BlockSpec((1, ndx, BT), rev3),        # Lx
        pl.BlockSpec((1, nu, BT), rev3),         # Lu
        pl.BlockSpec((1, ndx, ndx, BT), rev),    # Lxx
        pl.BlockSpec((1, nu, ndx, BT), rev),     # Lxu^T
        pl.BlockSpec((1, nu, nu, BT), rev),      # Luu
        pl.BlockSpec((1, ndx, BT), rev3),        # fs
        pl.BlockSpec((ndx, BT), term2),          # VxT
        pl.BlockSpec((ndx, ndx, BT), term3),     # VxxT
        pl.BlockSpec((1, BT), vec),              # xreg
        pl.BlockSpec((1, BT), vec),              # ureg
        pl.BlockSpec((1, BT), vec),              # infeasible mask
    ]
    out_specs = [
        pl.BlockSpec((1, nu, BT), rev3),         # k
        pl.BlockSpec((1, nu, ndx, BT), rev),     # K
        pl.BlockSpec((1, nu, BT), rev3),         # Qu
        pl.BlockSpec((1, nu, BT), rev3),         # Quuk
        pl.BlockSpec((1, ndx, BT), rev3),        # Vx
        pl.BlockSpec((1, ndx, ndx, BT), rev),    # Vxx
    ]
    out_shape = [
        jax.ShapeDtypeStruct((T, nu, Bp), dtype),
        jax.ShapeDtypeStruct((T, nu, ndx, Bp), dtype),
        jax.ShapeDtypeStruct((T, nu, Bp), dtype),
        jax.ShapeDtypeStruct((T, nu, Bp), dtype),
        jax.ShapeDtypeStruct((T, ndx, Bp), dtype),
        jax.ShapeDtypeStruct((T, ndx, ndx, Bp), dtype),
    ]
    interpret = _interpret()
    scratch = [pltpu.VMEM((ndx, BT), dtype),
               pltpu.VMEM((ndx, ndx, BT), dtype)]

    kern = functools.partial(_node_kernel, nu=nu, ndx=ndx, rel_eps=rel_eps)
    outs = pl.pallas_call(
        kern,
        grid=(nb, T),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=(pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"))
            if not interpret else None),
    )(FxL, FuL, LxL, LuL, LxxL, LxuTL, LuuL, fsL, VxTL, VxxTL, xrL, urL, nfL)

    def from_lanes(x):  # (T, *dims, Bp) -> (B, T, *dims)
        return jnp.moveaxis(x[..., :B], -1, 0)

    return tuple(from_lanes(o) for o in outs)


# ---------------------------------------------------------------------------
# custom_vmap dispatch: sequential scan when unbatched, Pallas when vmapped
# ---------------------------------------------------------------------------

def _scan_single(Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, fs, VxT, VxxT,
                 xreg, ureg, feasible):
    """Reference semantics (mirror of solvers/fddp._backward_pass's step)."""
    from . import smallmat  # local import: keep module load light

    ndx, nu = Fx.shape[1], Fu.shape[2]
    dtype = Fx.dtype
    I_ndx = jnp.eye(ndx, dtype=dtype)
    I_nu = jnp.eye(nu, dtype=dtype)
    rel_eps = 100.0 * jnp.finfo(dtype).eps

    def step(carry, inp):
        Vx, Vxx = carry
        fx, fu, lx, lu, lxx, lxu, luu, f = inp
        FxTV = fx.T @ Vxx
        FuTV = fu.T @ Vxx
        Qx = lx + fx.T @ Vx
        Qu = lu + fu.T @ Vx
        Qxx = lxx + FxTV @ fx
        Qxu = lxu + FxTV @ fu
        Quu_raw = luu + FuTV @ fu
        diag_floor = rel_eps * jnp.max(jnp.abs(jnp.diagonal(Quu_raw)))
        Quu = Quu_raw + (ureg + diag_floor) * I_nu
        chol = smallmat.CholFactor(Quu)
        k = chol.solve(Qu)
        K = chol.solve_mat(Qxu.T)
        Quuk = Quu @ k
        Vx_n = Qx + K.T @ Quuk - 2.0 * (K.T @ Qu)
        Vxx_n = Qxx - Qxu @ K
        Vxx_n = 0.5 * (Vxx_n + Vxx_n.T) + xreg * I_ndx
        Vx_n = Vx_n + jnp.where(feasible, 0.0, Vxx_n @ f)
        return (Vx_n, Vxx_n), (k, K, Qu, Quuk, Vx_n, Vxx_n)

    (_, _), outs = jax.lax.scan(step, (VxT, VxxT),
                                (Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, fs),
                                reverse=True)
    return outs


@jax.custom_batching.custom_vmap
def scan_core(Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, fs, VxT, VxxT,
              xreg, ureg, feasible):
    """Riccati recursion core. Unbatched: (T, ...) operands, scalar regs.
    Under vmap every operand gains a leading batch dim and the recursion
    runs as ONE fused Pallas program."""
    return _scan_single(Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, fs, VxT, VxxT,
                        xreg, ureg, feasible)


@scan_core.def_vmap
def _scan_core_vmap(axis_size, in_batched, *args):
    def bcast(x, batched):
        return x if batched else jnp.broadcast_to(x[None], (axis_size,) + x.shape) \
            if hasattr(x, "shape") else jnp.full((axis_size,), x)

    args = [bcast(jnp.asarray(a), b) for a, b in zip(args, in_batched)]
    (Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, fs, VxT, VxxT, xreg, ureg, feasible) = args
    outs = _pallas_backward(Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, fs, VxT, VxxT,
                            xreg, ureg, feasible)
    return outs, tuple(True for _ in outs)
