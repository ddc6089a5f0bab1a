"""
Log-depth block parallel-cyclic-reduction (PCR) solver over the band.

The block-Thomas solver (``solvers.btd``) is *latency*-bound, not
bandwidth-bound: its two sweeps scan the ~``n_sup`` super-blocks
serially (2 x 186 dependent ~1.3 us steps at 23.7k dofs ~ 0.5 ms for
factors whose pure HBM stream is ~25 us).  PCR removes the serial
chain: at each of ``ceil(log2(n_sup))`` levels every super-row
eliminates its stride-``s`` neighbors *simultaneously*,

    r_i <- r_i + P_i^l r_{i-s} + Q_i^l r_{i+s},      s = 2^l,

and after the last level the system is block-diagonal: ``x = Dinv r``.
With the elimination multipliers ``P, Q`` precomputed at factor time
(once per Jacobian refresh window), a solve is just ``2 log2(n) + 1``
*batched* (n, Bt, Bt) x (n, Bt) MXU matmuls — no scan at all.  The
price is streaming ``(2 levels + 1)`` factor arrays instead of
Thomas's 3: ~6x the HBM traffic.

**Measured outcome (round 4, TPU v5e, 23.7k dofs, fold-proof slope
timing — ``benchmarks/probe_assembly.py``): PCR LOSES to block-Thomas
and is kept as tested infrastructure, not the default.**  The round-3
premise (btd_solve ~0.5 ms, ~20x its streaming floor) was
dispatch-distorted; measured honestly the Thomas solve is 0.145 ms
(bf16) / 0.181 ms (f32), while pcr_solve is 0.573 / 1.554 ms and
pcr_factor is 117.6 ms vs btd_factor 15.7 ms.  PCR's 17 factor arrays
(~104 MB bf16) would stream in ~145 us at the chip's 716 GB/s bound,
but the (186, 128, 128) batched matmuls only reach ~25% of peak
bandwidth, so the 6x traffic translates to ~4x slower solves — and the
8 levels of 5 batched matmul/inverse passes make the factorization
7.5x Thomas's scan.  Log-depth does not pay at this block geometry;
``linear_solver='btd'`` remains the single-chip default.

Like ``btd`` this is exact (a direct method), uses the same
equilibrated super-block front-end (``btd.btd_superblocks``), supports
bf16-stored factors with f32 accumulation, and solves the TRANSPOSED
system with the same factors (``pcr_solve_t``) for the IFT adjoint.
Select with ``linear_solver='pcr'``.

Replaces the same reference component as ``btd``: PETSc's direct solve
per Newton iteration (reference ``src/femvf/models/transient.py:470-491``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .bsb import BSBPlan
from .btd import btd_superblocks

__all__ = ["PCRFactors", "pcr_factor", "pcr_solve", "pcr_solve_t"]


class PCRFactors(NamedTuple):
    P: jnp.ndarray  # (n_levels, n_sup, Bt, Bt) lower-neighbor multipliers
    Q: jnp.ndarray  # (n_levels, n_sup, Bt, Bt) upper-neighbor multipliers
    Dinv: jnp.ndarray  # (n_sup, Bt, Bt) final block-diagonal inverses
    d: jnp.ndarray  # (ndof_pad,) Jacobi equilibration scale


def _n_levels(n_sup: int) -> int:
    lv = 0
    while (1 << lv) < n_sup:
        lv += 1
    return lv


def _bmv(A, x):
    """Batched (n,Bt,Bt)@(n,Bt) via the solver family's single
    mixed-precision policy site (``spike._mixed_einsum``)."""
    from .spike import _mixed_einsum

    return _mixed_einsum("nij,nj->ni", A, x)


def _bmv_t(A, x):
    """Batched transposed matvec A_i^T x_i, same policy site."""
    from .spike import _mixed_einsum

    return _mixed_einsum("nji,nj->ni", A, x)


def _shift_dn(a, s):
    """a_{i-s} with zero fill (rows i < s see no lower neighbor)."""
    z = jnp.zeros_like(a[:s])
    return jnp.concatenate([z, a[:-s]], axis=0)


def _shift_up(a, s):
    """a_{i+s} with zero fill (rows i >= n-s see no upper neighbor)."""
    z = jnp.zeros_like(a[:s])
    return jnp.concatenate([a[s:], z], axis=0)


def pcr_factor(
    plan: BSBPlan, blocks: jnp.ndarray, store_dtype=None,
    factor_dtype=None,
) -> PCRFactors:
    """Equilibrate + precompute the PCR elimination multipliers.

    ``store_dtype='bfloat16'`` halves the per-solve factor stream (the
    solve is bandwidth-bound batched matmuls; accuracy is absorbed by
    the residual-certified chord Newton exactly as for bf16 Thomas
    factors).  ``factor_dtype='float32'`` casts the Jacobian before
    factorizing — the f64-on-TPU mixed-precision path (``btd_factor``
    docstring).
    """
    if factor_dtype is not None:
        blocks = blocks.astype(factor_dtype)
    D, L, U, d = btd_superblocks(plan, blocks)
    n_sup, Bt = D.shape[0], D.shape[1]
    eye = jnp.eye(Bt, dtype=D.dtype)
    n_levels = _n_levels(n_sup)

    # work in the factor dtype; negate L/U so level multipliers are an
    # fma: P = -L Dinv_{i-s}, Q = -U Dinv_{i+s}
    Ps, Qs = [], []
    for lv in range(n_levels):
        s = 1 << lv
        Dinv = jnp.linalg.solve(D, eye[None].repeat(n_sup, 0))
        P = -jnp.einsum("nij,njk->nik", L, _shift_dn(Dinv, s))
        Q = -jnp.einsum("nij,njk->nik", U, _shift_up(Dinv, s))
        D = (
            D
            + jnp.einsum("nij,njk->nik", P, _shift_dn(U, s))
            + jnp.einsum("nij,njk->nik", Q, _shift_up(L, s))
        )
        L = jnp.einsum("nij,njk->nik", P, _shift_dn(L, s))
        U = jnp.einsum("nij,njk->nik", Q, _shift_up(U, s))
        Ps.append(P)
        Qs.append(Q)

    Dinv = jnp.linalg.solve(D, eye[None].repeat(n_sup, 0))
    if n_levels:
        P = jnp.stack(Ps)
        Q = jnp.stack(Qs)
    else:
        P = jnp.zeros((0, n_sup, Bt, Bt), D.dtype)
        Q = jnp.zeros((0, n_sup, Bt, Bt), D.dtype)
    if store_dtype is not None:
        P = P.astype(store_dtype)
        Q = Q.astype(store_dtype)
        Dinv = Dinv.astype(store_dtype)
    return PCRFactors(P=P, Q=Q, Dinv=Dinv, d=d)


def pcr_solve(plan: BSBPlan, factors: PCRFactors, r: jnp.ndarray):
    """Direct solve ``A x = r``: log-depth batched-matmul reduction."""
    P, Q, Dinv, d = factors
    n_sup, Bt = Dinv.shape[0], Dinv.shape[1]
    npad = n_sup * Bt - r.shape[0]
    rb = jnp.pad(r / d[: r.shape[0]], (0, npad)).reshape(n_sup, Bt)

    for lv in range(P.shape[0]):
        s = 1 << lv
        rb = rb + _bmv(P[lv], _shift_dn(rb, s)) + _bmv(
            Q[lv], _shift_up(rb, s)
        )
    x = _bmv(Dinv, rb)
    x = x.reshape(-1)[: r.shape[0]]
    return x / d[: r.shape[0]]


def pcr_solve_t(plan: BSBPlan, factors: PCRFactors, r: jnp.ndarray):
    """Direct TRANSPOSED solve ``A^T x = r`` with the same factors.

    ``A^{-1} = Dinv . T_{L-1} ... T_0`` with
    ``T_l(r)_i = r_i + P_i r_{i-s} + Q_i r_{i+s}``; hence
    ``A^{-T} = T_0^T ... T_{L-1}^T . Dinv^T`` where
    ``T_l^T(y)_j = y_j + P_{j+s}^T y_{j+s} + Q_{j-s}^T y_{j-s}`` — the
    same batched matmuls with transposed blocks and reversed shifts.
    The equilibration is symmetric, so the pre/post scaling matches
    :func:`pcr_solve`.  This keeps IFT adjoint solves direct (no
    Krylov fallback) exactly like ``btd_solve_t``.
    """
    P, Q, Dinv, d = factors
    n_sup, Bt = Dinv.shape[0], Dinv.shape[1]
    npad = n_sup * Bt - r.shape[0]
    rb = jnp.pad(r / d[: r.shape[0]], (0, npad)).reshape(n_sup, Bt)

    y = _bmv_t(Dinv, rb)
    for lv in range(P.shape[0] - 1, -1, -1):
        s = 1 << lv
        y = y + _shift_up(_bmv_t(P[lv], y), s) + _shift_dn(
            _bmv_t(Q[lv], y), s
        )
    x = y.reshape(-1)[: r.shape[0]]
    return x / d[: r.shape[0]]
