"""
Block-tridiagonal direct solver over the block-banded Jacobian.

The block-banded operator (``solvers.bsb``, half-band ``h`` blocks of
``b=128``) is exactly block-tridiagonal in super-blocks of ``Bt = h*b``:
super-row ``i`` couples only to ``i-1, i, i+1``.  A block-Thomas
factorization (sequential Schur complements ``S_i = D_i - L_i S_{i-1}^-1
U_{i-1}``, inverses stored explicitly) then solves the system *directly*:

- factorization: ``n_sup`` sequential ``Bt x Bt`` LU-inverses + batched
  matmuls, done once per Jacobian refresh window (amortized);
- solve: one batched MXU matmul (``g = Sinv r``) + two scans of ONE
  block matvec per row (product-form factors ``V = Sinv L``,
  ``W = Sinv U`` — see :class:`BTDFactors`).

Why this wins on TPU: at 50k+ dofs the Krylov path is bandwidth-bound
(each BiCGStab iteration streams the whole band; ~46 streams per time
step measured).  The direct solve replaces those with ~2 Newton
iterations x 1 solve each, cutting per-step traffic ~20x.  This is the
TPU-native replacement for PETSc's banded/sparse direct solvers
(reference ``dfn.solve(..., 'petsc')``, ``transient.py:470-491``).

Requires an RCM-renumbered mesh like ``bsb``; use through
``linear_solver='btd'``.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from .bsb import BSBPlan

__all__ = [
    "BTDFactors",
    "btd_factor",
    "btd_solve",
    "btd_solve_t",
    "btd_superblocks",
]


class BTDFactors(NamedTuple):
    """Product-form block-Thomas factors.

    The factorization is ``A_s = Lt Ut`` (``Lt`` lower block-bidiagonal
    with diagonal ``S_i`` and sub-diagonal ``L_i``; ``Ut`` upper
    bidiagonal with unit diagonal and super ``Sinv_i U_i``).  Instead of
    the raw ``(Sinv, L, U)`` triplet, the *products* ``V_i = Sinv_i L_i``
    and ``W_i = Sinv_i U_i`` are stored: both solve sweeps then take ONE
    matvec per sequential block row (``y_i = g_i - V_i y_{i-1}``,
    ``x_i = y_i - W_i x_{i+1}``) with the ``Sinv`` application hoisted
    out of the serial chain into a single batched MXU matmul
    (``g = Sinv r``).  vs the raw triplet this halves both the serial
    chain's latency (1 matvec/row instead of 2 dependent ones) and its
    HBM traffic (V+W streamed in-scan instead of Sinv twice + L + U).
    The transposed solve uses the same arrays (see ``btd_solve_t``).
    """

    Sinv: jnp.ndarray  # (n_sup, Bt, Bt) Schur-complement inverses
    V: jnp.ndarray  # (n_sup, Bt, Bt) products Sinv_i @ L_i
    W: jnp.ndarray  # (n_sup, Bt, Bt) products Sinv_i @ U_i
    d: jnp.ndarray  # (ndof_pad,) Jacobi equilibration scale


def _btd_from_bsb(plan: BSBPlan, blocks: jnp.ndarray):
    """Regroup band blocks into block-tridiagonal (D, L, U) super-blocks."""
    b, h, nb = plan.b, plan.h, plan.nb
    nblk = plan.nblk
    n_sup = -(-nblk // h)
    pad = n_sup * h - nblk
    if pad:
        # identity padding rows keep the factorization nonsingular
        eye_rows = jnp.zeros((pad, nb, b, b), dtype=blocks.dtype)
        eye_rows = eye_rows.at[:, h].set(jnp.eye(b, dtype=blocks.dtype))
        blocks = jnp.concatenate([blocks, eye_rows], axis=0)

    rr, cc = np.meshgrid(np.arange(h), np.arange(h), indexing="ij")
    n_idx = (h * np.arange(n_sup)[:, None, None] + rr[None]).astype(np.int32)

    def gather(m_grid, mask):
        m = np.clip(m_grid, 0, nb - 1).astype(np.int32)
        sub = blocks[jnp.asarray(n_idx), jnp.asarray(m)[None]]
        sub = sub * jnp.asarray(mask[None, :, :, None, None], blocks.dtype)
        # (n_sup, h, h, b, b) -> (n_sup, h*b, h*b)
        return jnp.transpose(sub, (0, 1, 3, 2, 4)).reshape(
            n_sup, h * b, h * b
        )

    ones = np.ones((h, h), dtype=bool)
    D = gather(h + cc - rr, ones)
    U = gather(2 * h + cc - rr, cc <= rr)
    L = gather(cc - rr, cc >= rr)
    return D, L, U, n_sup, pad


def _equilibration(plan: BSBPlan, blocks: jnp.ndarray):
    b, h = plan.b, plan.h
    diag = jnp.diagonal(blocks[:, h], axis1=1, axis2=2)  # (nblk, b)
    return jnp.sqrt(jnp.abs(diag) + 1e-30).reshape(-1)


def _scale_blocks(plan: BSBPlan, blocks: jnp.ndarray, d: jnp.ndarray):
    """blocks <- D^-1/2 A D^-1/2 in band storage."""
    b, h, nb, nblk = plan.b, plan.h, plan.nb, plan.nblk
    dr = d.reshape(nblk, b)
    # column scale for band position m: block-col n + m - h (clamped; the
    # out-of-range positions hold zero blocks so the scale value is moot)
    col_idx = np.clip(
        np.arange(nblk)[:, None] + np.arange(nb)[None, :] - h, 0, nblk - 1
    )
    dc = dr[jnp.asarray(col_idx.astype(np.int32))]  # (nblk, nb, b)
    return blocks / dr[:, None, :, None] / dc[:, :, None, :]


def btd_superblocks(plan: BSBPlan, blocks: jnp.ndarray):
    """Equilibrate the banded Jacobian and regroup it into
    block-tridiagonal super-blocks ``(D, L, U)`` plus the scale ``d``.

    Shared front-end of the block-Thomas factorization here and the
    SPIKE-partitioned factorization (``solvers.spike``)."""
    d = _equilibration(plan, blocks)
    blocks_s = _scale_blocks(plan, blocks, d)
    # the trailing pad rows of the last block (beyond ndof) are all-zero;
    # harmless for Krylov but singular for a direct factorization —
    # install identity rows (in the scaled space)
    tail_start = plan.ndof - (plan.nblk - 1) * plan.b
    if tail_start < plan.b:
        ii = jnp.arange(tail_start, plan.b)
        blocks_s = blocks_s.at[plan.nblk - 1, plan.h, ii, ii].add(1.0)
    D, L, U, n_sup, pad = _btd_from_bsb(plan, blocks_s)
    return D, L, U, d


def btd_factor(
    plan: BSBPlan, blocks: jnp.ndarray, store_dtype=None,
    factor_dtype=None, offdiag_dtype=None,
) -> BTDFactors:
    """Equilibrate + block-Thomas factor the banded Jacobian.

    ``store_dtype='bfloat16'`` stores the factors half-width: the solve
    streams the factor arrays (bandwidth-bound at large meshes), so bf16
    storage nearly halves per-solve time.  The ~1e-2 relative factor
    error is within what the chord (frozen-Jacobian) Newton already
    tolerates from stale factors — convergence remains
    residual-certified (see ``solvers.newton``).  Matvecs accumulate in
    f32 (``preferred_element_type``).

    ``offdiag_dtype`` (default: ``store_dtype``) separately controls the
    off-diagonal product arrays ``V/W`` — the ONLY arrays streamed
    inside the solve's serial scans.  Quantizing them below ``Sinv``
    costs almost no accuracy (they multiply the sweep *corrections*, not
    the residual itself: measured solve error 2.2e-3 for bf16-Sinv +
    e4m3-V/W vs 1.7e-3 all-bf16, vs 1.3e-1 with e4m3 Sinv), so
    ``store_dtype='bfloat16', offdiag_dtype='float8_e4m3fn'`` halves the
    serial-chain traffic again at bf16-grade solve quality.

    ``factor_dtype='float32'`` casts the Jacobian *before* factorizing —
    the mixed-precision path for f64 runs on TPU, where elementwise f64
    works (software-emulated) but there is no f64 LU: residuals stay
    f64, factors and solves run f32, and the residual-certified Newton
    refines to the f64 floor (reference tolerances,
    ``solverconst.py:1-6``, on the accelerator itself).
    """
    if factor_dtype is not None:
        blocks = blocks.astype(factor_dtype)
    D, L, U, d = btd_superblocks(plan, blocks)
    Bt = D.shape[1]
    eye = jnp.eye(Bt, dtype=D.dtype)

    # U shifted by one: xs[i] carries U_{i-1}
    U_prev = jnp.concatenate([jnp.zeros_like(U[:1]), U[:-1]], axis=0)

    def body(Sinv_prev, xs):
        D_i, L_i, U_im1 = xs
        # SU = Sinv_{i-1} @ U_{i-1} is W_{i-1}: emit it so the W
        # products fall out of the factorization for free
        SU = Sinv_prev @ U_im1
        S = D_i - L_i @ SU
        Sinv = jnp.linalg.solve(S, eye)
        return Sinv, (Sinv, SU)

    _, (Sinv, SU) = jax.lax.scan(
        body, jnp.zeros_like(eye), (D, L, U_prev)
    )
    W = jnp.concatenate([SU[1:], (Sinv[-1] @ U[-1])[None]], axis=0)
    # V = Sinv @ L as ONE batched MXU matmul (outside the serial scan)
    V = jax.lax.dot_general(
        Sinv, L,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=Sinv.dtype,
    )
    if store_dtype is not None:
        Sinv = _store_cast(Sinv, store_dtype)
    od = offdiag_dtype if offdiag_dtype is not None else store_dtype
    if od is not None:
        V = _store_cast(V, od)
        W = _store_cast(W, od)
    return BTDFactors(Sinv=Sinv, V=V, W=W, d=d)


# finite-max clamp values for fp8 storage formats (cast of an
# out-of-range f32 gives inf/nan, which would poison the whole solve)
_FP8_MAX = {"float8_e4m3fn": 448.0, "float8_e5m2": 57344.0}


def _store_cast(X, store_dtype):
    """Cast factors to the storage dtype, clamping fp8 to finite range.

    The factors are Jacobi-equilibrated (O(1) rows/cols), so e4m3's
    +-448 range holds everything but ill-conditioned Schur-complement
    inverses; those outliers saturate instead of overflowing to inf —
    a bounded factor-quality loss the residual-certified chord Newton
    can still absorb (or fail loudly on via the trajectory gate)."""
    name = jnp.dtype(store_dtype).name
    fmax = _FP8_MAX.get(name)
    if fmax is not None:
        X = jnp.clip(X, -fmax, fmax)
    return X.astype(store_dtype)


def _upcast(A):
    """fp8-stored factors upconvert the BLOCK in-register to bf16 — the
    VECTOR is never quantized below bf16 (an fp8 rhs would lose the
    residual itself, not just the preconditioner quality)."""
    return A.astype(jnp.bfloat16) if A.dtype.itemsize == 1 else A


def _dot(A, x, dims):
    """Factor-block matvec preserving the vector dtype.

    bf16-stored factors stream at half bandwidth (fp8 at byte width)
    and accumulate in f32 before casting back; f32 factors under an
    f64 vector (the TPU mixed-precision path — no f64 MXU) compute in
    f32 and cast back."""
    if A.dtype != x.dtype or A.dtype.itemsize == 1:
        A = _upcast(A)
        out = jax.lax.dot_general(
            A,
            x.astype(A.dtype),
            dimension_numbers=(dims, ((), ())),
            preferred_element_type=jnp.float32,
        )
        return out.astype(x.dtype)
    return jax.lax.dot_general(A, x, dimension_numbers=(dims, ((), ())))


def _mv(A, x):
    """A @ x: (Bt, Bt) @ (Bt,), mixed-precision (see :func:`_dot`)."""
    return _dot(A, x, ((1,), (0,)))


def _mvT(A, x):
    """A.T @ x with the same dtype handling as :func:`_mv`."""
    return _dot(A, x, ((0,), (0,)))


def _bdot(A, x, contract):
    """Batched (n, Bt, Bt) @ (n, Bt) -> (n, Bt) with :func:`_dot`'s
    dtype policy — the full-MXU hoisted ``Sinv`` application."""
    dims = ((contract,), (1,)), ((0,), (0,))
    if A.dtype != x.dtype or A.dtype.itemsize == 1:
        A = _upcast(A)
        out = jax.lax.dot_general(
            A, x.astype(A.dtype), dimension_numbers=dims,
            preferred_element_type=jnp.float32,
        )
        return out.astype(x.dtype)
    return jax.lax.dot_general(A, x, dimension_numbers=dims)


def _bmv(A, x):
    return _bdot(A, x, 2)


def _bmvT(A, x):
    return _bdot(A, x, 1)


def btd_solve(plan: BSBPlan, factors: BTDFactors, r: jnp.ndarray):
    """Direct solve ``A x = r`` with the stored product-form factors.

    ``g = Sinv r`` is ONE batched matmul (full-efficiency MXU, outside
    the serial chain); the two sweeps are then one matvec per block row:

        y_i = g_i - V_i y_{i-1}           (forward,  V = Sinv L)
        x_i = y_i - W_i x_{i+1}           (backward, W = Sinv U)
    """
    Sinv, V, W, d = factors
    n_sup, Bt, _ = Sinv.shape
    npad = n_sup * Bt - r.shape[0]
    rb = jnp.pad(r / d[: r.shape[0]], (0, npad)).reshape(n_sup, Bt)
    g = _bmv(Sinv, rb)

    def fwd(y_prev, xs):
        V_i, g_i = xs
        y = g_i - _mv(V_i, y_prev)
        return y, y

    _, y = jax.lax.scan(fwd, jnp.zeros(Bt, g.dtype), (V, g))

    def bwd(x_next, xs):
        W_i, y_i = xs
        x = y_i - _mv(W_i, x_next)
        return x, x

    _, x = jax.lax.scan(
        bwd, jnp.zeros(Bt, g.dtype), (W, y), reverse=True
    )
    x = x.reshape(-1)[: r.shape[0]]
    return x / d[: r.shape[0]]


def btd_solve_t(plan: BSBPlan, factors: BTDFactors, r: jnp.ndarray):
    """Direct TRANSPOSED solve ``A^T x = r`` with the same stored factors.

    The factorization is ``A_s = Lt Ut`` (see :class:`BTDFactors`), so
    ``A_s^T = Ut^T Lt^T``.  ``Ut^T z = r`` is the forward sweep
    ``z_i = r_i - W_{i-1}^T z_{i-1}``.  For ``Lt^T x = z`` substitute
    ``w_i = S_i^T x_i``: the recurrence ``S_i^T x_i = z_i - L_{i+1}^T
    x_{i+1}`` becomes ``w_i = z_i - (Sinv_{i+1} L_{i+1})^T w_{i+1} =
    z_i - V_{i+1}^T w_{i+1}`` — one transposed matvec per row — and the
    final ``x = Sinv^T w`` hoists out as one batched matmul.  Same
    storage, latency, and traffic as the forward solve.

    The equilibration is symmetric (``d`` on both sides), so pre/post
    scaling is identical to :func:`btd_solve`.  This is what makes IFT
    adjoint solves direct at large mesh sizes (the reverse path
    previously rerouted to matrix-free Krylov)."""
    Sinv, V, W, d = factors
    n_sup, Bt, _ = Sinv.shape
    npad = n_sup * Bt - r.shape[0]
    rb = jnp.pad(r / d[: r.shape[0]], (0, npad)).reshape(n_sup, Bt)

    W_prev = jnp.concatenate([jnp.zeros_like(W[:1]), W[:-1]], axis=0)

    def fwd(z_prev, xs):
        W_im1, r_i = xs
        z = r_i - _mvT(W_im1, z_prev)
        return z, z

    _, z = jax.lax.scan(fwd, jnp.zeros(Bt, rb.dtype), (W_prev, rb))

    V_next = jnp.concatenate([V[1:], jnp.zeros_like(V[:1])], axis=0)

    def bwd(w_next, xs):
        V_ip1, z_i = xs
        w = z_i - _mvT(V_ip1, w_next)
        return w, w

    _, w = jax.lax.scan(
        bwd, jnp.zeros(Bt, rb.dtype), (V_next, z), reverse=True
    )
    x = _bmvT(Sinv, w)
    x = x.reshape(-1)[: r.shape[0]]
    return x / d[: r.shape[0]]
