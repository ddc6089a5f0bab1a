"""
TPU-resident linear solvers.

Replaces PETSc KSP/LU (reference: ``dfn.solve(A, x, b, 'petsc')`` at
``src/femvf/models/transient.py:470-491`` and the PREONLY+LU KSP at
``transient.py:1133-1140``):

- Dense LU on the MXU for M5-scale systems (1k-10k DOFs) — at these sizes a
  single batched dense factorization beats any sparse iteration on TPU.
- Jacobi-preconditioned CG on a matrix-free EBE operator for larger systems.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


def _equilibrate(A: jnp.ndarray):
    """Symmetric Jacobi equilibration scale: d = sqrt(|diag A|).

    Newmark Jacobians mix mass terms ~ rho/(beta dt^2) (~1e8 at dt=1e-4)
    with traction rows ~ O(1), a diagonal spread that breaks f32 LU on TPU
    (no f64 LU exists there).  Scaling A -> D^-1/2 A D^-1/2 restores ~1e-6
    relative solve accuracy in f32, and is harmless in f64.
    """
    d = jnp.sqrt(jnp.abs(jnp.diagonal(A)) + 1e-30)
    return d


def dense_solve(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    d = _equilibrate(A)
    As = A / d[:, None] / d[None, :]
    y = jnp.linalg.solve(As, b / d)
    return y / d


def dense_solve_transpose(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    d = _equilibrate(A)
    As = A / d[:, None] / d[None, :]
    y = jnp.linalg.solve(As.T, b / d)
    return y / d


def dense_factor(A: jnp.ndarray):
    """Equilibrate + invert once; reuse with :func:`dense_factor_solve`.

    Newton with a per-step frozen Jacobian turns each extra iteration into
    one MXU matvec.  An explicit inverse is used rather than LU factors:
    on TPU the triangular ``lu_solve`` path is slower than a matmul, and
    with Jacobi equilibration the inverse is numerically adequate for the
    f32 noise floor at which Newton stops anyway.
    """
    d = _equilibrate(A)
    As = A / d[:, None] / d[None, :]
    # solve against I rather than jnp.linalg.inv: identical result but uses
    # the same (fast-compiling) LU codepath as dense_solve on TPU
    Ainv = jnp.linalg.solve(As, jnp.eye(As.shape[0], dtype=As.dtype))
    return (Ainv, d)


def dense_factor_solve(factors, b: jnp.ndarray) -> jnp.ndarray:
    Ainv, d = factors
    return (Ainv @ (b / d)) / d


def dense_refresh(factors, A: jnp.ndarray, iters: int = 2,
                  precision: str = None):
    """Newton–Schulz update of an explicit inverse toward a drifted matrix.

    ``factors = (X, d_old)`` approximates the inverse of an earlier Jacobian
    (equilibrated by ``d_old``); ``A`` is the current Jacobian.  Each
    Newton–Schulz sweep ``X <- X + X(I - A X)`` squares the error
    ``||I - A X||`` and costs two matmuls — pure MXU work, an order of
    magnitude faster than re-running the (sequential-panel) LU on TPU, and
    it batches perfectly under ``vmap`` for parameter sweeps.

    Quadratic convergence requires ``||I - A X|| < 1``: true when the
    Jacobian drifts smoothly between refreshes (Newmark steps, cubic-smooth
    contact penalty).  The downstream Newton solve is residual-certified
    with best-iterate tracking, so an occasional low-quality refresh costs
    iterations, not correctness.

    ``precision``: matmul precision for the update products (e.g.
    'default' = single-pass bf16 MXU, ~4x the throughput of the package
    default 'float32' 3-pass).  The refreshed inverse is a preconditioner
    for a residual-certified Newton, so the bf16 error floor (~3e-3
    relative) costs at most an extra cheap iteration — the right trade
    for batched sweeps where the refresh GEMMs dominate.
    """
    d = _equilibrate(A)
    As = A / d[:, None] / d[None, :]
    X, d_old = factors
    # re-express the old scaled inverse in the new equilibration:
    # raw inverse Y = D_old^-1 X D_old^-1, new scaled X0 = D_new Y D_new
    s = d / d_old
    X = X * s[:, None] * s[None, :]
    eye = jnp.eye(A.shape[0], dtype=A.dtype)
    mm = partial(jnp.matmul, precision=precision) if precision else jnp.matmul
    for _ in range(iters):
        X = X + mm(X, eye - mm(As, X))
    return (X, d)


class CGResult(NamedTuple):
    x: jnp.ndarray
    n_iter: jnp.ndarray
    res_norm: jnp.ndarray


def pcg(
    matvec: Callable,
    b: jnp.ndarray,
    x0: jnp.ndarray = None,
    precond_diag: jnp.ndarray = None,
    precond: Callable = None,
    tol: float = 1e-10,
    atol: float = 1e-12,
    max_iter: int = 1000,
) -> CGResult:
    """Preconditioned conjugate gradients (jittable while_loop).

    ``precond`` (a callable, e.g. nodal block-Jacobi) wins over the
    diagonal ``precond_diag``."""
    if x0 is None:
        x0 = jnp.zeros_like(b)
    if precond is not None:
        Minv_apply = precond
    else:
        Minv = 1.0 if precond_diag is None else 1.0 / precond_diag

        def Minv_apply(v):
            return Minv * v

    r0 = b - matvec(x0)
    z0 = Minv_apply(r0)
    p0 = z0
    rz0 = jnp.vdot(r0, z0)
    bnorm = jnp.linalg.norm(b)
    target = jnp.maximum(tol * bnorm, atol)

    def cond(carry):
        x, r, z, p, rz, k = carry
        return jnp.logical_and(jnp.linalg.norm(r) > target, k < max_iter)

    def body(carry):
        x, r, z, p, rz, k = carry
        Ap = matvec(p)
        alpha = rz / jnp.vdot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = Minv_apply(r)
        rz_new = jnp.vdot(r, z)
        beta = rz_new / rz
        p = z + beta * p
        return (x, r, z, p, rz_new, k + 1)

    x, r, z, p, rz, k = jax.lax.while_loop(cond, body, (x0, r0, z0, p0, rz0, 0))
    return CGResult(x=x, n_iter=k, res_norm=jnp.linalg.norm(r))


def bicgstab(
    matvec: Callable,
    b: jnp.ndarray,
    x0: jnp.ndarray = None,
    precond_diag: jnp.ndarray = None,
    precond: Callable = None,
    tol: float = 1e-10,
    atol: float = 1e-12,
    max_iter: int = 1000,
) -> CGResult:
    """
    Preconditioned BiCGStab for nonsymmetric EBE operators
    (``precond`` callable wins over the Jacobi ``precond_diag``).

    Hand-rolled ``while_loop`` (jax's wrapper requires a transposable
    matvec, which scatter-add EBE operators are not); AD never flows
    through this solver — Newton's IFT rules own the derivatives.
    """
    if x0 is None:
        x0 = jnp.zeros_like(b)
    if precond is not None:
        Minv_apply = precond
    else:
        Minv = 1.0 if precond_diag is None else 1.0 / precond_diag

        def Minv_apply(v):
            return Minv * v

    r0 = b - matvec(x0)
    rhat = r0
    bnorm = jnp.linalg.norm(b)
    target = jnp.maximum(tol * bnorm, atol)
    eps = jnp.asarray(1e-30, dtype=b.dtype)

    init = (x0, r0, jnp.zeros_like(b), jnp.zeros_like(b),
            jnp.asarray(1.0, b.dtype), jnp.asarray(1.0, b.dtype),
            jnp.asarray(1.0, b.dtype), 0)

    def cond(carry):
        x, r, p, v, rho, alpha, omega, k = carry
        return jnp.logical_and(jnp.linalg.norm(r) > target, k < max_iter)

    def body(carry):
        x, r, p, v, rho, alpha, omega, k = carry
        rho_new = jnp.vdot(rhat, r)
        beta = (rho_new / jnp.where(rho == 0, eps, rho)) * (
            alpha / jnp.where(omega == 0, eps, omega)
        )
        p = r + beta * (p - omega * v)
        phat = Minv_apply(p)
        v = matvec(phat)
        denom = jnp.vdot(rhat, v)
        alpha = rho_new / jnp.where(denom == 0, eps, denom)
        s = r - alpha * v
        shat = Minv_apply(s)
        t = matvec(shat)
        tt = jnp.vdot(t, t)
        omega = jnp.vdot(t, s) / jnp.where(tt == 0, eps, tt)
        x = x + alpha * phat + omega * shat
        r = s - omega * t
        return (x, r, p, v, rho_new, alpha, omega, k + 1)

    x, r, p, v, rho, alpha, omega, k = jax.lax.while_loop(cond, body, init)
    return CGResult(x=x, n_iter=k, res_norm=jnp.linalg.norm(r))
