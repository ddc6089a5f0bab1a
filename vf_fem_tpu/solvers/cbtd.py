"""
COMPLEX block-tridiagonal direct solver via 2x real embedding.

Shift-invert eigenanalysis (``misc.hopf``) needs direct solves with the
complex-shifted pencil ``K + sigma D + sigma^2 M`` (sigma = growth rate
+ i * angular frequency).  Each complex super-block ``Z = R + iI`` embeds
as the real ``2Bt x 2Bt`` block ``[[R, -I], [I, R]]`` and complex vectors
as stacked ``[re; im]`` halves — the embedded system is again block
tridiagonal with the SAME super-block structure, so the block-Thomas
factorization (``solvers.btd``) applies verbatim at ``Bt' = 2Bt``.

This is deliberately NOT complex arithmetic in XLA: f64 complex LU is
unavailable on TPU and the embedding keeps every kernel in the real
dtypes the rest of the framework uses.  Equilibration uses the complex
modulus of the diagonal (a real diagonal scaling, valid for the
embedded system).

Replaces the complex shift-invert solves the reference delegates to
PETSc/SLEPc consumers of its sparse dynamical Jacobians (reference
``src/femvf/models/dynamical.py:239-298``).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from .bsb import BSBPlan
from .btd import _btd_from_bsb, _scale_blocks

__all__ = ["CBTDFactors", "cbtd_factor", "cbtd_solve"]


class CBTDFactors(NamedTuple):
    """Product-form embedded Thomas factors (``V = Sinv L``,
    ``W = Sinv U`` — same restructuring as ``btd.BTDFactors``: one
    matvec per sequential row, the ``Sinv`` application hoisted into a
    batched matmul)."""

    Sinv: jnp.ndarray  # (n_sup, 2Bt, 2Bt) embedded Schur inverses
    V: jnp.ndarray  # (n_sup, 2Bt, 2Bt) products Sinv L
    W: jnp.ndarray  # (n_sup, 2Bt, 2Bt) products Sinv U
    d: jnp.ndarray  # (ndof_pad,) real equilibration scale
    Bt: int


def _embed(re, im):
    """(n, Bt, Bt) complex pair -> (n, 2Bt, 2Bt) real embedding."""
    top = jnp.concatenate([re, -im], axis=2)
    bot = jnp.concatenate([im, re], axis=2)
    return jnp.concatenate([top, bot], axis=1)


def cbtd_factor(
    plan: BSBPlan, blocks_re: jnp.ndarray, blocks_im: jnp.ndarray
) -> CBTDFactors:
    """Equilibrate + block-Thomas factor the complex banded matrix
    given as (real, imag) band-block arrays."""
    b, h, nblk = plan.b, plan.h, plan.nblk
    # modulus equilibration (real diagonal scaling of the complex system)
    diag_re = jnp.diagonal(blocks_re[:, h], axis1=1, axis2=2)
    diag_im = jnp.diagonal(blocks_im[:, h], axis1=1, axis2=2)
    d = jnp.sqrt(
        jnp.sqrt(diag_re**2 + diag_im**2) + 1e-30
    ).reshape(-1)
    re_s = _scale_blocks(plan, blocks_re, d)
    im_s = _scale_blocks(plan, blocks_im, d)
    # zero trailing pad rows of the last block get identity (real part)
    tail_start = plan.ndof - (plan.nblk - 1) * plan.b
    if tail_start < plan.b:
        ii = jnp.arange(tail_start, plan.b)
        re_s = re_s.at[plan.nblk - 1, plan.h, ii, ii].add(1.0)

    Dr, Lr, Ur, n_sup, _ = _btd_from_bsb(plan, re_s)
    Di, Li, Ui, _, _ = _btd_from_bsb(plan, im_s)
    # _btd_from_bsb installs identity pad rows in BOTH parts, so a pad
    # super-block embeds as [[I, -I], [I, I]] — nonsingular (det 2^b
    # per pad row), and the pad rhs is zero so pad solutions never
    # couple back into real dofs
    D = _embed(Dr, Di)
    L = _embed(Lr, Li)
    U = _embed(Ur, Ui)
    Bt2 = D.shape[1]
    eye = jnp.eye(Bt2, dtype=D.dtype)
    U_prev = jnp.concatenate([jnp.zeros_like(U[:1]), U[:-1]], axis=0)

    def body(Sinv_prev, xs):
        D_i, L_i, U_im1 = xs
        SU = Sinv_prev @ U_im1  # = W_{i-1}
        S = D_i - L_i @ SU
        Sinv = jnp.linalg.solve(S, eye)
        return Sinv, (Sinv, SU)

    _, (Sinv, SU) = jax.lax.scan(
        body, jnp.zeros_like(eye), (D, L, U_prev)
    )
    W = jnp.concatenate([SU[1:], (Sinv[-1] @ U[-1])[None]], axis=0)
    V = jax.lax.dot_general(
        Sinv, L,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=Sinv.dtype,
    )
    return CBTDFactors(Sinv=Sinv, V=V, W=W, d=d, Bt=Bt2 // 2)


def cbtd_solve(plan: BSBPlan, factors: CBTDFactors, r_re, r_im):
    """Solve the complex system for a complex rhs given as (re, im);
    returns (x_re, x_im).

    Product-form sweeps (see ``btd.btd_solve``): ``g = Sinv r`` batched,
    then ``y_i = g_i - V_i y_{i-1}`` / ``x_i = y_i - W_i x_{i+1}`` —
    one matvec per sequential row of the embedded system."""
    Sinv, V, W, d = factors[:4]
    # NOT factors.Bt: the int leaf is traced when the factors are passed
    # as jit arguments (remote-compile payload limits require that); the
    # static shape carries the same information
    Bt = Sinv.shape[1] // 2
    n_sup = Sinv.shape[0]
    n = r_re.shape[0]
    npad = n_sup * Bt - n

    def pack(v):
        return jnp.pad(v / d[:n], (0, npad)).reshape(n_sup, Bt)

    rb = jnp.concatenate([pack(r_re), pack(r_im)], axis=1)  # (n_sup, 2Bt)
    g = jax.lax.dot_general(
        Sinv, rb, dimension_numbers=(((2,), (1,)), ((0,), (0,)))
    )

    def fwd(y_prev, xs):
        V_i, g_i = xs
        y = g_i - V_i @ y_prev
        return y, y

    _, y = jax.lax.scan(fwd, jnp.zeros(2 * Bt, g.dtype), (V, g))

    def bwd(x_next, xs):
        W_i, y_i = xs
        x = y_i - W_i @ x_next
        return x, x

    _, x = jax.lax.scan(
        bwd, jnp.zeros(2 * Bt, g.dtype), (W, y), reverse=True
    )
    x_re = x[:, :Bt].reshape(-1)[:n] / d[:n]
    x_im = x[:, Bt:].reshape(-1)[:n] / d[:n]
    return x_re, x_im
