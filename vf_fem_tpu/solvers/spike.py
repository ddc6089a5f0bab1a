"""
SPIKE-partitioned block-tridiagonal direct solver.

The block-Thomas factorization (``solvers.btd``) is the fastest
single-chip large-mesh solver, but its Schur recurrence is strictly
sequential in the ``n_sup`` super-blocks: the factorization is
latency-bound (~n_sup tiny LU calls in a scan) and it cannot be
distributed over a device mesh.  SPIKE partitioning (Polizzi & Sameh's
decomposition of a banded system into independent diagonal blocks plus
low-rank interface coupling) fixes both with the same machinery:

- the ``n_sup`` super-rows are split into ``S`` contiguous slabs; each
  slab is Thomas-factored *independently* — a scan of length ``m =
  n_sup/S`` over ``S``-batched ``Bt x Bt`` ops (vmapped on one chip,
  ``shard_map``-ed across chips, see ``parallel.spike_shard``);
- the inter-slab coupling is captured by per-slab "spikes" ``V_j =
  A_j^{-1} e_last C_j`` and ``W_j = A_j^{-1} e_first B_j`` (computed
  once per factorization as batched matrix-RHS Thomas solves — pure MXU
  work);
- a *reduced* block-tridiagonal system in the ``2S`` slab-interface
  unknowns (size ``2 Bt`` blocks) couples the slabs; it is tiny and
  solved sequentially (replicated, when distributed).

A solve is then: one batched local Thomas sweep for ``g = A_j^{-1}
r_j``, the reduced solve for the interface values, and a batched spike
correction ``x_j = g_j - V_j x_{j+1}^t - W_j x_{j-1}^b`` — two matmuls.
~1.5x the HBM traffic of plain Thomas but scan length ``m`` instead of
``n_sup``, and embarrassingly parallel over slabs.

Transposed solves (the IFT adjoint path) use the same local factors
with transposed sweeps plus separately-computed transposed spikes
(``A^T``'s slab coupling blocks are ``C_{j-1}^T`` / ``B_{j+1}^T``).

This is the TPU-native replacement for a distributed sparse direct
solver (the reference outsources all linear algebra to single-process
PETSc and never runs parallel — reference
``src/femvf/models/fsi.py:38-39``).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .bsb import BSBPlan
from .btd import btd_superblocks, _store_cast as _offdiag_cast

__all__ = ["SPIKEFactors", "spike_factor", "spike_solve", "spike_solve_t"]


class SPIKEFactors(NamedTuple):
    """Per-slab Thomas factors + spikes + reduced-system factors.

    Leading axis ``S`` is the slab (partition) index; ``m`` super-rows
    per slab of block size ``Bt``.  The slab-local Thomas factors are
    stored in PRODUCT form ``P = Sinv L``, ``Q = Sinv U`` (same
    restructuring as ``solvers.btd.BTDFactors``: one matvec per
    sequential row in each sweep, the ``Sinv`` application hoisted into
    a batched MXU matmul).  ``red`` / ``red_t`` are the ``(Sinv_r, L_r,
    U_r)`` Thomas factors of the (2Bt-block) reduced interface system
    for ``A`` and ``A^T``.
    """

    Sinv: jnp.ndarray  # (S, m, Bt, Bt) local Schur inverses
    P: jnp.ndarray  # (S, m, Bt, Bt) products Sinv L (P[:, 0] = 0)
    Q: jnp.ndarray  # (S, m, Bt, Bt) products Sinv U (Q[:, -1] = 0)
    V: jnp.ndarray  # (S, m, Bt, Bt) right spikes (V[S-1] = 0)
    W: jnp.ndarray  # (S, m, Bt, Bt) left spikes (W[0] = 0)
    red: tuple  # reduced Thomas factors (Sinv_r, L_r, U_r), (S, 2Bt, 2Bt)
    Vh: Optional[jnp.ndarray]  # transposed-system spikes (or None)
    Wh: Optional[jnp.ndarray]
    red_t: Optional[tuple]
    d: jnp.ndarray  # (ndof_pad,) Jacobi equilibration scale


def _mixed_target(x_dtype):
    """Result dtype for a mixed-precision product keyed on the vector."""
    return jnp.float32 if x_dtype == jnp.bfloat16 else x_dtype


def _mixed_einsum(subs, A, x):
    """Factor-vector einsum in the factor dtype, f32 accumulation.

    Handles bf16-stored factors (half-bandwidth streaming) AND the TPU
    mixed-precision path (f32 factors under f64 vectors — no f64 MXU;
    see ``btd._mv``): the product runs in ``A.dtype``, the result is
    cast back to the vector dtype.  The single site for the solver
    family's precision policy."""
    if A.dtype.itemsize == 1:
        # fp8-stored factors: upconvert the BLOCK in-register to bf16;
        # the vector is never quantized below bf16 (see btd._dot)
        out = jnp.einsum(
            subs, A.astype(jnp.bfloat16), x.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        return out.astype(_mixed_target(x.dtype))
    if A.dtype != x.dtype or A.dtype == jnp.bfloat16:
        # Factors are never wider than the vectors in this family
        # (bf16/f32 factors under f32/f64 vectors); a wider-factor call
        # would silently lose the extra factor precision to the f32
        # accumulation below — refuse it rather than mis-advertise.
        assert jnp.finfo(A.dtype).bits <= jnp.finfo(x.dtype).bits, (
            f"factor dtype {A.dtype} wider than vector dtype {x.dtype}:"
            " the mixed product accumulates in f32 and would drop the"
            " extra factor precision"
        )
        out = jnp.einsum(
            subs, A, x.astype(A.dtype),
            preferred_element_type=jnp.float32,
        )
        return out.astype(_mixed_target(x.dtype))
    return jnp.einsum(subs, A, x)


def _bmm(A, X):
    return _mixed_einsum("...ij,...jk->...ik", A, X)


def _bmv(A, x):
    return _mixed_einsum("...ij,...j->...i", A, x)


def _bmv_t(A, x):
    return _mixed_einsum("...ji,...j->...i", A, x)


def _scan_m(f, xs_tuple, init, reverse=False):
    """Scan over the slab-interior axis (axis 1) of (S, m, ...) arrays."""
    xs = tuple(jnp.moveaxis(x, 1, 0) for x in xs_tuple)
    _, ys = jax.lax.scan(f, init, xs, reverse=reverse)
    return jax.tree_util.tree_map(lambda y: jnp.moveaxis(y, 0, 1), ys)


def _local_factor(D, L, U):
    """Batched block-Thomas factorization of each slab's interior.

    ``D, L, U``: (S, m, Bt, Bt) with the inter-slab couplings already
    stripped (``L[:, 0] = U[:, -1] = 0``).  Returns the PRODUCT-form
    factors ``(Sinv, P, Q)`` with ``P = Sinv L``, ``Q = Sinv U`` (see
    ``SPIKEFactors``); the scan is length ``m`` with all slabs advancing
    in lockstep (batched LU + matmuls).  ``Q`` falls out of the
    factorization recurrence (the body already computes ``Sinv_{i-1}
    U_{i-1}``); ``P`` is one batched matmul.
    """
    S, m, Bt, _ = D.shape
    eye = jnp.broadcast_to(jnp.eye(Bt, dtype=D.dtype), (S, Bt, Bt))
    U_prev = jnp.concatenate(
        [jnp.zeros_like(U[:, :1]), U[:, :-1]], axis=1
    )

    def body(Sinv_prev, xs):
        D_i, L_i, U_im1 = xs  # (S, Bt, Bt) each
        SU = _bmm(Sinv_prev, U_im1)  # = Q_{i-1}
        Sm = D_i - _bmm(L_i, SU)
        Sinv = jnp.linalg.solve(Sm, eye)
        return Sinv, (Sinv, SU)

    # derive the init from the data so it carries the same varying-axes
    # type under shard_map (a fresh constant would be replicated-typed)
    Sinv, SU = _scan_m(body, (D, L, U_prev), 0.0 * D[:, 0])
    Q = jnp.concatenate(
        [SU[:, 1:], _bmm(Sinv[:, -1], U[:, -1])[:, None]], axis=1
    )
    P = _bmm(Sinv, L)
    return Sinv, P, Q


def _local_solve(Sinv, P, Q, R):
    """Per-slab product-form Thomas solve, batched over slabs.

    ``R``: (S, m, Bt) vector or (S, m, Bt, k) matrix right-hand sides.
    ``g = Sinv R`` is batched over the whole slab (outside the scans);
    the sweeps are one matvec per sequential row (see ``SPIKEFactors``).
    """
    mv = _bmv if R.ndim == 3 else _bmm
    g = mv(Sinv, R)
    # data-derived init over the UNION of operand varying axes: keeps
    # the shard_map varying-axes type (jax 0.9 VMA)
    zero = 0.0 * (g[:, 0] + mv(P[:, 0], g[:, 0]))

    def fwd(y_prev, xs):
        P_i, g_i = xs
        y = g_i - mv(P_i, y_prev)
        return y, y

    y = _scan_m(fwd, (P, g), zero)
    zero_b = 0.0 * (y[:, 0] + mv(Q[:, 0], y[:, 0]))

    def bwd(x_next, xs):
        Q_i, y_i = xs
        x = y_i - mv(Q_i, x_next)
        return x, x

    return _scan_m(bwd, (Q, y), zero_b, reverse=True)


def _local_solve_t(Sinv, P, Q, R):
    """Per-slab TRANSPOSED product-form solve ``A_j^T x = r``.

    Same two-sweep identity as ``solvers.btd.btd_solve_t``: ``z_i = r_i
    - Q_{i-1}^T z_{i-1}``, then with ``w_i = S_i^T x_i`` the second
    sweep is ``w_i = z_i - P_{i+1}^T w_{i+1}`` and ``x = Sinv^T w``
    hoists out as one batched matmul."""
    mvt = _bmv_t if R.ndim == 3 else (
        lambda A, X: _bmm(jnp.swapaxes(A, -1, -2), X)
    )
    zero = 0.0 * (R[:, 0] + mvt(Q[:, 0], R[:, 0]))

    Q_prev = jnp.concatenate(
        [jnp.zeros_like(Q[:, :1]), Q[:, :-1]], axis=1
    )

    def fwd(z_prev, xs):
        Q_im1, r_i = xs
        z = r_i - mvt(Q_im1, z_prev)
        return z, z

    z = _scan_m(fwd, (Q_prev, R), zero)

    P_next = jnp.concatenate(
        [P[:, 1:], jnp.zeros_like(P[:, :1])], axis=1
    )
    zero_b = 0.0 * (z[:, 0] + mvt(P[:, 0], z[:, 0]))

    def bwd(w_next, xs):
        P_ip1, z_i = xs
        w = z_i - mvt(P_ip1, w_next)
        return w, w

    w = _scan_m(bwd, (P_next, z), zero_b, reverse=True)
    return mvt(Sinv, w)


def _reduced_blocks(V, W):
    """Build the (2Bt-block) reduced interface coupling from spike
    tops/bottoms: row j is ``z_j + L_r[j] z_{j-1} + U_r[j] z_{j+1} =
    g_j`` with ``z_j = (x_j^t, x_j^b)``."""
    S, m, Bt, _ = V.shape
    Z = jnp.zeros((S, Bt, Bt), V.dtype)
    eye2 = jnp.broadcast_to(
        jnp.eye(2 * Bt, dtype=V.dtype), (S, 2 * Bt, 2 * Bt)
    )
    row = lambda a, b: jnp.concatenate([a, b], axis=-1)
    blk = lambda tl, tr, bl, br: jnp.concatenate(
        [row(tl, tr), row(bl, br)], axis=-2
    )
    f32 = lambda a: (
        a.astype(jnp.float32) if a.dtype.itemsize <= 2 else a
    )
    L_r = blk(Z, f32(W[:, 0]), Z, f32(W[:, m - 1]))
    U_r = blk(f32(V[:, 0]), Z, f32(V[:, m - 1]), Z)
    return eye2, L_r, U_r


def _seq_thomas_factor(D, L, U):
    """Plain (unbatched) block-Thomas factorization over axis 0 — used
    for the tiny reduced system."""
    n, Bt, _ = D.shape
    eye = jnp.eye(Bt, dtype=D.dtype)
    U_prev = jnp.concatenate([jnp.zeros_like(U[:1]), U[:-1]], axis=0)

    def body(Sinv_prev, xs):
        D_i, L_i, U_im1 = xs
        Sm = D_i - L_i @ (Sinv_prev @ U_im1)
        Sinv = jnp.linalg.solve(Sm, eye)
        return Sinv, Sinv

    # carry init takes the UNION of the operands' varying axes: under a
    # DP x TP mesh the reduced D is a constant identity (unvarying)
    # while L/U carry the dp axis — 0.0*D[0] alone would type-mismatch
    # the scan carry (jax 0.9 shard_map VMA)
    init = 0.0 * (D[0] + L[0] + U_prev[0])
    _, Sinv = jax.lax.scan(body, init, (D, L, U_prev))
    return Sinv


def _seq_thomas_solve(Sinv, L, U, r):
    n, Bt, _ = Sinv.shape
    # data-derived inits over the UNION of operand varying axes (see
    # _seq_thomas_factor): r alone may be missing an axis L/U/Sinv carry
    zero = 0.0 * (r[0] + (Sinv[0] + L[0]) @ r[0])

    def fwd(y_prev, xs):
        Sinv_i, L_i, r_i = xs
        y = Sinv_i @ (r_i - L_i @ y_prev)
        return y, y

    _, y = jax.lax.scan(fwd, zero, (Sinv, L, r))
    zero_b = 0.0 * (y[0] + (Sinv[0] + U[0]) @ y[0])

    def bwd(x_next, xs):
        Sinv_i, U_i, y_i = xs
        x = y_i - Sinv_i @ (U_i @ x_next)
        return x, x

    _, x = jax.lax.scan(bwd, zero_b, (Sinv, U, y), reverse=True)
    return x


def spike_superblocks(plan: BSBPlan, blocks: jnp.ndarray, n_parts: int):
    """Slab-partitioned (D, L, U, B, C, d) from the banded Jacobian.

    Pads the super-row count to a multiple of ``n_parts`` with identity
    rows, reshapes to (S, m, Bt, Bt) and splits off the inter-slab
    coupling blocks ``B_j = L[:, 0]`` (to the previous slab) and
    ``C_j = U[:, m-1]`` (to the next slab).
    """
    D, L, U, d = btd_superblocks(plan, blocks)
    n_sup, Bt, _ = D.shape
    S = int(n_parts)
    m = -(-n_sup // S)
    pad = S * m - n_sup
    if pad:
        eye_pad = jnp.broadcast_to(
            jnp.eye(Bt, dtype=D.dtype), (pad, Bt, Bt)
        )
        D = jnp.concatenate([D, eye_pad], axis=0)
        L = jnp.concatenate([L, jnp.zeros_like(eye_pad)], axis=0)
        U = jnp.concatenate([U, jnp.zeros_like(eye_pad)], axis=0)
    D = D.reshape(S, m, Bt, Bt)
    L = L.reshape(S, m, Bt, Bt)
    U = U.reshape(S, m, Bt, Bt)
    B = L[:, 0]  # (S, Bt, Bt); B[0] = 0 structurally
    C = U[:, m - 1]  # (S, Bt, Bt); C[S-1] = 0 structurally
    L = L.at[:, 0].set(0.0)
    U = U.at[:, m - 1].set(0.0)
    return D, L, U, B, C, d


def _spike_from_locals(
    Sinv, P, Q, B, C, with_transpose=True, C_prev=None, B_next=None
):
    """Spikes + reduced factors from already-computed local factors.

    Shared by the single-chip (vmapped) and multi-chip
    (``parallel.spike_shard``) drivers.  ``C_prev``/``B_next`` (the
    neighbor slabs' coupling blocks, needed only for the transposed
    spikes) default to in-array shifts of ``C``/``B``; the sharded
    driver passes them explicitly (``ppermute`` from the neighbor
    device).
    """
    S, m, Bt, _ = Sinv.shape
    # right spikes: A_j^{-1} (e_last ⊗ C_j); left: A_j^{-1} (e_0 ⊗ B_j)
    R_V = jnp.zeros((S, m, Bt, Bt), Sinv.dtype).at[:, m - 1].set(C)
    R_W = jnp.zeros((S, m, Bt, Bt), Sinv.dtype).at[:, 0].set(B)
    V = _local_solve(Sinv, P, Q, R_V)
    W = _local_solve(Sinv, P, Q, R_W)

    Vh = Wh = None
    if with_transpose:
        # A^T slab couplings: to prev slab C_{j-1}^T, to next B_{j+1}^T
        if C_prev is None:
            C_prev = jnp.concatenate(
                [jnp.zeros_like(C[:1]), C[:-1]], axis=0
            )
        if B_next is None:
            B_next = jnp.concatenate(
                [B[1:], jnp.zeros_like(B[:1])], axis=0
            )
        tr = lambda A: jnp.swapaxes(A, -1, -2)
        R_Vh = jnp.zeros_like(R_V).at[:, m - 1].set(tr(B_next))
        R_Wh = jnp.zeros_like(R_W).at[:, 0].set(tr(C_prev))
        Vh = _local_solve_t(Sinv, P, Q, R_Vh)
        Wh = _local_solve_t(Sinv, P, Q, R_Wh)
    return V, W, Vh, Wh


def _reduced_factor(V, W):
    D_r, L_r, U_r = _reduced_blocks(V, W)
    Sinv_r = _seq_thomas_factor(D_r, L_r, U_r)
    return (Sinv_r, L_r, U_r)


def spike_factor(
    plan: BSBPlan,
    blocks: jnp.ndarray,
    n_parts: int = 8,
    store_dtype=None,
    with_transpose: bool = True,
    factor_dtype=None,
    offdiag_dtype=None,
) -> SPIKEFactors:
    """Factor the banded Jacobian with ``n_parts`` SPIKE slabs.

    ``store_dtype='bfloat16'`` stores all large factor arrays
    half-width (same bandwidth-bound argument as
    ``solvers.btd.btd_factor``).  ``offdiag_dtype`` (default:
    ``store_dtype``) separately controls the sweep/correction arrays
    (``P/Q/V/W/Vh/Wh``) — quantizing them below ``Sinv`` costs almost
    no solve accuracy (see ``btd.btd_factor``).
    ``with_transpose=False`` skips the transposed spikes (forward-only
    runs).  ``factor_dtype='float32'`` casts the Jacobian *before*
    factorizing — the TPU mixed-precision path (f64 state/residuals,
    f32 factors; see ``btd.btd_factor``).
    """
    if factor_dtype is not None:
        blocks = blocks.astype(factor_dtype)
    D, L, U, B, C, d = spike_superblocks(plan, blocks, n_parts)
    Sinv, Pf, Qf = _local_factor(D, L, U)
    V, W, Vh, Wh = _spike_from_locals(
        Sinv, Pf, Qf, B, C, with_transpose=with_transpose
    )
    red = _reduced_factor(V, W)
    red_t = None
    if with_transpose:
        red_t = _reduced_factor(Vh, Wh)

    od = offdiag_dtype if offdiag_dtype is not None else store_dtype
    if store_dtype is not None:
        Sinv = Sinv.astype(store_dtype)
    if od is not None:
        cast = lambda a: None if a is None else _offdiag_cast(a, od)
        Pf, Qf, V, W = map(cast, (Pf, Qf, V, W))
        Vh, Wh = cast(Vh), cast(Wh)
        # the reduced factors are tiny — keep them full precision
    return SPIKEFactors(
        Sinv=Sinv, P=Pf, Q=Qf, V=V, W=W, red=red, Vh=Vh, Wh=Wh,
        red_t=red_t, d=d,
    )


def _interface_correct(g, red, V, W):
    """Reduced interface solve + spike correction (shared fwd/transposed
    logic — the caller passes the matching spikes/reduced factors)."""
    S, m, Bt = g.shape
    rhs = jnp.concatenate([g[:, 0], g[:, m - 1]], axis=-1)  # (S, 2Bt)
    Sinv_r, L_r, U_r = red
    z = _seq_thomas_solve(Sinv_r, L_r, U_r, rhs)  # (S, 2Bt)
    xt, xb = z[:, :Bt], z[:, Bt:]
    xt_next = jnp.concatenate([xt[1:], jnp.zeros_like(xt[:1])], axis=0)
    xb_prev = jnp.concatenate([jnp.zeros_like(xb[:1]), xb[:-1]], axis=0)

    def spike_mv(A, x):  # (S, m, Bt, Bt) @ (S, Bt) -> (S, m, Bt)
        return _mixed_einsum("smij,sj->smi", A, x)

    return g - spike_mv(V, xt_next) - spike_mv(W, xb_prev)


def _vec_to_slabs(factors: SPIKEFactors, r: jnp.ndarray):
    S, m, Bt, _ = factors.Sinv.shape
    d = factors.d
    npad = S * m * Bt - r.shape[0]
    rb = jnp.pad(r / d[: r.shape[0]], (0, npad)).reshape(S, m, Bt)
    return rb


def _slabs_to_vec(factors: SPIKEFactors, x: jnp.ndarray, n: int):
    return x.reshape(-1)[:n] / factors.d[:n]


def spike_solve(plan: BSBPlan, factors: SPIKEFactors, r: jnp.ndarray):
    """Direct solve ``A x = r`` with the SPIKE factors."""
    rb = _vec_to_slabs(factors, r)
    g = _local_solve(factors.Sinv, factors.P, factors.Q, rb)
    x = _interface_correct(g, factors.red, factors.V, factors.W)
    return _slabs_to_vec(factors, x, r.shape[0])


def spike_solve_t(plan: BSBPlan, factors: SPIKEFactors, r: jnp.ndarray):
    """Direct TRANSPOSED solve ``A^T x = r`` with the same factors."""
    assert factors.Vh is not None, (
        "spike_factor(with_transpose=True) required for transposed solves"
    )
    rb = _vec_to_slabs(factors, r)
    g = _local_solve_t(factors.Sinv, factors.P, factors.Q, rb)
    x = _interface_correct(g, factors.red_t, factors.Vh, factors.Wh)
    return _slabs_to_vec(factors, x, r.shape[0])
