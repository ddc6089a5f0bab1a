"""Pallas kernel correctness (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from vf_fem_tpu.equations import newmark
from vf_fem_tpu.ops import ebe_matvec, newmark_update


def test_ebe_matvec_matches_einsum(rng):
    ne, nld = 37, 6
    J = rng.standard_normal((ne, nld, nld))
    x = rng.standard_normal((ne, nld))
    y = np.asarray(ebe_matvec(jnp.asarray(J), jnp.asarray(x), tile=16))
    y_ref = np.einsum("eij,ej->ei", J, x)
    np.testing.assert_allclose(y, y_ref, rtol=1e-12, atol=1e-12)


def test_newmark_update_matches_formulas(rng):
    n = 123
    u1, u0, v0, a0 = (rng.standard_normal(n) for _ in range(4))
    dt = 1e-4
    v1, a1 = newmark_update(
        jnp.asarray(u1), jnp.asarray(u0), jnp.asarray(v0), jnp.asarray(a0), dt
    )
    np.testing.assert_allclose(
        np.asarray(v1), newmark.newmark_v(u1, u0, v0, a0, dt), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(a1), newmark.newmark_a(u1, u0, v0, a0, dt), rtol=1e-12
    )


def test_ebe_operator_matvec(rng):
    """Pallas EBE operator application matches the dense matrix."""
    from vf_fem_tpu.fem.assembly import EBEOperator
    from vf_fem_tpu.ops import ebe_operator_matvec

    ne, nld, ndof = 20, 6, 30
    J = rng.standard_normal((ne, nld, nld))
    dofs = rng.integers(0, ndof, size=(ne, nld))
    bc = jnp.asarray(np.array([0, 5], dtype=np.int32))
    op = EBEOperator(
        J_cells=jnp.asarray(J),
        cell_dofs=jnp.asarray(dofs),
        J_facets=None,
        facet_dofs=None,
        ndof=ndof,
        bc_dofs=bc,
    )
    x = rng.standard_normal(ndof)
    y_pallas = np.asarray(ebe_operator_matvec(op, jnp.asarray(x), tile=8))
    y_ref = np.asarray(op.matvec(jnp.asarray(x)))
    np.testing.assert_allclose(y_pallas, y_ref, rtol=1e-12, atol=1e-12)


def test_bsb_matvec_pallas_matches_xla(rng):
    """The Pallas block-banded matvec kernel reproduces the XLA path
    (interpret mode here; compiled and benchmarked on TPU)."""
    from vf_fem_tpu.ops.pallas_kernels import bsb_matvec_pallas
    from vf_fem_tpu.solvers import bsb

    # small synthetic banded system: 3 block rows, 1 block half-band
    b, nblk, h = 128, 3, 1
    nb = 2 * h + 1
    ndof = nblk * b - 17  # ragged tail
    blocks = jnp.asarray(rng.standard_normal((nblk, nb, b, b)))
    plan = bsb.BSBPlan(
        ndof=ndof, b=b, nblk=nblk, nb=nb, h=h,
        tgt_idx=np.zeros(1, np.int32), src_keep=np.ones(1, bool),
        bc_dofs=np.zeros(0, np.int32), diag_ones=np.zeros(0, np.int32),
    )
    x = jnp.asarray(rng.standard_normal(ndof))
    y_xla = np.asarray(bsb.bsb_matvec(plan, blocks, x))
    y_pl = np.asarray(bsb_matvec_pallas(plan, blocks, x, tile=8))
    np.testing.assert_allclose(y_pl, y_xla, rtol=1e-12, atol=1e-12)


def test_newton_masked_body_matches_plain():
    """The dp-lockstep masked Newton body (uniform_pred set) must
    produce bit-identical iterates, telemetry, and trip count to the
    plain body — an identity uniform_pred only changes which body is
    traced, never the result.  (Also pins the finite stagnation
    sentinel: an inf sentinel through the masked body's jnp.where is
    the TPU 0*inf=NaN hazard.)"""
    import jax
    from vf_fem_tpu.solvers.newton import newton_solve

    A = jnp.asarray(np.diag([3.0, 5.0, 7.0]))

    def assem_res(x):
        # mildly nonlinear residual with a known root
        return A @ x + 0.1 * x**3 - jnp.asarray([1.0, 2.0, 3.0])

    def solve_jac(x, r):
        return jnp.linalg.solve(A + 0.3 * jnp.diag(x**2), r)

    x0 = jnp.zeros(3)
    params = {"absolute_tolerance": 1e-12, "relative_tolerance": 1e-14}
    x_plain, info_plain = jax.jit(
        lambda x: newton_solve(x, assem_res, solve_jac, params)
    )(x0)
    x_masked, info_masked = jax.jit(
        lambda x: newton_solve(
            x, assem_res, solve_jac, params, uniform_pred=lambda p: p
        )
    )(x0)
    assert float(info_plain.abs_err) < 1e-12
    np.testing.assert_array_equal(np.asarray(x_plain), np.asarray(x_masked))
    assert int(info_plain.num_iter) == int(info_masked.num_iter)
    np.testing.assert_array_equal(
        np.asarray(info_plain.abs_err), np.asarray(info_masked.abs_err)
    )


def test_newton_masked_body_nan_iterate_not_committed_as_best():
    """An ACTIVE lockstep row whose update goes non-finite must score
    bigval (norm of the RAW residual) and mask itself off — NOT have its
    NaN entries zero-filled into a spuriously small norm and committed
    as the best iterate (round-4 review finding on body_masked)."""
    import jax
    from vf_fem_tpu.solvers.newton import newton_solve

    def assem_res(x):
        # residual goes NaN as soon as the iterate leaves the unit ball
        # (mimics a contact/area kernel blowing up off-manifold); at the
        # start point it is finite and LARGE so the solver wants to move
        bad = jnp.sum(x**2) > 1.0
        r = x - jnp.asarray([10.0, 10.0])
        return jnp.where(bad, jnp.nan, r)

    def solve_jac(x, r):
        return r  # identity Jacobian: first update jumps to (10, 10)

    x0 = jnp.asarray([0.1, 0.0])
    params = {"absolute_tolerance": 1e-12, "relative_tolerance": 1e-14}
    x, info = jax.jit(
        lambda x: newton_solve(
            x, assem_res, solve_jac, params, uniform_pred=lambda p: p
        )
    )(x0)
    # the returned best iterate is the (finite) start point, and the
    # reported error is its TRUE residual norm — not a zero-filled one
    assert np.all(np.isfinite(np.asarray(x)))
    np.testing.assert_array_equal(np.asarray(x), np.asarray(x0))
    expected = float(np.linalg.norm(np.asarray(assem_res(x0))))
    np.testing.assert_allclose(float(info.abs_err), expected, rtol=1e-12)
    assert int(info.num_iter) == 1  # one wasted (masked-off) iteration
