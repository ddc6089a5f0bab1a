"""
Transient-model OO derivative API (reference: ``tests/models/test_transient.py``
+ the Newmark-structured solve of ``transient.py:470-513``).
"""

import numpy as np
import pytest

from vf_fem_tpu.misc.taylor import taylor_convergence

from fixture_models import make_unit_solid_model


@pytest.fixture(scope="module")
def model():
    model = make_unit_solid_model()
    rng = np.random.default_rng(0)
    model.dt = 1e-4
    state0 = model.state0.copy()
    state0[:] = 1e-4 * rng.standard_normal(state0.size)
    model.set_ini_state(state0)
    state1 = model.state1.copy()
    state1[:] = 1e-4 * rng.standard_normal(state1.size)
    model.set_fin_state(state1)
    control = model.control.copy()
    control[:] = 500.0 * rng.random(control.size)
    model.set_control(control)
    return model


def _res_mono(model):
    return model.assem_res().to_mono_ndarray()


def test_dres_dstate1_taylor(model):
    rng = np.random.default_rng(1)
    x0 = model.state1.copy()
    dx = 1e-5 * rng.standard_normal(x0.size)

    def f(x_flat):
        x = model.state1.copy()
        x[:] = x_flat
        model.set_fin_state(x)
        return _res_mono(model)

    def jac(x_flat, d):
        x = model.state1.copy()
        x[:] = x_flat
        model.set_fin_state(x)
        A = model.assem_dres_dstate1().to_mono_ndarray()
        return A @ d

    taylor_convergence(x0.to_mono_ndarray(), dx, f, jac)


def test_dres_dstate0_taylor(model):
    rng = np.random.default_rng(2)
    x0 = model.state0.copy()
    dx = 1e-5 * rng.standard_normal(x0.size)

    def f(x_flat):
        x = model.state0.copy()
        x[:] = x_flat
        model.set_ini_state(x)
        return _res_mono(model)

    def jac(x_flat, d):
        x = model.state0.copy()
        x[:] = x_flat
        model.set_ini_state(x)
        A = model.assem_dres_dstate0().to_mono_ndarray()
        return A @ d

    taylor_convergence(x0.to_mono_ndarray(), dx, f, jac)


def test_dres_dcontrol_taylor(model):
    rng = np.random.default_rng(3)
    g0 = model.control.copy()
    dg = rng.standard_normal(g0.size)

    def f(g_flat):
        g = model.control.copy()
        g[:] = g_flat
        model.set_control(g)
        return _res_mono(model)

    def jac(g_flat, d):
        g = model.control.copy()
        g[:] = g_flat
        model.set_control(g)
        A = model.assem_dres_dcontrol().to_mono_ndarray()
        return A @ d

    taylor_convergence(g0.to_mono_ndarray(), dg, f, jac)


def test_solve_dres_dstate1_roundtrip(model):
    """solve_dres_dstate1 inverts the block Jacobian action; the adjoint
    solve satisfies <x, A^T y>... duality."""
    rng = np.random.default_rng(4)
    A = model.assem_dres_dstate1()
    b = model.state1.copy()
    b[:] = rng.standard_normal(b.size)
    x = model.solve_dres_dstate1(A, model.state1.copy(), b)
    # A @ x == b
    Ax = A.mult_vec(x)
    # tolerance reflects the Newmark Jacobian's conditioning (~1e8 diag
    # spread): the equilibrated LU delivers ~1e-7 relative roundtrip
    np.testing.assert_allclose(
        Ax.to_mono_ndarray(), b.to_mono_ndarray(), rtol=1e-6, atol=1e-8
    )
    # adjoint duality: <b2, x> == <x2, b> with x2 = A^{-T} b2
    b2 = model.state1.copy()
    b2[:] = rng.standard_normal(b2.size)
    x2 = model.solve_dres_dstate1_adj(A, model.state1.copy(), b2)
    lhs = float(np.dot(b2.to_mono_ndarray(), x.to_mono_ndarray()))
    rhs = float(np.dot(x2.to_mono_ndarray(), b.to_mono_ndarray()))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-9)


def test_cg_newton_matches_dense(model):
    """Matrix-free Newton-Krylov (EBE + BiCGStab) reproduces the dense-LU
    solve (SURVEY 2.9: PETSc -> TPU-resident preconditioned Krylov)."""
    model.dt = 1e-4
    state0 = model.state0.copy()
    state1_dense, info_d = model.solve_state1(state0)
    state1_cg, info_c = model.solve_state1(
        state0, options={"linear_solver": "cg", "krylov_tolerance": 1e-12}
    )
    assert info_c["abs_err"] < 1e-6
    np.testing.assert_allclose(
        state1_cg.to_mono_ndarray(),
        state1_dense.to_mono_ndarray(),
        rtol=1e-6,
        atol=1e-10,
    )


def test_fixed_iteration_newton_matches_adaptive(model):
    """Statically unrolled Newton ('fixed_iterations') reproduces the
    adaptive while_loop solve (used for latency-bound TPU steps)."""
    model.dt = 1e-4
    state0 = model.state0.copy()
    s_adapt, info_a = model.solve_state1(state0)
    s_fixed, info_f = model.solve_state1(
        state0, options={"fixed_iterations": 4}
    )
    np.testing.assert_allclose(
        s_fixed.to_mono_ndarray(), s_adapt.to_mono_ndarray(),
        rtol=1e-8, atol=1e-12,
    )
    assert info_f["num_iter"] == 4


def test_fixed_tail_free_newton_bit_identical_iterates():
    """'fixed_tail_residual=False' skips the trailing telemetry residual
    AND the certified mode's best-iterate select (which needs it): while
    the chord contracts STRICTLY (the production regime — bench gates it
    on trajectory error), the committed state is BIT-identical to the
    certified fixed-iteration solve, and the reported error is the
    penultimate iterate's (an upper bound under contraction).

    Solver-level check on a synthetic strictly-contracting chord — a
    model step bottoms out at the rounding noise floor within 3 iters,
    where best-vs-final legitimately differ by noise (see the model-
    level check below)."""
    import jax.numpy as jnp
    from vf_fem_tpu.solvers.newton import newton_solve

    rng = np.random.default_rng(7)
    n = 40
    K = np.diag(2.0 + rng.random(n)) + 0.1 * rng.standard_normal((n, n))
    b = rng.standard_normal(n)
    Kinv = np.linalg.inv(K)

    def assem_res(x):
        return jnp.asarray(K) @ x + 0.05 * x**3 - jnp.asarray(b)

    def solve_jac(x, r):
        return jnp.asarray(Kinv) @ r  # frozen chord: contraction ~0.05

    x0 = jnp.zeros(n, dtype=jnp.float64)
    x_tail, info_t = newton_solve(
        x0, assem_res, solve_jac, params={"fixed_iterations": 3}
    )
    x_free, info_f = newton_solve(
        x0, assem_res, solve_jac,
        params={"fixed_iterations": 3, "fixed_tail_residual": False},
    )
    np.testing.assert_array_equal(np.asarray(x_free), np.asarray(x_tail))
    assert info_f.num_iter == 3
    # penultimate residual >= final residual while the chord contracts
    assert float(info_f.abs_err) >= float(info_t.abs_err)
    assert np.isfinite(float(info_f.abs_err))


def test_fixed_tail_free_model_step_matches_to_noise_floor(model):
    """Model-level: the tail-free committed step agrees with the
    certified one to the chord's rounding noise floor (the two can pick
    different iterates once the residual bottoms out)."""
    model.dt = 1e-4
    state0 = model.state0.copy()
    s_tail, _ = model.solve_state1(state0, options={"fixed_iterations": 3})
    s_free, info_f = model.solve_state1(
        state0,
        options={"fixed_iterations": 3, "fixed_tail_residual": False},
    )
    np.testing.assert_allclose(
        s_free.to_mono_ndarray(), s_tail.to_mono_ndarray(),
        rtol=1e-6, atol=1e-9,
    )
    assert info_f["num_iter"] == 3
    assert np.isfinite(info_f["abs_err"])
