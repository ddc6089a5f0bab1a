"""
SPIKE-partitioned block-tridiagonal direct solver tests: correctness vs
dense, transposed solves, bf16 storage, and the stale FSI trajectory
through ``linear_solver='spike'``.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vf_fem_tpu.load import load_fsi_model, load_solid_model
from vf_fem_tpu.mesh import vocal_fold_mesh
from vf_fem_tpu.mesh.reorder import rcm_mesh
from vf_fem_tpu.residuals import fluid as flr, solid as slr
from vf_fem_tpu.solvers import bsb, spike


@pytest.fixture(scope="module")
def solid_setup():
    mesh = rcm_mesh(vocal_fold_mesh(14, 7))
    model = load_solid_model(mesh, slr.KelvinVoigt)
    prop = model.prop
    prop["emod"][:] = 5e4
    prop["nu"][:] = 0.45
    prop["rho"][:] = 1.0
    prop["eta"][:] = 3.0
    prop["ycontact"][:] = 10.0
    prop["kcontact"][:] = 1e8
    model.set_prop(prop)
    sprop = {k: jnp.asarray(v) for k, v in model.prop.sub_items()}
    s0 = {k: jnp.zeros(model.ndof) for k in ("u", "v", "a")}
    ctrl = {"p1": jnp.full(model.nvert, 800.0)}
    op = model.jac_u_ebe(s0["u"], s0, ctrl, sprop, 1e-4)
    plan = model._get_bsb_plan()
    blocks = bsb.bsb_fill(plan, [op.J_cells, op.J_facets])
    A = np.asarray(model.jac_u_dense(s0["u"], s0, ctrl, sprop, 1e-4))
    return plan, blocks, A


@pytest.mark.parametrize("n_parts", [1, 2, 3, 8])
def test_spike_solve_matches_dense(solid_setup, n_parts):
    plan, blocks, A = solid_setup
    fac = spike.spike_factor(plan, blocks, n_parts=n_parts)
    rng = np.random.default_rng(0)
    r = jnp.asarray(rng.standard_normal(A.shape[0]))
    x = np.asarray(spike.spike_solve(plan, fac, r))
    xr = np.linalg.solve(A, np.asarray(r))
    np.testing.assert_allclose(x, xr, rtol=1e-8, atol=1e-10)

    xt = np.asarray(spike.spike_solve_t(plan, fac, r))
    xt_ref = np.linalg.solve(A.T, np.asarray(r))
    np.testing.assert_allclose(xt, xt_ref, rtol=1e-8, atol=1e-10)


def test_spike_bf16_storage(solid_setup):
    plan, blocks, A = solid_setup
    rng = np.random.default_rng(1)
    r = jnp.asarray(rng.standard_normal(A.shape[0]))
    xr = np.linalg.solve(A, np.asarray(r))
    fac16 = spike.spike_factor(
        plan, blocks, n_parts=4, store_dtype="bfloat16"
    )
    x16 = np.asarray(spike.spike_solve(plan, fac16, r))
    rel = np.linalg.norm(x16 - xr) / np.linalg.norm(xr)
    assert rel < 5e-2
    # one refinement step contracts the error (chord-Newton use pattern)
    resid = np.asarray(r) - A @ x16
    x16b = x16 + np.asarray(
        spike.spike_solve(plan, fac16, jnp.asarray(resid))
    )
    rel1 = np.linalg.norm(x16b - xr) / np.linalg.norm(xr)
    assert rel1 < 0.3 * rel


def test_spike_fsi_trajectory():
    """``linear_solver='spike'`` reproduces the exact-Jacobian FSI
    trajectory through the stale integrator (incl. the refined stale
    adjoint using ``spike_solve_t``)."""
    from vf_fem_tpu import forward

    mesh = rcm_mesh(vocal_fold_mesh(10, 5))
    ymax = mesh.coords[:, 1].max()
    model = load_fsi_model(
        mesh, slr.KelvinVoigt, flr.BernoulliSmoothMinSep, coupling="explicit"
    )
    prop = model.prop
    prop["emod"][:] = 5e4
    prop["rho"][:] = 1.0
    prop["eta"][:] = 3.0
    prop["nu"][:] = 0.45
    prop["ycontact"][:] = ymax + 0.05
    prop["kcontact"][:] = 1e8
    prop["rho_air"][:] = 1.1225e-3
    prop["zeta_min"][:] = 1e-3
    prop["zeta_sep"][:] = 1e-3
    prop["ymid"][:] = ymax + 0.01
    model.set_prop(prop)
    model.control["psub"][:] = 8000.0
    model.set_control(model.control)

    state0 = {k: np.zeros_like(np.asarray(v))
              for k, v in model.state0.sub_items()}
    cs = forward._stack_controls(model, [model.control])
    pd = model.prop_to_dict(model.prop)
    times = np.asarray(5e-5 * np.arange(13))
    fd, td, _ = forward.integrate_pure(
        model, state0, cs, pd, times, {"jacobian_refresh_steps": 1}
    )
    fs, ts, _ = forward.integrate_pure(
        model, state0, cs, pd, times,
        {"linear_solver": "spike", "spike_partitions": 4,
         "jacobian_refresh_steps": 6},
    )
    np.testing.assert_allclose(
        np.asarray(ts["u"]), np.asarray(td["u"]), rtol=1e-8, atol=1e-12
    )

    # gradient through the spike stale path (refined adjoint w/ the
    # transposed SPIKE solve)
    def loss(p):
        fin, _, _ = forward.integrate_pure(
            model, state0, cs, p, np.asarray(5e-5 * np.arange(7)),
            {"linear_solver": "spike", "spike_partitions": 4,
             "jacobian_refresh_steps": 3},
            use_remat=True,
        )
        return jnp.sum(fin["u"] ** 2) * 1e4

    def loss_dense(p):
        fin, _, _ = forward.integrate_pure(
            model, state0, cs, p, np.asarray(5e-5 * np.arange(7)),
            {"jacobian_refresh_steps": 1}, use_remat=True,
        )
        return jnp.sum(fin["u"] ** 2) * 1e4

    g = jax.grad(loss)(pd)
    g_ref = jax.grad(loss_dense)(pd)
    np.testing.assert_allclose(
        np.asarray(g["emod"]), np.asarray(g_ref["emod"]),
        rtol=1e-6, atol=1e-30,
    )
