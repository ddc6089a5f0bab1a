"""
Log-depth PCR direct solver tests: correctness vs dense, transposed
solves, bf16 storage, and the stale FSI trajectory + adjoint through
``linear_solver='pcr'``.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vf_fem_tpu.load import load_fsi_model, load_solid_model
from vf_fem_tpu.mesh import vocal_fold_mesh
from vf_fem_tpu.mesh.reorder import rcm_mesh
from vf_fem_tpu.residuals import fluid as flr, solid as slr
from vf_fem_tpu.solvers import bsb, btd, pcr


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


def test_pcr_solve_matches_dense(solid_setup):
    plan, blocks, A = solid_setup
    fac = pcr.pcr_factor(plan, blocks)
    rng = np.random.default_rng(0)
    r = jnp.asarray(rng.standard_normal(A.shape[0]))
    x = np.asarray(pcr.pcr_solve(plan, fac, r))
    xr = np.linalg.solve(A, np.asarray(r))
    np.testing.assert_allclose(x, xr, rtol=1e-8, atol=1e-10)

    xt = np.asarray(pcr.pcr_solve_t(plan, fac, r))
    xt_ref = np.linalg.solve(A.T, np.asarray(r))
    np.testing.assert_allclose(xt, xt_ref, rtol=1e-8, atol=1e-10)


def test_pcr_matches_btd(solid_setup):
    """PCR and block-Thomas are the same direct solve of the same
    equilibrated super-block system — they must agree to rounding."""
    plan, blocks, A = solid_setup
    fac_p = pcr.pcr_factor(plan, blocks)
    fac_t = btd.btd_factor(plan, blocks)
    rng = np.random.default_rng(2)
    r = jnp.asarray(rng.standard_normal(A.shape[0]))
    xp = np.asarray(pcr.pcr_solve(plan, fac_p, r))
    xt = np.asarray(btd.btd_solve(plan, fac_t, r))
    np.testing.assert_allclose(xp, xt, rtol=1e-9, atol=1e-12)


def test_pcr_bf16_storage(solid_setup):
    plan, blocks, A = solid_setup
    rng = np.random.default_rng(1)
    r = jnp.asarray(rng.standard_normal(A.shape[0]))
    xr = np.linalg.solve(A, np.asarray(r))
    fac16 = pcr.pcr_factor(plan, blocks, store_dtype="bfloat16")
    x16 = np.asarray(pcr.pcr_solve(plan, fac16, r))
    rel = np.linalg.norm(x16 - xr) / np.linalg.norm(xr)
    assert rel < 5e-2
    # one refinement step contracts the error (chord-Newton use pattern)
    resid = np.asarray(r) - A @ x16
    x16b = x16 + np.asarray(pcr.pcr_solve(plan, fac16, jnp.asarray(resid)))
    rel1 = np.linalg.norm(x16b - xr) / np.linalg.norm(xr)
    assert rel1 < 0.3 * rel


def test_pcr_single_superblock():
    """n_sup == 1 degenerates to one dense block solve (0 PCR levels)."""
    from vf_fem_tpu.solvers.bsb import BSBPlan

    rng = np.random.default_rng(3)
    n = 100
    A = np.eye(n) * 10.0 + 0.5 * rng.standard_normal((n, n))
    plan = BSBPlan(
        ndof=n, b=128, nblk=1, nb=3, h=1,
        tgt_idx=np.zeros(0, np.int32), src_keep=np.zeros(0, bool),
        bc_dofs=np.zeros(0, np.int32), diag_ones=np.zeros(0, np.int32),
    )
    blocks = np.zeros((1, 3, 128, 128))
    blocks[0, 1, :n, :n] = A
    fac = pcr.pcr_factor(plan, jnp.asarray(blocks))
    assert fac.P.shape[0] == 0
    r = rng.standard_normal(n)
    x = np.asarray(pcr.pcr_solve(plan, fac, jnp.asarray(r)))
    np.testing.assert_allclose(x, np.linalg.solve(A, r), rtol=1e-9,
                               atol=1e-11)
    xt = np.asarray(pcr.pcr_solve_t(plan, fac, jnp.asarray(r)))
    np.testing.assert_allclose(xt, np.linalg.solve(A.T, r), rtol=1e-9,
                               atol=1e-11)


def test_pcr_fsi_trajectory():
    """``linear_solver='pcr'`` reproduces the exact-Jacobian FSI
    trajectory through the stale integrator (incl. the refined stale
    adjoint using ``pcr_solve_t``)."""
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
        {"linear_solver": "pcr", "jacobian_refresh_steps": 6},
    )
    np.testing.assert_allclose(
        np.asarray(ts["u"]), np.asarray(td["u"]), rtol=1e-8, atol=1e-12
    )

    # gradient through the pcr stale path (refined adjoint w/ pcr_solve_t)
    def loss(emod):
        p2 = dict(pd, emod=jnp.full_like(jnp.asarray(pd["emod"]), emod))
        fin, _, _ = forward.integrate_pure(
            model, state0, cs, p2, times,
            {"linear_solver": "pcr", "jacobian_refresh_steps": 6},
        )
        return jnp.sum(fin["u"] ** 2)

    g = jax.grad(loss)(5e4)
    h = 5e1
    fd_g = (loss(5e4 + h) - loss(5e4 - h)) / (2 * h)
    np.testing.assert_allclose(np.asarray(g), np.asarray(fd_g), rtol=2e-4)
