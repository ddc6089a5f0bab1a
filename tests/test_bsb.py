"""
Block-banded (BSB) operator + RCM renumbering tests.

The BSB format is the TPU-native large-mesh Jacobian (gather-free matvec;
see ``vf_fem_tpu/solvers/bsb.py``); correctness is checked against the
dense assembly on an RCM-renumbered mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vf_fem_tpu.load import load_fsi_model, load_solid_model
from vf_fem_tpu.mesh import vocal_fold_mesh
from vf_fem_tpu.mesh.reorder import rcm_mesh, rcm_permutation
from vf_fem_tpu.residuals import fluid as flr, solid as slr
from vf_fem_tpu.solvers import bsb


@pytest.fixture(scope="module")
def solid_model():
    mesh = rcm_mesh(vocal_fold_mesh(10, 5))
    model = load_solid_model(mesh, slr.KelvinVoigt)
    prop = model.prop
    prop["emod"][:] = 5e4
    prop["nu"][:] = 0.45
    prop["rho"][:] = 1.0
    prop["eta"][:] = 3.0
    prop["ycontact"][:] = 10.0
    prop["kcontact"][:] = 1e8
    model.set_prop(prop)
    return model


def test_rcm_reduces_bandwidth():
    mesh = vocal_fold_mesh(16, 8)
    cells0 = np.asarray(mesh.cells)
    bw0 = int(np.abs(cells0[:, :, None] - cells0[:, None, :]).max())
    m2 = rcm_mesh(mesh)
    cells2 = np.asarray(m2.cells)
    bw2 = int(np.abs(cells2[:, :, None] - cells2[:, None, :]).max())
    assert bw2 <= bw0
    assert bw2 < 4 * int(np.sqrt(mesh.num_vertices))  # O(sqrt n)


def test_rcm_mesh_preserves_markers_and_geometry():
    mesh = vocal_fold_mesh(10, 5)
    m2 = rcm_mesh(mesh)
    perm = rcm_permutation(mesh)
    np.testing.assert_allclose(m2.coords, mesh.coords[perm])
    # cell markers: same multiset per marker, same cell areas
    assert dict(m2.subdomains[2]) == dict(mesh.subdomains[2])
    np.testing.assert_array_equal(
        np.sort(m2.mesh_functions[2]), np.sort(mesh.mesh_functions[2])
    )
    # facet markers: same count per subdomain, same marked total length
    for name, marker in mesh.subdomains[1].items():
        if marker == 0:
            continue
        f0 = mesh.entities_by_marker(1, marker)
        f2 = m2.entities_by_marker(1, marker)
        assert len(f0) == len(f2), name
        len0 = np.linalg.norm(
            np.diff(mesh.coords[mesh.facets[f0]], axis=1), axis=-1
        ).sum()
        len2 = np.linalg.norm(
            np.diff(m2.coords[m2.facets[f2]], axis=1), axis=-1
        ).sum()
        np.testing.assert_allclose(len0, len2, rtol=1e-12)
    # vertex markers follow the permutation
    v0 = np.nonzero(mesh.mesh_functions[0])[0]
    v2 = np.nonzero(m2.mesh_functions[0])[0]
    inv = np.argsort(perm)
    np.testing.assert_array_equal(np.sort(inv[v0]), np.sort(v2))


def test_bsb_matvec_matches_dense(solid_model):
    model = solid_model
    prop = {k: jnp.asarray(v) for k, v in model.prop.sub_items()}
    s0 = {k: jnp.zeros(model.ndof) for k in ("u", "v", "a")}
    ctrl = {"p1": jnp.full(model.nvert, 500.0)}
    dt = 1e-4

    op = model.jac_u_ebe(s0["u"], s0, ctrl, prop, dt)
    A = np.asarray(model.jac_u_dense(s0["u"], s0, ctrl, prop, dt))
    plan = model._get_bsb_plan()
    blocks = bsb.bsb_fill(plan, [op.J_cells, op.J_facets])

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(model.ndof))
    y = np.asarray(bsb.bsb_matvec(plan, blocks, x))
    np.testing.assert_allclose(y, A @ np.asarray(x), rtol=1e-10, atol=1e-8)
    yt = np.asarray(bsb.bsb_matvec_t(plan, blocks, x))
    np.testing.assert_allclose(yt, A.T @ np.asarray(x), rtol=1e-10, atol=1e-8)


def test_bsb_fsi_trajectory_matches_dense():
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
    model.control["psup"][:] = 0.0

    from vf_fem_tpu import forward

    state0 = {k: np.zeros_like(np.asarray(v))
              for k, v in model.state0.sub_items()}
    cs = forward._stack_controls(model, [model.control])
    pd = model.prop_to_dict(model.prop)
    times = np.asarray(5e-5 * np.arange(31))
    fin_d, traj_d, _ = forward.integrate_pure(
        model, state0, cs, pd, times, {"jacobian_refresh_steps": 1}
    )
    fin_b, traj_b, info_b = forward.integrate_pure(
        model, state0, cs, pd, times,
        {
            "linear_solver": "bsb",
            "krylov_tolerance": 1e-10,
            "jacobian_refresh_steps": 8,
        },
    )
    np.testing.assert_allclose(
        np.asarray(traj_b["u"]), np.asarray(traj_d["u"]),
        rtol=1e-8, atol=1e-12,
    )
    assert np.all(np.asarray(info_b.abs_err) < 1e-6)


def test_bsb_matvec_3d_extruded():
    """The block-banded operator works unchanged on extruded 3D tet
    meshes (3x3 nodal blocks, RCM'd tets)."""
    from vf_fem_tpu.mesh import m5_mesh
    from vf_fem_tpu.mesh.extrude import extrude_mesh

    mesh = rcm_mesh(
        extrude_mesh(
            m5_mesh("M5_CB_GA3", h=0.1, smooth_iters=5),
            np.linspace(0.0, 1.5, 3),
        )
    )
    model = load_solid_model(mesh, slr.KelvinVoigt)
    prop = {k: jnp.asarray(v) for k, v in model.prop.sub_items()}
    s0 = {k: jnp.zeros(model.ndof) for k in ("u", "v", "a")}
    ctrl = {"p1": jnp.full(model.nvert, 500.0)}
    op = model.jac_u_ebe(s0["u"], s0, ctrl, prop, 1e-4)
    plan = model._get_bsb_plan()
    blocks = bsb.bsb_fill(plan, [op.J_cells, op.J_facets])
    A = np.asarray(model.jac_u_dense(s0["u"], s0, ctrl, prop, 1e-4))
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(model.ndof))
    np.testing.assert_allclose(
        np.asarray(bsb.bsb_matvec(plan, blocks, x)), A @ np.asarray(x),
        rtol=1e-9, atol=1e-7,
    )


def test_btd_direct_solve_and_trajectory():
    """Block-Thomas direct solve over the banded Jacobian matches dense,
    and the btd-stale integrator reproduces the exact-Jacobian
    trajectory."""
    from vf_fem_tpu import forward
    from vf_fem_tpu.solvers import btd

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
    model.control["psup"][:] = 0.0

    # direct solve vs dense
    solid = model.solid
    sprop = {k: jnp.asarray(v) for k, v in model.prop.sub_items()
             if k in model._solid_prop_keys}
    s0 = {k: jnp.zeros(solid.ndof) for k in ("u", "v", "a")}
    ctrl = {"p1": jnp.full(solid.nvert, 800.0)}
    op = solid.jac_u_ebe(s0["u"], s0, ctrl, sprop, 1e-4)
    plan = solid._get_bsb_plan()
    blocks = bsb.bsb_fill(plan, [op.J_cells, op.J_facets])
    fac = btd.btd_factor(plan, blocks)
    rng = np.random.default_rng(0)
    r = jnp.asarray(rng.standard_normal(solid.ndof))
    x = np.asarray(btd.btd_solve(plan, fac, r))
    A = np.asarray(op.to_dense())
    xr = np.linalg.solve(A, np.asarray(r))
    np.testing.assert_allclose(x, xr, rtol=1e-9, atol=1e-11)

    # transposed solve with the SAME factors (A = Lt Ut -> A^T = Ut^T Lt^T)
    xt = np.asarray(btd.btd_solve_t(plan, fac, r))
    xt_ref = np.linalg.solve(A.T, np.asarray(r))
    np.testing.assert_allclose(xt, xt_ref, rtol=1e-9, atol=1e-11)

    # bf16-stored factors: ~1e-2 solve accuracy, and iterative refinement
    # (the chord-Newton use pattern) contracts the error
    fac16 = btd.btd_factor(plan, blocks, store_dtype="bfloat16")
    x16 = np.asarray(btd.btd_solve(plan, fac16, r))
    rel0 = np.linalg.norm(x16 - xr) / np.linalg.norm(xr)
    assert rel0 < 5e-2
    resid = np.asarray(r) - A @ x16
    x16b = x16 + np.asarray(btd.btd_solve(plan, fac16, jnp.asarray(resid)))
    rel1 = np.linalg.norm(x16b - xr) / np.linalg.norm(xr)
    assert rel1 < 0.3 * rel0

    # fp8-stored factors: byte-wide streaming; cast is clamped to the
    # format's finite range and the matvec upconverts the BLOCK (never
    # quantizes the vector).  Solve error stays preconditioner-grade
    # (contracts under refinement) for both fp8 formats.
    for sd, tol0 in (("float8_e4m3fn", 0.3), ("float8_e5m2", 0.1)):
        fac8 = btd.btd_factor(plan, blocks, store_dtype=sd)
        assert np.isfinite(np.asarray(fac8.Sinv, dtype=np.float32)).all()
        x8 = np.asarray(btd.btd_solve(plan, fac8, r))
        rel8 = np.linalg.norm(x8 - xr) / np.linalg.norm(xr)
        assert rel8 < tol0, (sd, rel8)
        resid8 = np.asarray(r) - A @ x8
        x8b = x8 + np.asarray(
            btd.btd_solve(plan, fac8, jnp.asarray(resid8))
        )
        rel8b = np.linalg.norm(x8b - xr) / np.linalg.norm(xr)
        assert rel8b < 0.5 * rel8, (sd, rel8, rel8b)
        # transposed solve shares the fp8 block-upconvert path
        xt8 = np.asarray(btd.btd_solve_t(plan, fac8, r))
        relT8 = np.linalg.norm(xt8 - xt_ref) / np.linalg.norm(xt_ref)
        assert relT8 < tol0, (sd, relT8)

    # mixed storage: bf16 Sinv + fp8 off-diagonal products (V/W are the
    # only arrays streamed in the solve's serial scans) stays within a
    # small factor of all-bf16 solve error — the production fp8 config
    facm = btd.btd_factor(
        plan, blocks, store_dtype="bfloat16",
        offdiag_dtype="float8_e4m3fn",
    )
    assert facm.Sinv.dtype == jnp.bfloat16
    assert facm.V.dtype.itemsize == 1 and facm.W.dtype.itemsize == 1
    xm = np.asarray(btd.btd_solve(plan, facm, r))
    relm = np.linalg.norm(xm - xr) / np.linalg.norm(xr)
    assert relm < 10 * max(rel0, 1e-4), (relm, rel0)

    # trajectory through the stale integrator
    state0 = {k: np.zeros_like(np.asarray(v))
              for k, v in model.state0.sub_items()}
    cs = forward._stack_controls(model, [model.control])
    pd = model.prop_to_dict(model.prop)
    times = np.asarray(5e-5 * np.arange(25))
    fd, td, _ = forward.integrate_pure(
        model, state0, cs, pd, times, {"jacobian_refresh_steps": 1}
    )
    fb, tb, ib = forward.integrate_pure(
        model, state0, cs, pd, times,
        {"linear_solver": "btd", "jacobian_refresh_steps": 8},
    )
    np.testing.assert_allclose(
        np.asarray(tb["u"]), np.asarray(td["u"]), rtol=1e-8, atol=1e-12
    )
    # adjoint solves use the transposed Thomas factors directly
    def loss(p):
        fin, _, _ = forward.integrate_pure(
            model, state0, cs, p, np.asarray(5e-5 * np.arange(5)),
            {"linear_solver": "btd", "jacobian_refresh_steps": 4},
            use_remat=True,
        )
        return jnp.sum(fin["u"] ** 2)

    g = jax.grad(loss)(pd)
    assert np.isfinite(np.asarray(g["emod"])).all()


def test_btd_banded_3d_trajectory():
    """The full large-mesh stack (banded assembly + btd direct solves,
    incl. bf16-stored factors) reproduces the exact-Jacobian trajectory
    on an extruded 3D tet FSI model (one fluid channel per z-plane)."""
    from vf_fem_tpu import forward
    from vf_fem_tpu.mesh import m5_mesh
    from vf_fem_tpu.mesh.extrude import extrude_mesh
    from vf_fem_tpu.load import load_fsi_model

    zs = np.linspace(0.0, 1.5, 3)
    mesh = rcm_mesh(extrude_mesh(m5_mesh("M5_CB_GA3", h=0.1, smooth_iters=5), zs))
    model = load_fsi_model(
        mesh, slr.KelvinVoigt, flr.BernoulliAreaRatioSep,
        coupling="explicit", zs=zs,
    )
    ymax = mesh.coords[:, 1].max()
    prop = model.prop
    prop["emod"][:] = 5e4
    prop["rho"][:] = 1.0
    prop["eta"][:] = 3.0
    prop["nu"][:] = 0.45
    prop["ycontact"][:] = ymax + 0.05
    prop["kcontact"][:] = 1e8
    prop["rho_air"][:] = 1.1225e-3
    prop["r_sep"][:] = 1.0
    prop["area_lb"][:] = 1e-4
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
    fb, tb, ib = forward.integrate_pure(
        model, state0, cs, pd, times,
        {"assembly": "banded", "linear_solver": "btd",
         "jacobian_refresh_steps": 6, "fixed_iterations": 3},
    )
    np.testing.assert_allclose(
        np.asarray(tb["u"]), np.asarray(td["u"]), rtol=1e-7, atol=1e-11
    )
    # bf16-stored factors: trajectory agreement at the chord-certified level
    fb16, tb16, _ = forward.integrate_pure(
        model, state0, cs, pd, times,
        {"assembly": "banded", "linear_solver": "btd",
         "btd_store_dtype": "bfloat16",
         "jacobian_refresh_steps": 6, "fixed_iterations": 3},
    )
    du = np.abs(np.asarray(tb16["u"]) - np.asarray(td["u"])).max()
    uscale = np.abs(np.asarray(td["u"])).max()
    assert du < 1e-5 * max(uscale, 1e-30)


def test_btd_banded_implicit_coupling():
    """Implicit (Picard) FSI coupling routes its inner solid solves
    through the same banded+btd stale factors; trajectory matches the
    exact-Jacobian run."""
    from vf_fem_tpu import forward

    mesh = rcm_mesh(vocal_fold_mesh(10, 5))
    ymax = mesh.coords[:, 1].max()
    model = load_fsi_model(
        mesh, slr.KelvinVoigt, flr.BernoulliSmoothMinSep,
        coupling="implicit",
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
    fb, tb, _ = forward.integrate_pure(
        model, state0, cs, pd, times,
        {"assembly": "banded", "linear_solver": "btd",
         "jacobian_refresh_steps": 6},
    )
    du = np.abs(np.asarray(tb["u"]) - np.asarray(td["u"])).max()
    assert du < 1e-7 * np.abs(np.asarray(td["u"])).max()


def test_stale_adjoint_refinement_matches_exact():
    """The reverse sweep's refined stale-factor adjoint (carried forward
    factors as preconditioner + exact transposed-Jacobian refinement;
    ``adjoint_refine='stale'``, the default) reproduces the
    refactor-every-step exact adjoint and finite differences — including
    with bf16-stored Thomas factors."""
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
    times = np.asarray(5e-5 * np.arange(9))

    def make_loss(extra):
        prm = {"linear_solver": "btd", "jacobian_refresh_steps": 4,
               **extra}

        def loss(p):
            fin, traj, _ = forward.integrate_pure(
                model, state0, cs, p, times, prm, use_remat=True
            )
            return jnp.sum(fin["u"] ** 2) * 1e4

        return loss

    v_st, g_st = jax.value_and_grad(make_loss({}))(pd)
    v_ex, g_ex = jax.value_and_grad(
        make_loss({"adjoint_refine": "exact"})
    )(pd)
    np.testing.assert_allclose(float(v_st), float(v_ex), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(g_st["emod"]), np.asarray(g_ex["emod"]),
        rtol=1e-6, atol=1e-30,
    )

    # bf16-stored factors in the forward sweep: the refinement treats
    # them as a preconditioner only, so the gradient stays exact
    g_16 = jax.grad(make_loss({"btd_store_dtype": "bfloat16"}))(pd)
    np.testing.assert_allclose(
        np.asarray(g_16["emod"]), np.asarray(g_ex["emod"]),
        rtol=1e-5, atol=1e-30,
    )

    # FD check
    loss = make_loss({})
    h = 10.0
    pp = {k: np.asarray(v).copy() for k, v in pd.items()}
    pm = {k: np.asarray(v).copy() for k, v in pd.items()}
    pp["emod"] = pp["emod"] + h
    pm["emod"] = pm["emod"] - h
    fd = (float(loss(pp)) - float(loss(pm))) / (2 * h)
    np.testing.assert_allclose(float(np.sum(g_st["emod"])), fd, rtol=1e-5)

    # dense stale factors refine the same way
    g_d = jax.grad(make_loss({"linear_solver": "dense"}))(pd)
    np.testing.assert_allclose(
        np.asarray(g_d["emod"]), np.asarray(g_ex["emod"]),
        rtol=1e-6, atol=1e-30,
    )


def test_plan_bsb_warns_on_degenerate_bandwidth():
    """A never-RCM'd (scrambled) numbering degenerates the band toward
    dense; plan_bsb must say so actionably instead of silently
    allocating a near-dense block array (round-3 VERDICT weak #7)."""
    import warnings
    from vf_fem_tpu.solvers import bsb

    rng = np.random.default_rng(0)
    ndof = 2000
    cells = rng.integers(0, ndof, size=(3000, 6))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        bsb.plan_bsb([cells], ndof, np.array([0]))
    assert any(
        "RCM-renumber" in str(x.message) for x in w
        if issubclass(x.category, RuntimeWarning)
    )

    # a banded numbering must NOT warn
    band = np.arange(3000)[:, None] % (ndof - 6) + np.arange(6)[None, :]
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        bsb.plan_bsb([band], ndof, np.array([0]))
    assert not any(
        "RCM-renumber" in str(x.message) for x in w
    )
