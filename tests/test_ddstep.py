"""
DOF-sharded end-to-end integration tests (``parallel.ddstep`` +
``parallel.spike_shard``): the whole coupled FSI time loop runs inside
one ``shard_map`` program with the solid DOF axis partitioned over the
device mesh, and must reproduce the single-device trajectory and
gradients.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from vf_fem_tpu import forward
from vf_fem_tpu.load import load_fsi_model, load_solid_model
from vf_fem_tpu.mesh import vocal_fold_mesh
from vf_fem_tpu.mesh.reorder import rcm_mesh
from vf_fem_tpu.residuals import fluid as flr, solid as slr
from vf_fem_tpu.solvers import bsb
from vf_fem_tpu.parallel import spike_shard


def _make_model(nx=40, ny=20):
    mesh = rcm_mesh(vocal_fold_mesh(nx, ny))
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
    model.set_control(model.control)
    return model


def _mesh(n):
    return Mesh(np.asarray(jax.devices("cpu")[:n]), ("shard",))


def test_sharded_spike_matches_dense():
    """Slab-per-device SPIKE factor+solve vs the dense solve on the
    8-device virtual mesh (fwd and transposed)."""
    model = _make_model(20, 10)
    solid = model.solid
    sprop = {k: jnp.asarray(v) for k, v in model.prop.sub_items()
             if k in model._solid_prop_keys}
    s0 = {k: jnp.zeros(solid.ndof) for k in ("u", "v", "a")}
    ctrl = {"p1": jnp.full(solid.nvert, 800.0)}
    op = solid.jac_u_ebe(s0["u"], s0, ctrl, sprop, 1e-4)
    plan = solid._get_bsb_plan()
    blocks = bsb.bsb_fill(plan, [op.J_cells, op.J_facets])
    A = np.asarray(solid.jac_u_dense(s0["u"], s0, ctrl, sprop, 1e-4))

    for n_dev in (2, 4):
        mesh = _mesh(n_dev)
        fac, d = spike_shard.sharded_spike_factor(plan, blocks, mesh)
        rng = np.random.default_rng(0)
        r = jnp.asarray(rng.standard_normal(solid.ndof))
        x = np.asarray(spike_shard.sharded_spike_solve(plan, fac, d, r, mesh))
        xr = np.linalg.solve(A, np.asarray(r))
        np.testing.assert_allclose(x, xr, rtol=1e-8, atol=1e-10)
        xt = np.asarray(
            spike_shard.sharded_spike_solve(
                plan, fac, d, r, mesh, transpose=True
            )
        )
        np.testing.assert_allclose(
            xt, np.linalg.solve(A.T, np.asarray(r)), rtol=1e-8, atol=1e-10
        )


@pytest.mark.parametrize("n_dev", [4, 8])
def test_dd_integrate_matches_single_device(n_dev):
    """The fully sharded time loop (assembly + SPIKE + fluid exchange all
    inside one shard_map) reproduces the single-device trajectory over
    50+ coupled steps to ~1e-10."""
    from vf_fem_tpu.parallel.ddstep import DDIntegrator

    model = _make_model()
    state0 = {k: np.zeros_like(np.asarray(v))
              for k, v in model.state0.sub_items()}
    cs = forward._stack_controls(model, [model.control])
    pd = model.prop_to_dict(model.prop)
    times = np.asarray(5e-5 * np.arange(53))

    fin_ref, traj_ref, _ = forward.integrate_pure(
        model, state0, cs, pd, times, {"jacobian_refresh_steps": 1}
    )

    dd = DDIntegrator(
        model, _mesh(n_dev), params={"jacobian_refresh_steps": 8}
    )
    fin, traj, infos = dd.integrate_pure(state0, cs, pd, times)

    u_ref = np.asarray(traj_ref["u"])
    u_dd = np.asarray(traj["u"])
    scale = np.abs(u_ref).max()
    assert np.abs(u_dd - u_ref).max() < 1e-10 * max(scale, 1e-30)
    np.testing.assert_allclose(
        np.asarray(traj["q"]), np.asarray(traj_ref["q"]),
        rtol=1e-9, atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(fin["u"]), np.asarray(fin_ref["u"]),
        rtol=1e-9, atol=1e-14,
    )
    assert np.all(np.isfinite(np.asarray(infos.abs_err)))


def test_dd_adjoint_matches_single_device():
    """Gradients through the sharded loop (IFT custom_vjp with the
    transposed sharded SPIKE solve) match the single-device adjoint."""
    from vf_fem_tpu.parallel.ddstep import DDIntegrator

    model = _make_model()
    state0 = {k: np.zeros_like(np.asarray(v))
              for k, v in model.state0.sub_items()}
    cs = forward._stack_controls(model, [model.control])
    pd = model.prop_to_dict(model.prop)
    times = np.asarray(5e-5 * np.arange(9))

    dd = DDIntegrator(
        model, _mesh(4), params={"jacobian_refresh_steps": 4},
        use_remat=True,
    )

    def loss_dd(p):
        fin, traj, _ = dd.integrate_pure(state0, cs, p, times)
        return jnp.sum(fin["u"] ** 2) * 1e4 + 1e-6 * jnp.sum(
            traj["q"] ** 2
        )

    def loss_ref(p):
        fin, traj, _ = forward.integrate_pure(
            model, state0, cs, p, times, {"jacobian_refresh_steps": 1},
            use_remat=True,
        )
        return jnp.sum(fin["u"] ** 2) * 1e4 + 1e-6 * jnp.sum(
            traj["q"] ** 2
        )

    v_dd, g_dd = jax.value_and_grad(loss_dd)(pd)
    v_rf, g_rf = jax.value_and_grad(loss_ref)(pd)
    np.testing.assert_allclose(float(v_dd), float(v_rf), rtol=1e-10)
    # agreement bounded by the reverse-sweep refinement tolerance (1e-8
    # relative residual), not machine precision
    g_scale = float(np.abs(np.asarray(g_rf["emod"])).max())
    np.testing.assert_allclose(
        np.asarray(g_dd["emod"]), np.asarray(g_rf["emod"]),
        rtol=1e-4, atol=1e-7 * g_scale,
    )
    np.testing.assert_allclose(
        np.asarray(g_dd["ymid"]), np.asarray(g_rf["ymid"]), rtol=1e-6
    )


def test_dd_integrate_3d_extruded():
    """The sharded loop handles extruded 3D tet meshes (3x3 nodal
    blocks, one fluid channel per z-plane) unchanged: per-dof slab
    ownership never assumes a vertex's dofs share a slab."""
    from vf_fem_tpu.mesh import m5_mesh
    from vf_fem_tpu.mesh.extrude import extrude_mesh
    from vf_fem_tpu.parallel.ddstep import DDIntegrator

    zs = np.linspace(0.0, 1.5, 3)
    mesh = rcm_mesh(
        extrude_mesh(m5_mesh("M5_CB_GA3", h=0.1, smooth_iters=5), zs)
    )
    model = load_fsi_model(
        mesh, slr.KelvinVoigt, flr.BernoulliSmoothMinSep,
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

    fin_ref, traj_ref, _ = forward.integrate_pure(
        model, state0, cs, pd, times, {"jacobian_refresh_steps": 1}
    )
    dd = DDIntegrator(
        model, _mesh(4), params={"jacobian_refresh_steps": 6}
    )
    fin, traj, _ = dd.integrate_pure(state0, cs, pd, times)
    u_ref = np.asarray(traj_ref["u"])
    scale = np.abs(u_ref).max()
    assert np.abs(np.asarray(traj["u"]) - u_ref).max() < 1e-9 * max(
        scale, 1e-30
    )
    np.testing.assert_allclose(
        np.asarray(traj["q"]), np.asarray(traj_ref["q"]),
        rtol=1e-8, atol=1e-12,
    )


def test_dd_integrate_implicit_matches_single_device():
    """The sharded Picard (implicit-coupling) step reproduces the
    single-device implicit trajectory."""
    from vf_fem_tpu.parallel.ddstep import DDIntegrator

    mesh = rcm_mesh(vocal_fold_mesh(40, 20))
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
    times = np.asarray(5e-5 * np.arange(21))

    fin_ref, traj_ref, _ = forward.integrate_pure(
        model, state0, cs, pd, times, {"jacobian_refresh_steps": 1}
    )
    dd = DDIntegrator(
        model, _mesh(4), params={"jacobian_refresh_steps": 5}
    )
    fin, traj, infos = dd.integrate_pure(state0, cs, pd, times)
    u_ref = np.asarray(traj_ref["u"])
    scale = np.abs(u_ref).max()
    # agreement at the Picard tolerance level: the sharded driver stops
    # on the psum'd coupled-update norm while the single-chip driver
    # stops on the coupled residual norm — same fixed point, different
    # certificates (measured 2e-7 relative)
    assert np.abs(np.asarray(traj["u"]) - u_ref).max() < 1e-6 * max(
        scale, 1e-30
    )
    p_scale = np.abs(np.asarray(traj_ref["p"])).max()
    assert np.abs(
        np.asarray(traj["p"]) - np.asarray(traj_ref["p"])
    ).max() < 1e-6 * max(p_scale, 1e-30)
    assert np.all(np.asarray(infos.num_iter) <= 50)


def test_dd_dp_tp_implicit_adjoint_matches_single_device():
    """The fixed-point IFT adjoint runs batched: per-variant gradients
    through the DP x TP Picard loop (whose forward AND reverse
    while_loops iterate in dp-lockstep with masked commits) match each
    variant's single-device implicit adjoint."""
    from vf_fem_tpu.parallel.ddstep import DDIntegrator

    mesh = rcm_mesh(vocal_fold_mesh(20, 10))
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
    times = np.asarray(5e-5 * np.arange(7))

    emods = np.asarray([4e4, 8e4])
    B = len(emods)
    prop_b = {
        k: np.broadcast_to(np.asarray(v), (B,) + np.shape(v)).copy()
        for k, v in pd.items()
    }
    prop_b["emod"] = np.broadcast_to(
        emods[:, None], (B, pd["emod"].shape[0])
    ).copy()
    state0_b = {
        k: np.broadcast_to(v, (B,) + v.shape).copy()
        for k, v in state0.items()
    }

    mesh2 = Mesh(
        np.asarray(jax.devices("cpu")[:8]).reshape(2, 4), ("dp", "shard")
    )
    dd = DDIntegrator(
        model, mesh2, dp_axis="dp",
        params={"jacobian_refresh_steps": 4},
    )

    def loss_b(pb):
        fin, _, _ = dd.integrate_batch_pure(state0_b, cs, pb, times)
        return jnp.sum(fin["u"] ** 2) * 1e4

    g_b = np.asarray(jax.grad(loss_b)(prop_b)["emod"])

    for i in range(B):
        pd_i = dict(pd)
        pd_i["emod"] = prop_b["emod"][i]

        def loss_1(p):
            fin, _, _ = forward.integrate_pure(
                model, state0, cs, p, times,
                {"jacobian_refresh_steps": 1},
            )
            return jnp.sum(fin["u"] ** 2) * 1e4

        g_ref = np.asarray(jax.grad(loss_1)(pd_i)["emod"])
        err = np.abs(g_b[i] - g_ref).max() / max(np.abs(g_ref).max(), 1e-30)
        assert err < 1e-4, (i, err)


def test_dd_implicit_adjoint_matches_single_device():
    """The sharded Picard step carries a fixed-point IFT adjoint
    (lam <- xbar + F_x^T lam at the converged coupled point); gradients
    match the single-chip implicit's dense coupled-LU adjoint and a
    finite-difference directional derivative."""
    from vf_fem_tpu.parallel.ddstep import DDIntegrator

    mesh = rcm_mesh(vocal_fold_mesh(24, 12))
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
    times = np.asarray(5e-5 * np.arange(11))

    dd = DDIntegrator(
        model, _mesh(4), params={"jacobian_refresh_steps": 4}
    )

    def dd_loss(p):
        fin, traj, _ = dd.integrate_pure(state0, cs, p, times)
        return jnp.sum(fin["u"] ** 2) * 1e4 + 1e-6 * jnp.sum(traj["q"] ** 2)

    def ref_loss(p):
        fin, traj, _ = forward.integrate_pure(
            model, state0, cs, p, times, {"jacobian_refresh_steps": 1}
        )
        return jnp.sum(fin["u"] ** 2) * 1e4 + 1e-6 * jnp.sum(traj["q"] ** 2)

    v_dd, g_dd = jax.value_and_grad(dd_loss)(pd)
    v_rf, g_rf = jax.value_and_grad(ref_loss)(pd)
    np.testing.assert_allclose(float(v_dd), float(v_rf), rtol=1e-8)
    ge, gr = np.asarray(g_dd["emod"]), np.asarray(g_rf["emod"])
    assert np.abs(ge - gr).max() < 1e-5 * np.abs(gr).max()
    gy, gyr = np.asarray(g_dd["ymid"]), np.asarray(g_rf["ymid"])
    assert np.abs(gy - gyr).max() < 1e-6 * np.abs(gyr).max()

    eps = 1e-6
    pd_p = dict(pd)
    pd_p["emod"] = pd["emod"] * (1 + eps)
    pd_m = dict(pd)
    pd_m["emod"] = pd["emod"] * (1 - eps)
    fd = (float(dd_loss(pd_p)) - float(dd_loss(pd_m))) / (2 * eps)
    an = float(np.sum(ge * np.asarray(pd["emod"])))
    assert abs(fd - an) < 1e-6 * abs(fd)


def test_dd_integrate_writes_statefile(tmp_path):
    """``DDIntegrator.integrate`` exposes the same BlockVector +
    StateFile surface as ``forward.integrate``: the sharded run writes
    an HDF5 trajectory interchangeable with the single-device one."""
    from vf_fem_tpu import statefile as sf
    from vf_fem_tpu.parallel.ddstep import DDIntegrator

    model = _make_model(20, 10)
    times = 5e-5 * np.arange(13)
    ini_state = model.state0.copy()
    ini_state[:] = 0.0

    path_dd = str(tmp_path / "dd.h5")
    dd = DDIntegrator(
        model, _mesh(4), params={"jacobian_refresh_steps": 4}
    )
    with sf.StateFile(model, path_dd, mode="w") as f:
        fin_dd, info_dd = dd.integrate(
            f, ini_state, [model.control], model.prop, times,
            idx_meas=np.array([0, 5]),
        )
        assert f.size == len(times)
        stored = f.get_state(f.size - 1)
        for k in ("u", "v", "a", "q", "p"):
            np.testing.assert_allclose(
                stored[k], fin_dd[k], rtol=1e-12, atol=0
            )
        assert list(np.asarray(f.get_meas_indices())) == [0, 5]

    assert info_dd["diverged"] is False

    path_ref = str(tmp_path / "ref.h5")
    with sf.StateFile(model, path_ref, mode="w") as f:
        forward.integrate(
            model, f, ini_state, [model.control], model.prop, times,
            newton_solver_prm={"jacobian_refresh_steps": 1},
        )
        ref5 = f.get_state(5)
    with sf.StateFile(model, path_dd, mode="r") as f:
        dd5 = f.get_state(5)
    scale = np.abs(np.asarray(ref5["u"])).max()
    assert np.abs(
        np.asarray(dd5["u"]) - np.asarray(ref5["u"])
    ).max() < 1e-9 * max(scale, 1e-30)


def test_dd_bf16_factors():
    """bf16-stored SPIKE factors in the sharded loop (the bandwidth
    lever for real multi-chip runs) keep the chord-certified trajectory
    within the usual bf16 envelope of the f32-factor run."""
    from vf_fem_tpu.parallel.ddstep import DDIntegrator

    model = _make_model()
    state0 = {k: np.zeros_like(np.asarray(v))
              for k, v in model.state0.sub_items()}
    cs = forward._stack_controls(model, [model.control])
    pd = model.prop_to_dict(model.prop)
    times = np.asarray(5e-5 * np.arange(17))

    dd32 = DDIntegrator(
        model, _mesh(4), params={"jacobian_refresh_steps": 8}
    )
    _, t32, _ = dd32.integrate_pure(state0, cs, pd, times)
    dd16 = DDIntegrator(
        model, _mesh(4),
        params={"jacobian_refresh_steps": 8,
                "btd_store_dtype": "bfloat16"},
    )
    _, t16, _ = dd16.integrate_pure(state0, cs, pd, times)
    du = np.abs(np.asarray(t16["u"]) - np.asarray(t32["u"])).max()
    scale = np.abs(np.asarray(t32["u"])).max()
    assert np.isfinite(du) and du < 1e-5 * max(scale, 1e-30)


def test_dd_banded_assembly_matches_indexed():
    """The gather-free banded cell-pass assembly per slab
    (``assembly='banded'``: per-slab ``fem.banded`` plans as sharded
    operands, one stacked MXU gather/scatter instead of indexed
    gathers + segment_sum) reproduces the indexed sharded trajectory
    and its gradients."""
    from vf_fem_tpu.parallel.ddstep import DDIntegrator

    model = _make_model(30, 15)
    state0 = {k: np.zeros_like(np.asarray(v))
              for k, v in model.state0.sub_items()}
    cs = forward._stack_controls(model, [model.control])
    pd = model.prop_to_dict(model.prop)
    times = np.asarray(5e-5 * np.arange(9))

    dd_p = DDIntegrator(
        model, _mesh(4), params={"jacobian_refresh_steps": 4}
    )
    _, tp, _ = dd_p.integrate_pure(state0, cs, pd, times)
    dd_b = DDIntegrator(
        model, _mesh(4),
        params={"jacobian_refresh_steps": 4, "assembly": "banded"},
    )
    assert dd_b.bplan is not None
    _, tb, _ = dd_b.integrate_pure(state0, cs, pd, times)
    du = np.abs(np.asarray(tb["u"]) - np.asarray(tp["u"])).max()
    sc = np.abs(np.asarray(tp["u"])).max()
    assert du < 1e-9 * max(sc, 1e-30)

    def loss(integ, psub):
        cs2 = {**cs, "psub": jnp.full_like(jnp.asarray(cs["psub"]), psub)}
        fin, _, _ = integ.integrate_pure(state0, cs2, pd, times)
        return jnp.sum(fin["u"] ** 2)

    gp = float(jax.grad(lambda x: loss(dd_p, x))(jnp.asarray(8000.0)))
    gb = float(jax.grad(lambda x: loss(dd_b, x))(jnp.asarray(8000.0)))
    assert abs(gp - gb) < 1e-6 * max(abs(gp), 1e-30)


def test_dd_banded_assembly_empty_slabs():
    """Banded DD assembly on a partition with cell-less tail slabs
    (small mesh over many devices): the fully-masked dummy plans must
    keep the trajectory finite and identical to the indexed path.
    Regression: zero-coordinate dummy cells gave det(J)=0 -> NaN
    element kernels, and NaN survives the masked one-hot scatter
    (NaN*0 = NaN inside the matmul)."""
    from vf_fem_tpu.parallel.ddstep import DDIntegrator, plan_dd

    model = _make_model(20, 10)
    plan = plan_dd(model, 8)
    n_real = plan.cell_mask.sum(axis=1).astype(int)
    assert (n_real == 0).any(), "fixture must produce an empty slab"

    state0 = {k: np.zeros_like(np.asarray(v))
              for k, v in model.state0.sub_items()}
    cs = forward._stack_controls(model, [model.control])
    pd = model.prop_to_dict(model.prop)
    times = np.asarray(5e-5 * np.arange(9))

    dd_p = DDIntegrator(
        model, _mesh(8), params={"jacobian_refresh_steps": 4}
    )
    _, tp, _ = dd_p.integrate_pure(state0, cs, pd, times)
    dd_b = DDIntegrator(
        model, _mesh(8),
        params={"jacobian_refresh_steps": 4, "assembly": "banded"},
    )
    assert dd_b.bplan is not None
    _, tb, _ = dd_b.integrate_pure(state0, cs, pd, times)
    ub = np.asarray(tb["u"])
    assert np.all(np.isfinite(ub))
    du = np.abs(ub - np.asarray(tp["u"])).max()
    sc = np.abs(np.asarray(tp["u"])).max()
    assert du < 1e-9 * max(sc, 1e-30)


def test_dd_dp_tp_sweep_matches_single_device():
    """DP x TP end-to-end stepping: a batch of stiffness variants of the
    DOF-sharded model runs in ONE shard_map program over a 2D (dp, tp)
    device mesh and reproduces each variant's single-device trajectory."""
    from vf_fem_tpu.parallel.ddstep import DDIntegrator

    model = _make_model()
    state0 = {k: np.zeros_like(np.asarray(v))
              for k, v in model.state0.sub_items()}
    cs = forward._stack_controls(model, [model.control])
    pd = model.prop_to_dict(model.prop)
    times = np.asarray(5e-5 * np.arange(11))

    # B = 4 on a 2-device dp axis: per-device local batch of 2, so the
    # uniform dp-psum'd loop predicates compose with vmap's own batched
    # while_loop masking (local batch > 1 path)
    emods = np.asarray([4e4, 5.5e4, 7e4, 8e4])
    B = len(emods)
    prop_b = {
        k: np.broadcast_to(np.asarray(v), (B,) + np.shape(v)).copy()
        for k, v in pd.items()
    }
    prop_b["emod"] = np.broadcast_to(
        emods[:, None], (B, pd["emod"].shape[0])
    ).copy()
    state0_b = {
        k: np.broadcast_to(v, (B,) + v.shape).copy()
        for k, v in state0.items()
    }

    mesh2 = Mesh(
        np.asarray(jax.devices("cpu")[:8]).reshape(2, 4), ("dp", "shard")
    )
    dd = DDIntegrator(
        model, mesh2, dp_axis="dp",
        params={"jacobian_refresh_steps": 4},
    )
    fin_b, traj_b, infos_b = dd.integrate_batch_pure(
        state0_b, cs, prop_b, times
    )
    assert np.asarray(traj_b["u"]).shape[0] == B
    assert np.all(np.isfinite(np.asarray(infos_b.abs_err)))

    for i in range(B):
        pd_i = dict(pd)
        pd_i["emod"] = prop_b["emod"][i]
        _, traj_ref, _ = forward.integrate_pure(
            model, state0, cs, pd_i, times, {"jacobian_refresh_steps": 1}
        )
        u_ref = np.asarray(traj_ref["u"])
        u_dd = np.asarray(traj_b["u"])[i]
        scale = max(np.abs(u_ref).max(), 1e-30)
        assert np.abs(u_dd - u_ref).max() < 1e-9 * scale, i
        np.testing.assert_allclose(
            np.asarray(traj_b["q"])[i], np.asarray(traj_ref["q"]),
            rtol=1e-8, atol=1e-11,
        )
    # the two variants genuinely differ (the batch axis is live)
    assert np.abs(
        np.asarray(traj_b["u"])[0] - np.asarray(traj_b["u"])[1]
    ).max() > 1e-6


def test_dd_dp_tp_sweep_implicit_matches_single_device():
    """DP x TP composes with the implicit (Picard) coupling: batched
    stiffness variants of the DOF-sharded Picard loop reproduce each
    variant's single-device implicit trajectory."""
    from vf_fem_tpu.parallel.ddstep import DDIntegrator

    mesh = rcm_mesh(vocal_fold_mesh(20, 10))
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
    times = np.asarray(5e-5 * np.arange(9))

    emods = np.asarray([4e4, 8e4])
    B = len(emods)
    prop_b = {
        k: np.broadcast_to(np.asarray(v), (B,) + np.shape(v)).copy()
        for k, v in pd.items()
    }
    prop_b["emod"] = np.broadcast_to(
        emods[:, None], (B, pd["emod"].shape[0])
    ).copy()
    state0_b = {
        k: np.broadcast_to(v, (B,) + v.shape).copy()
        for k, v in state0.items()
    }

    mesh2 = Mesh(
        np.asarray(jax.devices("cpu")[:8]).reshape(2, 4), ("dp", "shard")
    )
    dd = DDIntegrator(
        model, mesh2, dp_axis="dp",
        params={"jacobian_refresh_steps": 4},
    )
    _, traj_b, infos_b = dd.integrate_batch_pure(
        state0_b, cs, prop_b, times
    )
    assert np.all(np.asarray(infos_b.num_iter) <= 50)

    for i in range(B):
        pd_i = dict(pd)
        pd_i["emod"] = prop_b["emod"][i]
        _, traj_ref, _ = forward.integrate_pure(
            model, state0, cs, pd_i, times, {"jacobian_refresh_steps": 1}
        )
        u_ref = np.asarray(traj_ref["u"])
        scale = max(np.abs(u_ref).max(), 1e-30)
        # Picard-certificate agreement level (see the 1D implicit test)
        assert np.abs(
            np.asarray(traj_b["u"])[i] - u_ref
        ).max() < 1e-6 * scale, i


def test_dd_dp_tp_sweep_adjoint_matches_single_device():
    """Gradients flow through the DP x TP batched sharded loop: the
    per-variant emod gradient of a batched loss matches each variant's
    single-device adjoint."""
    from vf_fem_tpu.parallel.ddstep import DDIntegrator

    model = _make_model()
    state0 = {k: np.zeros_like(np.asarray(v))
              for k, v in model.state0.sub_items()}
    cs = forward._stack_controls(model, [model.control])
    pd = model.prop_to_dict(model.prop)
    times = np.asarray(5e-5 * np.arange(7))

    emods = np.asarray([4e4, 8e4])
    B = len(emods)
    prop_b = {
        k: np.broadcast_to(np.asarray(v), (B,) + np.shape(v)).copy()
        for k, v in pd.items()
    }
    prop_b["emod"] = np.broadcast_to(
        emods[:, None], (B, pd["emod"].shape[0])
    ).copy()
    state0_b = {
        k: np.broadcast_to(v, (B,) + v.shape).copy()
        for k, v in state0.items()
    }

    mesh2 = Mesh(
        np.asarray(jax.devices("cpu")[:8]).reshape(2, 4), ("dp", "shard")
    )
    dd = DDIntegrator(
        model, mesh2, dp_axis="dp",
        params={"jacobian_refresh_steps": 4}, use_remat=True,
    )

    def loss_b(pb):
        fin, _, _ = dd.integrate_batch_pure(state0_b, cs, pb, times)
        return jnp.sum(fin["u"] ** 2) * 1e4

    g_b = np.asarray(jax.grad(loss_b)(prop_b)["emod"])

    for i in range(B):
        pd_i = dict(pd)
        pd_i["emod"] = prop_b["emod"][i]

        def loss_1(p):
            fin, _, _ = forward.integrate_pure(
                model, state0, cs, p, times,
                {"jacobian_refresh_steps": 1}, use_remat=True,
            )
            return jnp.sum(fin["u"] ** 2) * 1e4

        g_ref = np.asarray(jax.grad(loss_1)(pd_i)["emod"])
        err = np.abs(g_b[i] - g_ref).max() / max(np.abs(g_ref).max(), 1e-30)
        assert err < 1e-5, (i, err)


def test_dd_f32_factors_reach_f64_floor():
    """Mixed precision in the sharded loop (``btd_factor_dtype=
    'float32'``): f64 state/residuals with f32 SPIKE factors — the TPU
    reference-tolerance path (no f64 LU on the chip) extended to the
    distributed solver — reproduces the all-f64 sharded trajectory at
    the f64 level and meets the reference tolerances each step."""
    from vf_fem_tpu.parallel.ddstep import DDIntegrator

    model = _make_model()
    state0 = {k: np.zeros_like(np.asarray(v))
              for k, v in model.state0.sub_items()}
    cs = forward._stack_controls(model, [model.control])
    pd = model.prop_to_dict(model.prop)
    times = np.asarray(5e-5 * np.arange(17))

    dd64 = DDIntegrator(
        model, _mesh(4), params={"jacobian_refresh_steps": 8}
    )
    _, t64, _ = dd64.integrate_pure(state0, cs, pd, times)
    ddmx = DDIntegrator(
        model, _mesh(4),
        params={
            "jacobian_refresh_steps": 8,
            "btd_factor_dtype": "float32",
            "absolute_tolerance": 1e-8,
            "relative_tolerance": 1e-10,
        },
    )
    _, tmx, infos = ddmx.integrate_pure(state0, cs, pd, times)
    assert np.asarray(tmx["u"]).dtype == np.float64
    abs_err = np.asarray(infos.abs_err)
    rel_err = np.asarray(infos.rel_err)
    assert np.all((abs_err < 1e-8) | (rel_err < 1e-10))
    du = np.abs(np.asarray(tmx["u"]) - np.asarray(t64["u"])).max()
    scale = np.abs(np.asarray(t64["u"])).max()
    assert du < 1e-10 * max(scale, 1e-30)


def _make_fsai_model(nx=40, ny=20):
    from vf_fem_tpu.load import load_fsai_model

    mesh = rcm_mesh(vocal_fold_mesh(nx, ny))
    ymax = mesh.coords[:, 1].max()
    model = load_fsai_model(
        mesh, slr.KelvinVoigt, flr.BernoulliSmoothMinSep, num_tube=12
    )
    prop = model.prop
    prop["emod"][:] = 5e4
    prop["rho"][:] = 1.0
    prop["eta"][:] = 3.0
    prop["nu"][:] = 0.45
    prop["ycontact"][:] = ymax + 0.005
    prop["kcontact"][:] = 1e8
    prop["rho_air"][:] = 1.1225e-3
    prop["zeta_min"][:] = 1e-3
    prop["zeta_sep"][:] = 1e-3
    prop["ymid"][:] = ymax + 0.01
    n = model.acoustic.num_tube
    prop["area"][:] = np.concatenate(
        [np.full(n // 2, 0.6), np.full(n - n // 2, 2.6)]
    )
    prop["proploss"][:] = 1.0
    model.set_prop(prop)
    model.control["psub"][:] = 8000.0
    model.set_control(model.control)
    return model


def test_dd_integrate_fsai_matches_single_device():
    """The sharded loop also runs the two-way FSAI coupling: solid slabs
    sharded, the WRA tract and source-tract fixed point replicated on
    the psum'd area — every transient coupling family is multi-chip."""
    from vf_fem_tpu.parallel.ddstep import DDIntegrator

    model = _make_fsai_model(40, 20)
    state0 = {k: np.zeros_like(np.asarray(v))
              for k, v in model.state0.sub_items()}
    cs = forward._stack_controls(model, [model.control])
    pd = model.prop_to_dict(model.prop)
    times = model.dt * np.arange(41)

    fin_ref, traj_ref, _ = forward.integrate_pure(
        model, state0, cs, pd, times, {"jacobian_refresh_steps": 1}
    )
    dd = DDIntegrator(
        model, _mesh(4), params={"jacobian_refresh_steps": 8}
    )
    fin, traj, infos = dd.integrate_pure(state0, cs, pd, times)

    u_ref = np.asarray(traj_ref["u"])
    scale = np.abs(u_ref).max()
    assert np.abs(np.asarray(traj["u"]) - u_ref).max() < 1e-9 * max(
        scale, 1e-30
    )
    np.testing.assert_allclose(
        np.asarray(traj["q"]), np.asarray(traj_ref["q"]),
        rtol=1e-8, atol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(traj["pref"]), np.asarray(traj_ref["pref"]),
        rtol=1e-8, atol=1e-10,
    )
    # DD FSAI carries the envelope telemetry (per-step ``bracketed``)
    # so finalize_run's lagged-fallback guard fires on sharded runs too;
    # this in-envelope run must have bracketed every step
    assert hasattr(infos, "bracketed")
    assert np.all(np.asarray(infos.bracketed).astype(bool))


def test_dd_integrate_fsai_envelope_guard_warns():
    """The STATIC half of the FSAI envelope guard (contact plane must
    lie below the channel midline) fires on sharded runs exactly as on
    single-chip ones — DDIntegrator.integrate routes through
    model.check_envelope and finalize_run's telemetry."""
    import pytest as _pytest

    from vf_fem_tpu.parallel.ddstep import DDIntegrator

    model = _make_fsai_model(20, 10)
    prop = model.prop
    ymax = float(np.asarray(model.solid._Xref)[:, 1].max())
    prop["ycontact"][:] = ymax + 0.05  # above ymid: out of envelope
    model.set_prop(prop)
    ini = model.state0.copy()
    ini[:] = 0.0
    times = model.dt * np.arange(3)
    dd = DDIntegrator(
        model, _mesh(4), params={"jacobian_refresh_steps": 8}
    )
    with _pytest.warns(RuntimeWarning, match="outside the supported"):
        fin, info = dd.integrate(
            None, ini, [model.control], prop, times, write=False
        )
    assert "lagged_fallback_steps" in info


def test_dd_dp_tp_sweep_fsai_matches_single_device():
    """DP x TP composes with the two-way FSAI coupling: batched
    stiffness variants of the DOF-sharded source-tract loop reproduce
    each variant's single-device trajectory (with this, every transient
    coupling family runs batched x sharded)."""
    from vf_fem_tpu.parallel.ddstep import DDIntegrator

    model = _make_fsai_model(20, 10)
    state0 = {k: np.zeros_like(np.asarray(v))
              for k, v in model.state0.sub_items()}
    cs = forward._stack_controls(model, [model.control])
    pd = model.prop_to_dict(model.prop)
    times = model.dt * np.arange(9)

    emods = np.asarray([4e4, 8e4])
    B = len(emods)
    prop_b = {
        k: np.broadcast_to(np.asarray(v), (B,) + np.shape(v)).copy()
        for k, v in pd.items()
    }
    prop_b["emod"] = np.broadcast_to(
        emods[:, None], (B, pd["emod"].shape[0])
    ).copy()
    state0_b = {
        k: np.broadcast_to(v, (B,) + v.shape).copy()
        for k, v in state0.items()
    }

    mesh2 = Mesh(
        np.asarray(jax.devices("cpu")[:8]).reshape(2, 4), ("dp", "shard")
    )
    dd = DDIntegrator(
        model, mesh2, dp_axis="dp",
        params={"jacobian_refresh_steps": 4},
    )
    _, traj_b, infos_b = dd.integrate_batch_pure(
        state0_b, cs, prop_b, times
    )
    assert np.all(np.isfinite(np.asarray(infos_b.abs_err)))

    for i in range(B):
        pd_i = dict(pd)
        pd_i["emod"] = prop_b["emod"][i]
        _, traj_ref, _ = forward.integrate_pure(
            model, state0, cs, pd_i, times, {"jacobian_refresh_steps": 1}
        )
        u_ref = np.asarray(traj_ref["u"])
        scale = max(np.abs(u_ref).max(), 1e-30)
        assert np.abs(
            np.asarray(traj_b["u"])[i] - u_ref
        ).max() < 1e-9 * scale, i
        np.testing.assert_allclose(
            np.asarray(traj_b["pref"])[i], np.asarray(traj_ref["pref"]),
            rtol=1e-8, atol=1e-10,
        )


def test_dd_fsai_adjoint_matches_single_device():
    """jax.grad through the sharded FSAI integrate (IFT vjp on the slab
    solves + the unrolled source-tract fixed point) agrees with the
    single-device gradient."""
    from vf_fem_tpu.parallel.ddstep import DDIntegrator

    model = _make_fsai_model(24, 12)
    state0 = {k: np.zeros_like(np.asarray(v))
              for k, v in model.state0.sub_items()}
    cs = forward._stack_controls(model, [model.control])
    pd = model.prop_to_dict(model.prop)
    times = model.dt * np.arange(21)

    dd = DDIntegrator(
        model, _mesh(4), params={"jacobian_refresh_steps": 4}
    )

    def dd_loss(p):
        _, traj, _ = dd.integrate_pure(state0, cs, p, times)
        return jnp.sum(traj["u"] ** 2) + 1e-8 * jnp.sum(traj["pref"] ** 2)

    def ref_loss(p):
        _, traj, _ = forward.integrate_pure(
            model, state0, cs, p, times, {"jacobian_refresh_steps": 1}
        )
        return jnp.sum(traj["u"] ** 2) + 1e-8 * jnp.sum(traj["pref"] ** 2)

    g_dd = np.asarray(jax.grad(dd_loss)(pd)["emod"])
    g_rf = np.asarray(jax.grad(ref_loss)(pd)["emod"])
    rel = np.abs(g_dd - g_rf).max() / (np.abs(g_rf).max() + 1e-30)
    assert rel < 1e-6, f"sharded FSAI adjoint mismatch: {rel}"


def test_dd_integrate_shape_matches_single_device():
    """Shape (umesh) parameters in the DOF-sharded loop (round-4 VERDICT
    item 3b): per-slab traced coordinates ride the existing halo
    gathers.  Trajectory AND the sharded shape gradient must match the
    single-device run."""
    from vf_fem_tpu.parallel.ddstep import DDIntegrator

    mesh = rcm_mesh(vocal_fold_mesh(40, 20))
    ymax = mesh.coords[:, 1].max()
    model = load_fsi_model(
        mesh, slr.KelvinVoigtWShape, flr.BernoulliSmoothMinSep,
        coupling="explicit",
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
    # a smooth nonzero shape displacement (bulge scaled by height)
    X = mesh.coords
    um = np.zeros_like(X)
    um[:, 1] = 0.02 * np.sin(np.pi * X[:, 0] / X[:, 0].max()) * (
        X[:, 1] / max(ymax, 1e-30)
    )
    prop["umesh"][:] = um.reshape(-1)
    model.set_prop(prop)
    model.control["psub"][:] = 8000.0
    model.control["psup"][:] = 0.0
    model.set_control(model.control)

    state0 = {k: np.zeros_like(np.asarray(v))
              for k, v in model.state0.sub_items()}
    cs = forward._stack_controls(model, [model.control])
    pd = model.prop_to_dict(model.prop)
    times = np.asarray(5e-5 * np.arange(17))

    fin_ref, traj_ref, _ = forward.integrate_pure(
        model, state0, cs, pd, times, {"jacobian_refresh_steps": 1}
    )
    # refresh 1: the umesh plumbing through the per-slab refactorization
    # is exercised every step.  (Contact ONSET mid-refresh-window makes
    # the frozen-Jacobian chord Newton diverge identically on the
    # single-chip stale path — verified same abs_err trace — so longer
    # refresh windows in this violently-closing config test stale-factor
    # robustness, not shape parity.)
    dd = DDIntegrator(
        model, _mesh(4), params={"jacobian_refresh_steps": 1}
    )
    fin, traj, _ = dd.integrate_pure(state0, cs, pd, times)
    u_ref = np.asarray(traj_ref["u"])
    scale = np.abs(u_ref).max()
    assert scale > 1e-6  # the shaped fold actually moves
    assert np.abs(np.asarray(traj["u"]) - u_ref).max() < 1e-8 * scale
    # q amplifies surface-u differences through the Bernoulli area terms
    # near closure; solver-tolerance agreement is the contract
    np.testing.assert_allclose(
        np.asarray(traj["q"]), np.asarray(traj_ref["q"]),
        rtol=1e-5, atol=1e-8,
    )

    # sharded SHAPE gradient vs the single-device adjoint
    # refresh 1 again: the bulged fold reaches contact within the
    # gradient window, where frozen factors diverge on any path
    dd_g = DDIntegrator(
        model, _mesh(4), params={"jacobian_refresh_steps": 1},
        use_remat=True,
    )
    times_g = np.asarray(5e-5 * np.arange(9))

    def loss_dd(p):
        fin, traj, _ = dd_g.integrate_pure(state0, cs, p, times_g)
        return jnp.sum(fin["u"] ** 2) * 1e4 + 1e-6 * jnp.sum(traj["q"] ** 2)

    def loss_ref(p):
        fin, traj, _ = forward.integrate_pure(
            model, state0, cs, p, times_g, {"jacobian_refresh_steps": 1},
            use_remat=True,
        )
        return jnp.sum(fin["u"] ** 2) * 1e4 + 1e-6 * jnp.sum(traj["q"] ** 2)

    v_dd, g_dd = jax.value_and_grad(loss_dd)(pd)
    v_rf, g_rf = jax.value_and_grad(loss_ref)(pd)
    np.testing.assert_allclose(float(v_dd), float(v_rf), rtol=1e-8)
    g_scale = float(np.abs(np.asarray(g_rf["umesh"])).max())
    assert g_scale > 0  # shape sensitivity is live
    np.testing.assert_allclose(
        np.asarray(g_dd["umesh"]), np.asarray(g_rf["umesh"]),
        rtol=1e-4, atol=1e-7 * g_scale,
    )


def test_plan_dd_actionable_errors():
    """plan_dd failure modes surface as actionable ValueErrors, not bare
    asserts (round-4 review item)."""
    from vf_fem_tpu.mesh.reorder import permute_mesh
    from vf_fem_tpu.parallel.ddstep import plan_dd

    # a scrambled (non-bandwidth-ordered) mesh: the plan must fail with
    # a message telling the user to RCM-renumber, not a bare assert
    base = vocal_fold_mesh(40, 20)
    rng = np.random.default_rng(0)
    scrambled = permute_mesh(base, rng.permutation(base.num_vertices))
    ymax = scrambled.coords[:, 1].max()
    model2 = load_fsi_model(
        scrambled, slr.KelvinVoigt, flr.BernoulliSmoothMinSep,
        coupling="explicit",
    )
    prop = model2.prop
    prop["ymid"][:] = ymax + 0.01
    model2.set_prop(prop)
    # the scrambled bandwidth swallows the whole mesh into one super-row:
    # the plan degenerates to an effectively-serial partition and must
    # SAY so (empty slabs), pointing at rcm_mesh
    with pytest.warns(RuntimeWarning, match="RCM-renumber"):
        plan_dd(model2, 4)
