"""
Batched/sharded parameter sweeps — BASELINE config 5
(the reference has no parallel equivalent: ``models/fsi.py:38-39``).

Runs on the 8 virtual CPU devices configured in conftest.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vf_fem_tpu import forward
from vf_fem_tpu.parallel import batch_mesh, sweep_grad, sweep_integrate

from fixture_models import make_vf_fsi_model


@pytest.fixture(scope="module")
def model():
    from vf_fem_tpu.residuals import fluid as flr

    return make_vf_fsi_model(FluidResidual=flr.BernoulliSmoothMinSep, nx=6, ny=3)


@pytest.fixture(scope="module")
def sweep_args(model):
    state0 = {
        k: jnp.zeros_like(jnp.asarray(np.asarray(v)))
        for k, v in model.state0.sub_items()
    }
    controls = forward._stack_controls(model, [model.control])
    prop0 = model.prop_to_dict(model.prop)
    times = 2e-5 * np.arange(6)

    batch = 8
    prop_batch = {k: jnp.stack([jnp.asarray(v)] * batch) for k, v in prop0.items()}
    emods = jnp.linspace(4e4, 8e4, batch)[:, None]
    prop_batch["emod"] = jnp.broadcast_to(
        emods, (batch,) + prop0["emod"].shape
    )
    return state0, controls, prop_batch, times


def test_sweep_matches_single(model, sweep_args):
    state0, controls, prop_batch, times = sweep_args
    mesh = batch_mesh(8)
    (fin, infos) = sweep_integrate(
        model, state0, controls, prop_batch, times, mesh=mesh
    )
    u = np.asarray(fin["u"])
    assert u.shape[0] == 8
    assert np.all(np.isfinite(u))
    # variants differ (stiffness sweep)
    assert not np.allclose(u[0], u[-1])

    # single run with variant 3's props matches the sweep row
    prop3 = {k: np.asarray(v)[3] for k, v in prop_batch.items()}
    fin3, _, _ = forward.integrate_pure(model, state0, controls, prop3, times)
    np.testing.assert_allclose(
        np.asarray(fin3["u"]), u[3], rtol=1e-10, atol=1e-14
    )


def test_sweep_is_sharded(model, sweep_args):
    state0, controls, prop_batch, times = sweep_args
    mesh = batch_mesh(8)
    fin, infos = sweep_integrate(
        model, state0, controls, prop_batch, times, mesh=mesh
    )
    # the output batch axis is sharded over the device mesh
    sharding = fin["u"].sharding
    assert len(sharding.device_set) == 8


def test_sweep_grad(model, sweep_args):
    state0, controls, prop_batch, times = sweep_args
    mesh = batch_mesh(8)

    def functional(traj, cs, p, ts):
        return jnp.sum(traj["u"][-1] ** 2)

    values, grads = sweep_grad(
        model, functional, state0, controls, prop_batch, times, mesh=mesh
    )
    values = np.asarray(values)
    assert values.shape == (8,)
    assert np.all(np.isfinite(values))
    g = np.asarray(grads["emod"])
    assert g.shape[0] == 8
    assert np.all(np.isfinite(g))
    assert np.linalg.norm(g) > 0


def test_domain_sharded_matvec():
    rng = np.random.default_rng(10)
    """Element-partitioned (tensor-parallel) EBE matvec over the device
    mesh matches the single-device operator (SURVEY section 2.10 TP plan)."""
    from vf_fem_tpu.fem.assembly import EBEOperator
    from vf_fem_tpu.parallel.domain import sharded_ebe_matvec

    ne, nld, ndof = 40, 6, 50
    J = rng.standard_normal((ne, nld, nld))
    dofs = rng.integers(0, ndof, size=(ne, nld))
    op = EBEOperator(
        J_cells=jnp.asarray(J),
        cell_dofs=jnp.asarray(dofs),
        J_facets=None,
        facet_dofs=None,
        ndof=ndof,
        bc_dofs=jnp.asarray(np.array([0, 3], dtype=np.int32)),
    )
    x = jnp.asarray(rng.standard_normal(ndof))
    mesh = batch_mesh(8, axis="shard")
    y_sharded = np.asarray(sharded_ebe_matvec(op, x, mesh))
    y_ref = np.asarray(op.matvec(x))
    np.testing.assert_allclose(y_sharded, y_ref, rtol=1e-10, atol=1e-12)


def test_domain_sharded_pcg():
    rng = np.random.default_rng(11)
    """Sharded CG solves an SPD EBE system to tolerance."""
    from vf_fem_tpu.fem.assembly import EBEOperator
    from vf_fem_tpu.parallel.domain import sharded_pcg

    # SPD element blocks sharing dofs -> SPD global operator
    ne, nld, ndof = 30, 4, 25
    B = rng.standard_normal((ne, nld, nld))
    J = np.einsum("eij,ekj->eik", B, B) + 3.0 * np.eye(nld)
    dofs = rng.integers(0, ndof, size=(ne, nld))
    op = EBEOperator(
        J_cells=jnp.asarray(J),
        cell_dofs=jnp.asarray(dofs),
        J_facets=None,
        facet_dofs=None,
        ndof=ndof,
        bc_dofs=jnp.asarray(np.zeros(0, dtype=np.int32)),
    )
    b = jnp.asarray(rng.standard_normal(ndof))
    mesh = batch_mesh(8, axis="shard")
    result = sharded_pcg(op, b, mesh, tol=1e-10)
    res = np.asarray(op.matvec(result.x)) - np.asarray(b)
    assert np.linalg.norm(res) < 1e-8 * max(1.0, float(np.linalg.norm(np.asarray(b))))


def test_sharded_bsb_matvec_and_solve():
    """Block-row-sharded block-banded matvec (ppermute halo exchange over
    the device mesh — the scalable TP decomposition; no full-vector psum)
    matches the single-device operator, and the distributed BiCGStab
    solves against the dense reference."""
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from vf_fem_tpu.load import load_solid_model
    from vf_fem_tpu.mesh import vocal_fold_mesh
    from vf_fem_tpu.mesh.reorder import rcm_mesh
    from vf_fem_tpu.residuals import solid as slr
    from vf_fem_tpu.solvers import bsb
    from vf_fem_tpu.parallel import bsb_shard

    model = load_solid_model(rcm_mesh(vocal_fold_mesh(40, 20)), slr.KelvinVoigt)
    prop = {k: jnp.asarray(v) for k, v in model.prop.sub_items()}
    s0 = {k: jnp.zeros(model.ndof) for k in ("u", "v", "a")}
    ctrl = {"p1": jnp.full(model.nvert, 500.0)}
    op = model.jac_u_ebe(s0["u"], s0, ctrl, prop, 1e-4)
    plan = model._get_bsb_plan()
    blocks = bsb.bsb_fill(plan, [op.J_cells, op.J_facets])

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(model.ndof))
    devmesh = Mesh(np.asarray(jax.devices()[:8]), ("shard",))
    blocks_p, x_p, _ = bsb_shard.pad_plan_arrays(plan, blocks, x, 8)
    y_sh = np.asarray(
        bsb_shard.sharded_bsb_matvec(plan, blocks_p, x_p, devmesh)
    )[: model.ndof]
    y_ref = np.asarray(bsb.bsb_matvec(plan, blocks, x))
    np.testing.assert_allclose(y_sh, y_ref, rtol=1e-12, atol=1e-12)

    bvec = x.at[jnp.asarray(np.asarray(op.bc_dofs))].set(0.0)
    res = bsb_shard.sharded_bsb_bicgstab(plan, blocks, bvec, devmesh, tol=1e-10)
    x_dense = np.linalg.solve(np.asarray(op.to_dense()), np.asarray(bvec))
    np.testing.assert_allclose(
        np.asarray(res.x), x_dense, rtol=1e-6, atol=1e-8
    )


def test_dp_tp_2d_mesh_matvec():
    """DP x TP over a 2D (batch=4, shard=2) device mesh: per-variant
    banded Jacobians, block-rows halo-sharded on the inner axis — matches
    per-variant single-device matvecs."""
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from vf_fem_tpu.load import load_solid_model
    from vf_fem_tpu.mesh import vocal_fold_mesh
    from vf_fem_tpu.mesh.reorder import rcm_mesh
    from vf_fem_tpu.residuals import solid as slr
    from vf_fem_tpu.solvers import bsb
    from vf_fem_tpu.parallel import bsb_shard

    model = load_solid_model(
        rcm_mesh(vocal_fold_mesh(30, 15)), slr.KelvinVoigt
    )
    prop0 = {k: jnp.asarray(v) for k, v in model.prop.sub_items()}
    s0 = {k: jnp.zeros(model.ndof) for k in ("u", "v", "a")}
    ctrl = {"p1": jnp.full(model.nvert, 500.0)}
    plan = model._get_bsb_plan()

    B, S = 4, 2
    emods = [4e4, 5e4, 6e4, 7e4]
    blocks_list, x_list, y_ref = [], [], []
    rng = np.random.default_rng(11)
    for em in emods:
        p = dict(prop0)
        p["emod"] = jnp.full_like(prop0["emod"], em)
        op = model.jac_u_ebe(s0["u"], s0, ctrl, p, 1e-4)
        blocks = bsb.bsb_fill(plan, [op.J_cells, op.J_facets])
        x = jnp.asarray(rng.standard_normal(model.ndof))
        bp, xp, _ = bsb_shard.pad_plan_arrays(plan, blocks, x, S)
        blocks_list.append(bp)
        x_list.append(xp)
        y_ref.append(np.asarray(bsb.bsb_matvec(plan, blocks, x)))

    blocks_b = jnp.stack(blocks_list)
    x_b = jnp.stack(x_list)
    mesh2d = Mesh(
        np.asarray(jax.devices()[:8]).reshape(B, S), ("batch", "shard")
    )
    y_b = np.asarray(
        bsb_shard.dp_tp_bsb_matvec(plan, blocks_b, x_b, mesh2d)
    )
    for i in range(B):
        np.testing.assert_allclose(
            y_b[i, : model.ndof], y_ref[i], rtol=1e-12, atol=1e-12
        )


def test_geometry_sweep_with_shape_grad():
    """BASELINE config 5 as written: *geometry* AND stiffness variants in
    one vmapped sweep — per-variant ``umesh`` (mesh-displacement shape
    parameter, ``residuals/solid.KelvinVoigtWShape``) with an FD-checked
    shape gradient under vmap."""
    from vf_fem_tpu.residuals import fluid as flr, solid as slr
    from fixture_models import make_vf_fsi_model

    model = make_vf_fsi_model(
        SolidResidual=slr.KelvinVoigtWShape,
        FluidResidual=flr.BernoulliSmoothMinSep,
        nx=6, ny=3,
    )
    state0 = {
        k: jnp.zeros_like(jnp.asarray(np.asarray(v)))
        for k, v in model.state0.sub_items()
    }
    cs = forward._stack_controls(model, [model.control])
    prop0 = model.prop_to_dict(model.prop)
    times = jnp.asarray(2e-5 * np.arange(6))

    batch = 4
    prop_batch = {
        k: jnp.stack([jnp.asarray(v)] * batch) for k, v in prop0.items()
    }
    prop_batch["emod"] = jnp.broadcast_to(
        jnp.linspace(4e4, 8e4, batch)[:, None],
        (batch,) + prop0["emod"].shape,
    )
    # per-variant geometry: a smooth y-bump of the whole fold, scaled
    # differently per variant (vertex-major interleaved dof order)
    nvert = model.solid.nvert
    X = np.asarray(model.solid._Xref)
    bump = np.zeros((nvert, 2))
    bump[:, 1] = 0.004 * np.sin(
        np.pi * (X[:, 0] - X[:, 0].min())
        / max(np.ptp(X[:, 0]), 1e-9)
    ) * (X[:, 1] - X[:, 1].min()) / max(np.ptp(X[:, 1]), 1e-9)
    scales = np.linspace(-1.0, 1.0, batch)
    umesh_b = jnp.asarray(scales[:, None] * bump.reshape(-1)[None, :])
    prop_batch["umesh"] = umesh_b

    def loss(p):
        fin, traj, infos = forward.integrate_pure(
            model, state0, cs, p, times, use_remat=True
        )
        return jnp.sum(fin["u"] ** 2) * 1e4 + 1e-6 * jnp.sum(
            traj["q"] ** 2
        )

    vals, grads = jax.vmap(jax.value_and_grad(loss))(prop_batch)
    assert vals.shape == (batch,)
    assert np.all(np.isfinite(np.asarray(vals)))
    # geometry changed the physics: distinct values across variants
    assert np.unique(np.asarray(vals)).size == batch
    g_um = np.asarray(grads["umesh"])
    assert np.all(np.isfinite(g_um)) and np.linalg.norm(g_um[2]) > 0

    # FD check of the shape gradient for one variant along a direction
    rng = np.random.default_rng(3)
    dh = rng.standard_normal(g_um.shape[1])
    dh /= np.linalg.norm(dh)
    h = 1e-6
    pv = {k: np.asarray(v[2]) for k, v in prop_batch.items()}
    vp = dict(pv); vp["umesh"] = pv["umesh"] + h * dh
    vm = dict(pv); vm["umesh"] = pv["umesh"] - h * dh
    fd = (float(loss(vp)) - float(loss(vm))) / (2 * h)
    np.testing.assert_allclose(float(g_um[2] @ dh), fd, rtol=2e-5)
