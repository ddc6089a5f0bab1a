"""
Banded (gather-free) assembly tests (``vf_fem_tpu/fem/banded.py``).

The banded kernels replace the irregular ``u[cells]`` gather and the
``segment_sum`` scatter with on-chip one-hot matmuls over contiguous
vertex windows of an RCM-ordered, cell-sorted mesh.  Checked here against
the irregular formulation (exact equality — one-hot matmuls copy values),
for transpose duality (the custom_vjp rules are each other's adjoints),
and end-to-end on a full solid residual.  Pallas runs in interpret mode on
CPU; on TPU the same code compiles to Mosaic.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vf_fem_tpu.fem import banded
from vf_fem_tpu.mesh import vocal_fold_mesh
from vf_fem_tpu.mesh.reorder import rcm_mesh
from vf_fem_tpu.residuals import solid as slr


@pytest.fixture(scope="module")
def mesh():
    return rcm_mesh(vocal_fold_mesh(12, 6))


@pytest.fixture(scope="module")
def plan(mesh):
    return banded.plan_banded(
        np.asarray(mesh.cells), mesh.num_vertices, gc=128
    )


def test_plan_windows(mesh, plan):
    cells = np.asarray(mesh.cells)
    assert plan.ngroups == -(-cells.shape[0] // plan.gc)
    assert plan.ncells == cells.shape[0]
    # every cell's vertices lie inside its group window
    grouped = plan.cells_pad.reshape(plan.ngroups, plan.gc, plan.nv)
    for g in range(plan.ngroups):
        assert grouped[g].min() >= plan.base[g]
        assert grouped[g].max() < plan.base[g] + plan.w
    assert plan.w % 128 == 0
    assert np.all(plan.base % 128 == 0)


def test_unsorted_mesh_asserts():
    m = vocal_fold_mesh(24, 12)
    cells = np.asarray(m.cells).copy()
    np.random.default_rng(0).shuffle(cells)  # destroy the ordering
    with pytest.raises(AssertionError):
        banded.plan_banded(cells, m.num_vertices, gc=128, max_window=128)


def test_gather_matches_indexing(mesh, plan):
    rng = np.random.default_rng(0)
    F = jnp.asarray(rng.standard_normal((5, mesh.num_vertices)))
    out = np.asarray(banded.banded_gather(plan, F))  # (nv, C, ncpad)
    ref = np.asarray(F).T[plan.cells_pad]  # (ncpad, nv, C)
    np.testing.assert_array_equal(out, ref.transpose(1, 2, 0))


def test_scatter_matches_segment_sum(mesh, plan):
    rng = np.random.default_rng(1)
    cells = np.asarray(mesh.cells)
    vals = rng.standard_normal((plan.ngroups * plan.gc, plan.nv, 3))
    loc = jnp.asarray(vals.transpose(1, 2, 0))  # (nv, C, ncpad)
    out = np.asarray(
        banded.banded_scatter(plan, loc, mesh.num_vertices)
    )  # (C, nvert)
    ref = np.zeros((mesh.num_vertices, 3))
    np.add.at(
        ref, cells.reshape(-1), vals[: plan.ncells].reshape(-1, 3)
    )
    np.testing.assert_allclose(out.T, ref, rtol=0, atol=1e-12)


def test_gather_scatter_duality(mesh, plan):
    """<gather(F), Y> == <F, scatter(Y)> on real cells (padding slots of Y
    zeroed — the scatter drops them; the gather duplicates real cells)."""
    rng = np.random.default_rng(2)
    nvert = mesh.num_vertices
    F = jnp.asarray(rng.standard_normal((4, nvert)))
    Y = rng.standard_normal((plan.ngroups * plan.gc, plan.nv, 4))
    Y[plan.ncells:] = 0.0
    Y = jnp.asarray(Y.transpose(1, 2, 0))  # (nv, C, ncpad)
    lhs = float(jnp.vdot(banded.banded_gather(plan, F), Y))
    rhs = float(jnp.vdot(F, banded.banded_scatter(plan, Y, nvert)))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-12)


def test_vjp_rules(mesh, plan):
    rng = np.random.default_rng(3)
    nvert = mesh.num_vertices
    F = jnp.asarray(rng.standard_normal((3, nvert)))
    ct_aos = rng.standard_normal((plan.ngroups * plan.gc, plan.nv, 3))
    ct = jnp.asarray(ct_aos.transpose(1, 2, 0))  # (nv, C, ncpad)
    # gather vjp == scatter over the *gather* pattern (padded slots read
    # real cells, so their cotangents flow back)
    _, vjp = jax.vjp(lambda f: banded.banded_gather(plan, f), F)
    (gF,) = vjp(ct)
    ref = np.zeros((nvert, 3))
    np.add.at(
        ref, plan.cells_pad.reshape(-1), ct_aos.reshape(-1, 3)
    )
    np.testing.assert_allclose(
        np.asarray(gF).T, ref, rtol=0, atol=1e-12
    )

    # scatter vjp == gather over the scatter pattern (padding slots get 0)
    g = jnp.asarray(rng.standard_normal((3, nvert)))
    _, vjp = jax.vjp(
        lambda y: banded.banded_scatter(plan, y, nvert), ct
    )
    (gY,) = vjp(g)
    refY = np.asarray(g).T[plan.cells_pad]  # (ncpad, nv, C)
    refY[plan.ncells:] = 0.0
    np.testing.assert_allclose(
        np.asarray(gY), refY.transpose(1, 2, 0), rtol=0, atol=1e-12
    )


def _residual_fields(residual, mesh, seed=4):
    rng = np.random.default_rng(seed)
    fields = {}
    for key in residual.coefficient_spec:
        shape = residual.coefficient_shape(key)
        fields[key] = jnp.asarray(0.01 * rng.standard_normal(shape))
    fields["prop/emod"] = jnp.full(mesh.num_cells, 5e4)
    fields["prop/nu"] = jnp.asarray([0.45])
    fields["prop/rho"] = jnp.ones(mesh.num_cells)
    fields["prop/eta"] = jnp.full(mesh.num_cells, 3.0)
    fields["prop/ycontact"] = jnp.asarray([np.inf])
    fields["prop/ncontact"] = jnp.zeros(mesh.dim).at[1].set(1.0)
    fields["prop/kcontact"] = jnp.asarray([1.0])
    return fields


def test_assemble_res_banded_matches(mesh):
    residual = slr.KelvinVoigt(mesh)
    fields = _residual_fields(residual, mesh)
    ref = np.asarray(residual.assemble_res(fields))
    out = np.asarray(residual.assemble_res(fields, banded=True))
    # one-hot copies are exact; only summation-order noise remains
    np.testing.assert_allclose(out, ref, rtol=1e-12, atol=1e-10)


def test_assemble_res_banded_vjp_matches(mesh):
    """Reverse-mode through the banded residual (the IFT adjoint path)
    agrees with the irregular formulation."""
    residual = slr.KelvinVoigt(mesh)
    fields = _residual_fields(residual, mesh)
    ct = jnp.asarray(
        np.random.default_rng(5).standard_normal(
            (mesh.num_vertices, mesh.dim)
        )
    )

    def loss(u1, emod, banded_flag):
        f = dict(fields)
        f["state/u1"] = u1
        f["prop/emod"] = emod
        return jnp.vdot(residual.assemble_res(f, banded=banded_flag), ct)

    u1 = fields["state/u1"]
    emod = fields["prop/emod"]
    g_ref = jax.grad(loss, argnums=(0, 1))(u1, emod, False)
    g_b = jax.grad(loss, argnums=(0, 1))(u1, emod, True)
    for a, b in zip(g_b, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-12
        )


def test_xla_fallback_matches_kernels(mesh, plan):
    """The indexed/segment-sum fallbacks (used when a TPU-default process
    lowers the same program for another platform, e.g. a CPU baseline
    leg) reproduce the kernel semantics."""
    rng = np.random.default_rng(7)
    nvert = mesh.num_vertices
    F = jnp.asarray(rng.standard_normal((4, nvert)))
    Fp = jnp.pad(F, ((0, 0), (0, plan.nvert_pad - nvert)))
    g_kernel = np.asarray(banded._pallas_gather(plan, Fp))
    g_xla = np.asarray(banded._xla_gather(plan, Fp))
    np.testing.assert_array_equal(g_kernel, g_xla)

    loc = jnp.asarray(
        rng.standard_normal((plan.nv, 4, plan.ngroups * plan.gc))
    )
    s_kernel = np.asarray(banded._pallas_scatter(plan, loc))
    s_xla = np.asarray(banded._xla_scatter(plan, loc))
    np.testing.assert_allclose(s_kernel, s_xla, rtol=0, atol=1e-12)

    # the vjp rules substitute delta_s into the gather (and delta_g into
    # the scatter): padding markers (delta == w) must read/write ZERO in
    # the fallback too, or gradient cotangents get corrupted
    plan_s = plan._replace(delta_g=plan.delta_s)
    gs_kernel = np.asarray(banded._pallas_gather(plan_s, Fp))
    gs_xla = np.asarray(banded._xla_gather(plan_s, Fp))
    np.testing.assert_array_equal(gs_kernel, gs_xla)
    plan_g = plan._replace(delta_s=plan.delta_g)
    sg_kernel = np.asarray(banded._pallas_scatter(plan_g, loc))
    sg_xla = np.asarray(banded._xla_scatter(plan_g, loc))
    np.testing.assert_allclose(sg_kernel, sg_xla, rtol=0, atol=1e-12)
