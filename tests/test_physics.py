"""
Physics-level validation the reference lacks (SURVEY section 4:
"add the correctness assertions the reference lacks"):

- energy conservation of the undamped Newmark (gamma=1/2, beta=1/4)
  integrator
- second-order convergence in dt
"""

import numpy as np
import jax.numpy as jnp
import pytest

from vf_fem_tpu import forward
from vf_fem_tpu.load import load_solid_model
from vf_fem_tpu.mesh import mark_unit_mesh_fixtures, unit_square_mesh
from vf_fem_tpu.residuals import solid as slr


@pytest.fixture(scope="module")
def solid():
    mesh = mark_unit_mesh_fixtures(unit_square_mesh(4, 4))
    model = load_solid_model(mesh, slr.KelvinVoigt)
    model.prop["emod"][:] = 1e4
    model.prop["rho"][:] = 1.0
    model.prop["eta"][:] = 0.0  # undamped
    model.prop["nu"][:] = 0.3
    model.prop["ycontact"][:] = 100.0  # no contact
    model.set_prop(model.prop)
    return model


def _energy(model, u, v):
    from vf_fem_tpu.functional.solid import _elastic_energy
    from vf_fem_tpu.fem import assembly
    import jax

    solid = model.solid
    topo = solid.residual.topology
    dim = solid.dim
    props = model.prop_to_dict(model.prop)
    elastic = 0.5 * float(_elastic_energy(model, jnp.asarray(u), props))
    v2 = jnp.asarray(v).reshape(-1, dim)
    X = jnp.asarray(solid.residual.ref_mesh_coords)
    rho = jnp.asarray(props["rho"])

    def kin_cell(v_e, rho_c, Xe):
        grads, vol = assembly.elements.cell_shape_gradients(Xe)
        v_q = topo.cell_bary @ v_e
        return 0.5 * rho_c * vol * jnp.sum(
            topo.cell_qw * jnp.sum(v_q**2, axis=-1)
        )

    kinetic = float(
        jnp.sum(jax.vmap(kin_cell)(v2[topo.cells], rho, X[topo.cells]))
    )
    return elastic + kinetic


def test_energy_conservation(solid):
    """Average-acceleration Newmark conserves energy for the undamped,
    unforced linear solid."""
    rng = np.random.default_rng(0)
    ini = solid.state0.copy()
    ini[:] = 0.0
    # random initial velocity satisfying the fixed BC
    v0 = 0.1 * rng.standard_normal(solid.ndof)
    mask = np.repeat(solid.residual.bc_vertex_mask, solid.dim)
    v0[mask] = 0.0
    ini["v"] = v0

    control = solid.control.copy()
    control[:] = 0.0
    times = 1e-4 * np.arange(80)
    state0 = {k: np.asarray(v) for k, v in ini.sub_items()}
    cs = forward._stack_controls(solid, [control])
    prop = solid.prop_to_dict(solid.prop)
    fin, traj, infos = forward.integrate_pure(solid, state0, cs, prop, times)

    e0 = _energy(solid, state0["u"], state0["v"])
    energies = [
        _energy(solid, np.asarray(traj["u"][n]), np.asarray(traj["v"][n]))
        for n in range(0, len(times) - 1, 10)
    ]
    drift = np.abs(np.array(energies) - e0) / e0
    assert drift.max() < 1e-8, f"energy drift {drift.max():.2e}"


def test_newmark_second_order(solid):
    """Halving dt reduces the end-state error ~4x (order 2).

    Free vibration from a velocity IC: with u0 = 0 and zero load the
    initial acceleration a0 = 0 is *consistent*, which Newmark's second
    order requires (a step load with a0 = 0 degrades it to first order —
    an inconsistency the reference inherits too since it also starts from
    a0 = 0)."""
    rng = np.random.default_rng(1)
    ini = solid.state0.copy()
    ini[:] = 0.0
    v0 = 0.5 * rng.standard_normal(solid.ndof)
    mask = np.repeat(solid.residual.bc_vertex_mask, solid.dim)
    v0[mask] = 0.0
    ini["v"] = v0
    control = solid.control.copy()
    control[:] = 0.0
    state0 = {k: np.asarray(v) for k, v in ini.sub_items()}
    cs = forward._stack_controls(solid, [control])
    prop = solid.prop_to_dict(solid.prop)

    T = 2e-3
    u_ref = None
    results = {}
    for n_steps in (10, 20, 40, 320):
        times = np.linspace(0.0, T, n_steps + 1)
        fin, _, _ = forward.integrate_pure(solid, state0, cs, prop, times)
        results[n_steps] = np.asarray(fin["u"])

    err10 = np.linalg.norm(results[10] - results[320])
    err20 = np.linalg.norm(results[20] - results[320])
    err40 = np.linalg.norm(results[40] - results[320])
    rate1 = np.log2(err10 / err20)
    rate2 = np.log2(err20 / err40)
    assert 1.7 < rate1 < 2.4, f"rates {rate1}, {rate2}"
    assert 1.7 < rate2 < 2.6, f"rates {rate1}, {rate2}"
