"""
Extruded-3D FSI: one 1D fluid channel per z-plane
(reference: ``load.py:264-275``, ``residuals/fluid.py:70-71``).
"""

import numpy as np
import pytest

from vf_fem_tpu import forward
from vf_fem_tpu.load import load_fsi_model
from vf_fem_tpu.mesh import mark_unit_mesh_fixtures, unit_cube_mesh, derive_1d_interface
from vf_fem_tpu.residuals import fluid as flr, solid as slr


@pytest.fixture(scope="module")
def model3d():
    mesh = mark_unit_mesh_fixtures(unit_cube_mesh(3, 3, 2))
    zs = np.linspace(0, 1, 3)
    model = load_fsi_model(
        mesh,
        slr.KelvinVoigt,
        flr.BernoulliSmoothMinSep,
        coupling="explicit",
        zs=zs,
    )
    prop = model.prop
    prop["emod"][:] = 5e4
    prop["rho"][:] = 1.0
    prop["eta"][:] = 3.0
    prop["nu"][:] = 0.45
    prop["ycontact"][:] = 2.0
    prop["kcontact"][:] = 1e8
    prop["rho_air"][:] = 1.1225e-3
    prop["zeta_min"][:] = 1e-2
    prop["zeta_sep"][:] = 1e-2
    prop["ymid"][:] = 1.05
    model.set_prop(prop)
    control = model.control
    control["psub"][:] = 5000.0
    control["psup"][:] = 0.0
    model.set_control(control)
    return model


def test_interface_3d():
    mesh = mark_unit_mesh_fixtures(unit_cube_mesh(3, 3, 2))
    zs = np.linspace(0, 1, 3)
    s, sdofs, fdofs = derive_1d_interface(mesh, ("pressure",), zs)
    assert s.ndim == 2 and s.shape[0] == 3
    # each plane's chain has monotone arc length
    assert np.all(np.diff(s, axis=-1) > 0)
    assert sdofs.size == fdofs.size == s.size


def test_fsi_3d_steps(model3d):
    model = model3d
    n_fluid = model.fluid.state0["q"].size
    assert n_fluid == 3  # one channel per z-plane

    state = model.state0.copy()
    state[:] = 0.0
    times = 2e-5 * np.arange(5)
    fin, info = forward.integrate(
        model, None, state, [model.control], model.prop, times, write=False
    )
    assert np.all(np.isfinite(fin.to_mono_ndarray()))
    q = np.asarray(fin["q"])
    assert q.shape == (3,)
    assert np.all(q > 0)
    assert float(np.abs(fin["u"]).max()) > 1e-8


def test_extruded_m5_3d_fsi():
    """Extrude the M5 CAD profile to 3D (conforming prism split) and run
    coupled FSI steps — one fluid channel per z-plane (the reference's
    extruded M5 workflow, reference ``load.py:264-275``)."""
    from vf_fem_tpu.mesh import m5_mesh
    from vf_fem_tpu.mesh.extrude import extrude_mesh

    mesh2d = m5_mesh("M5_CB_GA3", h=0.08, smooth_iters=8)
    zs = np.linspace(0.0, 1.5, 3)
    mesh = extrude_mesh(mesh2d, zs)
    assert mesh.dim == 3
    # markers transferred
    assert set(mesh.subdomains[3]) == {"body", "cover"}
    assert {"pressure", "fixed"} <= set(mesh.subdomains[2])
    # total volume = area * length
    p = mesh.coords[mesh.cells]
    v = np.abs(
        np.linalg.det(p[:, 1:] - p[:, :1])
    ).sum() / 6.0
    p2 = mesh2d.coords[mesh2d.cells]
    e1 = p2[:, 1] - p2[:, 0]
    e2 = p2[:, 2] - p2[:, 0]
    area = np.abs(e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0]).sum() / 2.0
    np.testing.assert_allclose(v, area * 1.5, rtol=1e-10)

    ymax = mesh.coords[:, 1].max()
    model = load_fsi_model(
        mesh,
        slr.KelvinVoigt,
        flr.BernoulliSmoothMinSep,
        coupling="explicit",
        zs=zs,
    )
    prop = model.prop
    prop["emod"][:] = 5e4
    prop["rho"][:] = 1.0
    prop["eta"][:] = 3.0
    prop["nu"][:] = 0.45
    prop["ycontact"][:] = ymax + 0.05
    prop["kcontact"][:] = 1e8
    prop["rho_air"][:] = 1.1225e-3
    prop["zeta_min"][:] = 1e-2
    prop["zeta_sep"][:] = 1e-2
    prop["ymid"][:] = ymax + 0.01
    model.set_prop(prop)
    control = model.control
    control["psub"][:] = 8000.0
    control["psup"][:] = 0.0
    model.set_control(control)

    assert model.fluid.state0["q"].size == 3  # one channel per plane
    model.dt = 1e-4
    state = model.state0.copy()
    state[:] = 0.0
    for _ in range(3):
        state, info = model.solve_state1(state)
        model.set_ini_state(state)
    assert info["abs_err"] < 1e-6
    assert np.all(np.isfinite(state.to_mono_ndarray()))
    assert float(np.abs(np.asarray(state["u"])).max()) > 1e-8
    q = np.asarray(state["q"])
    assert np.all(q > 0)
