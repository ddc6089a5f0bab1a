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
