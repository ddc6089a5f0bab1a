"""
The reference's fixture matrix: every predefined solid residual runs a
transient step; every fluid variant couples and steps
(reference: ``tests/models/fixture_coupled.py:19-85``,
``tests/models/test_transient.py:20-127``).
"""

import numpy as np
import pytest

from vf_fem_tpu import forward
from vf_fem_tpu.load import load_fsi_model, load_solid_model
from vf_fem_tpu.mesh import mark_unit_mesh_fixtures, unit_square_mesh, vocal_fold_mesh
from vf_fem_tpu.residuals import fluid as flr, solid as slr

SOLID_RESIDUALS = [
    slr.Rayleigh,
    slr.KelvinVoigt,
    slr.KelvinVoigtWShape,
    slr.KelvinVoigtWEpithelium,
    slr.IncompSwellingKelvinVoigt,
    slr.SwellingKelvinVoigt,
    slr.SwellingKelvinVoigtWEpithelium,
    slr.SwellingKelvinVoigtWEpitheliumNoShape,
    slr.SwellingPowerLawKelvinVoigtWEpitheliumNoShape,
    slr.Approximate3DKelvinVoigt,
]

FLUID_RESIDUALS = [
    flr.BernoulliFixedSep,
    flr.BernoulliSmoothMinSep,
    flr.BernoulliAreaRatioSep,
]


def _default_props(model):
    prop = model.prop
    for key, val in {
        "emod": 5e4, "rho": 1.0, "eta": 3.0, "nu": 0.45,
        "emod_membrane": 1e4, "nu_membrane": 0.3, "th_membrane": 0.01,
        "v_swelling": 1.0, "k_swelling": 1e4, "m_swelling": 0.0,
        "ycontact": 10.0, "kcontact": 1e8,
        "rayleigh_m": 1.0, "rayleigh_k": 1e-4,
        "u_ant": 0.0, "u_pos": 0.0, "length": 1.0, "muscle_stress": 0.0,
        "rho_air": 1.1225e-3, "r_sep": 1.0, "area_lb": 1e-5,
        "zeta_min": 1e-3, "zeta_sep": 1e-3,
    }.items():
        if key in prop:
            prop[key] = val
    if "ymid" in prop:
        mesh = model.solid.residual.mesh()
        prop["ymid"] = mesh.coords[:, 1].max() + 0.01
    model.set_prop(prop)
    return model


@pytest.mark.parametrize("Residual", SOLID_RESIDUALS)
def test_solid_transient_step(Residual):
    mesh = mark_unit_mesh_fixtures(unit_square_mesh(3, 3))
    model = _default_props(load_solid_model(mesh, Residual))
    model.control["p"][:] = 1000.0
    model.set_control(model.control)
    model.dt = 1e-4
    state1, info = model.solve_state1(model.state0)
    assert np.all(np.isfinite(state1.to_mono_ndarray()))
    assert info["abs_err"] < 1e-6
    assert float(np.abs(state1["u"]).max()) > 0


@pytest.mark.parametrize("Fluid", FLUID_RESIDUALS)
@pytest.mark.parametrize("Solid", [slr.KelvinVoigt, slr.Rayleigh])
def test_fsi_matrix(Solid, Fluid):
    mesh = vocal_fold_mesh(8, 4)
    kwargs = {}
    if Fluid in (flr.BernoulliFixedSep,):
        kwargs = {"fluid_kwargs": {"idx_sep": 10}}
    model = _default_props(
        load_fsi_model(mesh, Solid, Fluid, coupling="explicit", **kwargs)
    )
    model.control["psub"][:] = 5000.0
    model.control["psup"][:] = 0.0
    model.set_control(model.control)

    ini = model.state0.copy()
    ini[:] = 0.0
    times = 2e-5 * np.arange(4)
    fin, info = forward.integrate(
        model, None, ini, [model.control], model.prop, times, write=False
    )
    assert np.all(np.isfinite(fin.to_mono_ndarray()))
    assert float(fin["q"][0]) > 0
