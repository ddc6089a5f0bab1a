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


# -- full e2e residual matrix (round 4) --------------------------------------
# The reference's own e2e shape (reference tests/test_forward.py:163-257):
# {4 solid} x {4 fluid incl. BernoulliFlowFixedSep} x {2D, extruded 3D},
# short integrate runs asserting finite states + solver convergence.
# Family-specific STEPPING bugs (e.g. a swelling form destabilizing
# Newmark) are invisible to assembly/Taylor tests; this matrix catches
# them.

E2E_SOLIDS = [
    slr.Rayleigh,
    slr.KelvinVoigt,
    slr.SwellingKelvinVoigt,
    slr.KelvinVoigtWEpithelium,
]
E2E_FLUIDS = [
    flr.BernoulliSmoothMinSep,
    flr.BernoulliFixedSep,
    flr.BernoulliAreaRatioSep,
    flr.BernoulliFlowFixedSep,
]


@pytest.mark.parametrize("dim", ["2d", "3d"])
@pytest.mark.parametrize("Fluid", E2E_FLUIDS)
@pytest.mark.parametrize("Solid", E2E_SOLIDS)
def test_e2e_residual_matrix(Solid, Fluid, dim):
    zs = None
    if dim == "2d":
        mesh = vocal_fold_mesh(8, 4)
    else:
        from vf_fem_tpu.mesh.extrude import extrude_mesh

        # 3 z-planes: ends clamped, middle plane free to deflect
        zs = np.linspace(0.0, 0.4, 3)
        mesh = extrude_mesh(vocal_fold_mesh(6, 3), zs)

    kwargs = {}
    if Fluid in (flr.BernoulliFixedSep, flr.BernoulliFlowFixedSep):
        kwargs = {"fluid_kwargs": {"idx_sep": 5}}
    model = _default_props(
        load_fsi_model(mesh, Solid, Fluid, coupling="explicit", zs=zs,
                       **kwargs)
    )
    # nontrivial swelling field so the family-specific stress terms are
    # actually exercised in stepping, not reduced to plain elasticity
    if "v_swelling" in model.prop:
        model.prop["v_swelling"][:] = 1.02
        model.set_prop(model.prop)
    if "psub" in model.control:
        model.control["psub"][:] = 5000.0
        model.control["psup"][:] = 0.0
    else:  # flow-driven variant (qsub control)
        model.control["qsub"][:] = 30.0
        model.control["psup"][:] = 0.0
    model.set_control(model.control)

    ini = model.state0.copy()
    ini[:] = 0.0
    times = 2e-5 * np.arange(3)  # 2 coupled steps per config
    fin, info = forward.integrate(
        model, None, ini, [model.control], model.prop, times, write=False
    )
    assert np.all(np.isfinite(fin.to_mono_ndarray()))
    # every step converged (residual-certified, not just finite)
    assert np.all(info["all"]["abs_err"] < 1e-6)
    assert not info["diverged"]
    # physically active: flow through the glottis, fold deflecting
    assert float(np.abs(np.asarray(fin["q"])).max()) > 0
    assert float(np.abs(fin["u"]).max()) > 1e-9
