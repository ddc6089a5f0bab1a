"""
Golden-trajectory regression: the canonical explicit FSI run must
reproduce the stored f64 trajectory to tight tolerance (the continuous
state-diffing strategy of SURVEY section 7, "dump reference trajectories
early, diff continuously").
"""

import os

import numpy as np
import pytest

from vf_fem_tpu import forward
from vf_fem_tpu.residuals import fluid as flr

from fixture_models import make_vf_fsi_model

GOLDEN = os.path.join(os.path.dirname(__file__), "data", "golden_fsi_explicit.npz")


@pytest.mark.skipif(not os.path.exists(GOLDEN), reason="no golden data")
def test_fsi_trajectory_matches_golden():
    data = np.load(GOLDEN)
    times = data["times"]

    model = make_vf_fsi_model(
        FluidResidual=flr.BernoulliAreaRatioSep, nx=12, ny=6
    )
    ini = model.state0.copy()
    ini[:] = 0.0
    state0 = {k: np.asarray(v) for k, v in ini.sub_items()}
    cs = forward._stack_controls(model, [model.control])
    prop = model.prop_to_dict(model.prop)
    fin, traj, infos = forward.integrate_pure(model, state0, cs, prop, times)

    np.testing.assert_allclose(
        np.asarray(traj["u"])[::8], data["u"], rtol=1e-8, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(traj["q"]).ravel(), data["q"], rtol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(traj["p"])[-1], data["p_final"], rtol=1e-8, atol=1e-8
    )


GOLDEN_IMP = os.path.join(
    os.path.dirname(__file__), "data", "golden_fsi_implicit.npz"
)


@pytest.mark.skipif(not os.path.exists(GOLDEN_IMP), reason="no golden data")
def test_implicit_fsi_trajectory_matches_golden():
    data = np.load(GOLDEN_IMP)
    times = data["times"]

    model = make_vf_fsi_model(
        FluidResidual=flr.BernoulliSmoothMinSep, coupling="implicit",
        nx=8, ny=4,
    )
    ini = model.state0.copy()
    ini[:] = 0.0
    state0 = {k: np.asarray(v) for k, v in ini.sub_items()}
    cs = forward._stack_controls(model, [model.control])
    prop = model.prop_to_dict(model.prop)
    fin, traj, infos = forward.integrate_pure(model, state0, cs, prop, times)

    np.testing.assert_allclose(
        np.asarray(traj["u"])[::6], data["u"], rtol=1e-8, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(traj["q"]).ravel(), data["q"], rtol=1e-8
    )


GOLDEN_M5 = os.path.join(
    os.path.dirname(__file__), "data", "golden_m5cad_explicit.npz"
)


@pytest.mark.skipif(not os.path.exists(GOLDEN_M5), reason="no golden data")
def test_m5_cad_trajectory_matches_golden():
    """The reference-benchmark configuration (KelvinVoigtWEpithelium +
    BernoulliAreaRatioSep on the committed M5-3layers-family CAD mesh)
    reproduces its stored f64 trajectory — guards the geometry pipeline
    (STEP parse -> triangulate -> gmsh roundtrip) and the physics at
    once."""
    from vf_fem_tpu.load import load_fsi_model
    from vf_fem_tpu.residuals import solid as slr

    data = np.load(GOLDEN_M5)
    times = data["times"]

    repo = os.path.join(os.path.dirname(__file__), "..")
    model = load_fsi_model(
        os.path.join(repo, "meshes", "M5_CB_GA3.msh"),
        slr.KelvinVoigtWEpithelium,
        flr.BernoulliAreaRatioSep,
        coupling="explicit",
    )
    mesh = model.solid.residual.mesh()
    ymax = mesh.coords[:, 1].max()
    p = model.prop
    p["emod"][:] = 5e4
    p["rho"][:] = 1.0
    p["eta"][:] = 3.0
    p["nu"][:] = 0.45
    p["emod_membrane"][:] = 0.0
    p["nu_membrane"][:] = 0.3
    p["th_membrane"][:] = 0.0
    p["ycontact"][:] = ymax + 0.05
    p["kcontact"][:] = 1e8
    p["rho_air"][:] = 1.1225e-3
    p["r_sep"][:] = 1.0
    p["area_lb"][:] = 1e-4
    p["ymid"][:] = ymax + 0.01
    model.set_prop(p)
    model.control["psub"][:] = 8000.0
    model.control["psup"][:] = 0.0
    model.set_control(model.control)

    ini = model.state0.copy()
    ini[:] = 0.0
    state0 = {k: np.asarray(v) for k, v in ini.sub_items()}
    cs = forward._stack_controls(model, [model.control])
    prop = model.prop_to_dict(model.prop)
    fin, traj, infos = forward.integrate_pure(model, state0, cs, prop, times)

    np.testing.assert_allclose(
        np.asarray(traj["u"])[::8], data["u"], rtol=1e-8, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(traj["q"]).ravel(), data["q"], rtol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(traj["p"])[-1], data["p_final"], rtol=1e-8, atol=1e-8
    )
