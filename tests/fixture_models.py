"""Shared model fixtures (mirrors reference ``tests/models/fixture_coupled.py``)."""

import numpy as np
import pytest

from vf_fem_tpu.load import load_fsi_model, load_solid_model
from vf_fem_tpu.mesh import (
    mark_unit_mesh_fixtures,
    unit_square_mesh,
    vocal_fold_mesh,
)
from vf_fem_tpu.residuals import fluid as flr
from vf_fem_tpu.residuals import solid as slr


def make_vf_fsi_model(
    SolidResidual=slr.KelvinVoigt,
    FluidResidual=flr.BernoulliAreaRatioSep,
    coupling="explicit",
    nx=12,
    ny=6,
):
    mesh = vocal_fold_mesh(nx, ny)
    model = load_fsi_model(mesh, SolidResidual, FluidResidual, coupling=coupling)
    ymax = mesh.coords[:, 1].max()

    prop = model.prop
    prop["emod"][:] = 5e4
    prop["rho"][:] = 1.0
    if "eta" in prop:
        prop["eta"][:] = 3.0
    if "nu" in prop:
        prop["nu"][:] = 0.45
    prop["ycontact"][:] = ymax + 0.05
    prop["kcontact"][:] = 1e8
    prop["rho_air"][:] = 1.1225e-3
    if "r_sep" in prop:
        prop["r_sep"][:] = 1.0
    if "area_lb" in prop:
        prop["area_lb"][:] = 1e-5
    if "zeta_min" in prop:
        prop["zeta_min"][:] = 1e-3
    if "zeta_sep" in prop:
        prop["zeta_sep"][:] = 1e-3
    prop["ymid"][:] = ymax + 0.01
    model.set_prop(prop)

    control = model.control
    if "psub" in control:
        control["psub"][:] = 8000.0
    else:
        control["qsub"][:] = 100.0
    control["psup"][:] = 0.0
    model.set_control(control)
    return model


def make_unit_solid_model(SolidResidual=slr.KelvinVoigt, nx=4, ny=4):
    mesh = mark_unit_mesh_fixtures(unit_square_mesh(nx, ny))
    model = load_solid_model(mesh, SolidResidual)
    model.prop["emod"][:] = 5e4
    model.prop["rho"][:] = 1.0
    if "eta" in model.prop:
        model.prop["eta"][:] = 3.0
    if "nu" in model.prop:
        model.prop["nu"][:] = 0.45
    model.prop["ycontact"][:] = 10.0
    model.prop["kcontact"][:] = 1e8
    model.set_prop(model.prop)
    return model
