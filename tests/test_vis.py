import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

from vf_fem_tpu import forward, statefile as sf
from vf_fem_tpu.vis import vis, xdmfutils

from fixture_models import make_vf_fsi_model


@pytest.fixture(scope="module")
def model():
    return make_vf_fsi_model(nx=6, ny=3)


@pytest.fixture(scope="module")
def solved_file(model, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("vis") / "run.h5")
    times = 2e-5 * np.arange(6)
    ini = model.state0.copy()
    ini[:] = 0.0
    f = sf.StateFile(model, path, mode="w")
    forward.integrate(model, f, ini, [model.control], model.prop, times)
    return f


def test_triangulation_and_figure(model, solved_file):
    state = solved_file.get_state(solved_file.size - 1)
    fig, ax = vis.init_figure(model, state)
    vis.update_figure(ax, model, state)
    vis.plot_gw(solved_file, model, ax=None)
    vis.plot_grad(model, np.asarray(state["u"]))


def test_write_xdmf(model, solved_file):
    xpath = xdmfutils.write_xdmf(solved_file)
    from lxml import etree

    tree = etree.parse(xpath)
    grids = tree.findall(".//Grid[@GridType='Uniform']")
    assert len(grids) == solved_file.size
    attrs = grids[0].findall("Attribute")
    assert {a.get("Name") for a in attrs} >= {"u", "v", "a"}


def test_export_mesh_values(model, solved_file):
    vals = np.arange(model.solid.nvert, dtype=float)
    pth = xdmfutils.export_mesh_values(solved_file, vals, "myfield")
    assert pth == "export/myfield"
    np.testing.assert_array_equal(
        solved_file.root_group["export/myfield"][()], vals
    )
