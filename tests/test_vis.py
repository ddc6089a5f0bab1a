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
    """ParaView-validity: every attribute's hyperslab dims must match the
    mesh entity counts, vectors must be 3-component node-centred, and the
    referenced HDF5 datasets must exist with exactly those shapes
    (reference ``vis/xdmfutils.py:311-455``)."""
    # a DG0 (cell) trajectory field exported alongside the states
    mesh = model.solid.residual.mesh()
    T = solved_file.size
    cellvals = np.tile(np.arange(mesh.num_cells, dtype=float), (T, 1))
    xdmfutils.export_mesh_values(solved_file, cellvals, "emod_cell",
                                 center="cell")
    xpath = xdmfutils.write_xdmf(solved_file, cell_fields=("emod_cell",))
    from lxml import etree

    tree = etree.parse(xpath)
    grids = tree.findall(".//Grid[@GridType='Uniform']")
    assert len(grids) == T
    h5 = solved_file.file

    n_vert, n_cell = mesh.num_vertices, mesh.num_cells
    attrs = grids[0].findall("Attribute")
    assert {a.get("Name") for a in attrs} >= {"u", "v", "a", "emod_cell"}
    for a in attrs:
        slab = a.find("DataItem[@ItemType='HyperSlab']")
        dims = tuple(int(x) for x in slab.get("Dimensions").split())
        if a.get("AttributeType") == "Vector":
            assert a.get("Center") == "Node"
            assert dims == (1, n_vert, 3)
        elif a.get("Center") == "Cell":
            assert dims == (1, n_cell)
        # the referenced dataset exists in the HDF5 with matching shape
        src = slab.findall("DataItem")[-1]
        ds_path = src.text.strip().split(":", 1)[1]
        ds = h5[ds_path]
        src_dims = tuple(int(x) for x in src.get("Dimensions").split())
        assert tuple(ds.shape) == src_dims
    # geometry is XYZ with padded 2D coordinates
    geom = grids[0].find("Geometry")
    assert geom.get("GeometryType") == "XYZ"
    gd = tuple(int(x) for x in geom.find("DataItem").get("Dimensions").split())
    assert gd == (n_vert, 3)
    # exported vector values round-trip: z component is zero, xy matches u
    u0 = np.asarray(solved_file.root_group["state/u"][0]).reshape(n_vert, 2)
    e0 = np.asarray(solved_file.root_group["export/u"][0])
    np.testing.assert_array_equal(e0[:, :2], u0)
    assert np.all(e0[:, 2] == 0)


def test_export_mesh_values(model, solved_file):
    vals = np.arange(model.solid.nvert, dtype=float)
    pth = xdmfutils.export_mesh_values(solved_file, vals, "myfield")
    assert pth == "export/myfield"
    np.testing.assert_array_equal(
        solved_file.root_group["export/myfield"][()][0], vals
    )
    # wrong entity count is rejected (ParaView-validity guard)
    with pytest.raises(ValueError):
        xdmfutils.export_mesh_values(
            solved_file, vals[:-1], "badfield", center="vertex"
        )
    # vector padding
    vec = np.zeros((2, model.solid.nvert, 2))
    xdmfutils.export_mesh_values(solved_file, vec, "vecfield")
    assert solved_file.root_group["export/vecfield"].shape == (
        2, model.solid.nvert, 3,
    )
