"""
StateFile unit tests (the reference's ``tests/test_statefile.py`` is empty;
these are the assertions it should have had).
"""

import numpy as np
import pytest

from vf_fem_tpu import statefile as sf
from vf_fem_tpu.blocks import BlockVector

from fixture_models import make_unit_solid_model


@pytest.fixture()
def model():
    return make_unit_solid_model(nx=3, ny=3)


def _rand_state(model, rng):
    s = model.state0.copy()
    s[:] = rng.standard_normal(s.size)
    return s


def test_append_and_read_roundtrip(model, tmp_path):
    rng = np.random.default_rng(0)
    path = str(tmp_path / "sf.h5")
    states = [_rand_state(model, rng) for _ in range(7)]
    controls = [model.control.copy() for _ in range(7)]
    for i, c in enumerate(controls):
        c[:] = float(i)

    with sf.StateFile(model, path, mode="w") as f:
        f.init_layout()
        for s, c in zip(states, controls):
            f.append_state(s)
            f.append_control(c)
            f.append_time(0.1)
            f.append_solver_info({"num_iter": 3, "abs_err": 1e-9, "rel_err": 1e-12})
        f.append_prop(model.prop)
        f.append_meas_index(2)

    with sf.StateFile(model, path, mode="r") as f:
        assert f.size == 7
        assert len(f) == 7
        for n in (0, 3, 6):
            got = f.get_state(n)
            for k in ("u", "v", "a"):
                np.testing.assert_array_equal(got[k], states[n][k])
        # negative index wraps
        got = f.get_state(-1)
        np.testing.assert_array_equal(got["u"], states[-1]["u"])
        # chunk cache reverse reads
        for n in reversed(range(7)):
            got = f.get_state(n)
            np.testing.assert_array_equal(got["u"], states[n]["u"])
        np.testing.assert_array_equal(f.get_meas_indices(), [2])
        info = f.get_solver_info(4)
        assert info["num_iter"] == 3
        prop = f.get_prop()
        np.testing.assert_array_equal(prop["emod"], model.prop["emod"])


def test_mesh_stored(model, tmp_path):
    path = str(tmp_path / "mesh.h5")
    with sf.StateFile(model, path, mode="w") as f:
        f.init_layout()
        mesh = model.residual.mesh()
        g = f.root_group["mesh/solid"]
        np.testing.assert_array_equal(g["coordinates"][()], mesh.coords)
        np.testing.assert_array_equal(g["connectivity"][()], mesh.cells)
        assert int(g["dim"][()]) == mesh.dim


def test_groups(model, tmp_path):
    """Multiple runs in one file under different groups
    (the reference's ``line_search`` layout)."""
    path = str(tmp_path / "groups.h5")
    rng = np.random.default_rng(1)
    for grp in ("0", "1"):
        with sf.StateFile(model, path, group=grp, mode="a") as f:
            f.init_layout()
            f.append_state(_rand_state(model, rng))
            f.append_time(0.0)
    import h5py

    with h5py.File(path, "r") as h5:
        assert "0" in h5 and "1" in h5
        assert "state/u" in h5["0"]


def test_window_append_equals_rows(model, tmp_path):
    rng = np.random.default_rng(2)
    T, ndof = 5, model.ndof
    states = rng.standard_normal((T, 3, ndof))
    times = np.arange(T, dtype=float)

    p_rows = str(tmp_path / "rows.h5")
    with sf.StateFile(model, p_rows, mode="w") as f:
        f.init_layout()
        for n in range(T):
            s = model.state0.copy()
            s["u"], s["v"], s["a"] = states[n]
            f.append_state(s)
            f.append_control(model.control)
            f.append_time(times[n])
            f.append_solver_info({"num_iter": 1, "abs_err": 0, "rel_err": 0})

    p_win = str(tmp_path / "win.h5")
    with sf.StateFile(model, p_win, mode="w") as f:
        f.init_layout()
        f.append_window(
            {"u": states[:, 0], "v": states[:, 1], "a": states[:, 2]},
            {"p": np.zeros((T, model.nvert))},
            times,
            {
                "num_iter": np.ones(T),
                "abs_err": np.zeros(T),
                "rel_err": np.zeros(T),
            },
        )

    import h5py

    with h5py.File(p_rows, "r") as a, h5py.File(p_win, "r") as b:
        for key in ("state/u", "state/v", "state/a", "time"):
            np.testing.assert_array_equal(a[key][()], b[key][()])


def test_schema_matches_reference_layout(model, tmp_path):
    """Every dataset in the reference's declared layout exists.

    Reference ``statefile.py:27-58`` declares the layout:
    /mesh/solid/{coordinates,connectivity}, /dofmap/{scalar,vector},
    /state/*, /control/*, /properties/*, /meas_indices, /time (plus the
    cell-dofs array the reference code actually writes as /dofmap/CG1,
    ``statefile.py:212-218``).  A consumer of reference files must find
    them all here."""
    path = str(tmp_path / "schema.h5")
    with sf.StateFile(model, path, mode="w") as f:
        f.init_layout()
        f.append_state(model.state0)
        f.append_control(model.control)
        f.append_time(0.0)
        f.append_prop(model.prop)
        f.append_solver_info({"num_iter": 1, "abs_err": 0.0, "rel_err": 0.0})

    import h5py

    mesh = model.residual.mesh()
    with h5py.File(path, "r") as h5:
        for name in (
            "time",
            "meas_indices",
            "mesh/solid/coordinates",
            "mesh/solid/connectivity",
            "dofmap/CG1",
            "dofmap/scalar",
            "dofmap/vector",
        ):
            assert name in h5, f"missing reference-layout dataset {name}"
        for key in model.state0.keys():
            assert f"state/{key}" in h5
        for key in model.control.keys():
            assert f"control/{key}" in h5
        for key in model.prop.keys():
            assert f"properties/{key}" in h5
        # scalar cell dofs are the connectivity rows; vector dofs are
        # vertex-major interleaved (dof = vertex*dim + comp)
        cells = np.asarray(h5["mesh/solid/connectivity"][()])
        np.testing.assert_array_equal(h5["dofmap/scalar"][()], cells)
        vec = np.asarray(h5["dofmap/vector"][()])
        assert vec.shape == (cells.shape[0], cells.shape[1] * mesh.dim)
        np.testing.assert_array_equal(vec[:, 0], cells[:, 0] * mesh.dim)
        np.testing.assert_array_equal(vec[:, 1], cells[:, 0] * mesh.dim + 1)
