import os

import numpy as np
import pytest

from vf_fem_tpu.mesh import (
    Mesh,
    mark_unit_mesh_fixtures,
    unit_cube_mesh,
    unit_square_mesh,
    vocal_fold_mesh,
    derive_1d_interface,
)


def test_unit_square_topology():
    mesh = unit_square_mesh(5, 5)
    assert mesh.num_vertices == 36
    assert mesh.num_cells == 50
    # total area = 1
    X = mesh.coords[mesh.cells]
    d1 = X[:, 1] - X[:, 0]
    d2 = X[:, 2] - X[:, 0]
    areas = 0.5 * np.abs(d1[:, 0] * d2[:, 1] - d1[:, 1] * d2[:, 0])
    assert np.isclose(areas.sum(), 1.0)
    # boundary facets: 4 sides x 5 edges
    assert len(mesh.boundary_facets) == 20


def test_unit_cube_topology():
    mesh = unit_cube_mesh(3, 3, 2)
    assert mesh.num_vertices == 4 * 4 * 3
    assert mesh.num_cells == 3 * 3 * 2 * 6
    X = mesh.coords[mesh.cells]
    d = X[:, 1:] - X[:, :1]
    vols = np.abs(np.linalg.det(d)) / 6
    assert np.isclose(vols.sum(), 1.0)


@pytest.mark.parametrize("nz", [0, 2])
def test_fixture_markers(nz):
    mesh = unit_square_mesh(5, 5) if nz == 0 else unit_cube_mesh(5, 5, nz)
    mark_unit_mesh_fixtures(mesh)
    dim = mesh.dim
    assert "fixed" in mesh.subdomains[dim - 1]
    assert "pressure" in mesh.subdomains[dim - 1]
    assert "separation" in mesh.subdomains[dim - 2]
    fixed = mesh.facets_by_subdomain(["fixed"])
    assert len(fixed) > 0
    # fixed facets all on bottom / front / back
    for f in fixed:
        vc = mesh.coords[mesh.facets[f]]
        on_bottom = np.all(vc[:, 1] < 1e-12)
        ok = on_bottom
        if dim == 3:
            ok = ok or np.all(vc[:, 2] < 1e-12) or np.all(vc[:, 2] > 1 - 1e-12)
        assert ok


def test_interface_derivation_2d():
    mesh = unit_square_mesh(5, 5)
    mark_unit_mesh_fixtures(mesh)
    s, solid_dofs, fluid_dofs = derive_1d_interface(mesh, ("pressure",))
    # pressure surface: left, right, top sides -> 16 vertices in a chain
    assert s.ndim == 1
    assert s[0] == 0.0
    assert np.all(np.diff(s) > 0)
    assert len(s) == len(solid_dofs) == len(fluid_dofs)
    np.testing.assert_array_equal(fluid_dofs, np.arange(len(s)))


def test_vocal_fold_mesh():
    mesh = vocal_fold_mesh(16, 8)
    assert mesh.dim == 2
    assert "pressure" in mesh.subdomains[1]
    assert "fixed" in mesh.subdomains[1]
    assert "cover" in mesh.subdomains[2]
    s, sdofs, fdofs = derive_1d_interface(mesh, ("pressure",))
    assert len(s) > 10
    assert np.all(np.diff(s) > 0)
    # all cells positively sized
    X = mesh.coords[mesh.cells]
    d1 = X[:, 1] - X[:, 0]
    d2 = X[:, 2] - X[:, 0]
    areas = 0.5 * np.abs(d1[:, 0] * d2[:, 1] - d1[:, 1] * d2[:, 0])
    assert np.all(areas > 0)


def test_gmsh_roundtrip(tmp_path):
    """write_gmsh -> load_gmsh preserves topology, markers, and names."""
    from vf_fem_tpu.mesh.writers import write_gmsh
    from vf_fem_tpu.mesh.gmsh_io import load_gmsh

    mesh = vocal_fold_mesh(10, 5)
    path = str(tmp_path / "vf.msh")
    write_gmsh(mesh, path)
    mesh2 = load_gmsh(path)

    assert mesh2.num_vertices == mesh.num_vertices
    assert mesh2.num_cells == mesh.num_cells
    np.testing.assert_allclose(mesh2.coords, mesh.coords)
    # subdomain names survive
    assert mesh2.subdomains[1].get("pressure") == mesh.subdomains[1]["pressure"]
    assert mesh2.subdomains[1].get("fixed") == mesh.subdomains[1]["fixed"]
    # marked facet sets are identical
    for name in ("pressure", "fixed"):
        f1 = {tuple(sorted(mesh.facets[i])) for i in mesh.facets_by_subdomain([name])}
        f2 = {tuple(sorted(mesh2.facets[i])) for i in mesh2.facets_by_subdomain([name])}
        assert f1 == f2
    # FSI interface derivation matches
    s1, d1, _ = derive_1d_interface(mesh)
    s2, d2, _ = derive_1d_interface(mesh2)
    np.testing.assert_allclose(s1, s2)
    np.testing.assert_array_equal(d1, d2)


def test_native_meshkit_consistency():
    """Native C++ facet extraction / chain sort match the numpy paths."""
    import os
    from vf_fem_tpu import native

    if native.get_lib() is None:
        import pytest
        pytest.skip("native meshkit unavailable")

    mesh = vocal_fold_mesh(12, 6)
    cells = np.asarray(mesh.cells)
    facets, fcell, flocal, counts = native.build_facets_native(cells, 2)
    # each facet's adjacency is consistent
    for i in range(len(facets)):
        cv = set(cells[fcell[i]])
        assert set(facets[i]) <= cv
        opp = cells[fcell[i]][flocal[i]]
        assert opp not in set(facets[i])
    # boundary facet set matches the numpy-derived mesh
    bset_native = {tuple(sorted(facets[i])) for i in np.nonzero(counts == 1)[0]}
    bset_numpy = {
        tuple(sorted(mesh.facets[i])) for i in mesh.boundary_facets
    }
    assert bset_native == bset_numpy

    # chain sort identical to the numpy walk
    from vf_fem_tpu.mesh.core import sort_vertices_by_nearest_neighbours

    rng = np.random.default_rng(0)
    t = np.sort(rng.random(20))
    pts = np.stack([t, 0.1 * np.sin(8 * t)], axis=-1)
    shuffled = rng.permutation(pts)
    perm_native = native.sort_edge_chain_native(shuffled)
    # numpy reference walk
    idx_sort = [int(np.argmin(np.linalg.norm(shuffled, axis=-1)))]
    dist = np.empty(len(shuffled))
    while len(idx_sort) < len(shuffled):
        d = shuffled - shuffled[idx_sort[-1]]
        dist[:] = np.sqrt((d**2).sum(-1))
        dist[idx_sort] = np.nan
        idx_sort.append(int(np.nanargmin(dist)))
    np.testing.assert_array_equal(perm_native, idx_sort)


# ---------------------------------------------------------------------------
# M5 (Scherer) geometry: committed assets + profile mesher
# ---------------------------------------------------------------------------

_REPO = os.path.join(os.path.dirname(__file__), "..")


def test_committed_m5_mesh_loads():
    """Parse committed gmsh assets this test did not write
    (reference geometry pipeline: ``meshes/genmesh_M5_CB.py``)."""
    from vf_fem_tpu.mesh import load_gmsh

    path = os.path.join(_REPO, "meshes", "M5_3layers.msh")
    mesh = load_gmsh(path)
    assert mesh.dim == 2
    assert set(mesh.subdomains[2]) == {"body", "ligament", "cover"}
    assert set(mesh.subdomains[1]) == {"pressure", "fixed"}
    assert {"separation-inf", "separation-sup"} <= set(mesh.subdomains[0])
    # every region is populated
    for name, marker in mesh.subdomains[2].items():
        assert (mesh.mesh_functions[2] == marker).sum() > 0, name
    # fixed facets lie on y=0
    fixed = mesh.facets_by_subdomain(["fixed"])
    ys = mesh.coords[mesh.facets[fixed]][..., 1]
    assert np.all(np.abs(ys) < 1e-9)
    # pressure facets form the rest of the boundary
    pres = mesh.facets_by_subdomain(["pressure"])
    assert len(pres) + len(fixed) == len(mesh.boundary_facets)


@pytest.mark.parametrize("name", ["M5_CB_GA3", "M5_CB_GA0_split"])
def test_m5_mesher_quality_and_groups(name):
    """The in-repo triangulator produces well-shaped conforming elements
    on the exact CAD profiles (reference ``meshes/stp/*.STEP``)."""
    from vf_fem_tpu.mesh import m5_mesh

    mesh = m5_mesh(name, h=0.04)
    p = mesh.coords[mesh.cells]
    a = np.linalg.norm(p[:, 1] - p[:, 0], axis=1)
    b = np.linalg.norm(p[:, 2] - p[:, 1], axis=1)
    c = np.linalg.norm(p[:, 0] - p[:, 2], axis=1)
    s = 0.5 * (a + b + c)
    area = np.sqrt(np.maximum(s * (s - a) * (s - b) * (s - c), 0.0))
    q = 4 * np.sqrt(3) * area / (a**2 + b**2 + c**2)
    assert q.min() > 0.3
    # area adds up to the polygon area (conforming, no holes/overlaps)
    from vf_fem_tpu.mesh.m5 import M5_PROFILES, _decode

    _, loops = _decode(M5_PROFILES[name])
    total = 0.0
    for loop in loops:
        pts = []
        from vf_fem_tpu.mesh.triangulate import edge_points

        for e, fl in loop:
            seg = edge_points(e, 0.002)
            if fl:
                seg = seg[::-1]
            pts.append(seg[:-1])
        poly = np.concatenate(pts, 0)
        x, y = poly[:, 0], poly[:, 1]
        total += abs(
            0.5 * np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)
        )
    assert abs(area.sum() - total) / total < 2e-3
    if name.endswith("_split"):
        assert set(mesh.subdomains[2]) == {"body", "cover"}
        assert "separation-mid" in mesh.subdomains[0]
