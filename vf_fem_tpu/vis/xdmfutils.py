"""
XDMF export for ParaView (reference: ``src/femvf/vis/xdmfutils.py``).

Writes XDMF XML referencing the statefile's HDF5 datasets directly (the
reference's hyperslab machinery, ``xdmfutils.py:38-181``); with the
framework's vertex-major dof ordering no data reshuffle is needed — vertex
fields are already in vertex order (the reference needed dof->vertex
permutations, ``xdmfutils.py:187-308``).
"""

from __future__ import annotations

from os import path
from typing import Optional, Sequence

import numpy as np
from lxml import etree

_TOPOLOGY_TYPE = {2: "Triangle", 3: "Tetrahedron"}
_GEOMETRY_TYPE = {2: "XY", 3: "XYZ"}


def _data_item(parent, dims, text, number_type="Float", fmt="HDF",
               precision="8"):
    item = etree.SubElement(
        parent,
        "DataItem",
        Dimensions=" ".join(str(d) for d in dims),
        NumberType=number_type,
        Precision=precision,
        Format=fmt,
    )
    item.text = text
    return item


def _hyperslab(parent, source_dims, start, stride, count, h5_path):
    """Select one time row from a (T, n) HDF5 dataset
    (reference: ``XDMFArray`` hyperslabs, ``xdmfutils.py:38-181``)."""
    ndim = len(source_dims)
    item = etree.SubElement(
        parent,
        "DataItem",
        ItemType="HyperSlab",
        Dimensions=" ".join(str(c) for c in count),
    )
    sel = etree.SubElement(
        item, "DataItem", Dimensions=f"3 {ndim}", Format="XML"
    )
    sel.text = (
        " ".join(str(s) for s in start)
        + " "
        + " ".join(str(s) for s in stride)
        + " "
        + " ".join(str(c) for c in count)
    )
    _data_item(item, source_dims, h5_path)
    return item


def write_xdmf(
    statefile,
    xdmf_path: Optional[str] = None,
    vertex_fields: Sequence[str] = ("u", "v", "a"),
    scalar_vertex_fields: Sequence[str] = (),
) -> str:
    """
    Write an XDMF file for a statefile's trajectory
    (reference: ``write_xdmf``, ``xdmfutils.py:311-455``).

    Returns the XDMF path.  Open in ParaView alongside the HDF5 file.
    """
    f = statefile
    h5_name = path.basename(f.file.filename)
    if xdmf_path is None:
        xdmf_path = path.splitext(f.file.filename)[0] + ".xdmf"

    mesh_g = f.root_group["mesh/solid"]
    coords = mesh_g["coordinates"]
    conn = mesh_g["connectivity"]
    dim = int(mesh_g["dim"][()])
    n_vert, n_cell = coords.shape[0], conn.shape[0]
    times = f.get_times()
    T = len(times)

    root = etree.Element("Xdmf", Version="3.0")
    domain = etree.SubElement(root, "Domain")
    collection = etree.SubElement(
        domain,
        "Grid",
        Name="Trajectory",
        GridType="Collection",
        CollectionType="Temporal",
    )

    grp = f.group_name.strip("/")
    prefix = f"{h5_name}:/{grp}/" if grp else f"{h5_name}:/"

    state_dims = {
        key: f.root_group["state"][key].shape for key in f.root_group["state"]
    }

    for n in range(T):
        grid = etree.SubElement(
            collection, "Grid", Name=f"t{n}", GridType="Uniform"
        )
        etree.SubElement(grid, "Time", Value=repr(float(times[n])))
        topo = etree.SubElement(
            grid,
            "Topology",
            TopologyType=_TOPOLOGY_TYPE[dim],
            NumberOfElements=str(n_cell),
        )
        _data_item(
            topo, conn.shape, f"{prefix}mesh/solid/connectivity",
            number_type="Int",
        )
        geom = etree.SubElement(grid, "Geometry", GeometryType=_GEOMETRY_TYPE[dim])
        _data_item(geom, coords.shape, f"{prefix}mesh/solid/coordinates")

        for key in vertex_fields:
            if key not in state_dims:
                continue
            attr = etree.SubElement(
                grid,
                "Attribute",
                Name=key,
                AttributeType="Vector",
                Center="Node",
            )
            src_dims = state_dims[key]
            _hyperslab(
                attr,
                src_dims,
                (n, 0),
                (1, 1),
                (1, src_dims[1]),
                f"{prefix}state/{key}",
            )
        for key in scalar_vertex_fields:
            if key not in state_dims:
                continue
            attr = etree.SubElement(
                grid,
                "Attribute",
                Name=key,
                AttributeType="Scalar",
                Center="Node",
            )
            src_dims = state_dims[key]
            _hyperslab(
                attr, src_dims, (n, 0), (1, 1), (1, src_dims[1]),
                f"{prefix}state/{key}",
            )

    tree = etree.ElementTree(root)
    tree.write(
        xdmf_path, pretty_print=True, xml_declaration=True, encoding="utf-8"
    )
    return xdmf_path


def export_mesh_values(
    statefile, values: np.ndarray, name: str, h5_path: Optional[str] = None
):
    """
    Store a derived (cell- or vertex-centred) field into the statefile for
    XDMF reference (reference: ``export_mesh_values``,
    ``xdmfutils.py:187-308``).  With vertex-major dof ordering the values
    are written as-is.
    """
    g = statefile.root_group.require_group("export")
    if name in g:
        del g[name]
    g.create_dataset(name, data=np.asarray(values))
    return f"export/{name}"
