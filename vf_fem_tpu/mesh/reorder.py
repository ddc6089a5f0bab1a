"""
Mesh vertex renumbering for bandwidth reduction.

The block-banded Jacobian format (``solvers.bsb``) needs the mesh numbered
so that adjacent vertices have nearby indices; reverse Cuthill–McKee on
the vertex adjacency graph gives bandwidth O(sqrt(n_vertices)) for planar
meshes.  Renumbering at load time keeps the framework's dof-ordering
invariant (``dof = vertex*dim + comp``) with no runtime permutation
anywhere on the device.

The reference has no analog (PETSc AIJ handles arbitrary orderings in C);
this is a TPU-specific preprocessing step.
"""

from __future__ import annotations

import numpy as np

from .core import INT, Mesh

__all__ = ["rcm_permutation", "rcm_mesh"]


def rcm_permutation(mesh: Mesh) -> np.ndarray:
    """RCM vertex permutation: ``perm[new_id] = old_id``."""
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    cells = np.asarray(mesh.cells)
    nv = mesh.num_vertices
    k = cells.shape[1]
    ii, jj = [], []
    for a in range(k):
        for bidx in range(k):
            if a != bidx:
                ii.append(cells[:, a])
                jj.append(cells[:, bidx])
    ii = np.concatenate(ii)
    jj = np.concatenate(jj)
    G = coo_matrix((np.ones_like(ii), (ii, jj)), shape=(nv, nv)).tocsr()
    return np.asarray(
        reverse_cuthill_mckee(G, symmetric_mode=True), dtype=np.int64
    )


def _entity_index(entities: np.ndarray) -> dict:
    return {
        tuple(sorted(row.tolist())): i for i, row in enumerate(entities)
    }


def rcm_mesh(mesh: Mesh, sort_cells: bool = True) -> Mesh:
    """Return a new :class:`Mesh` with RCM-renumbered vertices.

    All markers and subdomain names transfer: vertex markers permute,
    cell markers follow their cells, facet/edge markers are re-matched by
    vertex tuple.

    With ``sort_cells`` (default), cells are additionally sorted by their
    minimum renumbered vertex id, so that consecutive cells touch a
    contiguous vertex window — the precondition of the banded
    gather-free assembly (``fem.banded``) on top of the block-banded
    Jacobian (``solvers.bsb``).  This permutes the (user-visible) cell
    ids, which is why renumbering is opt-in at load time.
    """
    return permute_mesh(mesh, rcm_permutation(mesh), sort_cells=sort_cells)


def permute_mesh(mesh: Mesh, perm: np.ndarray, sort_cells: bool = True) -> Mesh:
    """Renumber vertices by ``perm`` (new id i <- old id perm[i]),
    transferring all markers/subdomains; the general form of
    :func:`rcm_mesh` for custom orderings."""
    perm = np.asarray(perm)
    inv = np.argsort(perm)

    coords2 = np.asarray(mesh.coords)[perm]
    cells2 = inv[np.asarray(mesh.cells)].astype(INT)
    cell_perm = (
        np.argsort(cells2.min(axis=1), kind="stable")
        if sort_cells
        else np.arange(cells2.shape[0])
    )
    cells2 = cells2[cell_perm]
    m2 = Mesh(coords2, cells2)

    dim = mesh.dim
    # vertex markers
    m2.mesh_functions[0][:] = mesh.mesh_functions[0][perm]
    m2.subdomains[0] = dict(mesh.subdomains[0])
    # cell markers follow the sorted cell order
    m2.mesh_functions[dim][:] = mesh.mesh_functions[dim][cell_perm]
    m2.subdomains[dim] = dict(mesh.subdomains[dim])
    # facet (and 3D edge) markers: match by renumbered vertex tuple
    for d in mesh.entities:
        if d in (0, dim):
            continue
        old_ents = np.asarray(mesh.entities[d])
        marked = np.nonzero(mesh.mesh_functions[d])[0]
        if marked.size == 0:
            m2.subdomains[d] = dict(mesh.subdomains[d])
            continue
        lookup = _entity_index(np.asarray(m2.entities[d]))
        mf2 = m2.mesh_functions[d]
        for e in marked:
            key = tuple(sorted(inv[old_ents[e]].tolist()))
            mf2[lookup[key]] = mesh.mesh_functions[d][e]
        m2.subdomains[d] = dict(mesh.subdomains[d])
    return m2
