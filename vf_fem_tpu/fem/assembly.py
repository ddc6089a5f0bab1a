"""
Global assembly: gather -> batched element kernels -> segment-sum scatter.

This replaces dolfin's C++ global assembler and PETSc AIJ insertion
(reference: ``src/femvf/models/assemblyutils.py:13-133``).  The design is
TPU-first:

- Residuals: ``vmap`` the element kernel over all cells/facets, then one
  ``segment_sum`` scatter into the global vector — a fully fused XLA program
  with static shapes.
- Jacobians: ``jax.jacfwd`` of the element kernel gives per-element dense
  blocks (a batched (nv*dim)^2 tensor).  These blocks are either scattered
  into a dense global matrix (small meshes, solved by LU on the MXU) or kept
  as an element-by-element (EBE) operator whose matvec is a batched matmul —
  the TPU-native "sparse matrix".
- Dirichlet BCs are row masks (zero residual rows, identity Jacobian rows),
  replacing ``dfn.DirichletBC.apply`` (reference: ``residuals/base.py:54-65``).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..mesh.core import Mesh
from . import elements
from .forms import CellGeom, FacetGeom, facet_restrict


class Topology(NamedTuple):
    """Static index arrays shipped to the device once.

    Facet-local structure is expressed as one-hot selector matrices
    (``facet_sel``/``facet_opp_sel``) rather than integer index arrays:
    inside kernels these become tiny matmuls, avoiding per-element dynamic
    gathers (slow and, fused, miscompiled on some TPU toolchains).
    """

    dim: int
    n_vertices: int
    n_cells: int
    cells: jnp.ndarray  # (nc, nv)
    # Marked (traction-subdomain) boundary facets:
    facet_cells: jnp.ndarray  # (nf,) adjacent cell index
    facet_floc: jnp.ndarray  # (nf, dim) local facet-vertex indices in the cell
    facet_fopp: jnp.ndarray  # (nf,) local index of the opposite vertex
    facet_sel: jnp.ndarray  # (nf, nv, dimf) one-hot facet-vertex selectors
    facet_opp_sel: jnp.ndarray  # (nf, nv) one-hot opposite-vertex selector
    # Quadrature tables
    cell_bary: jnp.ndarray
    cell_qw: jnp.ndarray
    facet_bary: jnp.ndarray
    facet_qw: jnp.ndarray


def build_topology(
    mesh: Mesh, traction_subdomains: Sequence[str] = ("pressure",)
) -> Topology:
    dim = mesh.dim
    cells = np.asarray(mesh.cells)

    try:
        marked = mesh.facets_by_subdomain(traction_subdomains)
    except KeyError:
        marked = np.zeros(0, dtype=np.int32)

    fcell = mesh.facet_to_cell[marked]
    fopp = mesh.facet_opposite_local_vertex[marked]
    # local indices of each facet vertex within the adjacent cell
    facet_verts = mesh.facets[marked]  # (nf, dim) global vertex ids
    cell_verts = cells[fcell]  # (nf, nv)
    floc = np.argmax(
        cell_verts[:, None, :] == facet_verts[:, :, None], axis=-1
    ).astype(np.int32)

    nv = dim + 1
    nf = len(marked)
    facet_sel = np.zeros((nf, nv, dim))
    facet_opp_sel = np.zeros((nf, nv))
    rows = np.arange(nf)
    for q in range(dim):
        facet_sel[rows, floc[:, q], q] = 1.0
    facet_opp_sel[rows, fopp] = 1.0

    cb, cw = elements.cell_quadrature(dim)
    fb, fw = elements.facet_quadrature(dim)
    # NOTE: all index/quadrature tables stay as *numpy* arrays: they are
    # embedded as constants at trace time.  Creating device arrays here
    # would issue eager ops, which are pathologically slow on remote TPU
    # backends (~1 s/op through the axon tunnel).
    return Topology(
        dim=dim,
        n_vertices=mesh.num_vertices,
        n_cells=cells.shape[0],
        cells=np.asarray(cells),
        facet_cells=np.asarray(fcell),
        facet_floc=np.asarray(floc),
        facet_fopp=np.asarray(fopp),
        facet_sel=facet_sel,
        facet_opp_sel=facet_opp_sel,
        cell_bary=np.asarray(cb),
        cell_qw=np.asarray(cw),
        facet_bary=np.asarray(fb),
        facet_qw=np.asarray(fw),
    )


def make_cell_geom(X_e: jnp.ndarray, topo: Topology) -> CellGeom:
    grads, vol = elements.cell_shape_gradients(X_e)
    return CellGeom(X=X_e, grads=grads, vol=vol, bary=topo.cell_bary, qw=topo.cell_qw)


def make_facet_geom(
    X_e: jnp.ndarray, sel: jnp.ndarray, opp_sel: jnp.ndarray, topo: Topology
) -> FacetGeom:
    grads, _ = elements.cell_shape_gradients(X_e)
    Xf = facet_restrict(X_e, sel)  # (dimf, dim) facet vertex coordinates
    nv = X_e.shape[0]
    X_opp = sum(opp_sel[v] * X_e[v] for v in range(nv))  # (dim,)
    meas, normal = elements.facet_measure_normal(Xf, X_opp)
    return FacetGeom(
        X=X_e,
        grads=grads,
        meas=meas,
        normal=normal,
        fbary=topo.facet_bary,
        fqw=topo.facet_qw,
        sel=sel,
    )


def scatter_add(
    res_cells: jnp.ndarray,
    vert_ids: jnp.ndarray,
    n_vertices: int,
) -> jnp.ndarray:
    """
    Sum per-element nodal contributions into a global (n_vertices, dim) array.

    ``res_cells``: (ne, nv, dim); ``vert_ids``: (ne, nv).
    """
    dim = res_cells.shape[-1]
    flat = res_cells.reshape(-1, dim)
    segs = vert_ids.reshape(-1)
    return jax.ops.segment_sum(flat, segs, num_segments=n_vertices)


def scatter_dense_jacobian(
    J_e: jnp.ndarray, dofs_e: jnp.ndarray, ndof: int, out: jnp.ndarray = None
) -> jnp.ndarray:
    """
    Scatter per-element Jacobian blocks into a dense (ndof, ndof) matrix.

    ``J_e``: (ne, nld, nld); ``dofs_e``: (ne, nld) global dof indices.
    """
    if out is None:
        out = jnp.zeros((ndof, ndof), dtype=J_e.dtype)
    rows = dofs_e[:, :, None]
    cols = dofs_e[:, None, :]
    return out.at[rows, cols].add(J_e)


def cell_dof_array(cells: np.ndarray, dim: int) -> np.ndarray:
    """(nc, nv*dim) global dof indices, vertex-major interleaved ordering."""
    nc, nv = cells.shape
    dofs = (np.asarray(cells)[:, :, None] * dim + np.arange(dim)[None, None, :])
    return dofs.reshape(nc, nv * dim)


def build_gather_map(dofs_arrays: Sequence[np.ndarray], ndof: int) -> np.ndarray:
    """Static transpose of the scatter pattern: for every global dof, the
    positions of its contributions in the concatenated per-element result.

    Scatter-adds serialize on TPU; with this (ndof, K) index table
    (entries index into ``concat(flattened element results, [0])``, padded
    rows pointing at the trailing zero) the EBE scatter becomes a dense
    gather + row sum — fully vectorized.  K = max contributions per dof
    (mesh valence * dim, a small constant).
    """
    flat = np.concatenate(
        [np.asarray(d).reshape(-1) for d in dofs_arrays if d is not None]
    ).astype(np.int64)
    n_src = flat.size
    order = np.argsort(flat, kind="stable")
    sorted_dofs = flat[order]
    counts = np.bincount(flat, minlength=ndof)
    K = int(counts.max()) if n_src else 1
    starts = np.zeros(ndof, dtype=np.int64)
    starts[1:] = np.cumsum(counts)[:-1]
    idx = np.full((ndof, K), n_src, dtype=np.int32)  # pad -> zero slot
    pos = np.arange(n_src) - starts[sorted_dofs]
    idx[sorted_dofs, pos] = order.astype(np.int32)
    return idx


class EBEOperator(NamedTuple):
    """
    Element-by-element linear operator: the TPU-native sparse matrix.

    ``matvec(x)`` = scatter(sum_e J_e @ gather_e(x)) — a batched small matmul
    that maps straight onto the MXU, with no irregular sparsity structure.
    """

    J_cells: jnp.ndarray  # (nc, nld, nld)
    cell_dofs: jnp.ndarray  # (nc, nld)
    J_facets: jnp.ndarray  # (nf, nld, nld) or None
    facet_dofs: jnp.ndarray  # (nf, nld) or None
    ndof: int
    bc_dofs: jnp.ndarray  # (n_bc,) constrained dof indices (identity rows)
    gather_idx: jnp.ndarray = None  # (ndof, K) static transpose of the
    # scatter pattern over concat(cell results, facet results, [0]); see
    # build_gather_map.  When present, matvec scatters by gather + row-sum
    # (scatter-add serializes on TPU).

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        # On TPU the batched small-matmul inner loop runs as a Pallas
        # kernel (tiled HBM->VMEM streaming of element blocks); elsewhere
        # XLA's einsum is equivalent.  Decided at trace time.
        import jax as _jax

        if _jax.default_backend() == "tpu":
            from ..ops import pallas_kernels as _pk

            yc = _pk.ebe_matvec(self.J_cells, x[self.cell_dofs])
        else:
            yc = jnp.einsum("eij,ej->ei", self.J_cells, x[self.cell_dofs])
        yf = None
        if self.J_facets is not None and self.J_facets.shape[0] > 0:
            yf = jnp.einsum("eij,ej->ei", self.J_facets, x[self.facet_dofs])
        return self._combine(yc, yf, x)

    def _combine(self, yc, yf, x):
        """Assemble per-element results into the global vector and apply
        identity Dirichlet rows."""
        if self.gather_idx is not None:
            parts = [yc.reshape(-1)]
            if yf is not None:
                parts.append(yf.reshape(-1))
            parts.append(jnp.zeros((1,), dtype=yc.dtype))
            src = jnp.concatenate(parts)
            y = jnp.sum(src[self.gather_idx], axis=1)
        else:
            # NOTE: x.shape[0] (static) rather than self.ndof — the
            # operator may be carried through lax.scan, where int leaves
            # trace
            y = jnp.zeros(x.shape[0], dtype=yc.dtype)
            y = y.at[self.cell_dofs.reshape(-1)].add(yc.reshape(-1))
            if yf is not None:
                y = y.at[self.facet_dofs.reshape(-1)].add(yf.reshape(-1))
        return y.at[self.bc_dofs].set(x[self.bc_dofs])

    def matvec_transpose(self, x: jnp.ndarray) -> jnp.ndarray:
        """Apply the transposed operator (adjoint solves): same EBE
        structure with each element block transposed."""
        xm = x.at[self.bc_dofs].set(0.0)
        yc = jnp.einsum("eji,ej->ei", self.J_cells, xm[self.cell_dofs])
        yf = None
        if self.J_facets is not None and self.J_facets.shape[0] > 0:
            yf = jnp.einsum("eji,ej->ei", self.J_facets, xm[self.facet_dofs])
        if self.gather_idx is not None:
            parts = [yc.reshape(-1)]
            if yf is not None:
                parts.append(yf.reshape(-1))
            parts.append(jnp.zeros((1,), dtype=yc.dtype))
            src = jnp.concatenate(parts)
            y = jnp.sum(src[self.gather_idx], axis=1)
        else:
            y = jnp.zeros(x.shape[0], dtype=yc.dtype)
            y = y.at[self.cell_dofs.reshape(-1)].add(yc.reshape(-1))
            if yf is not None:
                y = y.at[self.facet_dofs.reshape(-1)].add(yf.reshape(-1))
        # A^T with identity BC rows: columns at bc_dofs contribute only to
        # their own row
        return y.at[self.bc_dofs].add(x[self.bc_dofs])

    def to_dense(self) -> jnp.ndarray:
        A = scatter_dense_jacobian(self.J_cells, self.cell_dofs, self.ndof)
        if self.J_facets is not None and self.J_facets.shape[0] > 0:
            A = scatter_dense_jacobian(self.J_facets, self.facet_dofs, self.ndof, A)
        A = apply_dirichlet_rows(A, self.bc_dofs)
        return A

    def diagonal(self) -> jnp.ndarray:
        d = jnp.zeros(self.ndof, dtype=self.J_cells.dtype)
        dc = jnp.diagonal(self.J_cells, axis1=1, axis2=2)
        d = d.at[self.cell_dofs.reshape(-1)].add(dc.reshape(-1))
        if self.J_facets is not None and self.J_facets.shape[0] > 0:
            df = jnp.diagonal(self.J_facets, axis1=1, axis2=2)
            d = d.at[self.facet_dofs.reshape(-1)].add(df.reshape(-1))
        d = d.at[self.bc_dofs].set(1.0)
        return d

    def block_diag_inverse(self, block: int) -> jnp.ndarray:
        """
        Inverse of the nodal block diagonal: (ndof/block, block, block).

        The stronger cousin of Jacobi for vector problems: each vertex's
        dim x dim diagonal block is extracted via scatter-add over element
        blocks and inverted in closed form (batched, VPU-friendly).
        """
        from ..fem.elements import inv_small

        n_blocks = self.ndof // block
        D = jnp.zeros((n_blocks, block, block), dtype=self.J_cells.dtype)

        def add_blocks(D, J_e, dofs_e):
            ne, nld, _ = J_e.shape
            nodes = dofs_e // block  # (ne, nld)
            comps = dofs_e % block
            # accumulate J_e[i, j] into D[node_i, comp_i, comp_j] where
            # node_i == node_j (diagonal blocks only)
            same_node = nodes[:, :, None] == nodes[:, None, :]
            vals = jnp.where(same_node, J_e, 0.0)
            rows_n = jnp.broadcast_to(nodes[:, :, None], vals.shape)
            rows_c = jnp.broadcast_to(comps[:, :, None], vals.shape)
            cols_c = jnp.broadcast_to(comps[:, None, :], vals.shape)
            return D.at[
                rows_n.reshape(-1), rows_c.reshape(-1), cols_c.reshape(-1)
            ].add(vals.reshape(-1))

        D = add_blocks(D, self.J_cells, self.cell_dofs)
        if self.J_facets is not None and self.J_facets.shape[0] > 0:
            D = add_blocks(D, self.J_facets, self.facet_dofs)
        # Dirichlet rows/cols -> identity within the block
        bc_nodes = self.bc_dofs // block
        bc_comps = self.bc_dofs % block
        D = D.at[bc_nodes, bc_comps, :].set(0.0)
        D = D.at[bc_nodes, :, bc_comps].set(0.0)
        D = D.at[bc_nodes, bc_comps, bc_comps].set(1.0)
        return inv_small(D)

    def block_jacobi_apply(self, Dinv: jnp.ndarray, r: jnp.ndarray):
        block = Dinv.shape[-1]
        return jnp.einsum(
            "nij,nj->ni", Dinv, r.reshape(-1, block)
        ).reshape(-1)


def apply_dirichlet_rows(A: jnp.ndarray, bc_dofs: jnp.ndarray) -> jnp.ndarray:
    """Zero Dirichlet rows and put 1 on their diagonal (dolfin-style)."""
    if bc_dofs.shape[0] == 0:
        return A
    A = A.at[bc_dofs, :].set(0.0)
    A = A.at[bc_dofs, bc_dofs].set(1.0)
    return A


def dirichlet_vertex_mask(
    mesh: Mesh, subdomain_names: Sequence[str] = ("fixed",)
) -> np.ndarray:
    """Boolean (n_vertices,) mask of vertices on named facet subdomains."""
    facets = mesh.facets_by_subdomain(subdomain_names)
    verts = np.unique(mesh.facets[facets].reshape(-1))
    mask = np.zeros(mesh.num_vertices, dtype=bool)
    mask[verts] = True
    return mask
