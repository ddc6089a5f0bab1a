"""
Domain (tensor) parallelism: element-partitioned operator application.

SURVEY section 2.10 maps the reference's (absent) tensor parallelism to
"shard the DOF axis of the assembled residual/SpMV across devices with
shard_map if a single mesh outgrows one chip".  This module implements
that: elements are partitioned across a device mesh; each device computes
its shard's element matvecs (the EBE kernel) and scatters into a local
copy of the global vector; a ``psum`` over ICI accumulates shared-vertex
contributions.

This is the building block for multi-chip Newton-Krylov on meshes that
exceed one chip's HBM; at M5 scale it exists for completeness and is
validated on the virtual CPU mesh.
"""

from __future__ import annotations

from functools import partial
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ..fem.assembly import EBEOperator


def pad_elements(J_cells, cell_dofs, n_shards: int):
    """Pad the element axis to a multiple of ``n_shards`` with zero blocks
    (scattered to dof 0 with zero values — harmless)."""
    ne = J_cells.shape[0]
    n_pad = (-ne) % n_shards
    if n_pad:
        J_cells = np.concatenate(
            [np.asarray(J_cells),
             np.zeros((n_pad,) + J_cells.shape[1:], J_cells.dtype)]
        )
        cell_dofs = np.concatenate(
            [np.asarray(cell_dofs),
             np.zeros((n_pad, cell_dofs.shape[1]), cell_dofs.dtype)]
        )
    return J_cells, cell_dofs


def sharded_ebe_matvec(
    op: EBEOperator, x: jnp.ndarray, mesh: Mesh, axis: str = "shard"
) -> jnp.ndarray:
    """
    Apply the EBE operator with elements sharded over ``mesh``.

    Each device holds a contiguous shard of element Jacobians; ``x`` is
    replicated (it is a single mesh's dof vector).  Per-device partial
    results are ``psum``-ed over ICI.
    """
    n_shards = mesh.devices.size
    Jc, dofs = pad_elements(op.J_cells, op.cell_dofs, n_shards)
    ndof = op.ndof
    bc_dofs = jnp.asarray(np.asarray(op.bc_dofs))

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P()),
        out_specs=P(),
    )
    def matvec_shard(J_shard, dofs_shard, x_rep):
        xc = x_rep[dofs_shard]  # (ne_local, nld)
        yc = jnp.einsum("eij,ej->ei", J_shard, xc)
        y_local = jnp.zeros(ndof, dtype=x_rep.dtype)
        y_local = y_local.at[dofs_shard.reshape(-1)].add(yc.reshape(-1))
        # accumulate shared-vertex contributions across shards over ICI
        return jax.lax.psum(y_local, axis)

    y = matvec_shard(jnp.asarray(Jc), jnp.asarray(dofs), x)
    if op.J_facets is not None and op.J_facets.shape[0] > 0:
        # facet contributions are few; apply unsharded
        xf = x[op.facet_dofs]
        yf = jnp.einsum("eij,ej->ei", op.J_facets, xf)
        y = y.at[jnp.asarray(np.asarray(op.facet_dofs)).reshape(-1)].add(
            yf.reshape(-1)
        )
    return y.at[bc_dofs].set(x[bc_dofs])


def sharded_pcg(op: EBEOperator, b: jnp.ndarray, mesh: Mesh,
                tol: float = 1e-8, max_iter: int = 500):
    """Jacobi-preconditioned CG with the sharded matvec — multi-chip
    Newton-Krylov's inner solve."""
    from ..solvers.linalg import pcg

    diag = op.diagonal()

    def mv(v):
        return sharded_ebe_matvec(op, v, mesh)

    return pcg(mv, b, precond_diag=diag, tol=tol, max_iter=max_iter)
