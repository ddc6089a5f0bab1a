"""
Pallas TPU kernels for the hot operators.

XLA already fuses most of this framework's element math well; these kernels
target the two places where explicit control of VMEM traffic pays at scale:

- ``ebe_matvec``: the element-by-element operator application
  ``y_e = J_e @ x_e`` over all elements — the inner loop of matrix-free CG
  on large meshes (the TPU-native replacement of PETSc SpMV, SURVEY
  section 2.9).  Tiled so each grid step streams one block of element
  Jacobians HBM -> VMEM and runs a batched small matmul on the MXU.
- ``newmark_update``: the fused elementwise Newmark velocity/acceleration
  update (one VMEM pass instead of several HBM round-trips).

On non-TPU backends the kernels run in interpreter mode so tests exercise
identical code paths.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..equations import newmark


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu",)


# -- EBE matvec ---------------------------------------------------------------


def _ebe_matvec_kernel(J_ref, x_ref, y_ref):
    # J_ref: (TILE_E, nld, nld); x_ref: (TILE_E, nld); y_ref: (TILE_E, nld)
    J = J_ref[:]
    x = x_ref[:]
    y_ref[:] = jax.lax.dot_general(
        J,
        x[:, :, None],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=J.dtype,
    )[:, :, 0]


def ebe_matvec(J_cells: jnp.ndarray, x_cells: jnp.ndarray,
               tile: int = 256) -> jnp.ndarray:
    """
    Batched per-element matvec ``y_e = J_e @ x_e``.

    ``J_cells``: (ne, nld, nld); ``x_cells``: (ne, nld).  The caller does the
    global gather/scatter (see ``fem.assembly.EBEOperator``).
    """
    ne, nld, _ = J_cells.shape
    tile = min(tile, ne)
    n_tiles = -(-ne // tile)
    pad = n_tiles * tile - ne
    if pad:
        J_cells = jnp.pad(J_cells, ((0, pad), (0, 0), (0, 0)))
        x_cells = jnp.pad(x_cells, ((0, pad), (0, 0)))

    y = pl.pallas_call(
        _ebe_matvec_kernel,
        out_shape=jax.ShapeDtypeStruct((n_tiles * tile, nld), J_cells.dtype),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, nld, nld), lambda i: (i, 0, 0)),
            pl.BlockSpec((tile, nld), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((tile, nld), lambda i: (i, 0)),
        interpret=_interpret(),
    )(J_cells, x_cells)
    return y[:ne]


def ebe_operator_matvec(op, x: jnp.ndarray, tile: int = 256) -> jnp.ndarray:
    """Full EBE operator application with the pallas inner kernel.

    Drop-in replacement for ``EBEOperator.matvec`` on large meshes.
    """
    # x.shape[0] (static) rather than op.ndof: the operator may be a scan
    # carry pytree, in which case its int leaves are traced
    y = jnp.zeros(x.shape[0], dtype=x.dtype)
    yc = ebe_matvec(op.J_cells, x[op.cell_dofs], tile=tile)
    y = y.at[op.cell_dofs.reshape(-1)].add(yc.reshape(-1))
    if op.J_facets is not None and op.J_facets.shape[0] > 0:
        yf = ebe_matvec(op.J_facets, x[op.facet_dofs], tile=tile)
        y = y.at[op.facet_dofs.reshape(-1)].add(yf.reshape(-1))
    return y.at[op.bc_dofs].set(x[op.bc_dofs])


# -- Block-banded matvec --------------------------------------------------------


def _bsb_matvec_kernel(h, xpad_ref, blocks_ref, y_ref):
    # xpad_ref: full padded x in VMEM (nblk+2h, b); blocks_ref: one tile
    # (TILE_N, nb, b, b); y_ref: (TILE_N, b)
    t = pl.program_id(0)
    tile_n = blocks_ref.shape[0]
    nb = blocks_ref.shape[1]
    b = blocks_ref.shape[3]
    # window of x covering this tile's band: rows [t*tile_n, ...) + offsets
    base = t * tile_n
    acc = jnp.zeros((tile_n, b), dtype=y_ref.dtype)
    for m in range(nb):
        xm = xpad_ref[pl.ds(base + m, tile_n), :]  # (TILE_N, b)
        acc += jax.lax.dot_general(
            blocks_ref[:, m],
            xm[:, :, None],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=acc.dtype,
        )[:, :, 0]
    y_ref[:, :] = acc


def bsb_matvec_pallas(plan, blocks: jnp.ndarray, x: jnp.ndarray,
                      tile: int = 8) -> jnp.ndarray:
    """Block-banded matvec as a Pallas kernel.

    The (small) padded x lives whole in VMEM; block tiles stream
    HBM -> VMEM once with no HBM materialization of the shifted-window
    tensor the XLA path builds.  Matches ``solvers.bsb.bsb_matvec``.
    """
    b, h, nb, nblk = plan.b, plan.h, plan.nb, plan.nblk
    pad_tail = nblk * b - plan.ndof
    xpad = jnp.pad(x, (h * b, h * b + pad_tail)).reshape(nblk + 2 * h, b)

    n_tiles = -(-nblk // tile)
    pad_blk = n_tiles * tile - nblk
    if pad_blk:
        blocks = jnp.pad(blocks, ((0, pad_blk), (0, 0), (0, 0), (0, 0)))
        xpad = jnp.pad(xpad, ((0, pad_blk), (0, 0)))

    y = pl.pallas_call(
        lambda xr, br, yr: _bsb_matvec_kernel(h, xr, br, yr),
        out_shape=jax.ShapeDtypeStruct((n_tiles * tile, b), blocks.dtype),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(xpad.shape, lambda i: (0, 0)),  # x whole in VMEM
            pl.BlockSpec((tile, nb, b, b), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((tile, b), lambda i: (i, 0)),
        interpret=_interpret(),
    )(xpad, blocks)
    return y.reshape(-1)[: plan.ndof]


# -- Fused Newmark update -------------------------------------------------------


def _newmark_kernel(u1_ref, u0_ref, v0_ref, a0_ref, coef_ref, v1_ref, a1_ref):
    u1, u0, v0, a0 = u1_ref[:], u0_ref[:], v0_ref[:], a0_ref[:]
    # coef: [dt, gamma, beta] in SMEM
    dt = coef_ref[0]
    gamma = coef_ref[1]
    beta = coef_ref[2]
    du = u1 - u0
    v1_ref[:] = (
        gamma / beta / dt * du
        - (gamma / beta - 1.0) * v0
        - dt * (gamma / 2.0 / beta - 1.0) * a0
    )
    a1_ref[:] = (
        1.0 / beta / dt**2 * (du - dt * v0) - (1.0 / 2.0 / beta - 1.0) * a0
    )


def newmark_update(u1, u0, v0, a0, dt, gamma=0.5, beta=0.25):
    """Fused (v1, a1) Newmark update (same math as
    ``equations.newmark.newmark_v/a``)."""
    shape = u1.shape
    flat = lambda a: a.reshape(-1)
    coef = jnp.asarray(
        [dt, gamma, beta], dtype=jnp.result_type(u1.dtype, jnp.float32)
    )
    v1, a1 = pl.pallas_call(
        _newmark_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((u1.size,), u1.dtype),
            jax.ShapeDtypeStruct((u1.size,), u1.dtype),
        ),
        interpret=_interpret(),
    )(flat(u1), flat(u0), flat(v0), flat(a0), coef)
    return v1.reshape(shape), a1.reshape(shape)
