"""
Multi-chip block-banded matvec: row-partitioned with ICI halo exchange.

The block-banded operator (``solvers.bsb``) couples block-row ``n`` only
to block-rows ``n-h .. n+h``, so the natural multi-chip decomposition is
contiguous block-row ranges per device: each device stores its slab of
``blocks`` and its slice of ``x``, and a matvec needs only the ``h``
boundary blocks of each neighbor — two ``jax.lax.ppermute`` halo
exchanges over ICI, no all-reduce, no replication.  (Contrast
``parallel.domain.sharded_ebe_matvec``, which psums full vectors — fine
for correctness-testing element sharding, wasteful at scale.)

This is the standard stencil/halo pattern of distributed banded solvers
mapped onto ``shard_map``; combined with the sharded dot products in
:func:`sharded_bsb_bicgstab` it gives a multi-chip Newton-Krylov inner
solve for meshes beyond one chip's HBM.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ..solvers.bsb import BSBPlan

__all__ = [
    "pad_plan_arrays",
    "sharded_bsb_matvec",
    "sharded_bsb_bicgstab",
    "dp_tp_bsb_matvec",
]


def pad_plan_arrays(plan: BSBPlan, blocks, x, n_shards: int):
    """Pad block-rows (and x) to a multiple of ``n_shards``."""
    nblk = plan.nblk
    pad = (-nblk) % n_shards
    b = plan.b
    if pad:
        blocks = jnp.pad(blocks, ((0, pad), (0, 0), (0, 0), (0, 0)))
        # padded rows must stay nonsingular for Krylov: identity diagonal
        eye = jnp.zeros((pad, plan.nb, b, b), dtype=blocks.dtype)
        eye = eye.at[:, plan.h].set(jnp.eye(b, dtype=blocks.dtype))
        blocks = blocks.at[nblk:].set(eye)
    xpad = jnp.pad(x, (0, (nblk + pad) * b - x.shape[0]))
    return blocks, xpad, nblk + pad


def _halo_mv_local(plan: BSBPlan, S: int, L: int, axis: str):
    """Per-shard halo-exchange banded matvec body shared by the TP and
    DP x TP entry points: two ``ppermute`` halo exchanges, end-zeroing
    of the wrapped halos, window stacking, one batched einsum."""
    b, h, nb = plan.b, plan.h, plan.nb

    def mv_local(blocks_l, x_l):
        # blocks_l: (L, nb, b, b); x_l: (L*b,)
        xb = x_l.reshape(L, b)
        right = jax.lax.ppermute(  # my top h rows -> next shard's left halo
            xb[-h:], axis, [(i, (i + 1) % S) for i in range(S)]
        )
        left = jax.lax.ppermute(  # my bottom h rows -> prev shard's right
            xb[:h], axis, [(i, (i - 1) % S) for i in range(S)]
        )
        idx = jax.lax.axis_index(axis)
        # zero the wrapped halos at the global ends
        right = jnp.where(idx == 0, jnp.zeros_like(right), right)
        left = jnp.where(idx == S - 1, jnp.zeros_like(left), left)
        xw_full = jnp.concatenate([right, xb, left], axis=0)  # (L+2h, b)
        wins = jnp.stack(
            [
                jax.lax.dynamic_slice(xw_full, (m, 0), (L, b))
                for m in range(nb)
            ],
            axis=1,
        )  # (L, nb, b)
        y = jnp.einsum("nmij,nmj->ni", blocks_l, wins)
        return y.reshape(-1)

    return mv_local


def sharded_bsb_matvec(
    plan: BSBPlan, blocks, x, mesh: Mesh, axis: str = "shard"
):
    """Apply the block-banded operator with block-rows sharded over
    ``mesh``; returns the (sharded) product as a global array.

    ``blocks``/``x`` must already be padded (``pad_plan_arrays``).
    """
    S = mesh.devices.size
    nblk_pad = blocks.shape[0]
    L = nblk_pad // S
    assert plan.h <= L, "halo wider than a shard; use fewer devices"

    mv = partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(axis),
    )(_halo_mv_local(plan, S, L, axis))
    return mv(blocks, x)


def dp_tp_bsb_matvec(
    plan: BSBPlan,
    blocks_b,
    x_b,
    mesh: Mesh,
    baxis: str = "batch",
    saxis: str = "shard",
):
    """Batched + row-sharded banded matvec over a 2D device mesh.

    Combines the two parallelism axes of SURVEY section 2.10 in one
    program: independent variants (DP) on ``baxis`` and block-row domain
    decomposition with ICI halo exchange (TP) on ``saxis`` — the layout
    of a sharded batched parameter study whose per-variant mesh exceeds
    one chip's HBM.

    ``blocks_b``: (B, nblk_pad, nb, b, b) per-variant banded Jacobians;
    ``x_b``: (B, nblk_pad*b).  Both batch and block-row dims must divide
    the respective mesh axis sizes (``pad_plan_arrays`` for the rows).
    """
    Sb = mesh.shape[baxis]
    S = mesh.shape[saxis]
    B, nblk_pad = x_b.shape[0], blocks_b.shape[1]
    assert B % Sb == 0, "batch must divide the DP mesh axis"
    L = nblk_pad // S
    assert plan.h <= L, "halo wider than a shard; use fewer devices"

    one = _halo_mv_local(plan, S, L, saxis)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(baxis, saxis), P(baxis, saxis)),
        out_specs=P(baxis, saxis),
    )
    def mv(blocks_l, x_l):
        # blocks_l: (B_l, L, nb, b, b); x_l: (B_l, L*b)
        return jax.vmap(one)(blocks_l, x_l)

    return mv(blocks_b, x_b)


def sharded_bsb_bicgstab(
    plan: BSBPlan, blocks, b_vec, mesh: Mesh,
    tol: float = 1e-8, max_iter: int = 500, axis: str = "shard",
):
    """BiCGStab with the halo-exchange matvec; all vector work stays
    sharded (XLA partitions the elementwise ops and inserts the psums for
    the dot products)."""
    from ..solvers import linalg

    S = mesh.devices.size
    blocks_p, b_pad, nblk_pad = pad_plan_arrays(plan, blocks, b_vec, S)

    def mv(v):
        return sharded_bsb_matvec(plan, blocks_p, v, mesh, axis)

    res = linalg.bicgstab(mv, b_pad, tol=tol, max_iter=max_iter)
    return res._replace(x=res.x[: plan.ndof])
