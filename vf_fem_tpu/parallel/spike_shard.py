"""
Multi-chip SPIKE: the partitioned block-tridiagonal direct solver with
one slab per device.

``solvers.spike`` factors the banded Jacobian into ``S`` independent
slab factorizations plus a tiny reduced interface system.  Here the slab
axis IS the device axis: each device Thomas-factors its own slab and
computes its spikes locally (zero communication beyond two neighbor
``ppermute``s for the transposed couplings), the reduced system is built
from one ``all_gather`` of the four ``Bt x Bt`` spike tips per device
and solved replicated (it is ``2 S`` blocks — microseconds), and each
solve needs only a second ``all_gather`` of the ``2 Bt`` interface
values.  Communication per solve: one ``all_gather`` of ``2 Bt`` floats
per device over ICI — O(interface), not O(dofs).

This is the distributed direct solver the block-Thomas recurrence
(``solvers.btd``) structurally cannot be, and the missing piece that
makes a *fully sharded* transient time step possible
(``parallel.ddstep``): the reference never runs parallel at all
(reference ``src/femvf/models/fsi.py:38-39``).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ..solvers.bsb import BSBPlan
from ..solvers import spike as sp

__all__ = [
    "ShardedSPIKE",
    "spike_factor_local",
    "spike_solve_local",
    "spike_solve_t_local",
    "sharded_spike_factor",
    "sharded_spike_solve",
]


class ShardedSPIKE(NamedTuple):
    """Slab-LOCAL factors as seen inside ``shard_map`` (leading axis 1)
    plus the replicated reduced-system factors."""

    Sinv: jnp.ndarray  # (1, m, Bt, Bt)
    P: jnp.ndarray  # products Sinv L (see solvers.spike.SPIKEFactors)
    Q: jnp.ndarray  # products Sinv U
    V: jnp.ndarray
    W: jnp.ndarray
    red: tuple  # (S, 2Bt, 2Bt) x3, replicated
    Vh: jnp.ndarray
    Wh: jnp.ndarray
    red_t: tuple


def _specs(axis: str):
    """PartitionSpec pytree matching :class:`ShardedSPIKE`."""
    return ShardedSPIKE(
        Sinv=P(axis), P=P(axis), Q=P(axis), V=P(axis), W=P(axis),
        red=(P(), P(), P()),
        Vh=P(axis), Wh=P(axis), red_t=(P(), P(), P()),
    )


def _shift_from_prev(x, axis: str, S: int):
    """Each device receives the previous device's ``x`` (device 0 gets
    zeros)."""
    y = jax.lax.ppermute(x, axis, [(i, i + 1) for i in range(S - 1)])
    return y


def _shift_from_next(x, axis: str, S: int):
    y = jax.lax.ppermute(x, axis, [(i + 1, i) for i in range(S - 1)])
    return y


def _pgather(x, axis: str, S: int):
    """All-gather with *replicated* result typing: scatter the local
    block into a zeros-(S, ...) array and ``psum``.  ``jax.lax.
    all_gather`` outputs are varying-typed under shard_map's replication
    checker, which would reject the (genuinely replicated) reduced
    system built from the gathered spike tips; the psum formulation is
    both replication-typed and equivalent on ICI."""
    idx = jax.lax.axis_index(axis)
    buf = jnp.zeros((S,) + x.shape, x.dtype).at[idx].set(x)
    return jax.lax.psum(buf, axis)


def spike_factor_local(D, L, U, B, C, axis: str, S: int) -> ShardedSPIKE:
    """Factor one slab inside ``shard_map``.

    ``D, L, U``: this device's (1, m, Bt, Bt) slab with inter-slab
    couplings already stripped; ``B, C``: its (1, Bt, Bt) couplings to
    the previous/next slab; ``S``: the (static) slab-axis size.  Local
    Thomas factorization + spike solves (communication: two neighbor
    ``ppermute``s for the transposed couplings, one ``all_gather`` of
    spike tips for the replicated reduced factorization).
    """
    Sinv, Pf, Qf = sp._local_factor(D, L, U)
    C_prev = _shift_from_prev(C, axis, S)
    B_next = _shift_from_next(B, axis, S)
    V, W, Vh, Wh = sp._spike_from_locals(
        Sinv, Pf, Qf, B, C, with_transpose=True,
        C_prev=C_prev, B_next=B_next,
    )

    def reduced(Vl, Wl):
        # (1, m, Bt, Bt) -> gathered 2-row spike-tip stand-ins; the
        # reduced builder only reads rows 0 and m-1
        tips = lambda X: _pgather(
            jnp.stack([X[0, 0], X[0, -1]], axis=0), axis, S
        )  # (S, 2, Bt, Bt)
        return sp._reduced_factor(tips(Vl), tips(Wl))

    return ShardedSPIKE(
        Sinv=Sinv, P=Pf, Q=Qf, V=V, W=W, red=reduced(V, W),
        Vh=Vh, Wh=Wh, red_t=reduced(Vh, Wh),
    )


def _interface_correct_local(g, red, V, W, axis: str):
    """Reduced interface solve + local spike correction inside
    ``shard_map``: one all_gather of the (2 Bt) slab interface values,
    replicated tiny Thomas solve, local correction."""
    _, m, Bt = g.shape
    S = red[0].shape[0]
    tips = jnp.concatenate([g[0, 0], g[0, m - 1]], axis=-1)  # (2Bt,)
    rhs = _pgather(tips, axis, S)  # (S, 2Bt)
    Sinv_r, L_r, U_r = red
    z = sp._seq_thomas_solve(Sinv_r, L_r, U_r, rhs)  # (S, 2Bt)
    idx = jax.lax.axis_index(axis)
    xt_next = jnp.where(
        idx < S - 1, z[jnp.minimum(idx + 1, S - 1), :Bt], 0.0
    )
    xb_prev = jnp.where(idx > 0, z[jnp.maximum(idx - 1, 0), Bt:], 0.0)

    def mv(A, x):
        return sp._mixed_einsum("smij,j->smi", A, x)

    return g - mv(V, xt_next) - mv(W, xb_prev)


def spike_solve_local(fac: ShardedSPIKE, rb, axis: str):
    """Solve ``A x = r`` for this device's (1, m, Bt) slab inside
    ``shard_map``."""
    g = sp._local_solve(fac.Sinv, fac.P, fac.Q, rb)
    return _interface_correct_local(g, fac.red, fac.V, fac.W, axis)


def spike_solve_t_local(fac: ShardedSPIKE, rb, axis: str):
    g = sp._local_solve_t(fac.Sinv, fac.P, fac.Q, rb)
    return _interface_correct_local(g, fac.red_t, fac.Vh, fac.Wh, axis)


# ----------------------------------------------------------------------------
# Global-array convenience drivers (factor + solve as one shard_map each):
# used by tests and the driver dryrun; the production sharded time step
# (parallel.ddstep) keeps everything inside one shard_map program.
# ----------------------------------------------------------------------------


def sharded_spike_factor(
    plan: BSBPlan, blocks, mesh: Mesh, axis: str = "shard"
):
    """Factor with one SPIKE slab per device of ``mesh``; returns
    ``(factors, d)`` with the large factor arrays sharded over the slab
    axis and the reduced factors replicated."""
    S = mesh.devices.size
    D, L, U, B, C, d = sp.spike_superblocks(plan, blocks, S)

    fn = partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=_specs(axis),
    )(lambda *args: spike_factor_local(*args, axis, S))
    return fn(D, L, U, B, C), d


def sharded_spike_solve(
    plan: BSBPlan,
    factors: ShardedSPIKE,
    d,
    r,
    mesh: Mesh,
    axis: str = "shard",
    transpose: bool = False,
):
    """Solve with slab-sharded factors; ``r`` is the global RHS."""
    S = mesh.devices.size
    m, Bt = factors.Sinv.shape[1], factors.Sinv.shape[2]
    npad = S * m * Bt - r.shape[0]
    rb = jnp.pad(r / d[: r.shape[0]], (0, npad)).reshape(S, m, Bt)

    local = spike_solve_t_local if transpose else spike_solve_local
    fn = partial(
        shard_map,
        mesh=mesh,
        in_specs=(_specs(axis), P(axis)),
        out_specs=P(axis),
    )(lambda fac, rb_l: local(fac, rb_l, axis))
    x = fn(factors, rb)
    return x.reshape(-1)[: r.shape[0]] / d[: r.shape[0]]
