"""
Banded (gather-free) element assembly for bandwidth-ordered meshes.

TPUs have no hardware gather/scatter: the per-cell coefficient gather
(``u[cells]``) and the ``segment_sum`` scatter in the residual assembly are
emulated element-at-a-time and, together with the padded-layout traffic of
small-trailing-dim arrays, dominate large-mesh stepping.  This module
removes both.

The structure exploited is the same as ``solvers.bsb``: after RCM vertex
renumbering (``mesh.reorder.rcm_mesh``, which also sorts cells by their
minimum vertex id), any chunk of ``gc`` consecutive cells touches only a
small contiguous vertex window of size ``w`` = O(bandwidth).  Assembly
then becomes, per chunk and per local vertex slot v:

    gather:   locals[v] = F[:, base : base + w] @ onehot(delta_v)^T
    scatter:  R[:, base : base + w] += locals[v] @ onehot(delta_v)

where the one-hot selector is generated *on chip* (an iota comparison in
VMEM) and never touches HBM — this is the part XLA cannot do, which is why
these are Pallas kernels.

Layouts are SoA ("channels-major", element index last, on vector lanes):

- fields     F: (C, n_vertices)   — all cg1 channels stacked
- locals:      (nv, C, ncells_pad) — feeds ``vmap(kernel, in_axes=-1)``
- assembled R: (C, n_rows)

so every per-element scalar in the downstream element kernel is a full
(ncells,) lane vector; AoS layouts like (nc, nv, dim) pay an ~8-64x
padded-tile tax on every HBM materialization (measured).

The gather is exact (one-hot rows copy single f32 values; the bf16x3 MXU
decomposition reproduces f32 products with 1.0 exactly).

Replaces the irregular-access half of dolfin's C++ assembler
(reference: ``src/femvf/models/assemblyutils.py:13-133``); the reference
outsources it to dolfin/PETSc CPU code, which has hardware gathers.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = [
    "BandedPlan",
    "plan_banded",
    "banded_gather",
    "banded_scatter",
    "banded_gather_t",
    "banded_scatter_t",
]


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu",)


class BandedPlan(NamedTuple):
    """Static (host-built) plan for banded gather/scatter.

    ``vma``: varying-axes set for pallas outputs when the kernels run
    inside ``jax.shard_map`` (jax 0.9 VMA typing requires declaring it);
    None outside shard_map.

    ``delta_g`` duplicates a real cell of the same group into padding slots
    (so padded lanes gather finite, geometrically valid data), while
    ``delta_s`` marks them ``w`` (no iota match -> zero one-hot row), so
    padding never contributes to the assembled result and no inf/NaN is
    ever created or masked.  Delta arrays are vertex-slot-major
    ``(ngroups, nv, gc)`` (``gc`` is constrained to a multiple of 128,
    the TPU lane width).
    """

    ngroups: int
    gc: int  # cells per group (multiple of 128)
    nv: int  # vertices per cell
    w: int  # vertex window width (multiple of 128)
    nvert_pad: int  # padded vertex count (>= max(base) + w)
    ncells: int
    base: np.ndarray  # (ngroups,) int32 window starts (multiples of 128)
    delta_g: np.ndarray  # (ngroups, nv, gc) int32 gather offsets
    delta_s: np.ndarray  # (ngroups, nv, gc) int32 scatter offsets
    cells_pad: np.ndarray  # (ngroups*gc, nv) cells with padding rows
    # duplicated from real cells
    vma: object = None  # varying mesh axes under shard_map (or None)


def plan_banded(
    cells: np.ndarray,
    n_vertices: int,
    gc: int = 128,
    max_window: int = 2048,
    n_real: int = None,
    w_force: int = None,
    nvert_pad_min: int = None,
) -> BandedPlan:
    """Chunk cells into groups of ``gc`` and compute their vertex windows.

    Requires cells sorted by min vertex id on an RCM-renumbered mesh
    (``mesh.reorder.rcm_mesh``); asserts if the realized window exceeds
    ``max_window``.

    ``n_real`` marks ``cells[n_real:]`` as pre-padded duplicates (their
    scatter offsets are masked so they never contribute — the caller
    equalizes cell counts across shard_map slabs this way);
    ``w_force``/``nvert_pad_min`` force a common window width / padded
    vertex count across per-slab plans (shard_map runs one program on
    every device, so the plan shapes must agree).
    """
    assert gc % 128 == 0, "gc must be a multiple of 128 (TPU lane width)"
    cells = np.asarray(cells)
    nc, nv = cells.shape
    if n_real is None:
        n_real = nc
    # n_real == 0 is allowed: a fully-masked plan (every scatter slot
    # dumped) for empty shard_map slabs running the common program
    ngroups = -(-nc // gc)
    npad = ngroups * gc - nc
    # padding duplicates the last real cell (finite geometry, masked in
    # the scatter offsets)
    cells_pad = np.concatenate(
        [cells, np.broadcast_to(cells[-1:], (npad, nv))], axis=0
    )
    grouped = cells_pad.reshape(ngroups, gc, nv)

    gmin = grouped.reshape(ngroups, -1).min(axis=1)
    gmax = grouped.reshape(ngroups, -1).max(axis=1)
    base = (gmin // 128) * 128  # lane-aligned window starts
    span = int((gmax - base + 1).max())
    w = -(-span // 128) * 128
    assert w <= max_window, (
        f"banded-assembly window {w} > {max_window}: the mesh is not"
        " bandwidth-ordered; renumber with mesh.reorder.rcm_mesh"
        " before building the model"
    )
    if w_force is not None:
        assert w_force >= w and w_force % 128 == 0
        w = w_force

    delta = np.transpose(
        grouped - base[:, None, None], (0, 2, 1)
    )  # (ngroups, nv, gc) vertex-slot-major
    delta_g = delta.astype(np.int32)
    delta_s = delta_g.copy()
    # mask every padded slot (internal tail padding and caller-marked
    # duplicate cells): no iota match -> zero one-hot scatter row
    flat_idx = np.arange(ngroups * gc).reshape(ngroups, gc)
    pad_slots = flat_idx >= n_real  # (ngroups, gc)
    delta_s[np.broadcast_to(pad_slots[:, None, :], delta_s.shape)] = w
    nvert_pad = int(base.max()) + w
    if nvert_pad_min is not None:
        nvert_pad = max(nvert_pad, int(nvert_pad_min))
    return BandedPlan(
        ngroups=ngroups,
        gc=gc,
        nv=nv,
        w=w,
        nvert_pad=nvert_pad,
        ncells=nc,
        base=base.astype(np.int32),
        delta_g=delta_g,
        delta_s=delta_s,
        cells_pad=cells_pad,
    )


def _gather_kernel(base_ref, delta_ref, F_ref, out_ref, *, w, nv, gc):
    # plan guarantees lane alignment; Mosaic needs it stated to allow a
    # dynamic lane-dimension slice
    base = pl.multiple_of(base_ref[pl.program_id(0)], 128)
    win = F_ref[:, pl.ds(base, w)]  # (C, w)
    for v in range(nv):  # static unroll
        d = delta_ref[0, v]  # (gc,)
        iota = jax.lax.broadcasted_iota(jnp.int32, (gc, w), 1)
        oh = (d[:, None] == iota).astype(F_ref.dtype)  # (gc, w)
        out_ref[v] = jax.lax.dot_general(
            win,
            oh,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=F_ref.dtype,
        )  # (C, gc)


def _scatter_kernel(base_ref, delta_ref, loc_ref, out_ref, *, w, nv, gc):
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    base = pl.multiple_of(base_ref[g], 128)
    acc = None
    for v in range(nv):  # static unroll
        d = delta_ref[0, v]  # (gc,)
        iota = jax.lax.broadcasted_iota(jnp.int32, (gc, w), 1)
        oh = (d[:, None] == iota).astype(loc_ref.dtype)  # (gc, w)
        contrib = jax.lax.dot_general(
            loc_ref[v],  # (C, gc)
            oh,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=loc_ref.dtype,
        )  # (C, w)
        acc = contrib if acc is None else acc + contrib
    cur = out_ref[:, pl.ds(base, w)]
    out_ref[:, pl.ds(base, w)] = cur + acc


def _xla_gather(plan: BandedPlan, F: jnp.ndarray) -> jnp.ndarray:
    """Indexed-gather reference implementation (same layout contract as
    the Pallas kernel).  Used for non-TPU lowerings of a TPU-default
    process (e.g. a CPU baseline leg pinned off the default device).

    Entries with ``delta == w`` (padding markers — present when the
    scatter offsets are substituted in by ``_banded_scatter_bwd``) must
    read as ZERO, exactly like the kernel's no-match one-hot row."""
    delta = jnp.asarray(plan.delta_g)
    idx = jnp.asarray(plan.base)[:, None, None] + delta
    out = F[:, idx]  # (C, ngroups, nv, gc); clamped reads masked below
    out = jnp.where((delta < plan.w)[None], out, 0.0)
    return jnp.transpose(out, (2, 0, 1, 3)).reshape(
        plan.nv, F.shape[0], plan.ngroups * plan.gc
    )


def _xla_scatter(plan: BandedPlan, loc: jnp.ndarray) -> jnp.ndarray:
    """Segment-sum reference implementation of the banded scatter.
    Exact up to summation order (collision sums may associate
    differently than the kernel's fixed per-group order)."""
    nv, C, gc, ng = plan.nv, loc.shape[1], plan.gc, plan.ngroups
    base = jnp.asarray(plan.base)[:, None, None]
    delta = jnp.asarray(plan.delta_s)
    # padding slots (delta == w) go to an overflow bin that is dropped
    idx = jnp.where(delta == plan.w, plan.nvert_pad, base + delta)
    flat_idx = jnp.transpose(idx, (1, 0, 2)).reshape(-1)  # (nv*ng*gc,)
    li = jnp.moveaxis(loc.reshape(nv, C, ng, gc), 1, -1)  # (nv, ng, gc, C)
    flat_val = li.reshape(-1, C)
    out = jax.ops.segment_sum(
        flat_val, flat_idx, num_segments=plan.nvert_pad + 1
    )
    return out[: plan.nvert_pad].T


def _pallas_gather(plan: BandedPlan, F: jnp.ndarray) -> jnp.ndarray:
    """F: (C, nvert_pad) -> (nv, C, ngroups*gc)."""
    from jax.experimental.pallas import tpu as pltpu

    C = F.shape[0]
    nv, gc = plan.nv, plan.gc
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(plan.ngroups,),
        in_specs=[
            pl.BlockSpec((1, nv, gc), lambda g, base: (g, 0, 0)),
            pl.BlockSpec((C, plan.nvert_pad), lambda g, base: (0, 0)),
        ],
        out_specs=pl.BlockSpec((nv, C, gc), lambda g, base: (0, 0, g)),
    )
    return pl.pallas_call(
        partial(_gather_kernel, w=plan.w, nv=nv, gc=gc),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (nv, C, plan.ngroups * gc), F.dtype, vma=plan.vma
        ),
        interpret=_interpret(),
    )(jnp.asarray(plan.base), jnp.asarray(plan.delta_g), F)


def _pallas_scatter(plan: BandedPlan, loc: jnp.ndarray) -> jnp.ndarray:
    """loc: (nv, C, ngroups*gc) -> (C, nvert_pad)."""
    from jax.experimental.pallas import tpu as pltpu

    C = loc.shape[1]
    nv, gc = plan.nv, plan.gc
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(plan.ngroups,),
        in_specs=[
            pl.BlockSpec((1, nv, gc), lambda g, base: (g, 0, 0)),
            pl.BlockSpec((nv, C, gc), lambda g, base: (0, 0, g)),
        ],
        out_specs=pl.BlockSpec(
            (C, plan.nvert_pad), lambda g, base: (0, 0)
        ),
    )
    return pl.pallas_call(
        partial(_scatter_kernel, w=plan.w, nv=nv, gc=gc),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (C, plan.nvert_pad), loc.dtype, vma=plan.vma
        ),
        interpret=_interpret(),
    )(jnp.asarray(plan.base), jnp.asarray(plan.delta_s), loc)


def _gather_impl(plan: BandedPlan, F: jnp.ndarray) -> jnp.ndarray:
    if _interpret():
        # cpu-default process (tests): interpret-mode kernel everywhere
        return _pallas_gather(plan, F)
    if F.dtype == jnp.float64:
        # XLA's TPU f64 is an HLO-level software-emulation rewrite that
        # Mosaic does not perform — the one-hot dot_general cannot run
        # f64 inside a Pallas kernel.  The mixed-precision path (f64
        # state + f32 factors) takes the indexed gather instead.
        return _xla_gather(plan, F)
    # tpu-default process: native kernel for TPU lowerings; indexed
    # fallback when the same program is lowered for another platform
    # (e.g. a CPU baseline leg in a TPU process)
    return jax.lax.platform_dependent(
        F,
        tpu=partial(_pallas_gather, plan),
        default=partial(_xla_gather, plan),
    )


def _scatter_impl(plan: BandedPlan, loc: jnp.ndarray) -> jnp.ndarray:
    if _interpret():
        return _pallas_scatter(plan, loc)
    if loc.dtype == jnp.float64:
        return _xla_scatter(plan, loc)  # no f64 dot_general in Mosaic
    return jax.lax.platform_dependent(
        loc,
        tpu=partial(_pallas_scatter, plan),
        default=partial(_xla_scatter, plan),
    )


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def banded_gather(plan: BandedPlan, F: jnp.ndarray) -> jnp.ndarray:
    """Gather per-cell locals from stacked vertex fields.

    ``F``: (C, n_vertices) channels-major stacked cg1 coefficients.
    Returns (nv, C, ngroups*gc) — vertex-slot/channel-major locals whose
    last axis is the (padded) cell index, ready for
    ``vmap(elem_kernel, in_axes=-1)``.

    Linear; reverse-mode differentiates to the banded scatter (the exact
    transpose), so IFT adjoints through the residual stay exact.  Not
    ``jax.jvp``-able (custom_vjp) — forward-mode callers use the plain
    indexed gather.
    """
    F = jnp.pad(F, ((0, 0), (0, plan.nvert_pad - F.shape[1])))
    return _gather_impl(plan, F)


def _banded_gather_fwd(plan, F):
    return banded_gather(plan, F), (F.shape[1],)


def _banded_gather_bwd(plan, saved, ct):
    (nvert,) = saved
    # transpose of the *gather* pattern: padded slots read real cells, so
    # their cotangents flow back — scatter with the gather offsets
    out = _scatter_impl(plan._replace(delta_s=plan.delta_g), ct)
    return (out[:, :nvert],)


banded_gather.defvjp(_banded_gather_fwd, _banded_gather_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(0, 2))
def banded_scatter(plan: BandedPlan, loc: jnp.ndarray, n_rows: int):
    """Scatter-add per-cell nodal values into a global (C, n_rows) array.

    ``loc``: (nv, C, ngroups*gc) — the transpose of :func:`banded_gather`
    restricted to real cells (padding slots are dropped via ``delta_s``).
    """
    out = _scatter_impl(plan, loc)
    return out[:, :n_rows]


def _banded_scatter_fwd(plan, loc, n_rows):
    return banded_scatter(plan, loc, n_rows), None


def _banded_scatter_bwd(plan, n_rows, _saved, ct):
    ctpad = jnp.pad(ct, ((0, 0), (0, plan.nvert_pad - ct.shape[1])))
    # transpose of scatter = gather with the scatter offsets (padding
    # slots get zero cotangents)
    out = _gather_impl(plan._replace(delta_g=plan.delta_s), ctpad)
    return (out,)


banded_scatter.defvjp(_banded_scatter_fwd, _banded_scatter_bwd)


# ---------------------------------------------------------------------------
# Traced-plan variants: identical kernels, but ``base``/``delta`` are
# *traced array* arguments instead of host-plan constants.  Needed inside
# ``shard_map`` programs where every device runs one program over its own
# slab's plan arrays (sharded operands) — only the shape metadata
# ``meta = (ngroups, gc, nv, w, nvert_pad, mesh_axis_or_None)`` stays
# static and must agree across slabs (``parallel.ddstep`` equalizes it).
# The index arrays are integer-valued primals; their cotangents are
# float0.
# ---------------------------------------------------------------------------


def _plan_like(meta, base, delta_g, delta_s) -> BandedPlan:
    ngroups, gc, nv, w, nvert_pad, axis = meta
    vma = frozenset((axis,)) if axis is not None else None
    return BandedPlan(
        ngroups=ngroups, gc=gc, nv=nv, w=w, nvert_pad=nvert_pad,
        ncells=ngroups * gc, base=base, delta_g=delta_g, delta_s=delta_s,
        cells_pad=None, vma=vma,
    )


def _int_zero_ct(x):
    return np.zeros(jnp.shape(x), dtype=jax.dtypes.float0)


def _gather_impl_t(plan: BandedPlan, F: jnp.ndarray) -> jnp.ndarray:
    """Impl selection for the traced-plan variants: the native kernel on
    TPU; the XLA reference everywhere else.  (Interpret-mode Pallas
    inside shard_map trips jax's VMA checker on the interpreter's
    internal loop state — the single-chip interpret tests cover the
    kernels themselves.)"""
    if _interpret() or F.dtype == jnp.float64:
        return _xla_gather(plan, F)  # no f64 dot_general in Mosaic
    return jax.lax.platform_dependent(
        F,
        tpu=partial(_pallas_gather, plan),
        default=partial(_xla_gather, plan),
    )


def _scatter_impl_t(plan: BandedPlan, loc: jnp.ndarray) -> jnp.ndarray:
    if _interpret() or loc.dtype == jnp.float64:
        return _xla_scatter(plan, loc)  # no f64 dot_general in Mosaic
    return jax.lax.platform_dependent(
        loc,
        tpu=partial(_pallas_scatter, plan),
        default=partial(_xla_scatter, plan),
    )


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def banded_gather_t(meta, base, delta_g, F):
    """:func:`banded_gather` with traced ``base``/``delta_g`` arrays."""
    plan = _plan_like(meta, base, delta_g, delta_g)
    F = jnp.pad(F, ((0, 0), (0, plan.nvert_pad - F.shape[1])))
    return _gather_impl_t(plan, F)


def _banded_gather_t_fwd(meta, base, delta_g, F):
    return banded_gather_t(meta, base, delta_g, F), (
        base, delta_g, F.shape[1],
    )


def _banded_gather_t_bwd(meta, saved, ct):
    base, delta_g, nvert = saved
    # transpose of the gather pattern: scatter with the gather offsets
    plan = _plan_like(meta, base, delta_g, delta_g)
    out = _scatter_impl_t(plan, ct)
    return (_int_zero_ct(base), _int_zero_ct(delta_g), out[:, :nvert])


banded_gather_t.defvjp(_banded_gather_t_fwd, _banded_gather_t_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(0, 4))
def banded_scatter_t(meta, base, delta_s, loc, n_rows):
    """:func:`banded_scatter` with traced ``base``/``delta_s`` arrays."""
    plan = _plan_like(meta, base, delta_s, delta_s)
    return _scatter_impl_t(plan, loc)[:, :n_rows]


def _banded_scatter_t_fwd(meta, base, delta_s, loc, n_rows):
    return banded_scatter_t(meta, base, delta_s, loc, n_rows), (
        base, delta_s,
    )


def _banded_scatter_t_bwd(meta, n_rows, saved, ct):
    base, delta_s = saved
    plan = _plan_like(meta, base, delta_s, delta_s)
    ctpad = jnp.pad(ct, ((0, 0), (0, plan.nvert_pad - ct.shape[1])))
    out = _gather_impl_t(plan, ctpad)
    return (_int_zero_ct(base), _int_zero_ct(delta_s), out)


banded_scatter_t.defvjp(_banded_scatter_t_fwd, _banded_scatter_t_bwd)
