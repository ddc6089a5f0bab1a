"""
DOF-sharded end-to-end transient FSI integration (domain decomposition).

Everything the single-chip integrator does — element assembly, banded
Jacobian fill, direct factorization, chord Newton, the 1D fluid
exchange, the whole ``lax.scan`` time loop, and the IFT adjoint — runs
inside ONE ``shard_map`` program with the solid DOF axis partitioned in
contiguous slabs over the device mesh:

- **Partitioning**: after RCM renumbering, block-rows group into
  ``Bt``-sized super-blocks (``solvers.bsb``/``btd``); each device owns
  ``m`` consecutive super-rows.  Cells are assigned to the slab of their
  minimum DOF; since the matrix bandwidth is at most ``Bt``, a cell's
  support spills at most ``Bt`` DOFs into the next slab — a fixed-width
  right halo.
- **Assembly**: per-slab element kernels (the same per-element closures
  as ``models.transient.SolidModel.jac_u_blocks``); gathers read the
  local slab plus one ``ppermute`` halo, scatters accumulate locally and
  ``ppermute``-add the spilled tail to the next device.
- **Linear algebra**: the banded slab is filled locally, equilibrated
  with neighbor scale halos, and factored by the distributed SPIKE
  solver (``parallel.spike_shard``) — local Thomas + spikes, replicated
  2S-block reduced system.  Solves communicate one ``all_gather`` of
  ``2 Bt`` interface values.
- **FSI exchange**: the 1D fluid is tiny; per-slab surface-area
  contributions are ``psum``-ed and the Bernoulli solve runs replicated,
  exactly reproducing the single-chip coupling.
- **Adjoint**: each Newton solve carries a ``custom_vjp`` IFT rule whose
  transposed solve is the sharded SPIKE transpose with stale-factor
  iterative refinement (the sharded analog of
  ``models.transient.solve_u1_stale_bwd``).

The reference cannot do any of this — it is explicitly single-process
(reference ``src/femvf/models/fsi.py:38-39``); this module is what lets
a mesh that outgrows one chip's HBM run the *production* direct-solver
path across a TPU pod slice.

Supported models: ``ExplicitFSIModel``, ``ImplicitFSIModel`` (dp-lockstep
Picard with a fixed-point IFT adjoint), and the two-way coupled FSAI
model (``load_fsai_model``) — every transient coupling family — on an
RCM-renumbered mesh, 2D or extruded 3D, with or without shape
(``umesh``) parameters — the traced shape displacement is a cg1_vector
coefficient, so it rides the existing per-slab (halo) gathers and the
sharded adjoint returns exact shape gradients
(ref shape calculus ``src/femvf/equations/form.py:1037-1062``).

**DP x TP**: constructed with ``dp_axis=...`` on a 2D device mesh, the
whole sharded program is vmapped over a local batch of variants
(state + properties batched, controls/times shared) and the batch axis
shards over the dp mesh axis — batched parameter sweeps of a mesh that
is itself too large for one chip (``integrate_batch_pure``).
"""

from __future__ import annotations

from functools import partial
from types import SimpleNamespace
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ..equations import newmark
from ..solvers.btd import _btd_from_bsb
from ..solvers.newton import (
    newton_solve,
    sanitize_err,
    sanitize_iterate,
    SolveInfo,
)
from ..models.transient import _params_key
from . import spike_shard as ss

__all__ = ["DDPlan", "plan_dd", "DDIntegrator"]


class DDPlan(NamedTuple):
    """Host-built static plan for the sharded step (all numpy)."""

    S: int
    b: int
    h: int
    Bt: int
    m: int  # super-rows per slab
    nblk_loc: int
    ndof_loc: int
    ndof: int
    ndof_pad: int
    nvert: int
    dim: int
    n_fl: int
    nv: int
    nld: int
    flat_size: int  # local band scatter size (nblk_loc+h)*nb*b*b
    # per-slab static arrays (leading S axis; sharded into the program)
    cells: np.ndarray  # (S, ncm, nv) global vertex ids
    cell_ids: np.ndarray  # (S, ncm) global cell ids (dg0 coefficients)
    cell_dofs_loc: np.ndarray  # (S, ncm, nld) slab-local dof indices
    cell_mask: np.ndarray  # (S, ncm)
    Xe_c: np.ndarray  # (S, ncm, nv, dim) cell vertex coordinates
    fcv: np.ndarray  # (S, nfm, nv) facet-cell vertex ids
    f_ids: np.ndarray  # (S, nfm) facet-cell global cell ids
    facet_dofs_loc: np.ndarray  # (S, nfm, nld)
    facet_mask: np.ndarray  # (S, nfm)
    facet_sel: np.ndarray  # (S, nfm, nv, dimf)
    facet_opp_sel: np.ndarray  # (S, nfm, nv)
    Xe_f: np.ndarray  # (S, nfm, nv, dim)
    bc_mask_loc: np.ndarray  # (S, ndof_loc)
    fill_tgt: np.ndarray  # (S, n_src) int32, dump slot = flat_size
    diag_idx: np.ndarray  # (S, n_diag) int32, dump slot = flat_size
    col_idx: np.ndarray  # (nblk_loc, nb) shared column-scale block index
    fl_idx: np.ndarray  # (S, nflm) fluid dof owned (dump = n_fl)
    fl_udof: np.ndarray  # (S, nflm) local dof of the y displacement
    fl_y: np.ndarray  # (S, nflm) reference y coordinate
    fl_vert: np.ndarray  # (S, nflm) global surface vertex id (umesh y)
    fl_mask: np.ndarray  # (S, nflm)


def _pad_groups(idx_lists, pad_value_fn, max_len=None):
    """Pad per-slab index lists to equal length; empty slabs get one
    masked entry from ``pad_value_fn(s)``."""
    n = max(max(len(g) for g in idx_lists), 1)
    if max_len is not None:
        n = max(n, max_len)
    out, mask = [], []
    for s, g in enumerate(idx_lists):
        g = list(g)
        msk = [1.0] * len(g)
        while len(g) < n:
            g.append(pad_value_fn(s, g))
            msk.append(0.0)
        out.append(g)
        mask.append(msk)
    return np.asarray(out), np.asarray(mask)


def plan_dd(model, n_shards: int) -> DDPlan:
    """Partition an ``ExplicitFSIModel`` over ``n_shards`` DOF slabs."""
    solid = model.solid
    R = solid._residual
    topo = R.topology
    bsbp = solid._get_bsb_plan()
    b, h, nb = bsbp.b, bsbp.h, bsbp.nb
    ndof, nblk = solid.ndof, bsbp.nblk
    S = int(n_shards)
    n_sup = -(-nblk // h)
    m = -(-n_sup // S)  # >= 1; slabs beyond n_sup are fully-masked pads
    if n_sup < S:
        import warnings

        warnings.warn(
            f"plan_dd: the mesh bandwidth (half-band {h} blocks,"
            f" Bt={h * b}) leaves only {n_sup} super-rows for {S}"
            f" shards —"
            f" {S - n_sup} slabs will be EMPTY and the partition is"
            " effectively serial.  RCM-renumber the mesh"
            " (mesh.reorder.rcm_mesh / loader reorder='rcm') for a"
            " balanced bandwidth-ordered partition",
            RuntimeWarning,
        )
    nblk_loc = m * h
    ndof_loc = nblk_loc * b
    ndof_pad = S * ndof_loc
    Bt = h * b
    dim, nvert = solid.dim, solid.nvert
    cells = np.asarray(topo.cells)
    nc, nv = cells.shape
    nld = nv * dim
    cdofs = np.asarray(solid._cell_dofs)
    fcells = np.asarray(topo.facet_cells)
    fdofs = np.asarray(solid._facet_cell_dofs)
    nf = fcells.shape[0]
    Xref = np.asarray(solid._Xref)

    bc = np.zeros(ndof_pad, dtype=bool)
    bc[np.asarray(R.bc_dofs)] = True
    bc[ndof:] = True  # global padding rows are identity rows

    # --- element -> slab assignment by minimum dof --------------------------
    def check_and_assign(darr):
        s = darr.min(axis=1) // ndof_loc
        spill = darr.max(axis=1) - s * ndof_loc
        if not (spill < ndof_loc + Bt).all():
            raise ValueError(
                "plan_dd: an element's dof support exceeds one halo"
                f" width (max spill {int(spill.max())} >= slab"
                f" {ndof_loc} + halo {Bt}).  The mesh bandwidth is too"
                " large for this slab size: RCM-renumber the mesh"
                " (mesh.reorder.rcm_mesh / loader reorder='rcm') or"
                " reduce n_shards"
            )
        return s

    sc = check_and_assign(cdofs) if nc else np.zeros(0, int)
    sf = check_and_assign(fdofs) if nf else np.zeros(0, int)

    cell_groups = [np.nonzero(sc == s)[0] for s in range(S)]
    facet_groups = [np.nonzero(sf == s)[0] for s in range(S)]
    pad_c = lambda s, g: g[0] if g else 0
    pad_f = lambda s, g: g[0] if g else 0
    cell_ids, cell_mask = _pad_groups(cell_groups, pad_c)
    f_sel_ids, facet_mask = _pad_groups(facet_groups, pad_f)
    ncm, nfm = cell_ids.shape[1], f_sel_ids.shape[1]

    def loc_dofs(ids, mask, darr, s):
        d = darr[ids] - s * ndof_loc
        # padding entries may index elements of other slabs (empty-slab
        # fallback): clamp into the valid gather range; masked anyway
        return np.clip(d, 0, ndof_loc + Bt - 1)

    cell_dofs_loc = np.stack(
        [loc_dofs(cell_ids[s], cell_mask[s], cdofs, s) for s in range(S)]
    )
    facet_dofs_loc = np.stack(
        [loc_dofs(f_sel_ids[s], facet_mask[s], fdofs, s) for s in range(S)]
    )

    cells_s = cells[cell_ids]  # (S, ncm, nv)
    Xe_c = Xref[cells_s]
    fcv = cells[fcells][f_sel_ids] if nf else np.zeros(
        (S, nfm, nv), dtype=cells.dtype
    )
    Xe_f = Xref[fcv]
    facet_sel = np.asarray(topo.facet_sel)[f_sel_ids]
    facet_opp_sel = np.asarray(topo.facet_opp_sel)[f_sel_ids]
    f_cell_ids = fcells[f_sel_ids]

    bc_mask_loc = bc.reshape(S, ndof_loc).astype(np.float64)

    # --- banded fill targets (slab-local band + h spill block-rows) ---------
    flat_size = (nblk_loc + h) * nb * b * b

    def fill_targets(ids, mask, darr, s):
        d = darr[ids]  # (ne, nld) global dofs
        rows = np.broadcast_to(d[:, :, None], d.shape + (nld,))
        cols = np.broadcast_to(d[:, None, :], d.shape + (nld,))
        r_loc = rows - s * ndof_loc
        blk_r = r_loc // b
        mband = cols // b - rows // b + h
        tgt = ((blk_r * nb + mband) * b + rows % b) * b + cols % b
        drop = bc[rows] | (mask[:, None, None] == 0.0)
        return np.where(drop, flat_size, tgt).reshape(ids.shape[0], -1)

    fill_tgt = np.stack(
        [
            np.concatenate(
                [
                    fill_targets(
                        cell_ids[s], cell_mask[s], cdofs, s
                    ).reshape(-1),
                    fill_targets(
                        f_sel_ids[s], facet_mask[s], fdofs, s
                    ).reshape(-1),
                ]
            )
            for s in range(S)
        ]
    ).astype(np.int32)

    # identity diagonal for BC + padding rows
    diag_lists = []
    for s in range(S):
        r = np.nonzero(bc[s * ndof_loc : (s + 1) * ndof_loc])[0]
        tgt = (((r // b) * nb + h) * b + r % b) * b + r % b
        diag_lists.append(list(tgt))
    diag_idx, _ = _pad_groups(diag_lists, lambda s, g: flat_size)
    # padded entries must dump, not duplicate a real target
    for s in range(S):
        nreal = len(diag_lists[s])
        diag_idx[s, nreal:] = flat_size
    diag_idx = diag_idx.astype(np.int32)

    col_idx = (
        np.arange(nblk_loc)[:, None] + np.arange(nb)[None, :]
    ).astype(np.int32)

    # --- fluid interface ownership (by the y-displacement dof) -------------
    fsi_like = getattr(model, "fsi", model)  # FSAI wraps an FSI model
    sdofs = np.asarray(fsi_like._solid_dofs)
    fdofs_fl = np.asarray(fsi_like._fluid_dofs)
    n_fl = fsi_like.fsimap.N_FLUID
    own = [[] for _ in range(S)]
    for vk, fk in zip(sdofs, fdofs_fl):
        ydof = vk * dim + 1
        s = ydof // ndof_loc
        own[s].append(
            (int(fk), int(ydof - s * ndof_loc), float(Xref[vk, 1]), int(vk))
        )
    fl_lists = [[t[0] for t in g] for g in own]
    fl_idx, fl_mask = _pad_groups(fl_lists, lambda s, g: n_fl)
    nflm = fl_idx.shape[1]
    fl_udof = np.zeros((S, nflm), dtype=np.int32)
    fl_y = np.zeros((S, nflm))
    fl_vert = np.zeros((S, nflm), dtype=np.int32)
    for s in range(S):
        for k, t in enumerate(own[s]):
            fl_udof[s, k] = t[1]
            fl_y[s, k] = t[2]
            fl_vert[s, k] = t[3]
    # padded fl_idx entries point at the dump slot
    for s in range(S):
        fl_idx[s, len(own[s]) :] = n_fl
    fl_idx = fl_idx.astype(np.int32)

    return DDPlan(
        S=S, b=b, h=h, Bt=Bt, m=m, nblk_loc=nblk_loc, ndof_loc=ndof_loc,
        ndof=ndof, ndof_pad=ndof_pad, nvert=nvert, dim=dim, n_fl=n_fl,
        nv=nv, nld=nld, flat_size=flat_size,
        cells=cells_s.astype(np.int32),
        cell_ids=cell_ids.astype(np.int32),
        cell_dofs_loc=cell_dofs_loc.astype(np.int32),
        cell_mask=cell_mask,
        Xe_c=Xe_c,
        fcv=fcv.astype(np.int32),
        f_ids=f_cell_ids.astype(np.int32),
        facet_dofs_loc=facet_dofs_loc.astype(np.int32),
        facet_mask=facet_mask,
        facet_sel=facet_sel,
        facet_opp_sel=facet_opp_sel,
        Xe_f=Xe_f,
        bc_mask_loc=bc_mask_loc,
        fill_tgt=fill_tgt,
        diag_idx=diag_idx,
        col_idx=col_idx,
        fl_idx=fl_idx,
        fl_udof=fl_udof,
        fl_y=fl_y,
        fl_vert=fl_vert,
        fl_mask=fl_mask,
    )


def plan_dd_banded(model, plan: DDPlan):
    """Per-slab banded-assembly plans (``fem.banded`` one-hot MXU
    gather/scatter) for the sharded cell-pass residual, stacked on the
    slab axis.  The shape metadata (group count, window width, padded
    vertex count) is equalized across slabs so every device runs the
    same program.

    Returns ``None`` when the partition cannot support it: slab
    boundaries must align with vertices (``ndof_loc % dim == 0`` and
    ``Bt % dim == 0``) and each slab's cells must be a consecutive id
    range (RCM cell sort) so dg0 coefficients ride a contiguous slice.
    Cell-less tail slabs (covering only padding dofs) get fully-masked
    dummy plans.
    """
    from ..fem import banded as banded_mod

    dim = plan.dim
    if plan.ndof_loc % dim or plan.Bt % dim:
        return None
    S = plan.S
    nvert_loc = plan.ndof_loc // dim
    halo_v = plan.Bt // dim
    nvert_halo = nvert_loc + halo_v
    n_real = plan.cell_mask.sum(axis=1).astype(int)  # (S,)
    ncm = plan.cells.shape[1]
    nv = plan.cells.shape[2]
    c0 = np.zeros(S, dtype=np.int64)
    cells_loc = np.zeros_like(plan.cells)
    for s in range(S):
        if n_real[s] == 0:
            # tail slab covering only padding dofs: a dummy cell whose
            # scatter slots are all masked (n_real=0 plan)
            cells_loc[s] = np.broadcast_to(np.arange(nv), (ncm, nv))
            continue
        ids = plan.cell_ids[s, : n_real[s]]
        if n_real[s] > 1 and not (np.diff(ids) == 1).all():
            return None
        c0[s] = ids[0]
        real = plan.cells[s, : n_real[s]] - s * nvert_loc
        pad = np.broadcast_to(
            real[-1:], (ncm - n_real[s],) + real.shape[1:]
        )
        cells_loc[s] = np.concatenate([real, pad], axis=0)

    # two passes: establish the common (w, nvert_pad), then rebuild
    plans = [
        banded_mod.plan_banded(
            cells_loc[s], nvert_halo, n_real=int(n_real[s])
        )
        for s in range(S)
    ]
    w = max(p.w for p in plans)
    nvp = max(
        max(int(p.base.max()) + w for p in plans), nvert_halo
    )
    plans = [
        banded_mod.plan_banded(
            cells_loc[s], nvert_halo, n_real=int(n_real[s]),
            w_force=w, nvert_pad_min=nvp,
        )
        for s in range(S)
    ]
    p0 = plans[0]
    meta = (p0.ngroups, p0.gc, p0.nv, w, nvp)

    Xref = np.asarray(model.solid._Xref)
    nvert_glob = Xref.shape[0]
    # per-slab static coordinate channels; vertices beyond the real mesh
    # read zeros (only masked duplicate cells could touch them)
    Xch = np.zeros((S, dim, nvert_halo))
    for s in range(S):
        lo = s * nvert_loc
        hi = min(lo + nvert_halo, nvert_glob)
        if hi > lo:
            Xch[s, :, : hi - lo] = Xref[lo:hi].T
        if n_real[s] == 0:
            # the dummy cells (vertices 0..nv-1) need NON-degenerate
            # geometry: zero coords give det(J)=0 -> NaN element
            # kernels, and NaN survives the masked one-hot scatter
            # (NaN*0 = NaN inside the MXU matmul).  A unit reference
            # simplex keeps every kernel finite; no real cell lives on
            # this slab, so its coordinate channels are otherwise unread.
            Xch[s] = 0.0
            for v in range(1, nv):
                Xch[s, v - 1, v] = 1.0
    return dict(
        meta=meta,
        arrays=dict(
            bb_base=np.stack([p.base for p in plans]).astype(np.int32),
            bb_dg=np.stack([p.delta_g for p in plans]).astype(np.int32),
            bb_ds=np.stack([p.delta_s for p in plans]).astype(np.int32),
            bb_Xch=Xch,
            bb_v0=(np.arange(S) * nvert_loc).astype(np.int32)[:, None],
            bb_c0=c0.astype(np.int32)[:, None],
        ),
    )


class DDIntegrator:
    """Sharded transient integration of an ``ExplicitFSIModel``.

    ``integrate_pure(state0, controls_stacked, prop, times)`` mirrors
    :func:`vf_fem_tpu.forward.integrate_pure` (global in/out arrays,
    differentiable) but runs the whole loop DOF-sharded over ``mesh``.
    """

    def __init__(
        self,
        model,
        mesh: Mesh,
        params: Optional[dict] = None,
        axis: str = "shard",
        use_remat: bool = False,
        dp_axis: Optional[str] = None,
    ):
        from ..models.transient import (
            ExplicitFSIModel as _Exp,
            ImplicitFSIModel as _Imp,
        )
        from ..models.fsai import ExplicitFSAIModel as _Fsai

        assert isinstance(model, (_Exp, _Imp, _Fsai)), (
            "DD stepping supports the transient FSI/FSAI models"
        )
        self._implicit = isinstance(model, _Imp)
        self._fsai = isinstance(model, _Fsai)
        self.model = model
        self.mesh = mesh
        self.axis = axis
        self.dp_axis = dp_axis
        if dp_axis is not None:
            assert dp_axis in mesh.axis_names and axis in mesh.axis_names, (
                f"2D DP x TP mesh must carry axes ({dp_axis!r}, {axis!r})"
            )
        self.use_remat = use_remat
        self.params = dict(_params_key(params))
        # slabs partition over the TP axis only; a DP axis (if any)
        # replicates the plan and shards the variant batch
        self.plan = plan_dd(model, int(mesh.shape[axis]))
        # banded (gather-free Pallas) cell-pass assembly per slab:
        # 'banded' forces it (raises if the partition can't), 'auto'
        # uses it on TPU where the indexed gathers it replaces are the
        # cost center, 'plain' (default) keeps indexed gathers
        asm = str(self.params.get("assembly", "plain"))
        self.bplan = None
        if asm == "banded" and dp_axis is not None:
            # the Pallas kernels' declared output VMA carries only the
            # slab axis, and under vmap the plain indexed path wins
            # anyway (batch-amortized gather indices — CLAUDE round-2)
            raise ValueError(
                "banded DD assembly does not compose with dp_axis"
                " (DP x TP batched runs use assembly='plain')"
            )
        if asm == "auto" and (
            dp_axis is not None or jax.default_backend() not in ("tpu",)
        ):
            asm = "plain"  # interpret-mode Pallas / vmapped: not a win
        if asm in ("banded", "auto"):
            self.bplan = plan_dd_banded(model, self.plan)
            if self.bplan is None and asm == "banded":
                raise ValueError(
                    "banded DD assembly unsupported for this partition"
                    " (dof/vertex misalignment or non-contiguous slab"
                    " cell ids)"
                )
        self._fn_cache = {}

    # ------------------------------------------------------------------
    def _pst(self):
        """The sharded static-plan pytree + its PartitionSpec tree."""
        p = self.plan
        arrs = dict(
            cells=p.cells, cell_ids=p.cell_ids,
            cell_dofs_loc=p.cell_dofs_loc, cell_mask=p.cell_mask,
            Xe_c=p.Xe_c, fcv=p.fcv, f_ids=p.f_ids,
            facet_dofs_loc=p.facet_dofs_loc, facet_mask=p.facet_mask,
            facet_sel=p.facet_sel, facet_opp_sel=p.facet_opp_sel,
            Xe_f=p.Xe_f, bc_mask_loc=p.bc_mask_loc, fill_tgt=p.fill_tgt,
            diag_idx=p.diag_idx, fl_idx=p.fl_idx, fl_udof=p.fl_udof,
            fl_y=p.fl_y, fl_vert=p.fl_vert, fl_mask=p.fl_mask,
        )
        if self.bplan is not None:
            arrs.update(self.bplan["arrays"])
        specs = {k: P(self.axis) for k in arrs}
        return {k: jnp.asarray(v) for k, v in arrs.items()}, specs

    # ------------------------------------------------------------------
    def _build(self, n_controls: int, n_steps: int):
        plan = self.plan
        model = self.model
        solid = model.solid
        fluid = model.fluid
        R = solid._residual
        topo = R.topology
        spec = R.coefficient_spec
        has_contact = solid._has_contact
        has_p1 = solid._has_p1
        has_shape = solid._has_shape
        axis = self.axis
        params_d = dict(self.params)
        S, Bt, b, h = plan.S, plan.Bt, plan.b, plan.h
        nb = 2 * h + 1
        m, nblk_loc, ndof_loc = plan.m, plan.nblk_loc, plan.ndof_loc
        nv, nld, dim, nvert = plan.nv, plan.nld, plan.dim, plan.nvert
        n_fl = plan.n_fl
        cell_elem = R.cell_elem_fn()
        facet_elem = R.facet_elem_fn()
        fsi_like = getattr(model, "fsi", model)
        solid_keys = fsi_like._solid_prop_keys
        fluid_keys = fsi_like._fluid_prop_keys
        control_keys = (
            model._ext_control_keys if self._fsai else model._control_keys
        )
        sdofs = np.asarray(fsi_like._solid_dofs)
        fdofs = np.asarray(fsi_like._fluid_dofs)
        if self._fsai:
            from ..models.acoustic import make_wra_parts
            from ..models.fsai import solve_flow_root

            ac_keys = model._ac_prop_keys
            wra_half, wra_full, wra_coeffs = make_wra_parts(
                model.acoustic.num_tube
            )
        col_idx = jnp.asarray(plan.col_idx)
        K = int(params_d.get("jacobian_refresh_steps", 1))
        store_dtype = params_d.get("btd_store_dtype")
        factor_dtype = params_d.get("btd_factor_dtype")
        offdiag_dtype = params_d.get("btd_offdiag_dtype") or store_dtype

        shim = SimpleNamespace(b=b, h=h, nb=nb, nblk=nblk_loc)

        # ---- collectives ------------------------------------------------
        fwd_perm = [(i, i + 1) for i in range(S - 1)]
        bwd_perm = [(i + 1, i) for i in range(S - 1)]

        def halo_right(x):
            """Receive the first ``n`` entries of the next device."""
            return jax.lax.ppermute(x[:Bt], axis, bwd_perm)

        def spill_add(buf):
            """buf: (ndof_loc + Bt,); ship the tail to the next device and
            absorb the previous device's spill into the head."""
            recv = jax.lax.ppermute(buf[ndof_loc:], axis, fwd_perm)
            return buf[:ndof_loc].at[:Bt].add(recv)

        def pnorm(v):
            return jnp.sqrt(jax.lax.psum(jnp.sum(v * v), axis))

        # Under a 2D DP x TP mesh each dp row runs an independent
        # instance of every adaptive loop, but the loop bodies contain
        # tp-collectives that rendezvous across the WHOLE mesh: if rows
        # disagree on trip count the program deadlocks.  All adaptive
        # loops therefore run while ANY row is active (any-reduced
        # predicate) with per-row masked commits.
        dp_ax = self.dp_axis
        uniform = (
            None if dp_ax is None
            else lambda pred: jax.lax.psum(
                pred.astype(jnp.int32), dp_ax
            ) > 0
        )

        def big_like(e0):
            # FINITE stagnation sentinel (0 * inf = NaN through TPU's
            # arithmetically-rewritten fused selects in masked bodies),
            # data-derived for the VMA carry type
            return 0.0 * e0 + jnp.asarray(
                jnp.finfo(e0.dtype).max, e0.dtype
            ) * 0.125

        def bigval_of(e0):
            # python-float twin of big_like for nan_to_num sentinels
            return float(jnp.finfo(e0.dtype).max) * 0.125

        # ---- per-element closures (mirror SolidModel.jac_u_blocks) ------
        def cell_fn(dt):
            def f(u1_e, Xe, s0_e, local):
                u0_e, v0_e, a0_e = s0_e
                loc = dict(local)
                loc["state/u1"] = u1_e
                loc["state/v1"] = newmark.newmark_v(u1_e, u0_e, v0_e, a0_e, dt)
                loc["state/a1"] = newmark.newmark_a(u1_e, u0_e, v0_e, a0_e, dt)
                return cell_elem(Xe, loc)

            return f

        def facet_fn(dt):
            def f(u1_e, Xe, sel, opp_sel, s0_e, local):
                u0_e, v0_e, a0_e = s0_e
                loc = dict(local)
                loc["state/u1"] = u1_e
                loc["state/v1"] = newmark.newmark_v(u1_e, u0_e, v0_e, a0_e, dt)
                loc["state/a1"] = newmark.newmark_a(u1_e, u0_e, v0_e, a0_e, dt)
                if has_contact:
                    n = loc["prop/ncontact"]
                    y = loc["prop/ycontact"]
                    y = y[0] if jnp.ndim(y) > 0 else y
                    k = loc["prop/kcontact"]
                    k = k[0] if jnp.ndim(k) > 0 else k
                    gap = (Xe + u1_e) @ n - y
                    loc["control/tcontact"] = (
                        -(k * jnp.maximum(gap, 0.0) ** 3)[:, None] * n
                    )
                return facet_elem(Xe, sel, opp_sel, loc)

            return f

        def gather_locals(pst, fields, facet):
            """Per-slab coefficient locals (skips state/tcontact — those
            are overridden per element)."""
            verts = pst["fcv"][0] if facet else pst["cells"][0]
            ids = pst["f_ids"][0] if facet else pst["cell_ids"][0]
            local, axes = {}, {}
            for key, sp_ in spec.items():
                if key.startswith("state/") or key == "control/tcontact":
                    continue
                arr = fields[key]
                if sp_.space in ("cg1_vector", "cg1_scalar"):
                    local[key] = arr[verts]
                    axes[key] = 0
                elif sp_.space == "dg0_scalar":
                    local[key] = arr[ids]
                    axes[key] = 0
                else:
                    local[key] = (
                        arr[0] if sp_.space == "const_scalar" else arr
                    )
                    axes[key] = None
            return local, axes

        def shaped_X(pst, local, facet):
            """Element vertex coordinates incl. the traced shape
            displacement: ``prop/umesh`` is a cg1_vector coefficient, so
            the locals gather already carries it per element — the shape
            rides the SAME (halo) gathers as every other nodal field,
            exactly as it rides the cell gathers single-chip (measured
            free in sweeps)."""
            Xe = pst["Xe_f" if facet else "Xe_c"][0]
            if has_shape:
                Xe = Xe + local["prop/umesh"]
            return Xe

        def fl_area_vals(pst, u1, prop_s, ymid):
            """Per-slab fluid surface-area contributions, shape-aware:
            the surface reference y includes the traced umesh
            displacement (single-chip analog: ``_area_from_u1`` adds
            umesh through ``_coords``)."""
            y_ref = pst["fl_y"][0]
            if has_shape:
                um = prop_s["umesh"].reshape(nvert, dim)
                y_ref = y_ref + um[pst["fl_vert"][0], 1]
            return (
                2.0 * (ymid - y_ref - u1[pst["fl_udof"][0]])
            ) * pst["fl_mask"][0]

        def make_fields(prop_s, p1):
            fields = dict(solid._prop_fields(prop_s))
            if has_p1:
                fields["control/p1"] = p1
            return fields

        def _elem_inputs(pst, u_ext, ext0, facet):
            cd = pst["facet_dofs_loc" if facet else "cell_dofs_loc"][0]
            ue = u_ext[cd].reshape(-1, nv, dim)
            s0 = tuple(x[cd].reshape(-1, nv, dim) for x in ext0)
            return cd, ue, s0

        # ---- residual ----------------------------------------------------
        def _facet_res(pst, u1_ext, ext0, fields, dt):
            fd, u1_f, s0_f = _elem_inputs(pst, u1_ext, ext0, facet=True)
            local_f, axes_f = gather_locals(pst, fields, facet=True)
            res_f = jax.vmap(
                facet_fn(dt), in_axes=(0, 0, 0, 0, 0, axes_f)
            )(
                u1_f, shaped_X(pst, local_f, facet=True),
                pst["facet_sel"][0],
                pst["facet_opp_sel"][0], s0_f, local_f,
            )
            res_f = res_f * pst["facet_mask"][0][:, None, None]
            return jax.ops.segment_sum(
                res_f.reshape(-1),
                fd.reshape(-1),
                num_segments=ndof_loc + Bt,
            )

        def res_loc_plain(pst, u1_loc, ext0, p1, prop_s, dt):
            u1_ext = jnp.concatenate([u1_loc, halo_right(u1_loc)])
            fields = make_fields(prop_s, p1)

            cd, u1_e, s0_e = _elem_inputs(pst, u1_ext, ext0, facet=False)
            local_c, axes_c = gather_locals(pst, fields, facet=False)
            res_c = jax.vmap(cell_fn(dt), in_axes=(0, 0, 0, axes_c))(
                u1_e, shaped_X(pst, local_c, facet=False), s0_e, local_c
            )
            res_c = res_c * pst["cell_mask"][0][:, None, None]
            # (ne, nv, dim) flattens onto (ne, nld) local dofs (vertex-major
            # interleaved, matching assembly.cell_dof_array)
            buf = jax.ops.segment_sum(
                res_c.reshape(-1),
                cd.reshape(-1),
                num_segments=ndof_loc + Bt,
            )

            buf = buf + _facet_res(pst, u1_ext, ext0, fields, dt)
            r = spill_add(buf)
            bcm = pst["bc_mask_loc"][0]
            return r * (1.0 - bcm) + u1_loc * bcm

        if self.bplan is not None:
            from ..fem import banded as banded_mod

            # meta + the mesh axis name (jax 0.9 VMA typing: pallas
            # outputs inside shard_map must declare their varying axes)
            bmeta = tuple(self.bplan["meta"]) + (axis,)
            ngroups_b, gc_b, nv_b, w_b, nvp_b = bmeta[:5]
            ncpad = ngroups_b * gc_b
            nvert_loc_b = ndof_loc // dim
            halo_v = Bt // dim
            nvert_halo = nvert_loc_b + halo_v
            # static pad targets for the replicated global fields
            nvert_glob_pad = S * nvert_loc_b + halo_v
            nc_glob = int(topo.n_cells)
            nc_glob_pad = nc_glob + ncpad

        def res_loc_banded(pst, u1_loc, ext0, p1, prop_s, dt):
            """Cell pass via the gather-free one-hot-window kernels
            (``fem.banded``): all cg1 channels (state, coefficients,
            traced coordinates) ride one stacked MXU gather per slab;
            the scatter masks padded duplicate cells.  Facet pass and
            halo exchange are shared with the indexed path."""
            base = pst["bb_base"][0]
            dgr = pst["bb_dg"][0]
            dsr = pst["bb_ds"][0]
            v0 = pst["bb_v0"][0, 0]
            c0 = pst["bb_c0"][0, 0]
            u1_ext = jnp.concatenate([u1_loc, halo_right(u1_loc)])
            fields = make_fields(prop_s, p1)

            def vcomps(flat):
                arr2 = flat.reshape(nvert_halo, dim)
                return [arr2[:, c] for c in range(dim)]

            def slab_rows(arr2):
                arr2 = jnp.pad(
                    arr2,
                    ((0, nvert_glob_pad - arr2.shape[0]), (0, 0)),
                )
                return jax.lax.dynamic_slice_in_dim(arr2, v0, nvert_halo)

            comps = vcomps(u1_ext)
            for x in ext0:
                comps += vcomps(x)
            cg1_keys = []
            for key, sp_ in spec.items():
                if key.startswith("state/") or key == "control/tcontact":
                    continue
                if sp_.space == "cg1_vector":
                    sl = slab_rows(jnp.asarray(fields[key]).reshape(-1, dim))
                    comps += [sl[:, c] for c in range(dim)]
                    cg1_keys.append((key, dim))
                elif sp_.space == "cg1_scalar":
                    sl = slab_rows(jnp.asarray(fields[key]).reshape(-1, 1))
                    comps.append(sl[:, 0])
                    cg1_keys.append((key, 1))
            Xch = pst["bb_Xch"][0]  # (dim, nvert_halo) static coords
            comps += [Xch[c] for c in range(dim)]
            F = jnp.stack(comps, axis=0)  # (C, nvert_halo)
            loc_all = banded_mod.banded_gather_t(bmeta, base, dgr, F)

            off = 0

            def take(ncols):
                nonlocal off
                v = loc_all[:, off : off + ncols, :]
                off += ncols
                return v if ncols > 1 else v[:, 0, :]

            u1_e = take(dim)
            s0_e = (take(dim), take(dim), take(dim))
            local, axes = {}, {}
            for key, ncols in cg1_keys:
                local[key] = take(ncols)
                axes[key] = -1
            Xe = take(dim)
            if has_shape:
                # the umesh channels were gathered with the other
                # cg1_vector coefficients above
                Xe = Xe + local["prop/umesh"]
            for key, sp_ in spec.items():
                if sp_.space == "dg0_scalar":
                    arr = jnp.asarray(fields[key])
                    arr = jnp.pad(arr, (0, nc_glob_pad - arr.shape[0]))
                    local[key] = jax.lax.dynamic_slice_in_dim(
                        arr, c0, ncpad
                    )
                    axes[key] = -1
                elif sp_.space == "const_scalar":
                    local[key] = jnp.asarray(fields[key])[0]
                    axes[key] = None
                elif sp_.space == "const_vector":
                    local[key] = jnp.asarray(fields[key])
                    axes[key] = None

            res_c = jax.vmap(
                cell_fn(dt),
                in_axes=(-1, -1, (-1, -1, -1), axes),
                out_axes=-1,
            )(u1_e, Xe, s0_e, local)  # (nv, dim, ncpad)
            r2 = banded_mod.banded_scatter_t(
                bmeta, base, dsr, res_c, nvert_halo
            )  # (dim, nvert_halo)
            buf = jnp.moveaxis(r2, 0, 1).reshape(-1)

            buf = buf + _facet_res(pst, u1_ext, ext0, fields, dt)
            r = spill_add(buf)
            bcm = pst["bc_mask_loc"][0]
            return r * (1.0 - bcm) + u1_loc * bcm

        res_loc = res_loc_banded if self.bplan is not None else res_loc_plain

        # ---- banded fill + SPIKE factorization ---------------------------
        def factorize_loc(pst, ext0, p1, prop_s, dt):
            u_lin_ext = (
                ext0[0] + dt * ext0[1] + 0.5 * dt * dt * ext0[2]
            )
            fields = make_fields(prop_s, p1)
            cd, u1_e, s0_e = _elem_inputs(pst, u_lin_ext, ext0, False)
            local_c, axes_c = gather_locals(pst, fields, False)
            Jc = jax.vmap(
                jax.jacfwd(cell_fn(dt)), in_axes=(0, 0, 0, axes_c)
            )(
                u1_e, shaped_X(pst, local_c, facet=False), s0_e, local_c
            ).reshape(-1, nld, nld)
            Jc = Jc * pst["cell_mask"][0][:, None, None]

            fdl, u1_f, s0_f = _elem_inputs(pst, u_lin_ext, ext0, True)
            local_f, axes_f = gather_locals(pst, fields, True)
            Jf = jax.vmap(
                jax.jacfwd(facet_fn(dt)),
                in_axes=(0, 0, 0, 0, 0, axes_f),
            )(
                u1_f, shaped_X(pst, local_f, facet=True),
                pst["facet_sel"][0],
                pst["facet_opp_sel"][0], s0_f, local_f,
            ).reshape(-1, nld, nld)
            Jf = Jf * pst["facet_mask"][0][:, None, None]

            src = jnp.concatenate([Jc.reshape(-1), Jf.reshape(-1)])
            flat = jnp.zeros(plan.flat_size + 1, src.dtype)
            flat = flat.at[pst["fill_tgt"][0]].add(src)
            flat = flat.at[pst["diag_idx"][0]].add(1.0)
            band = flat[: plan.flat_size].reshape(
                nblk_loc + h, nb, b, b
            )
            # absorb the previous slab's spilled block-rows
            recv = jax.lax.ppermute(band[nblk_loc:], axis, fwd_perm)
            band = band[:nblk_loc].at[:h].add(recv)
            if factor_dtype is not None:
                # TPU mixed precision: f64 residuals, f32 factors
                band = band.astype(factor_dtype)

            # symmetric Jacobi equilibration with neighbor scale halos
            diag = jnp.diagonal(band[:, h], axis1=1, axis2=2)
            d_loc = jnp.sqrt(jnp.abs(diag) + 1e-30).reshape(-1)
            d_left = jax.lax.ppermute(d_loc[-h * b :], axis, fwd_perm)
            d_rght = jax.lax.ppermute(d_loc[: h * b], axis, bwd_perm)
            d_ext = jnp.concatenate([d_left, d_loc, d_rght])
            d_ext = jnp.where(d_ext == 0.0, 1.0, d_ext)
            dr = d_loc.reshape(nblk_loc, b)
            dc = d_ext.reshape(nblk_loc + 2 * h, b)[col_idx]
            band = band / dr[:, None, :, None] / dc[:, :, None, :]

            D, L, U, n_sup_l, pad_l = _btd_from_bsb(shim, band)
            assert n_sup_l == m and pad_l == 0
            D = D[None]
            L = L[None]
            U = U[None]
            B = L[:, 0]
            C = U[:, m - 1]
            L = L.at[:, 0].set(0.0)
            U = U.at[:, m - 1].set(0.0)
            fac = ss.spike_factor_local(D, L, U, B, C, axis, S)
            if store_dtype is not None:
                from ..solvers.btd import _store_cast

                cast = lambda a: _store_cast(a, offdiag_dtype)
                fac = fac._replace(
                    Sinv=_store_cast(fac.Sinv, store_dtype),
                    P=cast(fac.P), Q=cast(fac.Q),
                    V=cast(fac.V), W=cast(fac.W),
                    Vh=cast(fac.Vh), Wh=cast(fac.Wh),
                )
            return fac, d_loc

        def spike_apply(fac, d_loc, r, transpose=False):
            rb = (r / d_loc).reshape(1, m, Bt)
            f = ss.spike_solve_t_local if transpose else ss.spike_solve_local
            x = f(fac, rb, axis)
            return x.reshape(-1) / d_loc

        # ---- chord Newton with IFT custom_vjp ----------------------------
        def _newton(pst, u_guess, fac, d_loc, ext0, p1, prop_s, dt):
            def assem(u1):
                return res_loc(pst, u1, ext0, p1, prop_s, dt)

            def solve_jac(u1, r):
                return spike_apply(fac, d_loc, r)

            return newton_solve(
                u_guess, assem, solve_jac, params_d, norm_fn=pnorm,
                uniform_pred=uniform,
            )

        @partial(jax.custom_vjp, nondiff_argnums=(0,))
        def solve_u1_dd(pst_keys, u_guess, fac_d, pst_vals, ext0, p1,
                        prop_s, dt):
            pst = dict(zip(pst_keys, pst_vals))
            fac, d_loc = fac_d
            return _newton(pst, u_guess, fac, d_loc, ext0, p1, prop_s, dt)

        def solve_u1_dd_fwd(pst_keys, u_guess, fac_d, pst_vals, ext0, p1,
                            prop_s, dt):
            out = solve_u1_dd(
                pst_keys, u_guess, fac_d, pst_vals, ext0, p1, prop_s, dt
            )
            u1, info = out
            return out, (u1, fac_d, pst_vals, ext0, p1, prop_s, dt)

        def solve_u1_dd_bwd(pst_keys, saved, cts):
            u1, fac_d, pst_vals, ext0, p1, prop_s, dt = saved
            u1_bar, _ = cts
            pst = dict(zip(pst_keys, pst_vals))
            fac, d_loc = fac_d

            _, u_vjp = jax.vjp(
                lambda u: res_loc(pst, u, ext0, p1, prop_s, dt), u1
            )

            def JT(v):
                return u_vjp(v)[0]

            def Mt(r):
                return spike_apply(fac, d_loc, r, transpose=True)

            # stale-factor iterative refinement (sharded analog of
            # transient.refined_adjoint_solve; norms psum-replicated)
            tol = params_d.get("adjoint_refine_tol", 1e-8)
            max_it = int(params_d.get("adjoint_refine_iters", 25))
            stag = params_d.get("stagnation_ratio", 0.9)
            bnorm = pnorm(u1_bar)
            lam = Mt(u1_bar)
            r = u1_bar - JT(lam)
            rn = pnorm(r)
            big = big_like(rn)

            def own_active(carry):
                lam, r, rn, rn_prev, lam_b, rn_b, k = carry
                return jnp.logical_and(
                    jnp.logical_and(rn >= tol * bnorm, rn < stag * rn_prev),
                    k < max_it,
                )

            def cond(carry):
                act = own_active(carry)
                return act if uniform is None else uniform(act)

            def body_plain(carry):
                lam, r, rn, rn_prev, lam_b, rn_b, k = carry
                lam = lam + Mt(r)
                r = u1_bar - JT(lam)
                rn_new = pnorm(r)
                better = rn_new < rn_b
                lam_b = jnp.where(better, lam, lam_b)
                rn_b = jnp.where(better, rn_new, rn_b)
                return (lam, r, rn_new, rn, lam_b, rn_b, k + 1)

            def body_masked(carry):
                lam, r, rn, rn_prev, lam_b, rn_b, k = carry
                act = own_active(carry)  # masked commit (dp lockstep)
                lam_raw = lam + Mt(r)
                r_raw = u1_bar - JT(lam_raw)
                # norm from the RAW iterate's residual so a non-finite
                # iterate scores bigval (no best-commit; the row masks
                # off next cond) — entry-sanitize only what enters the
                # jnp.where carries (TPU fused-select: 0 * NaN = NaN)
                rn_new = sanitize_err(pnorm(r_raw), bigval_of(rn))
                lam_new = sanitize_iterate(lam_raw)
                r_new = sanitize_iterate(r_raw)
                better = jnp.logical_and(act, rn_new < rn_b)
                lam_b = jnp.where(better, lam_new, lam_b)
                rn_b = jnp.where(better, rn_new, rn_b)
                return (
                    jnp.where(act, lam_new, lam),
                    jnp.where(act, r_new, r),
                    jnp.where(act, rn_new, rn),
                    jnp.where(act, rn, rn_prev),
                    lam_b,
                    rn_b,
                    k + act.astype(k.dtype),
                )

            body = body_plain if uniform is None else body_masked

            lam = jax.lax.while_loop(
                cond, body,
                (lam, r, rn, big, lam, rn, (0.0 * rn).astype(jnp.int32)),
            )[4]

            _, t_vjp = jax.vjp(
                lambda e0, p1_, pr, t: res_loc(pst, u1, e0, p1_, pr, t),
                ext0, p1, prop_s, dt,
            )
            g_ext0, g_p1, g_prop, g_dt = t_vjp(-lam)

            def zero_ct(x):
                # integer/bool plan arrays take float0 cotangents
                if not jnp.issubdtype(x.dtype, jnp.floating):
                    return np.zeros(x.shape, dtype=jax.dtypes.float0)
                return jnp.zeros_like(x)

            z = jax.tree_util.tree_map
            return (
                jnp.zeros_like(u1),
                z(zero_ct, fac_d),
                z(zero_ct, tuple(pst_vals)),
                g_ext0, g_p1, g_prop, g_dt,
            )

        solve_u1_dd.defvjp(solve_u1_dd_fwd, solve_u1_dd_bwd)

        # ---- coupled step -------------------------------------------------
        def pressure_to_solid(p_fl):
            out = jnp.zeros((nvert,), dtype=p_fl.dtype)
            return out.at[jnp.asarray(sdofs)].set(p_fl[jnp.asarray(fdofs)])

        def step_loc(pst, state, fac_d, control, prop, dt):
            prop_s = {k: prop[k] for k in solid_keys}
            prop_f = {k: prop[k] for k in fluid_keys}
            p1 = pressure_to_solid(state["p"])
            ext0 = tuple(
                jnp.concatenate([state[k], halo_right(state[k])])
                for k in ("u", "v", "a")
            )
            u_guess = (
                state["u"] + dt * state["v"] + 0.5 * dt * dt * state["a"]
            )
            pst_keys = tuple(sorted(pst))
            pst_vals = tuple(pst[k] for k in pst_keys)
            u1, info = solve_u1_dd(
                pst_keys, u_guess, fac_d, pst_vals, ext0, p1, prop_s, dt
            )
            v1 = newmark.newmark_v(
                u1, state["u"], state["v"], state["a"], dt
            )
            a1 = newmark.newmark_a(
                u1, state["u"], state["v"], state["a"], dt
            )

            # fluid exchange: psum'd surface area, replicated 1D solve
            ymid = prop["ymid"][0]
            vals = fl_area_vals(pst, u1, prop_s, ymid)
            contrib = jnp.zeros(n_fl + 1, u1.dtype).at[
                pst["fl_idx"][0]
            ].add(vals)
            area = jax.lax.psum(contrib[:n_fl], axis)
            fl_control = {"area": area}
            fl_control.update({k: control[k] for k in control_keys})
            qp1 = fluid.solve_pure(
                fl_control, prop_f, {"q": state["q"], "p": state["p"]}
            )
            return {"u": u1, "v": v1, "a": a1, **qp1}, info

        # ---- implicit (Picard) coupled step ------------------------------
        def _picard_map(pst, x, fac_d, ext0, control_t, prop, dt):
            """One pass of the coupled fixed-point map: sharded solid
            chord Newton (seeing the iterate's fluid pressure) then the
            replicated fluid on the psum'd area.  Differentiable — the
            solid solve carries its stale-factor IFT vjp, and
            ``fluid.solve_pure`` zeroes its proto, so the map's state
            derivative flows only through the pressure."""
            prop_s = {k: prop[k] for k in solid_keys}
            prop_f = {k: prop[k] for k in fluid_keys}
            ymid = prop["ymid"][0]
            u_x, q_x, p_x = x
            p1 = pressure_to_solid(p_x)
            pst_keys = tuple(sorted(pst))
            pst_vals = tuple(pst[k] for k in pst_keys)
            u1, _ = solve_u1_dd(
                pst_keys, u_x, fac_d, pst_vals, ext0, p1, prop_s, dt
            )
            vals = fl_area_vals(pst, u1, prop_s, ymid)
            contrib = jnp.zeros(n_fl + 1, u1.dtype).at[
                pst["fl_idx"][0]
            ].add(vals)
            area = jax.lax.psum(contrib[:n_fl], axis)
            fl_control = {"area": area}
            fl_control.update({k: control_t[k] for k in control_keys})
            qp = fluid.solve_pure(fl_control, prop_f, {"q": q_x, "p": p_x})
            return (u1, qp["q"], qp["p"])

        def _coupled_delta(x_new, x):
            # sharded u pieces psum; replicated q/p counted once
            du = jax.lax.psum(jnp.sum((x_new[0] - x[0]) ** 2), axis)
            dq = jnp.sum((x_new[1] - x[1]) ** 2)
            dp = jnp.sum((x_new[2] - x[2]) ** 2)
            return jnp.sqrt(du + dq + dp)

        @partial(jax.custom_vjp, nondiff_argnums=(0,))
        def picard_solve_dd(pst_keys, x0, fac_d, pst_vals, ext0,
                            control_t, prop, dt):
            """Coupled Picard iteration to its fixed point, converged on
            the psum-reduced coupled update norm with a stagnation stop
            (sharded analog of ``ImplicitFSIModel.step_pure_stale``)."""
            pst = dict(zip(pst_keys, pst_vals))

            def picard(x):
                return _picard_map(pst, x, fac_d, ext0, control_t, prop, dt)

            x1 = picard(x0)
            err0 = _coupled_delta(x1, x0)
            abs_tol = params_d.get("fixedpoint_absolute_tolerance", 1e-10)
            rel_tol = params_d.get("fixedpoint_relative_tolerance", 1e-12)
            max_fp = int(params_d.get("fixedpoint_max_iterations", 50))
            stag = params_d.get("stagnation_ratio", 0.9)
            big = big_like(err0)

            def own_active(carry):
                x, err, err_prev, k = carry
                not_conv = jnp.logical_and(
                    err >= abs_tol, err >= rel_tol * err0
                )
                return jnp.logical_and(
                    jnp.logical_and(not_conv, err < stag * err_prev),
                    k < max_fp,
                )

            def cond(carry):
                act = own_active(carry)
                return act if uniform is None else uniform(act)

            def body_plain(carry):
                x, err, err_prev, k = carry
                x_new = picard(x)
                return (x_new, _coupled_delta(x_new, x), err, k + 1)

            def body_masked(carry):
                x, err, err_prev, k = carry
                # masked commit: a converged dp row keeps iterating for
                # collective lockstep without moving its state
                act = own_active(carry)
                x_raw = picard(x)
                # norm the RAW update: a non-finite iterate scores
                # bigval (the row stagnation-stops at the next cond)
                # and is NOT committed — norming the entry-sanitized
                # iterate would zero-fill the NaNs into a spuriously
                # small, possibly "converged" delta.  Only the CARRIED
                # arrays are entry-sanitized (TPU fused-select rewrite:
                # 0 * NaN = NaN through jnp.where)
                err_new = sanitize_err(
                    _coupled_delta(x_raw, x), bigval_of(err)
                )
                ok = jnp.logical_and(act, err_new < bigval_of(err))
                x_new = tuple(sanitize_iterate(xn) for xn in x_raw)
                x2 = tuple(
                    jnp.where(ok, xn, xo) for xn, xo in zip(x_new, x)
                )
                return (
                    x2,
                    jnp.where(act, err_new, err),
                    jnp.where(act, err, err_prev),
                    k + act.astype(k.dtype),
                )

            body = body_plain if uniform is None else body_masked

            x, err, _, k = jax.lax.while_loop(
                cond, body,
                (x1, err0, big, 1 + (0.0 * err0).astype(jnp.int32)),
            )
            info = SolveInfo(
                num_iter=k,
                abs_err=err,
                rel_err=err / jnp.where(err0 == 0, 1.0, err0),
            )
            return x, info

        def picard_solve_dd_fwd(pst_keys, x0, fac_d, pst_vals, ext0,
                                control_t, prop, dt):
            out = picard_solve_dd(
                pst_keys, x0, fac_d, pst_vals, ext0, control_t, prop, dt
            )
            x, _ = out
            return out, (x, fac_d, pst_vals, ext0, control_t, prop, dt)

        def picard_solve_dd_bwd(pst_keys, saved, cts):
            """Fixed-point adjoint (Christianson): at the converged
            x* = F(x*), iterate lam <- xbar + F_x^T lam — the transpose
            contraction converges at the forward Picard's rate — then
            pull parameter gradients through one vjp of F at x*."""
            x, fac_d, pst_vals, ext0, control_t, prop, dt = saved
            xbar, _ = cts
            pst = dict(zip(pst_keys, pst_vals))

            _, fx_vjp = jax.vjp(
                lambda x_: _picard_map(
                    pst, x_, fac_d, ext0, control_t, prop, dt
                ),
                x,
            )
            tmap = jax.tree_util.tree_map

            def next_lam(lam):
                return tmap(lambda a, b: a + b, xbar, fx_vjp(lam)[0])

            bnorm = _coupled_delta(xbar, tmap(jnp.zeros_like, xbar))
            abs_tol = params_d.get("fixedpoint_absolute_tolerance", 1e-10)
            rel_tol = params_d.get("fixedpoint_relative_tolerance", 1e-12)
            max_fp = int(params_d.get("fixedpoint_max_iterations", 50))
            stag = params_d.get("stagnation_ratio", 0.9)

            lam1 = next_lam(xbar)
            inc0 = _coupled_delta(lam1, xbar)
            big = big_like(inc0)

            def own_active(carry):
                lam, inc, inc_prev, k = carry
                not_conv = jnp.logical_and(
                    inc >= abs_tol, inc >= rel_tol * bnorm
                )
                return jnp.logical_and(
                    jnp.logical_and(not_conv, inc < stag * inc_prev),
                    k < max_fp,
                )

            def cond(carry):
                act = own_active(carry)
                return act if uniform is None else uniform(act)

            def body_plain(carry):
                lam, inc, inc_prev, k = carry
                lam_new = next_lam(lam)
                return (lam_new, _coupled_delta(lam_new, lam), inc, k + 1)

            def body_masked(carry):
                lam, inc, inc_prev, k = carry
                act = own_active(carry)  # masked commit (dp lockstep)
                lam_raw = next_lam(lam)
                # norm the RAW update (non-finite -> bigval, no commit,
                # stagnation-stop next cond); entry-sanitize only the
                # carried arrays (TPU fused-select: 0 * NaN = NaN)
                inc_new = sanitize_err(
                    _coupled_delta(lam_raw, lam), bigval_of(inc)
                )
                ok = jnp.logical_and(act, inc_new < bigval_of(inc))
                lam_new = tmap(sanitize_iterate, lam_raw)
                lam2 = tmap(
                    lambda a, b: jnp.where(ok, a, b), lam_new, lam
                )
                return (
                    lam2,
                    jnp.where(act, inc_new, inc),
                    jnp.where(act, inc, inc_prev),
                    k + act.astype(k.dtype),
                )

            body = body_plain if uniform is None else body_masked

            lam = jax.lax.while_loop(
                cond, body,
                (lam1, inc0, big, 1 + (0.0 * inc0).astype(jnp.int32)),
            )[0]

            _, ft_vjp = jax.vjp(
                lambda e0, c, p, t: _picard_map(pst, x, fac_d, e0, c, p, t),
                ext0, control_t, prop, dt,
            )
            g_ext0, g_c, g_p, g_dt = ft_vjp(lam)

            def zero_ct(v):
                if not jnp.issubdtype(v.dtype, jnp.floating):
                    return np.zeros(v.shape, dtype=jax.dtypes.float0)
                return jnp.zeros_like(v)

            z = jax.tree_util.tree_map
            return (
                z(jnp.zeros_like, x),
                z(zero_ct, fac_d),
                z(zero_ct, tuple(pst_vals)),
                g_ext0, g_c, g_p, g_dt,
            )

        picard_solve_dd.defvjp(picard_solve_dd_fwd, picard_solve_dd_bwd)

        def step_loc_implicit(pst, state, fac_d, control, prop, dt):
            """Sharded analog of ``ImplicitFSIModel.step_pure_stale``
            (reference ``transient.py:964-1145``), with a fixed-point
            IFT adjoint in place of the single-chip dense coupled LU."""
            ext0 = tuple(
                jnp.concatenate([state[k], halo_right(state[k])])
                for k in ("u", "v", "a")
            )
            pst_keys = tuple(sorted(pst))
            pst_vals = tuple(pst[k] for k in pst_keys)
            u_pred = (
                state["u"] + dt * state["v"] + 0.5 * dt * dt * state["a"]
            )
            x0 = (u_pred, state["q"], state["p"])
            control_t = {k: control[k] for k in control_keys}
            x, info = picard_solve_dd(
                pst_keys, x0, fac_d, pst_vals, ext0, control_t, prop, dt
            )
            u1, q1, p1f = x
            v1 = newmark.newmark_v(
                u1, state["u"], state["v"], state["a"], dt
            )
            a1 = newmark.newmark_a(
                u1, state["u"], state["v"], state["a"], dt
            )
            return {"u": u1, "v": v1, "a": a1, "q": q1, "p": p1f}, info

        # ---- FSAI (interactive source-tract) coupled step ----------------
        def step_loc_fsai(pst, state, fac_d, control, prop, dt):
            """Sharded analog of ``ExplicitFSAIModel.step_pure``: the
            solid slab solve is sharded; the WRA tract and the
            source-tract root solve run replicated on the psum'd
            surface area (same ``models/fsai.solve_flow_root`` as the
            single-chip model)."""
            prop_s = {k: prop[k] for k in solid_keys}
            prop_f = {k: prop[k] for k in fluid_keys}
            ac_prop = {k: prop[k] for k in ac_keys}
            p1 = pressure_to_solid(state["p"])
            ext0 = tuple(
                jnp.concatenate([state[k], halo_right(state[k])])
                for k in ("u", "v", "a")
            )
            u_guess = (
                state["u"] + dt * state["v"] + 0.5 * dt * dt * state["a"]
            )
            pst_keys = tuple(sorted(pst))
            pst_vals = tuple(pst[k] for k in pst_keys)
            u1, info = solve_u1_dd(
                pst_keys, u_guess, fac_d, pst_vals, ext0, p1, prop_s, dt
            )
            v1 = newmark.newmark_v(
                u1, state["u"], state["v"], state["a"], dt
            )
            a1 = newmark.newmark_a(
                u1, state["u"], state["v"], state["a"], dt
            )
            ymid = prop["ymid"][0]
            vals = fl_area_vals(pst, u1, prop_s, ymid)
            contrib = jnp.zeros(n_fl + 1, u1.dtype).at[
                pst["fl_idx"][0]
            ].add(vals)
            area = jax.lax.psum(contrib[:n_fl], axis)

            pinc_1 = wra_half(state["pinc"], state["pref"], ac_prop)
            z0, b2_0 = wra_coeffs(pinc_1, ac_prop)
            proto = {"q": state["q"], "p": state["p"]}
            ext = {k: control[k] for k in control_keys}

            def fluid_at(q):
                psup = (z0 * q + 2.0 * b2_0).reshape((1,))
                return fluid.solve_pure(
                    {"area": area, **ext, "psup": psup}, prop_f, proto
                )

            qp, bracketed = solve_flow_root(
                fluid_at, state["q"],
                n_expand=int(params_d.get("fsai_expand_iterations", 6)),
                n_bisect=int(params_d.get("fsai_bisect_iterations", 20)),
            )
            pinc1, pref1 = wra_full(
                pinc_1, state["pinc"], state["pref"], qp["q"], ac_prop
            )
            # carry the envelope telemetry so finalize_run's runtime
            # guard (lagged-fallback count + warning) fires on DD runs
            # exactly as on single-chip ones (models/fsai.py)
            from ..models.fsai import FSAISolveInfo

            info = FSAISolveInfo(
                num_iter=info.num_iter, abs_err=info.abs_err,
                rel_err=info.rel_err, bracketed=bracketed,
            )
            return {
                "u": u1, "v": v1, "a": a1, **qp,
                "pinc": pinc1, "pref": pref1,
            }, info

        if self._implicit:
            step_loc = step_loc_implicit
        if self._fsai:
            step_loc = step_loc_fsai

        def factorize_step(pst, state, control, prop, dt):
            prop_s = {k: prop[k] for k in solid_keys}
            p1 = pressure_to_solid(state["p"])
            ext0 = tuple(
                jnp.concatenate([state[k], halo_right(state[k])])
                for k in ("u", "v", "a")
            )
            return factorize_loc(pst, ext0, p1, prop_s, dt)

        if self.use_remat:
            step_loc = jax.checkpoint(step_loc, static_argnums=())

        # ---- scanned window loop -----------------------------------------
        def program(pst, state0, controls_stacked, prop, times):
            dts = jnp.diff(times)

            def control_at(n):
                idx = jnp.minimum(n, n_controls - 1)
                return jax.tree_util.tree_map(
                    lambda a: a[idx], controls_stacked
                )

            def inner(state, fac_d, dts_w, n0):
                def body(carry, xs):
                    dt, n = xs
                    s1, info = step_loc(
                        pst, carry, fac_d, control_at(n), prop, dt
                    )
                    return s1, (s1, info)

                return jax.lax.scan(
                    body, state,
                    (dts_w, n0 + jnp.arange(dts_w.shape[0])),
                )

            def window(state, dts_w, n0):
                fac_d = factorize_step(
                    pst, state, control_at(n0), prop, dts_w[0]
                )
                return inner(state, fac_d, dts_w, n0)

            n_win = n_steps // K
            rem = n_steps - n_win * K
            trajs, infoss = [], []
            fin = state0
            if n_win:
                dts_main = dts[: n_win * K].reshape(n_win, K)
                n0s = K * jnp.arange(n_win)

                def outer(state, xs):
                    dts_w, n0 = xs
                    return window(state, dts_w, n0)

                fin, (traj, infos) = jax.lax.scan(
                    outer, fin, (dts_main, n0s)
                )
                flat = lambda a: a.reshape((-1,) + a.shape[2:])
                trajs.append(jax.tree_util.tree_map(flat, traj))
                infoss.append(jax.tree_util.tree_map(flat, infos))
            if rem:
                fin, (traj_r, infos_r) = window(
                    fin, dts[n_win * K :], n_win * K
                )
                trajs.append(traj_r)
                infoss.append(infos_r)
            cat = (
                lambda *xs: xs[0]
                if len(xs) == 1
                else jnp.concatenate(xs, 0)
            )
            traj = jax.tree_util.tree_map(cat, *trajs)
            infos = jax.tree_util.tree_map(cat, *infoss)
            return fin, traj, infos

        # ---- shard_map wrapper -------------------------------------------
        pst_vals, pst_specs = self._pst()
        axis_ = self.axis
        state_spec = {
            "u": P(axis_), "v": P(axis_), "a": P(axis_),
            "q": P(), "p": P(),
        }
        traj_spec = {
            "u": P(None, axis_), "v": P(None, axis_), "a": P(None, axis_),
            "q": P(), "p": P(),
        }
        if self._fsai:
            state_spec.update({"pinc": P(), "pref": P()})
            traj_spec.update({"pinc": P(), "pref": P()})
        if self._fsai:
            from ..models.fsai import FSAISolveInfo

            info_spec = FSAISolveInfo(
                num_iter=P(), abs_err=P(), rel_err=P(), bracketed=P(),
            )
        else:
            info_spec = SolveInfo(num_iter=P(), abs_err=P(), rel_err=P())

        if self.dp_axis is None:
            def global_fn(state0, controls_stacked, prop, times):
                # pad the solid state to the sharded length
                pad = plan.ndof_pad - plan.ndof
                s0 = dict(state0)
                for k in ("u", "v", "a"):
                    s0[k] = jnp.pad(jnp.asarray(state0[k]), (0, pad))
                ctrl_specs = jax.tree_util.tree_map(
                    lambda _: P(), controls_stacked
                )
                prop_specs = jax.tree_util.tree_map(lambda _: P(), prop)
                fn = shard_map(
                    program,
                    mesh=self.mesh,
                    in_specs=(
                        pst_specs, state_spec, ctrl_specs, prop_specs, P(),
                    ),
                    out_specs=(state_spec, traj_spec, info_spec),
                )
                fin, traj, infos = fn(
                    pst_vals, s0, controls_stacked, prop, times
                )
                fin = dict(fin)
                traj = dict(traj)
                for k in ("u", "v", "a"):
                    fin[k] = fin[k][: plan.ndof]
                    traj[k] = traj[k][:, : plan.ndof]
                return fin, traj, infos

            return global_fn

        # ---- DP x TP: batched variants of the sharded loop ---------------
        # vmap the WHOLE sharded program over a local batch of variants
        # (state0 + prop batched; controls/times shared); the collectives
        # stay on the slab axis, so each variant's physics is untouched
        # while the batch axis shards over the dp mesh axis.
        dp = self.dp_axis
        vprog = jax.vmap(program, in_axes=(None, 0, None, 0, None))

        def _addb(spec):
            return P(dp, *spec)

        bstate_spec = {k: _addb(s) for k, s in state_spec.items()}
        btraj_spec = {k: _addb(s) for k, s in traj_spec.items()}
        if self._fsai:
            from ..models.fsai import FSAISolveInfo

            binfo_spec = FSAISolveInfo(
                num_iter=P(dp), abs_err=P(dp), rel_err=P(dp),
                bracketed=P(dp),
            )
        else:
            binfo_spec = SolveInfo(
                num_iter=P(dp), abs_err=P(dp), rel_err=P(dp)
            )

        def global_fn_b(state0_b, controls_stacked, prop_b, times):
            pad = plan.ndof_pad - plan.ndof
            s0 = dict(state0_b)
            for k in ("u", "v", "a"):
                s0[k] = jnp.pad(
                    jnp.asarray(state0_b[k]), ((0, 0), (0, pad))
                )
            ctrl_specs = jax.tree_util.tree_map(
                lambda _: P(), controls_stacked
            )
            prop_specs = jax.tree_util.tree_map(lambda _: P(dp), prop_b)
            fn = shard_map(
                vprog,
                mesh=self.mesh,
                in_specs=(
                    pst_specs, bstate_spec, ctrl_specs, prop_specs, P(),
                ),
                out_specs=(bstate_spec, btraj_spec, binfo_spec),
            )
            fin, traj, infos = fn(
                pst_vals, s0, controls_stacked, prop_b, times
            )
            fin = dict(fin)
            traj = dict(traj)
            for k in ("u", "v", "a"):
                fin[k] = fin[k][:, : plan.ndof]
                traj[k] = traj[k][:, :, : plan.ndof]
            return fin, traj, infos

        return global_fn_b

    # ------------------------------------------------------------------
    def integrate_pure(self, state0, controls_stacked, prop, times):
        """Sharded analog of ``forward.integrate_pure`` (rev mode)."""
        assert self.dp_axis is None, (
            "a DP x TP integrator runs batched: use integrate_batch_pure"
        )
        times = jnp.asarray(times)
        n_controls = jax.tree_util.tree_leaves(controls_stacked)[0].shape[0]
        n_steps = int(times.shape[0]) - 1
        key = (n_controls, n_steps)
        if key not in self._fn_cache:
            self._fn_cache[key] = jax.jit(
                self._build(n_controls, n_steps)
            )
        state0 = {k: jnp.asarray(v) for k, v in state0.items()}
        return self._fn_cache[key](state0, controls_stacked, prop, times)

    def integrate_batch_pure(self, state0_b, controls_stacked, prop_b,
                             times):
        """DP x TP: integrate a batch of variants of the DOF-sharded
        model in one program.  Every leaf of ``state0_b`` and ``prop_b``
        carries a leading batch axis (sharded over the mesh's dp axis;
        batch size must divide by the dp extent); controls and times are
        shared across variants.  Returns batched (fin, traj, infos)."""
        assert self.dp_axis is not None, (
            "construct with dp_axis=... on a 2D mesh for batched runs"
        )
        B = jax.tree_util.tree_leaves(prop_b)[0].shape[0]
        Bs = jax.tree_util.tree_leaves(state0_b)[0].shape[0]
        assert B == Bs, (
            f"prop batch ({B}) and state batch ({Bs}) must agree"
        )
        ndp = int(self.mesh.shape[self.dp_axis])
        assert B % ndp == 0, (
            f"variant batch ({B}) must divide by the dp mesh axis ({ndp})"
        )
        times = jnp.asarray(times)
        n_controls = jax.tree_util.tree_leaves(controls_stacked)[0].shape[0]
        n_steps = int(times.shape[0]) - 1
        key = (n_controls, n_steps)
        if key not in self._fn_cache:
            self._fn_cache[key] = jax.jit(
                self._build(n_controls, n_steps)
            )
        state0_b = {k: jnp.asarray(v) for k, v in state0_b.items()}
        return self._fn_cache[key](
            state0_b, controls_stacked, prop_b, times
        )

    def integrate(self, f, ini_state, controls, prop, times,
                  idx_meas=None, write=True):
        """Sharded analog of ``forward.integrate``: same BlockVector +
        StateFile surface (HDF5 writes, measure indices, divergence
        flagging), with the time loop run through the device mesh."""
        from .. import forward as fwd

        times = fwd.validate_times(times)
        self.model.set_prop(prop)
        state0 = {k: np.asarray(v) for k, v in ini_state.sub_items()}
        controls_stacked = fwd._stack_controls(self.model, controls)
        prop_d = self.model.prop_to_dict(prop)
        # static half of the FSAI envelope guard, as in forward.integrate
        check = getattr(self.model, "check_envelope", None)
        if check is not None:
            check(prop_d)
        fin_state, traj, infos = self.integrate_pure(
            state0, controls_stacked, prop_d, times
        )
        return fwd.finalize_run(
            self.model, f, ini_state, controls, prop, times, idx_meas,
            self.params, fin_state, traj, infos, write,
        )
