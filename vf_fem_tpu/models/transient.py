"""
Transient (time-step) models: solid, fluid, and coupled FSI.

Mirrors the reference's model layer (reference:
``src/femvf/models/transient.py``) with a TPU-first split:

- A **pure functional core**: each model builds jittable step functions
  ``F(state1, state0, control, prop, dt)`` and solvers
  ``solve_state1(state0, control, prop, dt) -> (state1, info)`` operating on
  dict-of-array pytrees.  The whole time loop can then run under
  ``lax.scan`` (see ``vf_fem_tpu.forward``), collapsing the reference's
  per-step Python <-> C++ <-> PETSc round-trips into one XLA program.
- Thin **OO wrappers** with the reference API (``set_ini_state``,
  ``solve_state1``, ``prop['emod'][:] = ...``) so reference driver scripts
  run unchanged.

Key translations from the reference:
- Newmark substitution of v1, a1 into the 'u' form
  (``form.modify_newmark_time_discretization``, reference
  ``form.py:1067-1113``) becomes plain function composition.
- The nodal contact traction, set manually as a control in the reference
  (``NodalContactModel``, reference ``transient.py:516-583``), is computed
  *inside* the residual, so ``jax.jacfwd`` provides the contact stiffness
  that the reference patches in via ``diagonalScale``.
- The Newmark-structured one-matrix solve (reference
  ``transient.py:470-491``) appears naturally: Newton runs on the 'u' block
  only and v1, a1 follow explicitly.
- ``solve_state1`` carries a ``jax.custom_vjp`` implementing the
  implicit-function-theorem adjoint (transposed Jacobian solve, mirroring
  ``solve_dres_dstate1_adj``, reference ``transient.py:493-513``), so
  ``jax.grad`` works through whole trajectories.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from .. import blocks as bv
from .. import config
from ..equations import newmark
from ..fem import assembly
from ..residuals.base import FemResidual, JaxResidual
from ..solverconst import DEFAULT_NEWTON_SOLVER_PRM, FIXEDPOINT_SOLVER_PRM
from ..solvers import linalg
from ..solvers.newton import newton_solve
from .fsi import FSIMap


def _params_key(params: Optional[dict]) -> tuple:
    params = {**DEFAULT_NEWTON_SOLVER_PRM, **(params or {})}
    return tuple(sorted(params.items()))


_ITERATIVE_SOLVERS = ("cg", "bsb", "btd", "spike", "pcr")
# adjoint (transposed) solve fallbacks by linear_solver; 'btd' needs none:
# the stored Thomas factors solve A^T x = r directly (btd_solve_t)
_BWD_FALLBACK = {}


def _iter_solve(factors, r, params_d, transpose=False, bsb_plan=None):
    """Solve with frozen matrix-free factors by block-Jacobi Krylov.

    ``linear_solver='cg'``: factors = (EBEOperator, nodal block inverse).
    ``linear_solver='bsb'``: factors = (block-banded array, nodal block
    inverse) — the gather-free large-mesh format (``solvers.bsb``).

    Default Krylov is BiCGStab: the Newmark Jacobian is nonsymmetric
    through the follower-pressure surface terms, and PCG stalls on it once
    the drive pressure is on (measured).  Set ``'krylov': 'pcg'`` for
    symmetric problems (no follower load) where CG's single matvec wins."""
    from ..solvers import bsb as bsb_mod

    if params_d.get("linear_solver") == "btd":
        from ..solvers import btd as btd_mod

        if transpose:
            return btd_mod.btd_solve_t(bsb_plan, factors, r)
        return btd_mod.btd_solve(bsb_plan, factors, r)

    if params_d.get("linear_solver") == "spike":
        from ..solvers import spike as spike_mod

        if transpose:
            return spike_mod.spike_solve_t(bsb_plan, factors, r)
        return spike_mod.spike_solve(bsb_plan, factors, r)

    if params_d.get("linear_solver") == "pcr":
        from ..solvers import pcr as pcr_mod

        if transpose:
            return pcr_mod.pcr_solve_t(bsb_plan, factors, r)
        return pcr_mod.pcr_solve(bsb_plan, factors, r)

    A, Dinv = factors
    block = Dinv.shape[-1]

    def pre(v):
        return jnp.einsum(
            "nij,nj->ni", Dinv, v.reshape(-1, block)
        ).reshape(-1)

    if params_d.get("linear_solver") == "bsb":
        if transpose:
            mv = lambda v: bsb_mod.bsb_matvec_t(bsb_plan, A, v)
        else:
            mv = lambda v: bsb_mod.bsb_matvec(bsb_plan, A, v)
    else:
        mv = A.matvec_transpose if transpose else A.matvec
    tol = params_d.get("krylov_tolerance", 1e-8)
    mx = params_d.get("krylov_max_iter", 1000)
    if params_d.get("krylov", "bicgstab") == "pcg" and not transpose:
        result = linalg.pcg(mv, r, precond=pre, tol=tol, max_iter=mx)
    else:
        result = linalg.bicgstab(mv, r, precond=pre, tol=tol, max_iter=mx)
    return result.x


class BaseTransientModel:
    """One-time-step system F(u1, u0, g, p, dt)
    (reference: ``transient.py:32-161``)."""

    @property
    def dt(self):
        raise NotImplementedError

    def set_ini_state(self, state):
        raise NotImplementedError

    def set_fin_state(self, state):
        raise NotImplementedError

    def set_control(self, control):
        raise NotImplementedError

    def set_prop(self, prop):
        raise NotImplementedError

    def assem_res(self):
        raise NotImplementedError

    def solve_state1(self, state1, options=None):
        raise NotImplementedError


# =============================================================================
# Solid
# =============================================================================


def properties_vec_from_residual(residual: FemResidual) -> bv.BlockVector:
    """Build the property block vector from 'prop/*' coefficient specs
    (reference: ``properties_bvec_from_forms``, ``transient.py:187-218``)."""
    defaults = residual.default_coefficients()
    labels, vecs = [], []
    for key in residual.coefficient_spec:
        group, name = key.split("/", 1)
        if group == "prop":
            labels.append(name)
            vecs.append(np.asarray(defaults[key]).reshape(-1).copy())
    return bv.BlockVector(vecs, labels=[tuple(labels)])


class SolidModel(BaseTransientModel):
    """
    Transient solid with Newmark time discretization and nodal penalty
    contact (reference ``FenicsModel``+``NodalContactModel``,
    ``transient.py:221-583``).
    """

    def __init__(self, residual: FemResidual):
        self._residual = residual
        mesh = residual.mesh()
        self.nvert = mesh.num_vertices
        self.dim = mesh.dim
        self.ndof = self.nvert * self.dim

        spec = residual.coefficient_spec
        self._has_contact = "control/tcontact" in spec
        self._has_shape = "prop/umesh" in spec
        self._has_p1 = "control/p1" in spec

        # OO state (host, mutable)
        zeros = lambda n: np.zeros(n)
        self.state0 = bv.BlockVector(
            [zeros(self.ndof)] * 3, labels=[("u", "v", "a")]
        )
        self.state1 = self.state0.copy()
        self.control = bv.BlockVector([zeros(self.nvert)], labels=[("p",)])
        self.prop = properties_vec_from_residual(residual)
        self._dt = 1.0

        # Static assembly data
        topo = residual.topology
        self._cell_dofs = assembly.cell_dof_array(
            np.asarray(topo.cells), self.dim
        )
        fcells = np.asarray(topo.facet_cells)
        self._facet_cell_dofs = assembly.cell_dof_array(
            np.asarray(topo.cells)[fcells], self.dim
        )
        self._Xref = np.asarray(residual.ref_mesh_coords)

        self._build_pure_fns()

    # -- Reference-compatible properties ------------------------------------
    @property
    def residual(self) -> FemResidual:
        return self._residual

    @property
    def solid(self):
        return self

    @property
    def XREF(self) -> np.ndarray:
        """Flat reference coordinates in dof order
        (reference: ``transient.py:277-287``)."""
        return np.asarray(self._Xref).reshape(-1)

    @property
    def dt(self):
        return self._dt

    @dt.setter
    def dt(self, value):
        self._dt = float(value)

    def set_ini_state(self, state):
        self.state0[:] = state

    def set_fin_state(self, state):
        self.state1[:] = state

    def set_control(self, control):
        self.control[:] = control

    def set_prop(self, prop):
        self.prop[:] = prop

    # -- Pure functional core -------------------------------------------------
    def _prop_fields(self, prop: dict) -> dict:
        """Map {name: flat array} -> {'prop/name': shaped array}."""
        spec = self._residual.coefficient_spec
        out = {}
        for key, sp in spec.items():
            group, name = key.split("/", 1)
            if group != "prop":
                continue
            arr = jnp.asarray(prop[name])
            if sp.space == "cg1_vector":
                arr = arr.reshape(self.nvert, self.dim)
            out[key] = arr
        return out

    def _build_pure_fns(self):
        R = self._residual
        topo = R.topology
        spec = R.coefficient_spec
        nvert, dim, ndof = self.nvert, self.dim, self.ndof
        Xref = self._Xref
        bc_dofs = R.bc_dofs
        has_contact = self._has_contact
        has_p1 = self._has_p1
        cell_elem = R.cell_elem_fn()
        facet_elem = R.facet_elem_fn()
        cells = topo.cells
        fcells = topo.facet_cells
        cell_dofs, facet_cell_dofs = self._cell_dofs, self._facet_cell_dofs
        n_facets = R.n_facets()
        has_facets = len(R._facet_forms) > 0 and n_facets > 0

        def coords(prop_fields):
            X = Xref
            if "prop/umesh" in prop_fields:
                X = X + prop_fields["prop/umesh"]
            return X

        def contact_traction(u1_2d, X, prop_fields):
            n = prop_fields["prop/ncontact"]
            y = prop_fields["prop/ycontact"][0]
            k = prop_fields["prop/kcontact"][0]
            gap = (X + u1_2d) @ n - y
            return -(k * jnp.maximum(gap, 0.0) ** 3)[:, None] * n

        def full_fields(u1_2d, v1_2d, a1_2d, control, prop_fields):
            fields = dict(prop_fields)
            fields["state/u1"] = u1_2d
            fields["state/v1"] = v1_2d
            fields["state/a1"] = a1_2d
            if has_p1:
                fields["control/p1"] = jnp.asarray(control["p1"])
            if has_contact:
                X = coords(prop_fields)
                fields["control/tcontact"] = contact_traction(
                    u1_2d, X, prop_fields
                )
            return fields

        self._contact_traction = contact_traction
        self._coords = coords
        self._full_fields = full_fields

        # ---- Newton residual on the 'u' block (v1, a1 substituted) ----
        # BC rows by mask arithmetic rather than .at[].set: the (static)
        # scatter into a handful of rows serializes on TPU
        bc_mask_np = np.zeros(ndof)
        bc_mask_np[np.asarray(bc_dofs)] = 1.0

        def res_u(u1_flat, state0, control, prop, dt, banded=False):
            u1 = u1_flat.reshape(nvert, dim)
            u0 = state0["u"].reshape(nvert, dim)
            v0 = state0["v"].reshape(nvert, dim)
            a0 = state0["a"].reshape(nvert, dim)
            v1 = newmark.newmark_v(u1, u0, v0, a0, dt)
            a1 = newmark.newmark_a(u1, u0, v0, a0, dt)
            prop_fields = self._prop_fields(prop)
            fields = full_fields(u1, v1, a1, control, prop_fields)
            res = R.assemble_res(fields, banded=banded).reshape(-1)
            bc_mask = jnp.asarray(bc_mask_np, dtype=res.dtype)
            return res * (1.0 - bc_mask) + u1_flat * bc_mask

        self.res_u = res_u

        # Banded (gather-free) variant for the Newton/adjoint hot paths.
        # The banded ops are custom_vjp (reverse-mode only), so the
        # forward-mode IFT rule (solve_u1_jvp) keeps the plain path.
        self._banded_ok = None

        def use_banded() -> bool:
            """Static (trace-time) decision: config + backend + mesh."""
            if self._banded_ok is None:
                mode = config.BANDED_ASSEMBLY
                if mode in ("0", "false", "off"):
                    self._banded_ok = False
                elif jax.default_backend() != "tpu" and mode not in (
                    "1", "true", "on",
                ):
                    self._banded_ok = False
                else:
                    try:
                        R.banded_plan()
                        self._banded_ok = True
                    except AssertionError:
                        self._banded_ok = False
            return self._banded_ok

        def _use_banded(params_d) -> bool:
            """Per-solve decision via the 'assembly' parameter:
            'banded' forces the Pallas path (asserts if the mesh is not
            bandwidth-ordered), 'plain' forces the indexed path, 'auto'
            (default) enables banded on a TPU-default backend when the
            mesh supports it.  Explicit values matter when execution is
            pinned to a non-default device (e.g. a CPU baseline leg in a
            TPU process)."""
            mode = params_d.get("assembly", "auto")
            if mode == "banded":
                R.banded_plan()
                return True
            if mode == "plain":
                return False
            return use_banded()

        def res_u_fast(u1_flat, state0, control, prop, dt, params_d):
            return res_u(u1_flat, state0, control, prop, dt,
                         banded=_use_banded(params_d))

        # ---- Element-level Newton Jacobian (dense assembly) ----
        def _elem_state0(state0):
            u0 = state0["u"].reshape(nvert, dim)
            v0 = state0["v"].reshape(nvert, dim)
            a0 = state0["a"].reshape(nvert, dim)
            return u0, v0, a0

        def jac_u_blocks(u1_flat, state0, control, prop, dt):
            """Per-element Jacobian blocks (Jc, Jf) of the Newton 'u'
            residual — shared by the dense and the matrix-free (EBE)
            assemblies."""
            u1 = u1_flat.reshape(nvert, dim)
            u0, v0, a0 = _elem_state0(state0)
            prop_fields = self._prop_fields(prop)
            X = coords(prop_fields)
            fields = full_fields(u1, jnp.zeros_like(u1), jnp.zeros_like(u1),
                                 control, prop_fields)

            # Cell pass
            local_c, axes_c = R.gather_cell_locals(fields)
            Xe_c = X[cells]
            s0_c = (u0[cells], v0[cells], a0[cells])

            def cell_fn(u1_e, Xe, s0_e, local):
                u0_e, v0_e, a0_e = s0_e
                v1_e = newmark.newmark_v(u1_e, u0_e, v0_e, a0_e, dt)
                a1_e = newmark.newmark_a(u1_e, u0_e, v0_e, a0_e, dt)
                loc = dict(local)
                loc["state/u1"] = u1_e
                loc["state/v1"] = v1_e
                loc["state/a1"] = a1_e
                return cell_elem(Xe, loc)

            nv = cells.shape[1]
            nld = nv * dim
            Jc = jax.vmap(jax.jacfwd(cell_fn), in_axes=(0, 0, 0, axes_c))(
                u1[cells], Xe_c, s0_c, local_c
            ).reshape(-1, nld, nld)

            Jf = None
            if has_facets:
                local_f, axes_f = R.gather_facet_locals(fields)
                cell_verts = cells[fcells]
                Xe_f = X[cell_verts]
                s0_f = (u0[cell_verts], v0[cell_verts], a0[cell_verts])

                def facet_fn(u1_e, Xe, sel, opp_sel, s0_e, local):
                    u0_e, v0_e, a0_e = s0_e
                    v1_e = newmark.newmark_v(u1_e, u0_e, v0_e, a0_e, dt)
                    a1_e = newmark.newmark_a(u1_e, u0_e, v0_e, a0_e, dt)
                    loc = dict(local)
                    loc["state/u1"] = u1_e
                    loc["state/v1"] = v1_e
                    loc["state/a1"] = a1_e
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

                Jf = jax.vmap(
                    jax.jacfwd(facet_fn), in_axes=(0, 0, 0, 0, 0, axes_f)
                )(
                    u1[cell_verts],
                    Xe_f,
                    topo.facet_sel,
                    topo.facet_opp_sel,
                    s0_f,
                    local_f,
                ).reshape(-1, nld, nld)
            return Jc, Jf

        self.jac_u_blocks = jac_u_blocks

        def jac_u_dense(u1_flat, state0, control, prop, dt):
            Jc, Jf = jac_u_blocks(u1_flat, state0, control, prop, dt)
            A = assembly.scatter_dense_jacobian(Jc, cell_dofs, ndof)
            if Jf is not None:
                A = assembly.scatter_dense_jacobian(
                    Jf, facet_cell_dofs, ndof, A
                )
            A = assembly.apply_dirichlet_rows(A, bc_dofs)
            return A

        self.jac_u_dense = jac_u_dense

        # Static transpose of the scatter pattern (host-built once): turns
        # the EBE scatter-add into a gather + row-sum, which vectorizes on
        # TPU where scatter-adds serialize.
        ebe_gather = assembly.build_gather_map(
            [cell_dofs, facet_cell_dofs], ndof
        )

        def jac_u_ebe(u1_flat, state0, control, prop, dt):
            """Matrix-free element-by-element operator — the TPU-native
            sparse Jacobian for meshes beyond dense-LU scale (SURVEY 2.9:
            'TPU-resident preconditioned Krylov with Pallas SpMV')."""
            Jc, Jf = jac_u_blocks(u1_flat, state0, control, prop, dt)
            return assembly.EBEOperator(
                J_cells=Jc,
                cell_dofs=jnp.asarray(cell_dofs),
                J_facets=Jf,
                facet_dofs=jnp.asarray(facet_cell_dofs),
                ndof=ndof,
                bc_dofs=jnp.asarray(bc_dofs),
                gather_idx=jnp.asarray(ebe_gather),
            )

        self.jac_u_ebe = jac_u_ebe

        # ---- Matrix-free factor helpers (cg: EBE, bsb: block-banded) ----
        self._bsb_plan = None

        def get_bsb_plan():
            if self._bsb_plan is None:
                from ..solvers import bsb as bsb_mod

                self._bsb_plan = bsb_mod.plan_bsb(
                    [cell_dofs, facet_cell_dofs], ndof, bc_dofs
                )
            return self._bsb_plan

        self._get_bsb_plan = get_bsb_plan

        def make_iter_factors(u_lin, state0, control, prop, dt, params_d):
            op = jac_u_ebe(u_lin, state0, control, prop, dt)
            ls = params_d.get("linear_solver")
            if ls == "btd":
                from ..solvers import bsb as bsb_mod, btd as btd_mod

                blocks = bsb_mod.bsb_fill(
                    get_bsb_plan(), [op.J_cells, op.J_facets]
                )
                return btd_mod.btd_factor(
                    get_bsb_plan(), blocks,
                    store_dtype=params_d.get("btd_store_dtype"),
                    factor_dtype=params_d.get("btd_factor_dtype"),
                    offdiag_dtype=params_d.get("btd_offdiag_dtype"),
                )
            if ls == "spike":
                from ..solvers import bsb as bsb_mod, spike as spike_mod

                blocks = bsb_mod.bsb_fill(
                    get_bsb_plan(), [op.J_cells, op.J_facets]
                )
                return spike_mod.spike_factor(
                    get_bsb_plan(), blocks,
                    n_parts=int(params_d.get("spike_partitions", 8)),
                    store_dtype=params_d.get("btd_store_dtype"),
                    factor_dtype=params_d.get("btd_factor_dtype"),
                    offdiag_dtype=params_d.get("btd_offdiag_dtype"),
                )
            if ls == "pcr":
                from ..solvers import bsb as bsb_mod, pcr as pcr_mod

                blocks = bsb_mod.bsb_fill(
                    get_bsb_plan(), [op.J_cells, op.J_facets]
                )
                return pcr_mod.pcr_factor(
                    get_bsb_plan(), blocks,
                    store_dtype=params_d.get("btd_store_dtype"),
                    factor_dtype=params_d.get("btd_factor_dtype"),
                )
            Dinv = op.block_diag_inverse(dim)
            if ls == "bsb":
                from ..solvers import bsb as bsb_mod

                blocks = bsb_mod.bsb_fill(
                    get_bsb_plan(), [op.J_cells, op.J_facets]
                )
                return (blocks, Dinv)
            return (op, Dinv)

        def iter_solve(factors, r, params_d, transpose=False):
            plan = (
                get_bsb_plan()
                if params_d.get("linear_solver") in ("bsb", "btd", "pcr")
                else None
            )
            return _iter_solve(
                factors, r, params_d, transpose=transpose, bsb_plan=plan
            )

        def _precond_t(factors, r, params_d):
            """Apply carried (possibly stale / bf16) factors as a
            TRANSPOSED preconditioner ``M^{-T} r``."""
            if params_d.get("linear_solver", "dense") in _ITERATIVE_SOLVERS:
                return iter_solve(factors, r, params_d, transpose=True)
            Ainv, d = factors
            return (Ainv.T @ (r / d)) / d

        def refined_adjoint_solve(factors, u1, state0, control, prop, dt,
                                  u1_bar, params_d):
            """Solve ``J(u1)^T lam = u1_bar`` by iterative refinement with
            the carried stale factors as preconditioner.

            The exact transposed-Jacobian action is one reverse-mode pass
            through the (banded) residual — HBM-streaming cost — so each
            refinement step costs ~one residual vjp + one stale solve,
            replacing the per-reverse-step Jacobian refill + refactor that
            made value+grad 6.5x a forward pass at large mesh
            (reference for the exact-adjoint contract this preserves:
            ``solve_dres_dstate1_adj``, reference ``transient.py:493-513``).
            Richardson iteration ``lam += M^{-T}(u1_bar - J^T lam)``
            converges whenever the chord Newton with the same factors does;
            best-iterate tracking + a stagnation stop certify the result.
            """
            tol = params_d.get("adjoint_refine_tol", 1e-8)
            max_it = int(params_d.get("adjoint_refine_iters", 25))
            stag = params_d.get("stagnation_ratio", 0.9)

            _, u1_vjp = jax.vjp(
                lambda u: res_u_fast(u, state0, control, prop, dt,
                                     params_d),
                u1,
            )

            def JT(v):
                return u1_vjp(v)[0]

            bnorm = jnp.linalg.norm(u1_bar)
            lam = _precond_t(factors, u1_bar, params_d)
            r = u1_bar - JT(lam)
            rn = jnp.linalg.norm(r)
            big = jnp.asarray(jnp.inf, dtype=rn.dtype)

            def cond(carry):
                lam, r, rn, rn_prev, lam_best, rn_best, k = carry
                return jnp.logical_and(
                    jnp.logical_and(rn >= tol * bnorm, rn < stag * rn_prev),
                    k < max_it,
                )

            def body(carry):
                lam, r, rn, rn_prev, lam_best, rn_best, k = carry
                lam = lam + _precond_t(factors, r, params_d)
                r = u1_bar - JT(lam)
                rn_new = jnp.linalg.norm(r)
                better = rn_new < rn_best
                lam_best = jnp.where(better, lam, lam_best)
                rn_best = jnp.where(better, rn_new, rn_best)
                return (lam, r, rn_new, rn, lam_best, rn_best, k + 1)

            out = jax.lax.while_loop(
                cond, body, (lam, r, rn, big, lam, rn, 0)
            )
            return out[4]

        # ---- Pure Newton solve with IFT adjoint ----
        def _solve_u1_fwd_only(u_guess, state0, control, prop, dt, params):
            params_d = dict(params)

            def assem(u1):
                return res_u_fast(u1, state0, control, prop, dt, params_d)

            if params_d.get("linear_solver", "dense") in _ITERATIVE_SOLVERS:
                # Matrix-free Newton-Krylov: preconditioned Krylov on the
                # EBE ('cg') or block-banded ('bsb') operator — no global
                # dense matrix ever materialized.  By default the operator
                # is assembled ONCE per step at the initial guess (chord
                # Newton — convergence is residual-certified, and the
                # frozen operator turns every Krylov iteration into
                # contiguous MXU work); set 'jacobian_update':
                # 'every_iteration' to re-assemble.
                if params_d.get("jacobian_update", "once_per_step") == (
                    "once_per_step"
                ):
                    factors0 = make_iter_factors(
                        u_guess, state0, control, prop, dt, params_d
                    )

                    def solve_jac(u1, r):
                        return iter_solve(factors0, r, params_d)

                else:

                    def solve_jac(u1, r):
                        factors = make_iter_factors(
                            u1, state0, control, prop, dt, params_d
                        )
                        return iter_solve(factors, r, params_d)

            elif params_d.get("jacobian_update", "every_iteration") == (
                "once_per_step"
            ):
                # Modified Newton: factor the Jacobian once at the step's
                # initial guess and reuse it — each extra iteration costs
                # two triangular solves instead of an O(n^3) refactor.
                # Convergence is still certified by the residual criteria.
                A0 = jac_u_dense(u_guess, state0, control, prop, dt)
                factors = linalg.dense_factor(A0)

                def solve_jac(u1, r):
                    return linalg.dense_factor_solve(factors, r)

            else:

                def solve_jac(u1, r):
                    A = jac_u_dense(u1, state0, control, prop, dt)
                    return linalg.dense_solve(A, r)

            return newton_solve(u_guess, assem, solve_jac, params_d)

        @partial(jax.custom_vjp, nondiff_argnums=(5,))
        def solve_u1(u_guess, state0, control, prop, dt, params):
            return _solve_u1_fwd_only(u_guess, state0, control, prop, dt, params)

        def solve_u1_fwd(u_guess, state0, control, prop, dt, params):
            u1, info = _solve_u1_fwd_only(
                u_guess, state0, control, prop, dt, params
            )
            return (u1, info), (u1, state0, control, prop, dt)

        def solve_u1_bwd(params, saved, cotangents):
            u1, state0, control, prop, dt = saved
            u1_bar, _info_bar = cotangents
            # lambda = J^{-T} u1_bar ; theta_bar = -(dR/dtheta)^T lambda
            params_d = dict(params)
            ls = params_d.get("linear_solver", "dense")
            params_d["linear_solver"] = _BWD_FALLBACK.get(ls, ls)
            # the adjoint is ONE uncorrected transposed solve: always use
            # full-precision factors, whatever the primal's bf16 storage
            params_d.pop("btd_store_dtype", None)
            params_d.pop("btd_offdiag_dtype", None)
            if params_d["linear_solver"] in _ITERATIVE_SOLVERS:
                fac = make_iter_factors(
                    u1, state0, control, prop, dt, params_d
                )
                lam = iter_solve(fac, u1_bar, params_d, transpose=True)
            else:
                A = jac_u_dense(u1, state0, control, prop, dt)
                lam = linalg.dense_solve_transpose(A, u1_bar)

            def res_wrt_theta(state0_, control_, prop_, dt_):
                return res_u_fast(u1, state0_, control_, prop_, dt_,
                                  params_d)

            _, vjp = jax.vjp(res_wrt_theta, state0, control, prop, dt)
            g_state0, g_control, g_prop, g_dt = vjp(-lam)
            g_guess = jax.tree_util.tree_map(jnp.zeros_like, u1)
            return (g_guess, g_state0, g_control, g_prop, g_dt)

        solve_u1.defvjp(solve_u1_fwd, solve_u1_bwd)
        self._solve_u1 = solve_u1

        # Forward-mode (jvp) variant for tangent propagation
        # (``forward.integrate_linear``); custom_vjp functions cannot be
        # jvp'd, so the IFT tangent rule is registered separately.
        @partial(jax.custom_jvp, nondiff_argnums=(5,))
        def solve_u1_fwdmode(u_guess, state0, control, prop, dt, params):
            u1, _ = _solve_u1_fwd_only(u_guess, state0, control, prop, dt, params)
            return u1

        @solve_u1_fwdmode.defjvp
        def solve_u1_jvp(params, primals, tangents):
            u_guess, state0, control, prop, dt = primals
            _, dstate0, dcontrol, dprop, ddt = tangents
            u1 = solve_u1_fwdmode(u_guess, state0, control, prop, dt, params)
            # du = -J^{-1} (dR/dtheta) theta_dot
            _, rdot = jax.jvp(
                lambda s0, c, p, t: res_u(u1, s0, c, p, t),
                (state0, control, prop, dt),
                (dstate0, dcontrol, dprop, ddt),
            )
            params_d = dict(params)
            # the tangent is ONE uncorrected direct solve (no residual
            # certification like the primal chord Newton): always use
            # full-precision factors, whatever the primal's bf16 storage
            params_d.pop("btd_store_dtype", None)
            params_d.pop("btd_offdiag_dtype", None)
            if params_d.get("linear_solver", "dense") in _ITERATIVE_SOLVERS:
                fac = make_iter_factors(
                    u1, state0, control, prop, dt, params_d
                )
                du = -iter_solve(fac, rdot, params_d)
            else:
                A = jac_u_dense(u1, state0, control, prop, dt)
                du = -linalg.dense_solve(A, rdot)
            return u1, du

        def solve_state1_pure_fwd(state1_guess, state0, control, prop, dt,
                                  params=_params_key(None)):
            from ..solvers.newton import SolveInfo

            u_guess = _initial_guess(state1_guess, state0, dt, params)
            u1 = solve_u1_fwdmode(
                u_guess, state0, control, prop, dt, params
            )
            u1_2d = u1.reshape(nvert, dim)
            u0, v0, a0 = _elem_state0(state0)
            v1 = newmark.newmark_v(u1_2d, u0, v0, a0, dt).reshape(-1)
            a1 = newmark.newmark_a(u1_2d, u0, v0, a0, dt).reshape(-1)
            info = SolveInfo(
                num_iter=jnp.array(0),
                abs_err=jnp.array(0.0),
                rel_err=jnp.array(0.0),
            )
            return {"u": u1, "v": v1, "a": a1}, info

        self.solve_state1_pure_fwd = solve_state1_pure_fwd
        self.step_pure_fwd = solve_state1_pure_fwd

        def _initial_guess(state1_guess, state0, dt, params):
            """Newmark predictor start (u0 + dt v0 + dt^2/2 a0) unless the
            caller asks for its provided guess ('initial_guess': 'given').
            The converged state is guess-independent; the predictor just
            saves Newton iterations."""
            if dict(params).get("initial_guess", "predictor") == "given":
                return state1_guess["u"]
            return newmark.newmark_predict_u(
                state0["u"], state0["v"], state0["a"], dt
            )

        def solve_state1_pure(state1_guess, state0, control, prop, dt,
                              params=_params_key(None)):
            u_guess = _initial_guess(state1_guess, state0, dt, params)
            u1, info = solve_u1(
                u_guess, state0, control, prop, dt, params
            )
            u1_2d = u1.reshape(nvert, dim)
            u0, v0, a0 = _elem_state0(state0)
            v1 = newmark.newmark_v(u1_2d, u0, v0, a0, dt).reshape(-1)
            a1 = newmark.newmark_a(u1_2d, u0, v0, a0, dt).reshape(-1)
            return {"u": u1, "v": v1, "a": a1}, info

        self.solve_state1_pure = solve_state1_pure
        self.step_pure = solve_state1_pure

        # ---- Stale-factor quasi-Newton (Jacobian refresh every K steps) ----
        # The frozen factors are a *solver internal*: the converged state
        # satisfies R(u1) = 0 regardless, so IFT gradients stay exact with
        # zero sensitivity through the factors.
        def factorize(state0, control, prop, dt, params=_params_key(None)):
            """Factor the Jacobian at the Newmark-predictor point.

            ``linear_solver='dense'``: equilibrated explicit inverse.
            ``linear_solver='cg'``: frozen EBE operator + nodal
            block-Jacobi inverse (matrix-free, large meshes)."""
            u_lin = _initial_guess(None, state0, dt, params)
            params_d = dict(params)
            if params_d.get("linear_solver", "dense") in _ITERATIVE_SOLVERS:
                return make_iter_factors(
                    u_lin, state0, control, prop, dt, params_d
                )
            A = jac_u_dense(u_lin, state0, control, prop, dt)
            return linalg.dense_factor(A)

        self.factorize = factorize

        def refresh_factors(factors, state0, control, prop, dt,
                            params=_params_key(None)):
            """Newton–Schulz refresh of carried inverse factors toward the
            Jacobian at the current predictor point (matmul-only; see
            :func:`vf_fem_tpu.solvers.linalg.dense_refresh`).  EBE factors
            have no factorization to amortize — refresh = re-assemble."""
            if dict(params).get("linear_solver", "dense") in _ITERATIVE_SOLVERS:
                return factorize(state0, control, prop, dt, params)
            u_lin = _initial_guess(None, state0, dt, params)
            A = jac_u_dense(u_lin, state0, control, prop, dt)
            params_d = dict(params)
            iters = int(params_d.get("jacobian_refresh_iters", 2))
            return linalg.dense_refresh(
                factors, A, iters,
                precision=params_d.get("jacobian_refresh_precision"),
            )

        self.refresh_factors = refresh_factors

        @partial(jax.custom_vjp, nondiff_argnums=(6,))
        def solve_u1_stale(u_guess, factors, state0, control, prop, dt, params):
            params_d = dict(params)

            def assem(u1):
                return res_u_fast(u1, state0, control, prop, dt, params_d)

            if params_d.get("linear_solver", "dense") in _ITERATIVE_SOLVERS:

                def solve_jac(u1, r):
                    return iter_solve(factors, r, params_d)

            else:

                def solve_jac(u1, r):
                    return linalg.dense_factor_solve(factors, r)

            return newton_solve(u_guess, assem, solve_jac, params_d)

        def solve_u1_stale_fwd(u_guess, factors, state0, control, prop, dt,
                               params):
            u1, info = solve_u1_stale(
                u_guess, factors, state0, control, prop, dt, params
            )
            return (u1, info), (u1, factors, state0, control, prop, dt)

        def solve_u1_stale_bwd(params, saved, cotangents):
            u1, factors, state0, control, prop, dt = saved
            u1_bar, _ = cotangents
            params_d = dict(params)
            ls = params_d.get("linear_solver", "dense")
            params_d["linear_solver"] = _BWD_FALLBACK.get(ls, ls)
            if params_d.get("adjoint_refine", "stale") == "stale":
                # reuse the forward sweep's carried factors (bf16-stored
                # ones included — they are only a preconditioner here) and
                # refine against the exact transposed-Jacobian action: no
                # per-reverse-step refill/refactor
                lam = refined_adjoint_solve(
                    factors, u1, state0, control, prop, dt, u1_bar,
                    params_d,
                )
            elif params_d["linear_solver"] in _ITERATIVE_SOLVERS:
                # exact mode: rebuild full-precision factors at u1 and do
                # ONE uncorrected transposed solve
                params_d.pop("btd_store_dtype", None)
                params_d.pop("btd_offdiag_dtype", None)
                fac = make_iter_factors(
                    u1, state0, control, prop, dt, params_d
                )
                lam = iter_solve(fac, u1_bar, params_d, transpose=True)
            else:
                params_d.pop("btd_store_dtype", None)
                params_d.pop("btd_offdiag_dtype", None)
                A = jac_u_dense(u1, state0, control, prop, dt)
                lam = linalg.dense_solve_transpose(A, u1_bar)
            _, vjp = jax.vjp(
                lambda s0, c, p, t: res_u_fast(u1, s0, c, p, t, params_d),
                state0, control, prop, dt,
            )
            g_state0, g_control, g_prop, g_dt = vjp(-lam)
            g_guess = jnp.zeros_like(u1)
            # the solver's internal factors carry no sensitivity (the root
            # of R is independent of how it was found)
            g_factors = jax.tree_util.tree_map(jnp.zeros_like, factors)
            return (g_guess, g_factors, g_state0, g_control, g_prop, g_dt)

        solve_u1_stale.defvjp(solve_u1_stale_fwd, solve_u1_stale_bwd)

        def solve_state1_stale(state1_guess, factors, state0, control, prop,
                               dt, params=_params_key(None)):
            u_guess = _initial_guess(state1_guess, state0, dt, params)
            u1, info = solve_u1_stale(
                u_guess, factors, state0, control, prop, dt, params
            )
            u1_2d = u1.reshape(nvert, dim)
            u0, v0, a0 = _elem_state0(state0)
            v1 = newmark.newmark_v(u1_2d, u0, v0, a0, dt).reshape(-1)
            a1 = newmark.newmark_a(u1_2d, u0, v0, a0, dt).reshape(-1)
            return {"u": u1, "v": v1, "a": a1}, info

        self.solve_state1_stale = solve_state1_stale
        self.step_pure_stale = solve_state1_stale

        # ---- Static problem (u0 := u1, v1 = a1 = 0) ----
        # The reference recovers statics by substituting u0 := u1 so the
        # Newmark updates vanish (reference: ``static.py:1-20,118-124``).
        # Here that is simply the residual with v1 = a1 = 0 and the Jacobian
        # taken with v1, a1 held fixed.
        def res_u_static(u1_flat, control, prop):
            u1 = u1_flat.reshape(nvert, dim)
            z = jnp.zeros_like(u1)
            prop_fields = self._prop_fields(prop)
            fields = full_fields(u1, z, z, control, prop_fields)
            res = R.assemble_res(fields).reshape(-1)
            return res.at[bc_dofs].set(u1_flat[bc_dofs] - 0.0)

        self.res_u_static = res_u_static

        def jac_u_static_dense(u1_flat, control, prop):
            u1 = u1_flat.reshape(nvert, dim)
            prop_fields = self._prop_fields(prop)
            X = coords(prop_fields)
            z = jnp.zeros_like(u1)
            fields = full_fields(u1, z, z, control, prop_fields)

            local_c, axes_c = R.gather_cell_locals(fields)
            Xe_c = X[cells]

            def cell_fn(u1_e, Xe, local):
                loc = dict(local)
                loc["state/u1"] = u1_e
                loc["state/v1"] = jnp.zeros_like(u1_e)
                loc["state/a1"] = jnp.zeros_like(u1_e)
                return cell_elem(Xe, loc)

            nv = cells.shape[1]
            nld = nv * dim
            Jc = jax.vmap(jax.jacfwd(cell_fn), in_axes=(0, 0, axes_c))(
                u1[cells], Xe_c, local_c
            ).reshape(-1, nld, nld)
            A = assembly.scatter_dense_jacobian(Jc, cell_dofs, ndof)

            if has_facets:
                local_f, axes_f = R.gather_facet_locals(fields)
                cell_verts = cells[fcells]
                Xe_f = X[cell_verts]

                def facet_fn(u1_e, Xe, sel, opp_sel, local):
                    loc = dict(local)
                    loc["state/u1"] = u1_e
                    loc["state/v1"] = jnp.zeros_like(u1_e)
                    loc["state/a1"] = jnp.zeros_like(u1_e)
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

                Jf = jax.vmap(
                    jax.jacfwd(facet_fn), in_axes=(0, 0, 0, 0, axes_f)
                )(
                    u1[cell_verts], Xe_f, topo.facet_sel, topo.facet_opp_sel,
                    local_f,
                ).reshape(-1, nld, nld)
                A = assembly.scatter_dense_jacobian(Jf, facet_cell_dofs, ndof, A)

            return assembly.apply_dirichlet_rows(A, bc_dofs)

        self.jac_u_static_dense = jac_u_static_dense

        def jac_u_static_blocks(u1_flat, control, prop):
            """Per-element static Jacobian blocks (v1 = a1 = 0) — the
            large-mesh analog of ``jac_u_static_dense`` for banded direct
            solves (same plan as the transient path)."""
            u1 = u1_flat.reshape(nvert, dim)
            prop_fields = self._prop_fields(prop)
            X = coords(prop_fields)
            z = jnp.zeros_like(u1)
            fields = full_fields(u1, z, z, control, prop_fields)

            local_c, axes_c = R.gather_cell_locals(fields)

            def cell_fn(u1_e, Xe, local):
                loc = dict(local)
                loc["state/u1"] = u1_e
                loc["state/v1"] = jnp.zeros_like(u1_e)
                loc["state/a1"] = jnp.zeros_like(u1_e)
                return cell_elem(Xe, loc)

            nv = cells.shape[1]
            nld = nv * dim
            Jc = jax.vmap(jax.jacfwd(cell_fn), in_axes=(0, 0, axes_c))(
                u1[cells], X[cells], local_c
            ).reshape(-1, nld, nld)

            Jf = None
            if has_facets:
                local_f, axes_f = R.gather_facet_locals(fields)
                cell_verts = cells[fcells]

                def facet_fn(u1_e, Xe, sel, opp_sel, local):
                    loc = dict(local)
                    loc["state/u1"] = u1_e
                    loc["state/v1"] = jnp.zeros_like(u1_e)
                    loc["state/a1"] = jnp.zeros_like(u1_e)
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

                Jf = jax.vmap(
                    jax.jacfwd(facet_fn), in_axes=(0, 0, 0, 0, axes_f)
                )(
                    u1[cell_verts], X[cell_verts], topo.facet_sel,
                    topo.facet_opp_sel, local_f,
                ).reshape(-1, nld, nld)
            return Jc, Jf

        self.jac_u_static_blocks = jac_u_static_blocks

        def _static_solve_jac(u1, r, control, prop, params_d,
                              transpose=False):
            """Static Newton linear solve: dense below large-mesh scale,
            banded-direct (``linear_solver='btd'|'pcr'``) above it, where
            the dense Jacobian (ndof^2) is unbuildable."""
            ls = params_d.get("linear_solver", "dense")
            if ls in ("btd", "pcr"):
                from ..solvers import bsb as bsb_mod

                Jc, Jf = jac_u_static_blocks(u1, control, prop)
                blocks = bsb_mod.bsb_fill(get_bsb_plan(), [Jc, Jf])
                if ls == "pcr":
                    from ..solvers import pcr as pcr_mod

                    fac = pcr_mod.pcr_factor(
                        get_bsb_plan(), blocks,
                        store_dtype=params_d.get("btd_store_dtype"),
                        factor_dtype=params_d.get("btd_factor_dtype"),
                    )
                    if transpose:
                        return pcr_mod.pcr_solve_t(get_bsb_plan(), fac, r)
                    return pcr_mod.pcr_solve(get_bsb_plan(), fac, r)
                from ..solvers import btd as btd_mod

                fac = btd_mod.btd_factor(
                    get_bsb_plan(), blocks,
                    store_dtype=params_d.get("btd_store_dtype"),
                    factor_dtype=params_d.get("btd_factor_dtype"),
                    offdiag_dtype=params_d.get("btd_offdiag_dtype"),
                )
                if transpose:
                    return btd_mod.btd_solve_t(get_bsb_plan(), fac, r)
                return btd_mod.btd_solve(get_bsb_plan(), fac, r)
            A = jac_u_static_dense(u1, control, prop)
            if transpose:
                return linalg.dense_solve_transpose(A, r)
            return linalg.dense_solve(A, r)

        @partial(jax.custom_vjp, nondiff_argnums=(3,))
        def solve_static_u1(u_guess, control, prop, params):
            def assem(u1):
                return res_u_static(u1, control, prop)

            def solve_jac(u1, r):
                return _static_solve_jac(u1, r, control, prop, dict(params))

            return newton_solve(u_guess, assem, solve_jac, dict(params))

        def solve_static_fwd(u_guess, control, prop, params):
            u1, info = solve_static_u1(u_guess, control, prop, params)
            return (u1, info), (u1, control, prop)

        def solve_static_bwd(params, saved, cotangents):
            u1, control, prop = saved
            u1_bar, _ = cotangents
            lam = _static_solve_jac(
                u1, u1_bar, control, prop, dict(params), transpose=True
            )
            _, vjp = jax.vjp(
                lambda c, p: res_u_static(u1, c, p), control, prop
            )
            g_control, g_prop = vjp(-lam)
            return (jnp.zeros_like(u1), g_control, g_prop)

        solve_static_u1.defvjp(solve_static_fwd, solve_static_bwd)
        self.solve_static_u1 = solve_static_u1

        # ---- Full transient residual (u, v, a blocks) ----
        def res_transient(state1, state0, control, prop, dt):
            u1 = state1["u"].reshape(nvert, dim)
            u0, v0, a0 = _elem_state0(state0)
            v1n = newmark.newmark_v(u1, u0, v0, a0, dt)
            a1n = newmark.newmark_a(u1, u0, v0, a0, dt)
            resu = res_u(state1["u"], state0, control, prop, dt)
            return {
                "u": resu,
                "v": state1["v"] - v1n.reshape(-1),
                "a": state1["a"] - a1n.reshape(-1),
            }

        self.res_transient = res_transient

    # -- Reference-compatible OO methods --------------------------------------
    def _np_state(self, b: bv.BlockVector) -> dict:
        return {k: np.asarray(v) for k, v in b.sub_items()}

    def control_to_dict(self, control: bv.BlockVector) -> dict:
        return {"p1": np.asarray(control["p"])}

    def prop_to_dict(self, prop: bv.BlockVector) -> dict:
        return {k: np.asarray(v) for k, v in prop.sub_items()}

    def assem_res(self) -> bv.BlockVector:
        state1 = self._np_state(self.state1)
        state0 = self._np_state(self.state0)
        control = {"p1": np.asarray(self.control["p"])}
        prop = {k: np.asarray(v) for k, v in self.prop.sub_items()}
        res_fn = self._jitted("res_transient", self.res_transient)
        res = res_fn(state1, state0, control, prop, self._dt)
        return bv.BlockVector(
            [np.asarray(res[k]) for k in ("u", "v", "a")],
            labels=[("u", "v", "a")],
        )

    def _jitted(self, name, fn, static_argnums=()):
        cache = self.__dict__.setdefault("_jit_cache", {})
        if name not in cache:
            cache[name] = jax.jit(fn, static_argnums=static_argnums)
        return cache[name]

    def _oo_args(self):
        state1 = self._np_state(self.state1)
        state0 = self._np_state(self.state0)
        control = {"p1": np.asarray(self.control["p"])}
        prop = {k: np.asarray(v) for k, v in self.prop.sub_items()}
        return state1, state0, control, prop

    def assem_dres_dstate1(self) -> bv.BlockMatrix:
        """3x3 block Jacobian wrt the final state, exploiting the Newmark
        substitution (reference: ``transient.py:384-406``): the 'u' block
        depends on u1 only; v/a rows are Newmark identities."""
        state1, state0, control, prop = self._oo_args()
        A = np.asarray(
            self.jac_u_dense(state1["u"], state0, control, prop, self._dt)
        )
        n = self.ndof
        I = np.eye(n)
        Z = np.zeros((n, n))
        dv_du1 = -newmark.newmark_v_du1(self._dt) * I
        da_du1 = -newmark.newmark_a_du1(self._dt) * I
        return bv.BlockMatrix(
            [[A, Z, Z], [dv_du1, I, Z], [da_du1, Z, I]],
            labels=(("u", "v", "a"), ("u", "v", "a")),
        )

    def assem_dres_dstate0(self) -> bv.BlockMatrix:
        """(reference: ``transient.py:408-423``)"""
        state1, state0, control, prop = self._oo_args()
        u1 = jnp.asarray(state1["u"])
        jac = jax.jacfwd(
            lambda s0: self.res_u(u1, s0, control, prop, self._dt)
        )({k: jnp.asarray(v) for k, v in state0.items()})
        n = self.ndof
        I = np.eye(n)
        Z = np.zeros((n, n))
        dt = self._dt
        dv_du0 = -newmark.newmark_v_du0(dt) * I
        dv_dv0 = -newmark.newmark_v_dv0(dt) * I
        dv_da0 = -newmark.newmark_v_da0(dt) * I
        da_du0 = -newmark.newmark_a_du0(dt) * I
        da_dv0 = -newmark.newmark_a_dv0(dt) * I
        da_da0 = -newmark.newmark_a_da0(dt) * I
        return bv.BlockMatrix(
            [
                [np.asarray(jac["u"]), np.asarray(jac["v"]), np.asarray(jac["a"])],
                [dv_du0, dv_dv0, dv_da0],
                [da_du0, da_dv0, da_da0],
            ],
            labels=(("u", "v", "a"), ("u", "v", "a")),
        )

    def assem_dres_dcontrol(self) -> bv.BlockMatrix:
        """(reference: ``transient.py:425-435``)"""
        state1, state0, control, prop = self._oo_args()
        u1 = jnp.asarray(state1["u"])
        jac = jax.jacfwd(
            lambda c: self.res_u(u1, state0, c, prop, self._dt)
        )({"p1": jnp.asarray(control["p1"])})
        n = self.ndof
        Z = np.zeros((n, self.nvert))
        return bv.BlockMatrix(
            [[np.asarray(jac["p1"])], [Z], [Z]],
            labels=(("u", "v", "a"), ("p",)),
        )

    def solve_dres_dstate1(self, dres_dstate1, x, b):
        """One matrix solve on the 'u' block + explicit Newmark rows
        (reference: ``transient.py:470-491``)."""
        A = np.asarray(dres_dstate1["u", "u"])
        bu, bvv, ba = (np.asarray(b[k]) for k in ("u", "v", "a"))
        xu = np.asarray(linalg.dense_solve(jnp.asarray(A), jnp.asarray(bu)))
        xv = bvv - np.asarray(dres_dstate1["v", "u"]) @ xu
        xa = ba - np.asarray(dres_dstate1["a", "u"]) @ xu
        out = x.copy()
        out["u"], out["v"], out["a"] = xu, xv, xa
        return out

    def solve_dres_dstate1_adj(self, dres_dstate1_adj, x, b):
        """Transposed Newmark-structured solve
        (reference: ``transient.py:493-513``)."""
        A = np.asarray(dres_dstate1_adj["u", "u"])
        bu, bvv, ba = (np.asarray(b[k]) for k in ("u", "v", "a"))
        rhs_u = bu - (
            np.asarray(dres_dstate1_adj["v", "u"]).T @ bvv
            + np.asarray(dres_dstate1_adj["a", "u"]).T @ ba
        )
        xu = np.asarray(
            linalg.dense_solve_transpose(jnp.asarray(A), jnp.asarray(rhs_u))
        )
        out = x.copy()
        out["u"], out["v"], out["a"] = xu, bvv, ba
        return out

    def solve_state1(self, state1, options: Optional[dict] = None):
        params = _params_key(options)
        guess = {k: np.asarray(v) for k, v in state1.sub_items()}
        state0 = self._np_state(self.state0)
        control = {"p1": np.asarray(self.control["p"])}
        prop = {k: np.asarray(v) for k, v in self.prop.sub_items()}
        solve = self._jitted("solve_state1", self.solve_state1_pure, (5,))
        out, info = solve(guess, state0, control, prop, self._dt, params)
        result = bv.BlockVector(
            [np.asarray(out[k]) for k in ("u", "v", "a")],
            labels=[("u", "v", "a")],
        )
        info_dict = {
            "num_iter": int(info.num_iter),
            "abs_err": float(info.abs_err),
            "rel_err": float(info.rel_err),
        }
        return result, info_dict


# =============================================================================
# Fluid
# =============================================================================


class FluidModel(BaseTransientModel):
    """
    Quasi-steady fluid wrapping a ``JaxResidual``
    (reference ``JaxModel``, ``transient.py:590-672``).
    """

    def __init__(self, residual: JaxResidual):
        self._residual = residual
        res, (state, control, prop) = residual.res, residual.res_args
        self._res = res

        self.state0 = bv.BlockVector(
            list(state.values()), labels=[tuple(state.keys())]
        )
        self.state1 = self.state0.copy()
        self.control = bv.BlockVector(
            list(control.values()), labels=[tuple(control.keys())]
        )
        self.prop = bv.BlockVector(
            list(prop.values()), labels=[tuple(prop.keys())]
        )
        self._dt = 1.0

        def res_pure(state, control, prop):
            return res(dict(state), dict(control), dict(prop))

        self.res_pure = res_pure

        def solve_pure(control, prop, state_proto):
            """Quasi-steady solve: state1 = state - res(state, g, p), which
            is independent of ``state`` (reference ``transient.py:667-672``)."""
            zero = {k: jnp.zeros_like(v) for k, v in state_proto.items()}
            r = res_pure(zero, control, prop)
            return {k: zero[k] - r[k] for k in zero}

        self.solve_pure = solve_pure

        def step_pure(state1_guess, state0, control, prop, dt,
                      params=None):
            from ..solvers.newton import SolveInfo

            out = solve_pure(control, prop, state0)
            info = SolveInfo(
                num_iter=jnp.array(0),
                abs_err=jnp.array(0.0),
                rel_err=jnp.array(0.0),
            )
            return out, info

        self.step_pure = step_pure
        self.step_pure_fwd = step_pure

    def control_to_dict(self, control):
        return {k: np.asarray(v) for k, v in control.sub_items()}

    def prop_to_dict(self, prop):
        return {k: np.asarray(v) for k, v in prop.sub_items()}

    @property
    def residual(self) -> JaxResidual:
        return self._residual

    @property
    def fluid(self):
        return self

    @property
    def dt(self):
        return self._dt

    @dt.setter
    def dt(self, value):
        self._dt = value

    def set_ini_state(self, state):
        self.state0[:] = state

    def set_fin_state(self, state):
        self.state1[:] = state

    def set_control(self, control):
        self.control[:] = control

    def set_prop(self, prop):
        self.prop[:] = prop

    def assem_res(self) -> bv.BlockVector:
        state = {k: np.asarray(v) for k, v in self.state1.sub_items()}
        control = {k: np.asarray(v) for k, v in self.control.sub_items()}
        prop = {k: np.asarray(v) for k, v in self.prop.sub_items()}
        r = self.res_pure(state, control, prop)
        keys = list(self.state1.keys())
        return bv.BlockVector([np.asarray(r[k]) for k in keys], labels=[keys])

    def solve_state1(self, state1, options=None):
        control = {k: np.asarray(v) for k, v in self.control.sub_items()}
        prop = {k: np.asarray(v) for k, v in self.prop.sub_items()}
        proto = {k: np.asarray(v) for k, v in self.state1.sub_items()}
        out = self.solve_pure(control, prop, proto)
        keys = list(self.state1.keys())
        return (
            bv.BlockVector([np.asarray(out[k]) for k in keys], labels=[keys]),
            {},
        )


# =============================================================================
# Coupled FSI
# =============================================================================


class BaseTransientFSIModel(BaseTransientModel):
    """
    Coupled solid + 1D fluid(s) (reference: ``transient.py:678-818``).

    State ``[u, v, a, q, p]``, control ``(psub, psup)`` (or ``qsub``),
    props = solid props + fluid props + coupling midline ``ymid``.
    """

    def __init__(
        self,
        solid: SolidModel,
        fluid: FluidModel,
        solid_fsi_dofs: np.ndarray,
        fluid_fsi_dofs: np.ndarray,
    ):
        self.solid = solid
        self.fluid = fluid

        self.state0 = bv.concatenate([solid.state0, fluid.state0])
        self.state1 = bv.concatenate([solid.state1, fluid.state1])
        # control = fluid control minus 'area' (the coupled variable)
        fl_keys = list(fluid.control.keys())
        self.control = fluid.control[fl_keys[1:]]
        _self_properties = bv.BlockVector((np.array([1.0]),), labels=[("ymid",)])
        self.prop = bv.concatenate([solid.prop, fluid.prop, _self_properties])

        n_fl_p = fluid.state0["p"].size
        self.fsimap = FSIMap(
            n_fl_p, solid.nvert, fluid_fsi_dofs, solid_fsi_dofs
        )
        self._solid_dofs = np.asarray(solid_fsi_dofs, dtype=np.int32)
        self._fluid_dofs = np.asarray(fluid_fsi_dofs, dtype=np.int32)

        self._solid_prop_keys = list(solid.prop.keys())
        self._fluid_prop_keys = list(fluid.prop.keys())
        self._control_keys = fl_keys[1:]
        self._build_pure_fns()

    def _build_pure_fns(self):
        raise NotImplementedError

    # Shared coupling maps (pure)
    def _pressure_to_solid(self, p_fluid: jnp.ndarray) -> jnp.ndarray:
        out = jnp.zeros((self.solid.nvert,), dtype=p_fluid.dtype)
        return out.at[self._solid_dofs].set(p_fluid[self._fluid_dofs])

    def _area_from_u1(self, u1_flat: jnp.ndarray, prop: dict) -> jnp.ndarray:
        """fluid area = 2*(ymid - y_surface)
        (reference: ``transient.py:836-848``)."""
        nvert, dim = self.solid.nvert, self.solid.dim
        u1 = u1_flat.reshape(nvert, dim)
        prop_fields = self.solid._prop_fields(
            {k: prop[k] for k in self._solid_prop_keys}
        )
        X = self.solid._coords(prop_fields)
        ymid = prop["ymid"][0]
        solid_area = 2.0 * (ymid - (X + u1)[:, 1])
        n_fl = self.fluid.control["area"].size
        area = jnp.zeros((n_fl,), dtype=solid_area.dtype)
        return area.at[self._fluid_dofs].set(solid_area[self._solid_dofs])

    def _split_prop(self, prop: dict):
        sl = {k: prop[k] for k in self._solid_prop_keys}
        fl = {k: prop[k] for k in self._fluid_prop_keys}
        return sl, fl

    # -- OO API ----------------------------------------------------------------
    @property
    def dt(self):
        return self.solid.dt

    @dt.setter
    def dt(self, value):
        self.solid.dt = value
        self.fluid.dt = value

    def set_ini_state(self, state):
        self.state0[:] = state

    def set_fin_state(self, state):
        self.state1[:] = state

    def set_control(self, control):
        self.control[:] = control

    def set_prop(self, prop):
        self.prop[:] = prop
        # propagate to submodels (reference: ``transient.py:804-817``)
        for k in self._solid_prop_keys:
            self.solid.prop[k] = self.prop[k]
        for k in self._fluid_prop_keys:
            self.fluid.prop[k] = self.prop[k]

    def _pytree_args(self):
        state0 = {k: np.asarray(v) for k, v in self.state0.sub_items()}
        control = {k: np.asarray(v) for k, v in self.control.sub_items()}
        prop = {k: np.asarray(v) for k, v in self.prop.sub_items()}
        return state0, control, prop

    def control_to_dict(self, control: bv.BlockVector) -> dict:
        return {k: np.asarray(v) for k, v in control.sub_items()}

    def prop_to_dict(self, prop: bv.BlockVector) -> dict:
        return {k: np.asarray(v) for k, v in prop.sub_items()}

    def _jitted(self, name, fn, static_argnums=()):
        cache = self.__dict__.setdefault("_jit_cache", {})
        if name not in cache:
            cache[name] = jax.jit(fn, static_argnums=static_argnums)
        return cache[name]

    def solve_state1(self, state1, options: Optional[dict] = None):
        params = _params_key(options)
        state0, control, prop = self._pytree_args()
        guess = {k: np.asarray(v) for k, v in state1.sub_items()}
        step = self._jitted("step_pure", self.step_pure, (5,))
        out, info = step(guess, state0, control, prop, self.dt, params)
        keys = list(self.state1.keys())
        result = bv.BlockVector(
            [np.asarray(out[k]) for k in keys], labels=[keys]
        )
        info_dict = {
            "num_iter": int(info.num_iter),
            "abs_err": float(info.abs_err),
            "rel_err": float(info.rel_err),
        }
        return result, info_dict

    def assem_res(self) -> bv.BlockVector:
        state1 = {k: np.asarray(v) for k, v in self.state1.sub_items()}
        state0, control, prop = self._pytree_args()
        res_fn = self._jitted("res_pure", self.res_pure)
        r = res_fn(state1, state0, control, prop, self.dt)
        keys = list(self.state1.keys())
        return bv.BlockVector([np.asarray(r[k]) for k in keys], labels=[keys])


class ExplicitFSIModel(BaseTransientFSIModel):
    """
    Staggered explicit coupling (reference: ``transient.py:821-961``):
    the solid sees the *previous* step's fluid pressure; the fluid sees the
    *current* step's solid geometry.
    """

    def _build_pure_fns(self):
        solid, fluid = self.solid, self.fluid

        def step_pure(state1_guess, state0, control, prop, dt,
                      params=_params_key(None)):
            sl_prop, fl_prop = self._split_prop(prop)
            # Solid control: pressure from the previous fluid state
            p_solid = self._pressure_to_solid(state0["p"])
            sl_state0 = {k: state0[k] for k in ("u", "v", "a")}
            sl_guess = {k: state1_guess[k] for k in ("u", "v", "a")}
            uva1, info = solid.solve_state1_pure(
                sl_guess, sl_state0, {"p1": p_solid}, sl_prop, dt, params
            )
            # Fluid control: area from the *final* solid displacement
            area = self._area_from_u1(uva1["u"], prop)
            fl_control = {"area": area, **{k: control[k] for k in control}}
            proto = {
                "q": state0["q"],
                "p": state0["p"],
            }
            qp1 = fluid.solve_pure(fl_control, fl_prop, proto)
            return {**uva1, **qp1}, info

        self.step_pure = step_pure

        def factorize(state0, control, prop, dt, params=_params_key(None)):
            sl_prop, _ = self._split_prop(prop)
            p_solid = self._pressure_to_solid(state0["p"])
            sl_state0 = {k: state0[k] for k in ("u", "v", "a")}
            return solid.factorize(
                sl_state0, {"p1": p_solid}, sl_prop, dt, params
            )

        self.factorize = factorize

        def refresh_factors(factors, state0, control, prop, dt,
                            params=_params_key(None)):
            sl_prop, _ = self._split_prop(prop)
            p_solid = self._pressure_to_solid(state0["p"])
            sl_state0 = {k: state0[k] for k in ("u", "v", "a")}
            return solid.refresh_factors(
                factors, sl_state0, {"p1": p_solid}, sl_prop, dt, params
            )

        self.refresh_factors = refresh_factors

        def step_pure_stale(state1_guess, factors, state0, control, prop, dt,
                            params=_params_key(None)):
            sl_prop, fl_prop = self._split_prop(prop)
            p_solid = self._pressure_to_solid(state0["p"])
            sl_state0 = {k: state0[k] for k in ("u", "v", "a")}
            sl_guess = {k: state1_guess[k] for k in ("u", "v", "a")}
            uva1, info = solid.solve_state1_stale(
                sl_guess, factors, sl_state0, {"p1": p_solid}, sl_prop, dt,
                params,
            )
            area = self._area_from_u1(uva1["u"], prop)
            fl_control = {"area": area, **{k: control[k] for k in control}}
            qp1 = fluid.solve_pure(
                fl_control, fl_prop, {"q": state0["q"], "p": state0["p"]}
            )
            return {**uva1, **qp1}, info

        self.step_pure_stale = step_pure_stale

        def step_pure_fwd(state1_guess, state0, control, prop, dt,
                          params=_params_key(None)):
            sl_prop, fl_prop = self._split_prop(prop)
            p_solid = self._pressure_to_solid(state0["p"])
            sl_state0 = {k: state0[k] for k in ("u", "v", "a")}
            sl_guess = {k: state1_guess[k] for k in ("u", "v", "a")}
            uva1, info = solid.solve_state1_pure_fwd(
                sl_guess, sl_state0, {"p1": p_solid}, sl_prop, dt, params
            )
            area = self._area_from_u1(uva1["u"], prop)
            fl_control = {"area": area, **{k: control[k] for k in control}}
            qp1 = fluid.solve_pure(
                fl_control, fl_prop, {"q": state0["q"], "p": state0["p"]}
            )
            return {**uva1, **qp1}, info

        self.step_pure_fwd = step_pure_fwd

        def res_pure(state1, state0, control, prop, dt):
            sl_prop, fl_prop = self._split_prop(prop)
            p_solid = self._pressure_to_solid(state0["p"])
            sl_state0 = {k: state0[k] for k in ("u", "v", "a")}
            sl_state1 = {k: state1[k] for k in ("u", "v", "a")}
            res_sl = solid.res_transient(
                sl_state1, sl_state0, {"p1": p_solid}, sl_prop, dt
            )
            area = self._area_from_u1(state1["u"], prop)
            fl_control = {"area": area, **{k: control[k] for k in control}}
            res_fl = fluid.res_pure(
                {"q": state1["q"], "p": state1["p"]}, fl_control, fl_prop
            )
            return {**res_sl, **res_fl}

        self.res_pure = res_pure


class ImplicitFSIModel(BaseTransientFSIModel):
    """
    Implicit coupling by fixed-point (Picard) iteration between the solid
    and fluid (reference: ``transient.py:964-1033``).
    """

    def _build_pure_fns(self):
        solid, fluid = self.solid, self.fluid

        def res_pure(state1, state0, control, prop, dt):
            sl_prop, fl_prop = self._split_prop(prop)
            p_solid = self._pressure_to_solid(state1["p"])
            sl_state0 = {k: state0[k] for k in ("u", "v", "a")}
            sl_state1 = {k: state1[k] for k in ("u", "v", "a")}
            res_sl = solid.res_transient(
                sl_state1, sl_state0, {"p1": p_solid}, sl_prop, dt
            )
            area = self._area_from_u1(state1["u"], prop)
            fl_control = {"area": area, **{k: control[k] for k in control}}
            res_fl = fluid.res_pure(
                {"q": state1["q"], "p": state1["p"]}, fl_control, fl_prop
            )
            return {**res_sl, **res_fl}

        self.res_pure = res_pure

        def step_pure(state1_guess, state0, control, prop, dt,
                      params=_params_key(None)):
            sl_prop, fl_prop = self._split_prop(prop)
            sl_state0 = {k: state0[k] for k in ("u", "v", "a")}
            fp_params = {**FIXEDPOINT_SOLVER_PRM}
            fp_params.update(
                (k, v) for k, v in dict(params).items()
                if k in ("aitken", "aitken_omega0")
            )

            picard_params = tuple(
                sorted({**dict(params), "initial_guess": "given"}.items())
            )

            def picard(x):
                # solid solve with the current iterate's fluid pressure
                p_solid = self._pressure_to_solid(x["p"])
                sl_guess = {k: x[k] for k in ("u", "v", "a")}
                uva1, _ = solid.solve_state1_pure(
                    sl_guess, sl_state0, {"p1": p_solid}, sl_prop, dt,
                    picard_params,
                )
                area = self._area_from_u1(uva1["u"], prop)
                fl_control = {"area": area, **{k: control[k] for k in control}}
                qp1 = fluid.solve_pure(
                    fl_control, fl_prop, {"q": x["q"], "p": x["p"]}
                )
                return {**uva1, **qp1}

            def res_fn(x):
                return res_pure(x, state0, control, prop, dt)

            from ..solvers.newton import iterative_solve

            x, info = iterative_solve(
                dict(state1_guess), res_fn, picard, params=fp_params
            )
            return x, info

        self._step_fwd_only = step_pure

        # ---- Stale-factor variant: the inner solid solves reuse factors
        # frozen at the window start (same IFT-safety argument as the
        # explicit model: factors are a solver internal; the converged
        # Picard point satisfies the residual regardless).
        def factorize(state0, control, prop, dt, params=_params_key(None)):
            sl_prop, _ = self._split_prop(prop)
            p_solid = self._pressure_to_solid(state0["p"])
            sl_state0 = {k: state0[k] for k in ("u", "v", "a")}
            return solid.factorize(
                sl_state0, {"p1": p_solid}, sl_prop, dt, params
            )

        self.factorize = factorize

        def refresh_factors(factors, state0, control, prop, dt,
                            params=_params_key(None)):
            sl_prop, _ = self._split_prop(prop)
            p_solid = self._pressure_to_solid(state0["p"])
            sl_state0 = {k: state0[k] for k in ("u", "v", "a")}
            return solid.refresh_factors(
                factors, sl_state0, {"p1": p_solid}, sl_prop, dt, params
            )

        self.refresh_factors = refresh_factors

        def _step_stale_fwd_only(state1_guess, factors, state0, control,
                                 prop, dt, params):
            sl_prop, fl_prop = self._split_prop(prop)
            sl_state0 = {k: state0[k] for k in ("u", "v", "a")}
            fp_params = {**FIXEDPOINT_SOLVER_PRM}
            fp_params.update(
                (k, v) for k, v in dict(params).items()
                if k in ("aitken", "aitken_omega0")
            )
            picard_params = tuple(
                sorted({**dict(params), "initial_guess": "given"}.items())
            )

            def picard(x):
                p_solid = self._pressure_to_solid(x["p"])
                sl_guess = {k: x[k] for k in ("u", "v", "a")}
                uva1, _ = solid.solve_state1_stale(
                    sl_guess, factors, sl_state0, {"p1": p_solid},
                    sl_prop, dt, picard_params,
                )
                area = self._area_from_u1(uva1["u"], prop)
                fl_control = {
                    "area": area, **{k: control[k] for k in control}
                }
                qp1 = fluid.solve_pure(
                    fl_control, fl_prop, {"q": x["q"], "p": x["p"]}
                )
                return {**uva1, **qp1}

            def res_fn(x):
                return res_pure(x, state0, control, prop, dt)

            from ..solvers.newton import iterative_solve

            return iterative_solve(
                dict(state1_guess), res_fn, picard, params=fp_params
            )

        # Coupled implicit-function-theorem derivative rules: the Picard
        # while_loop is not differentiable, so both AD modes solve the
        # coupled Jacobian system at the converged state — the jax-native
        # form of the reference's coupled (u, p) LU adjoint
        # (reference: ``transient.py:1035-1145``).
        from jax.flatten_util import ravel_pytree

        def _coupled_jac(x, state0, control, prop, dt):
            x_flat, unravel = ravel_pytree(x)

            def r_flat(xf):
                return ravel_pytree(
                    res_pure(unravel(xf), state0, control, prop, dt)
                )[0]

            J = jax.jacfwd(r_flat)(x_flat)
            return J, x_flat, unravel

        @partial(jax.custom_vjp, nondiff_argnums=(5,))
        def step_ift(state1_guess, state0, control, prop, dt, params):
            return step_pure(state1_guess, state0, control, prop, dt, params)

        def step_ift_fwd(state1_guess, state0, control, prop, dt, params):
            x, info = step_pure(state1_guess, state0, control, prop, dt, params)
            return (x, info), (x, state0, control, prop, dt)

        def step_ift_bwd(params, saved, cotangents):
            x, state0, control, prop, dt = saved
            xbar, _ = cotangents
            J, x_flat, unravel = _coupled_jac(x, state0, control, prop, dt)
            xbar_flat = ravel_pytree(xbar)[0]
            lam_flat = linalg.dense_solve_transpose(J, xbar_flat)
            lam = unravel(lam_flat)

            def r_theta(s0, c, p, t):
                return res_pure(x, s0, c, p, t)

            _, vjp = jax.vjp(r_theta, state0, control, prop, dt)
            g_s0, g_c, g_p, g_t = vjp(
                jax.tree_util.tree_map(lambda a: -a, lam)
            )
            g_guess = jax.tree_util.tree_map(jnp.zeros_like, x)
            return (g_guess, g_s0, g_c, g_p, g_t)

        step_ift.defvjp(step_ift_fwd, step_ift_bwd)
        self.step_pure = step_ift

        @partial(jax.custom_vjp, nondiff_argnums=(6,))
        def step_stale_ift(state1_guess, factors, state0, control, prop,
                           dt, params):
            return _step_stale_fwd_only(
                state1_guess, factors, state0, control, prop, dt, params
            )

        def step_stale_fwd(state1_guess, factors, state0, control, prop,
                           dt, params):
            x, info = _step_stale_fwd_only(
                state1_guess, factors, state0, control, prop, dt, params
            )
            return (x, info), (x, factors, state0, control, prop, dt)

        def step_stale_bwd(params, saved, cotangents):
            x, factors, state0, control, prop, dt = saved
            xbar, _ = cotangents
            J, x_flat, unravel = _coupled_jac(x, state0, control, prop, dt)
            xbar_flat = ravel_pytree(xbar)[0]
            lam_flat = linalg.dense_solve_transpose(J, xbar_flat)
            lam = unravel(lam_flat)

            def r_theta(s0, c, p, t):
                return res_pure(x, s0, c, p, t)

            _, vjp = jax.vjp(r_theta, state0, control, prop, dt)
            g_s0, g_c, g_p, g_t = vjp(
                jax.tree_util.tree_map(lambda a: -a, lam)
            )
            g_guess = jax.tree_util.tree_map(jnp.zeros_like, x)
            g_factors = jax.tree_util.tree_map(jnp.zeros_like, factors)
            return (g_guess, g_factors, g_s0, g_c, g_p, g_t)

        step_stale_ift.defvjp(step_stale_fwd, step_stale_bwd)

        def step_pure_stale(state1_guess, factors, state0, control, prop,
                            dt, params=_params_key(None)):
            return step_stale_ift(
                state1_guess, factors, state0, control, prop, dt, params
            )

        self.step_pure_stale = step_pure_stale

        @partial(jax.custom_jvp, nondiff_argnums=(5,))
        def step_ift_f(state1_guess, state0, control, prop, dt, params):
            x, _ = step_pure(state1_guess, state0, control, prop, dt, params)
            return x

        @step_ift_f.defjvp
        def step_ift_jvp(params, primals, tangents):
            state1_guess, state0, control, prop, dt = primals
            _, ds0, dc, dp, ddt = tangents
            x = step_ift_f(state1_guess, state0, control, prop, dt, params)
            J, x_flat, unravel = _coupled_jac(x, state0, control, prop, dt)
            _, rdot = jax.jvp(
                lambda s0, c, p, t: res_pure(x, s0, c, p, t),
                (state0, control, prop, dt),
                (ds0, dc, dp, ddt),
            )
            rdot_flat = ravel_pytree(rdot)[0]
            dx_flat = -linalg.dense_solve(J, rdot_flat)
            return x, unravel(dx_flat)

        def step_pure_fwd(state1_guess, state0, control, prop, dt,
                          params=_params_key(None)):
            from ..solvers.newton import SolveInfo

            x = step_ift_f(state1_guess, state0, control, prop, dt, params)
            info = SolveInfo(
                num_iter=jnp.array(0),
                abs_err=jnp.array(0.0),
                rel_err=jnp.array(0.0),
            )
            return x, info

        self.step_pure_fwd = step_pure_fwd
