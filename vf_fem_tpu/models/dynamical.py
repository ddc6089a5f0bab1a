"""
Dynamical (first-order) models for linearization and Hopf analysis.

These represent the system in first-order form ``F(x, xt; g, p)`` with
``x = (u, v)`` for the solid (``(q, p)`` for the fluid), exactly as the
reference (reference: ``src/femvf/models/dynamical.py:1-56``):

- solid: ``Fu(x, xt, g, p)`` is the 'u' form with ``u1=u, v1=v, a1=vt``;
  ``Fv = v - ut``
- fluid: quasi-steady residual, no ``xt`` dependence

Where the reference assembles each Jacobian block from UFL derivatives and
PETSc mats (882 LoC), every block here is ``jax.jacfwd``/``jax.jvp`` of the
same pure residual functions, assembled dense at the element level
(``FemResidual.assemble_jac_dense``).  Dense blocks are the right call:
these Jacobians feed eigen/Hopf analyses on M5-scale meshes, not the hot
time loop.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from .. import blocks as bv
from ..residuals.base import FemResidual, JaxResidual
from .fsi import FSIMap, make_dslarea_dslu
from .transient import properties_vec_from_residual


class BaseDynamicalModel:
    """(reference: ``dynamical.py:82-107``)"""

    def set_state(self, state):
        raise NotImplementedError()

    def set_statet(self, statet):
        raise NotImplementedError()

    def set_control(self, control):
        raise NotImplementedError()

    def set_prop(self, prop):
        raise NotImplementedError()

    def assem_res(self):
        raise NotImplementedError()

    def assem_dres_dstate(self):
        raise NotImplementedError()

    def assem_dres_dstatet(self):
        raise NotImplementedError()

    def assem_dres_dcontrol(self):
        raise NotImplementedError()

    def assem_dres_dprop(self):
        raise NotImplementedError()


class BaseLinearizedDynamicalModel(BaseDynamicalModel):
    def set_dstate(self, dstate):
        raise NotImplementedError()

    def set_dstatet(self, dstatet):
        raise NotImplementedError()

    def set_dcontrol(self, dcontrol):
        raise NotImplementedError()


# =============================================================================
# Solid
# =============================================================================


class _BaseSolidDynamical:
    def __init__(self, residual: FemResidual):
        self._residual = residual
        mesh = residual.mesh()
        self.nvert, self.dim = mesh.num_vertices, mesh.dim
        self.ndof = self.nvert * self.dim

        z = lambda: np.zeros(self.ndof)
        self.state = bv.BlockVector([z(), z()], labels=[("u", "v")])
        self.statet = bv.BlockVector([z(), z()], labels=[("u", "v")])
        self.control = bv.BlockVector(
            [np.zeros(self.nvert)], labels=[("p",)]
        )
        self.prop = properties_vec_from_residual(residual)

        self._prop_keys = list(self.prop.keys())
        spec = residual.coefficient_spec
        self._has_contact = "control/tcontact" in spec

    @property
    def residual(self) -> FemResidual:
        return self._residual

    @property
    def XREF(self) -> np.ndarray:
        return np.asarray(self._residual.ref_mesh_coords).reshape(-1)

    def set_state(self, state):
        self.state[:] = state

    def set_statet(self, statet):
        self.statet[:] = statet

    def set_control(self, control):
        self.control[:] = control

    def set_prop(self, prop):
        self.prop[:] = prop

    # -- field plumbing -------------------------------------------------------
    def _prop_fields(self) -> dict:
        spec = self._residual.coefficient_spec
        out = {}
        for key, sp in spec.items():
            group, name = key.split("/", 1)
            if group != "prop":
                continue
            arr = jnp.asarray(self.prop[name])
            if sp.space == "cg1_vector":
                arr = arr.reshape(self.nvert, self.dim)
            out[key] = arr
        return out

    def _fields(self) -> dict:
        """All coefficient fields at the current (state, statet, control)."""
        R = self._residual
        fields = self._prop_fields()
        u = jnp.asarray(self.state["u"]).reshape(self.nvert, self.dim)
        v = jnp.asarray(self.state["v"]).reshape(self.nvert, self.dim)
        vt = jnp.asarray(self.statet["v"]).reshape(self.nvert, self.dim)
        fields["state/u1"] = u
        fields["state/v1"] = v
        fields["state/a1"] = vt
        if "control/p1" in R.coefficient_spec:
            fields["control/p1"] = jnp.asarray(self.control["p"])
        if self._has_contact:
            X = jnp.asarray(R.ref_mesh_coords)
            if "prop/umesh" in fields:
                X = X + fields["prop/umesh"]
            n = fields["prop/ncontact"]
            y = fields["prop/ycontact"][0]
            k = fields["prop/kcontact"][0]
            gap = (X + u) @ n - y
            fields["control/tcontact"] = (
                -(k * jnp.maximum(gap, 0.0) ** 3)[:, None] * n
            )
        return fields

    def _tangent_fields(self, dstate, dstatet, dcontrol) -> dict:
        """Tangent coefficient fields for the linearized residual.

        Note the contact traction's u-dependence is chained: the tangent of
        ``control/tcontact`` is ``d(tcontact)/du . du``.
        """
        R = self._residual
        fields = self._fields()
        zeros = {
            key: jnp.zeros_like(val)
            for key, val in fields.items()
        }
        du = jnp.asarray(dstate["u"]).reshape(self.nvert, self.dim)
        dv = jnp.asarray(dstate["v"]).reshape(self.nvert, self.dim)
        dvt = jnp.asarray(dstatet["v"]).reshape(self.nvert, self.dim)
        zeros["state/u1"] = du
        zeros["state/v1"] = dv
        zeros["state/a1"] = dvt
        if "control/p1" in R.coefficient_spec:
            zeros["control/p1"] = jnp.asarray(dcontrol["p"])
        if self._has_contact:
            u = fields["state/u1"]

            def tc(u_):
                X = jnp.asarray(R.ref_mesh_coords)
                pf = self._prop_fields()
                if "prop/umesh" in pf:
                    X = X + pf["prop/umesh"]
                n = pf["prop/ncontact"]
                y = pf["prop/ycontact"][0]
                k = pf["prop/kcontact"][0]
                gap = (X + u_) @ n - y
                return -(k * jnp.maximum(gap, 0.0) ** 3)[:, None] * n

            _, dtc = jax.jvp(tc, (u,), (du,))
            zeros["control/tcontact"] = dtc
        return zeros

    # -- residual and Jacobian helpers ---------------------------------------
    def _resu(self) -> np.ndarray:
        return np.asarray(
            self._residual.assemble_res(self._fields()).reshape(-1)
        )

    def _jac(self, wrt_key: str, tangent=None) -> np.ndarray:
        return np.asarray(
            self._residual.assemble_jac_dense(
                self._fields(), wrt_key, tangent_fields=tangent
            )
        )

    def _jac_u_with_contact(self, tangent=None) -> np.ndarray:
        """dFu/du including the contact-traction chain rule
        (the reference patches this in manually via ``diagonalScale``,
        reference ``transient.py:554-583``)."""
        A = self._jac("state/u1", tangent)
        if self._has_contact:
            R = self._residual
            fields = self._fields()
            dF_dtc = np.asarray(
                R.assemble_jac_dense(fields, "control/tcontact",
                                     tangent_fields=tangent)
            )
            u = fields["state/u1"]

            def tc(u_):
                X = jnp.asarray(R.ref_mesh_coords)
                pf = {
                    k: v for k, v in fields.items() if k.startswith("prop/")
                }
                if "prop/umesh" in pf:
                    X = X + pf["prop/umesh"]
                n = pf["prop/ncontact"]
                y = pf["prop/ycontact"][0]
                k = pf["prop/kcontact"][0]
                gap = (X + u_) @ n - y
                return (-(k * jnp.maximum(gap, 0.0) ** 3)[:, None] * n).reshape(-1)

            dtc_du = np.asarray(jax.jacfwd(tc)(u)).reshape(self.ndof, self.ndof)
            A = A + dF_dtc @ dtc_du
        return A


    # -- banded (large-mesh) state Jacobians -------------------------------
    def _bsb_plan(self):
        """Lazy block-banded plan shared by the Hopf pencil blocks
        (same structure as the transient solver's plan)."""
        if getattr(self, "_bsb_plan_cache", None) is None:
            from ..fem import assembly
            from ..solvers import bsb as bsb_mod

            R = self._residual
            topo = R.topology
            cells = np.asarray(topo.cells)
            fcells = np.asarray(topo.facet_cells)
            dofs = [assembly.cell_dof_array(cells, self.dim)]
            if fcells.size:
                dofs.append(
                    assembly.cell_dof_array(cells[fcells], self.dim)
                )
            self._bsb_plan_cache = bsb_mod.plan_bsb(
                dofs, self.ndof, np.asarray(R.bc_dofs)
            )
        return self._bsb_plan_cache

    def assem_banded_state_blocks(self):
        """Banded (BSB) first-order Jacobian blocks at the current state:
        ``(plan, K, D, M)`` with ``K = dFu/du`` (incl. the contact-traction
        chain; Dirichlet identity rows), ``D = dFu/dv``, ``M = dFu/dvt``
        (Dirichlet rows zero).  The large-mesh replacement for the dense
        ``assem_dres_dstate``/``dstatet`` blocks — what the reference's
        sparse PETSc dynamical Jacobians exist for (reference
        ``src/femvf/models/dynamical.py:239-298``); consumed by the
        shift-invert Hopf solver (``misc.hopf``)."""
        from ..solvers import bsb as bsb_mod

        R = self._residual
        topo = R.topology
        cells = np.asarray(topo.cells)
        fcells = np.asarray(topo.facet_cells)
        dim = self.dim
        plan = self._bsb_plan()

        fields = self._fields()
        X = jnp.asarray(R.ref_mesh_coords)
        if "prop/umesh" in fields:
            X = X + fields["prop/umesh"]
        u = fields["state/u1"]
        v = fields["state/v1"]
        vt = fields["state/a1"]
        has_contact = self._has_contact
        cell_elem = R.cell_elem_fn()
        facet_elem = R.facet_elem_fn()
        local_c, axes_c = R.gather_cell_locals(fields)

        def cell_fn(u_e, v_e, vt_e, Xe, local):
            loc = dict(local)
            loc["state/u1"] = u_e
            loc["state/v1"] = v_e
            loc["state/a1"] = vt_e
            return cell_elem(Xe, loc)

        nv = cells.shape[1]
        nld = nv * dim

        def cell_jac(arg):
            f = jax.vmap(
                jax.jacfwd(cell_fn, argnums=arg),
                in_axes=(0, 0, 0, 0, axes_c),
            )
            return f(
                u[cells], v[cells], vt[cells], X[cells], local_c
            ).reshape(-1, nld, nld)

        Jc = [cell_jac(a) for a in (0, 1, 2)]

        Jf = [None, None, None]
        if fcells.size:
            cell_verts = cells[fcells]
            local_f, axes_f = R.gather_facet_locals(fields)

            def facet_fn(u_e, v_e, vt_e, Xe, sel, opp_sel, local):
                loc = dict(local)
                loc["state/u1"] = u_e
                loc["state/v1"] = v_e
                loc["state/a1"] = vt_e
                if has_contact:
                    n = loc["prop/ncontact"]
                    y = loc["prop/ycontact"]
                    y = y[0] if jnp.ndim(y) > 0 else y
                    k = loc["prop/kcontact"]
                    k = k[0] if jnp.ndim(k) > 0 else k
                    gap = (Xe + u_e) @ n - y
                    loc["control/tcontact"] = (
                        -(k * jnp.maximum(gap, 0.0) ** 3)[:, None] * n
                    )
                return facet_elem(Xe, sel, opp_sel, loc)

            def facet_jac(arg):
                f = jax.vmap(
                    jax.jacfwd(facet_fn, argnums=arg),
                    in_axes=(0, 0, 0, 0, 0, 0, axes_f),
                )
                return f(
                    u[cell_verts], v[cell_verts], vt[cell_verts],
                    X[cell_verts], jnp.asarray(topo.facet_sel),
                    jnp.asarray(topo.facet_opp_sel), local_f,
                ).reshape(-1, nld, nld)

            Jf = [facet_jac(a) for a in (0, 1, 2)]

        K = bsb_mod.bsb_fill(plan, [Jc[0], Jf[0]])
        D = bsb_mod.bsb_fill(plan, [Jc[1], Jf[1]], identity=False)
        M = bsb_mod.bsb_fill(plan, [Jc[2], Jf[2]], identity=False)
        return plan, K, D, M

    def assem_dresu_dp1_cols(self, col_verts):
        """Dense ``(ndof, len(col_verts))`` block of ``dFu/d(control p1)``
        restricted to the given surface vertices — the only columns the
        FSI coupling needs.  Assembled at the facet-element level (the
        full ``ndof x nvert`` dense block is unbuildable at large mesh)."""
        R = self._residual
        topo = R.topology
        cells = np.asarray(topo.cells)
        fcells = np.asarray(topo.facet_cells)
        dim = self.dim
        if not fcells.size or "control/p1" not in R.coefficient_spec:
            return np.zeros((self.ndof, len(col_verts)))

        fields = self._fields()
        X = jnp.asarray(R.ref_mesh_coords)
        if "prop/umesh" in fields:
            X = X + fields["prop/umesh"]
        u = fields["state/u1"]
        facet_elem = R.facet_elem_fn()
        local_f, axes_f = R.gather_facet_locals(fields)
        cell_verts = cells[fcells]

        def facet_fn_p(p_e, u_e, Xe, sel, opp_sel, local):
            loc = dict(local)
            loc["state/u1"] = u_e
            loc["control/p1"] = p_e
            return facet_elem(Xe, sel, opp_sel, loc)

        p_f = jnp.asarray(fields["control/p1"])[cell_verts]
        Jp = np.asarray(
            jax.vmap(
                jax.jacfwd(facet_fn_p), in_axes=(0, 0, 0, 0, 0, axes_f)
            )(
                p_f, u[cell_verts], X[cell_verts],
                jnp.asarray(topo.facet_sel),
                jnp.asarray(topo.facet_opp_sel), local_f,
            )
        )  # (nf, nv, dim, nv)

        ncols = len(col_verts)
        colmap = np.full(self.nvert, ncols, dtype=np.int64)
        colmap[np.asarray(col_verts)] = np.arange(ncols)
        nf, nv = cell_verts.shape
        rows = (
            cell_verts[:, :, None, None] * dim
            + np.arange(dim)[None, None, :, None]
        )  # (nf, nv, dim, 1)
        rows = np.broadcast_to(rows, Jp.shape)
        cols = np.broadcast_to(
            colmap[cell_verts][:, None, None, :], Jp.shape
        )
        C = np.zeros((self.ndof, ncols + 1))
        np.add.at(C, (rows.reshape(-1), cols.reshape(-1)), Jp.reshape(-1))
        C = C[:, :ncols]
        C[np.asarray(R.bc_dofs)] = 0.0  # Dirichlet rows
        return C


class SolidDynamicalModel(_BaseSolidDynamical, BaseDynamicalModel):
    """Nonlinear solid dynamical system
    (reference ``dynamical.FenicsModel``, ``dynamical.py:239-298``)."""

    def __init__(self, residual):
        # Predefined residual classes take a mesh; accept either a built
        # FemResidual or construct via load_solid_model
        super().__init__(residual)

    def assem_res(self) -> bv.BlockVector:
        resu = self._resu()
        resv = np.asarray(self.state["v"]) - np.asarray(self.statet["u"])
        return bv.BlockVector([resu, resv], labels=[("u", "v")])

    def assem_dres_dstate(self) -> bv.BlockMatrix:
        dresu_du = self._jac_u_with_contact()
        dresu_dv = self._jac("state/v1")
        n = self.ndof
        return bv.BlockMatrix(
            [
                [dresu_du, dresu_dv],
                [np.zeros((n, n)), np.eye(n)],
            ],
            labels=(("u", "v"), ("u", "v")),
        )

    def assem_dres_dstatet(self) -> bv.BlockMatrix:
        dresu_dvt = self._jac("state/a1")
        n = self.ndof
        return bv.BlockMatrix(
            [
                [np.zeros((n, n)), dresu_dvt],
                [-np.eye(n), np.zeros((n, n))],
            ],
            labels=(("u", "v"), ("u", "v")),
        )

    def assem_dres_dcontrol(self) -> bv.BlockMatrix:
        dresu_dp = self._jac("control/p1")
        return bv.BlockMatrix(
            [[dresu_dp], [np.zeros((self.ndof, self.nvert))]],
            labels=(("u", "v"), ("p",)),
        )

    def assem_dres_dprop(self) -> bv.BlockMatrix:
        mats_u, mats_v = [], []
        for name in self._prop_keys:
            key = "prop/" + name
            ncols = np.asarray(self.prop[name]).size
            J = np.asarray(self._jac(key)).reshape(self.ndof, ncols)
            mats_u.append(J)
            mats_v.append(np.zeros((self.ndof, ncols)))
        return bv.BlockMatrix(
            [mats_u, mats_v], labels=(("u", "v"), tuple(self._prop_keys))
        )


class LinearizedSolidDynamicalModel(_BaseSolidDynamical,
                                    BaseLinearizedDynamicalModel):
    """Action-of-Jacobian residual model
    (reference ``dynamical.LinearizedFenicsModel``, ``dynamical.py:301-399``,
    built symbolically by ``modify_unary_linearized_forms``,
    reference ``form.py:1116-1168``)."""

    def __init__(self, residual):
        super().__init__(residual)
        z = lambda: np.zeros(self.ndof)
        self.dstate = bv.BlockVector([z(), z()], labels=[("u", "v")])
        self.dstatet = bv.BlockVector([z(), z()], labels=[("u", "v")])
        self.dcontrol = bv.BlockVector(
            [np.zeros(self.nvert)], labels=[("p",)]
        )

    def set_dstate(self, dstate):
        self.dstate[:] = dstate

    def set_dstatet(self, dstatet):
        self.dstatet[:] = dstatet

    def set_dcontrol(self, dcontrol):
        self.dcontrol[:] = dcontrol

    def _tangent(self):
        return self._tangent_fields(self.dstate, self.dstatet, self.dcontrol)

    def assem_res(self) -> bv.BlockVector:
        """dFu/dx . dx + dFu/dxt . dxt + dFu/dg . dg; resv = dv - dut."""
        R = self._residual
        fields = self._fields()
        tangent = self._tangent()
        _, dres = jax.jvp(
            lambda f: R.assemble_res(f).reshape(-1), (fields,), (tangent,)
        )
        resv = np.asarray(self.dstate["v"]) - np.asarray(self.dstatet["u"])
        return bv.BlockVector([np.asarray(dres), resv], labels=[("u", "v")])

    def assem_dres_dstate(self) -> bv.BlockMatrix:
        t = self._tangent()
        dresu_du = self._jac_u_with_contact(tangent=t)
        dresu_dv = self._jac("state/v1", tangent=t)
        n = self.ndof
        zeros = np.zeros((n, n))
        return bv.BlockMatrix(
            [[dresu_du, dresu_dv], [zeros, zeros]],
            labels=(("u", "v"), ("u", "v")),
        )

    def assem_dres_dstatet(self) -> bv.BlockMatrix:
        t = self._tangent()
        dresu_dvt = self._jac("state/a1", tangent=t)
        n = self.ndof
        zeros = np.zeros((n, n))
        return bv.BlockMatrix(
            [[zeros, dresu_dvt], [zeros, zeros]],
            labels=(("u", "v"), ("u", "v")),
        )

    def assem_dres_dcontrol(self) -> bv.BlockMatrix:
        t = self._tangent()
        dresu_dp = self._jac("control/p1", tangent=t)
        return bv.BlockMatrix(
            [[dresu_dp], [np.zeros((self.ndof, self.nvert))]],
            labels=(("u", "v"), ("p",)),
        )

    def assem_dres_dprop(self) -> bv.BlockMatrix:
        t = self._tangent()
        mats_u, mats_v = [], []
        for name in self._prop_keys:
            key = "prop/" + name
            ncols = np.asarray(self.prop[name]).size
            J = np.asarray(self._jac(key, tangent=t)).reshape(self.ndof, ncols)
            mats_u.append(J)
            mats_v.append(np.zeros((self.ndof, ncols)))
        return bv.BlockMatrix(
            [mats_u, mats_v], labels=(("u", "v"), tuple(self._prop_keys))
        )


# =============================================================================
# Fluid
# =============================================================================


class _BaseFluidDynamical:
    """(reference ``BaseDynamicalJaxModel``, ``dynamical.py:425-494``)"""

    def __init__(self, residual: JaxResidual):
        self._residual = residual
        (state, control, prop) = residual.res_args
        self.state = bv.BlockVector(
            list(state.values()), labels=[tuple(state.keys())]
        )
        self.statet = self.state.copy()
        self.control = bv.BlockVector(
            list(control.values()), labels=[tuple(control.keys())]
        )
        self.prop = bv.BlockVector(
            list(prop.values()), labels=[tuple(prop.keys())]
        )

    @property
    def residual(self):
        return self._residual

    def set_state(self, state):
        self.state[:] = state

    def set_statet(self, statet):
        self.statet[:] = statet

    def set_control(self, control):
        self.control[:] = control

    def set_prop(self, prop):
        self.prop[:] = prop

    def _args(self):
        return (
            {k: jnp.asarray(v) for k, v in self.state.sub_items()},
            {k: jnp.asarray(v) for k, v in self.control.sub_items()},
            {k: jnp.asarray(v) for k, v in self.prop.sub_items()},
        )

    def _res_fn(self, state, control, prop):
        raise NotImplementedError

    def _block_mat(self, nested: dict, row_keys, col_keys) -> bv.BlockMatrix:
        grid = [
            [np.asarray(nested[rk][ck]) for ck in col_keys]
            for rk in row_keys
        ]
        return bv.BlockMatrix(grid, labels=(tuple(row_keys), tuple(col_keys)))

    def assem_res(self) -> bv.BlockVector:
        r = self._res_fn(*self._args())
        keys = list(self.state.keys())
        return bv.BlockVector([np.asarray(r[k]) for k in keys], labels=[keys])

    def assem_dres_dstate(self) -> bv.BlockMatrix:
        nested = jax.jacfwd(self._res_fn, argnums=0)(*self._args())
        keys = list(self.state.keys())
        return self._block_mat(nested, keys, keys)

    def assem_dres_dstatet(self) -> bv.BlockMatrix:
        keys = list(self.state.keys())
        sizes = {k: np.asarray(self.state[k]).size for k in keys}
        grid = [
            [np.zeros((sizes[rk], sizes[ck])) for ck in keys] for rk in keys
        ]
        return bv.BlockMatrix(grid, labels=(tuple(keys), tuple(keys)))

    def assem_dres_dcontrol(self) -> bv.BlockMatrix:
        nested = jax.jacfwd(self._res_fn, argnums=1)(*self._args())
        return self._block_mat(
            nested, list(self.state.keys()), list(self.control.keys())
        )

    def assem_dres_dprop(self) -> bv.BlockMatrix:
        nested = jax.jacfwd(self._res_fn, argnums=2)(*self._args())
        return self._block_mat(
            nested, list(self.state.keys()), list(self.prop.keys())
        )


class FluidDynamicalModel(_BaseFluidDynamical, BaseDynamicalModel):
    """(reference ``dynamical.JaxModel``, ``dynamical.py:499-513``)"""

    def _res_fn(self, state, control, prop):
        return self._residual.res(dict(state), dict(control), dict(prop))


class LinearizedFluidDynamicalModel(_BaseFluidDynamical,
                                    BaseLinearizedDynamicalModel):
    """(reference ``dynamical.LinearizedJaxModel``, ``dynamical.py:516-561``)"""

    def __init__(self, residual: JaxResidual):
        super().__init__(residual)
        self.dstate = self.state.copy()
        self.dstatet = self.statet.copy()
        self.dcontrol = self.control.copy()
        self.dprop = self.prop.copy()
        for b in (self.dstate, self.dstatet, self.dcontrol, self.dprop):
            b[:] = 0.0

    def set_dstate(self, dstate):
        self.dstate[:] = dstate

    def set_dstatet(self, dstatet):
        self.dstatet[:] = dstatet

    def set_dcontrol(self, dcontrol):
        self.dcontrol[:] = dcontrol

    def set_dprop(self, dprop):
        self.dprop[:] = dprop

    def _res_fn(self, state, control, prop):
        tangents = (
            {k: jnp.asarray(v) for k, v in self.dstate.sub_items()},
            {k: jnp.asarray(v) for k, v in self.dcontrol.sub_items()},
            {k: jnp.asarray(v) for k, v in self.dprop.sub_items()},
        )
        res = self._residual.res
        return jax.jvp(
            lambda s, c, p: res(dict(s), dict(c), dict(p)),
            (state, control, prop),
            tangents,
        )[1]


# =============================================================================
# Coupled FSI
# =============================================================================


class FSIDynamicalModel(BaseDynamicalModel):
    """Coupled dynamical system
    (reference ``dynamical.FSIModel``, ``dynamical.py:571-804``)."""

    def __init__(self, solid, fluid, solid_fsi_dofs, fluid_fsi_dofs):
        self.solid = solid
        self.fluid = fluid
        self._models = (solid, fluid)

        self.state = bv.concatenate([solid.state, fluid.state])
        self.statet = bv.concatenate([solid.statet, fluid.statet])
        fl_keys = list(fluid.control.keys())
        self.control = fluid.control[fl_keys[1:]]
        _ymid = bv.BlockVector([np.array([1.0])], labels=[("ymid",)])
        self.prop = bv.concatenate([solid.prop, fluid.prop, _ymid])

        n_fl_p = fluid.state["p"].size
        self.fsimap = FSIMap(
            n_fl_p, solid.nvert, fluid_fsi_dofs, solid_fsi_dofs
        )
        ndim = solid.dim
        self._dslarea_dslu = make_dslarea_dslu(
            solid.nvert, solid.ndof, ndim
        )

    def _transfer_solid_to_fluid(self):
        solid, fluid = self.solid, self.fluid
        X = np.asarray(solid.residual.ref_mesh_coords)
        if "umesh" in solid.prop:
            X = X + np.asarray(solid.prop["umesh"]).reshape(X.shape)
        u = np.asarray(solid.state["u"]).reshape(X.shape)
        solid_area = 2.0 * (self.prop["ymid"][0] - (X + u)[:, 1])
        fl_control = fluid.control.copy()
        self.fsimap.map_solid_to_fluid(solid_area, fl_control["area"])
        fluid.set_control(fl_control)

    def _transfer_fluid_to_solid(self):
        sl_control = self.solid.control.copy()
        self.fsimap.map_fluid_to_solid(
            np.asarray(self.fluid.state["p"]), sl_control["p"]
        )
        self.solid.set_control(sl_control)

    def set_state(self, state):
        self.state[:] = state
        self.solid.set_state(state[["u", "v"]])
        self.fluid.set_state(state[["q", "p"]])
        self._transfer_solid_to_fluid()
        self._transfer_fluid_to_solid()

    def set_statet(self, statet):
        self.statet[:] = statet
        self.solid.set_statet(statet[["u", "v"]])
        self.fluid.set_statet(statet[["q", "p"]])

    def set_control(self, control):
        self.control[:] = control
        fl_control = self.fluid.control.copy()
        for k in control.keys():
            fl_control[k] = control[k]
        self.fluid.set_control(fl_control)

    def set_prop(self, prop):
        self.prop[:] = prop
        for k in self.solid.prop.keys():
            self.solid.prop[k] = self.prop[k]
        for k in self.fluid.prop.keys():
            self.fluid.prop[k] = self.prop[k]
        self._transfer_solid_to_fluid()

    def assem_res(self) -> bv.BlockVector:
        return bv.concatenate(
            [self.solid.assem_res(), self.fluid.assem_res()]
        )

    def _coupling_mats(self):
        """dflcontrol/dslstate (area wrt u) and dslcontrol/dflstate (p perm)."""
        dflarea_dslu = self.fsimap.dfluid_dsolid() @ self._dslarea_dslu
        dslp_dflp = self.fsimap.dsolid_dfluid()
        return dflarea_dslu, dslp_dflp

    def assem_dres_dstate(self) -> bv.BlockMatrix:
        solid, fluid = self.solid, self.fluid
        dflarea_dslu, dslp_dflp = self._coupling_mats()

        dsl_dsl = solid.assem_dres_dstate()
        dsl_dctrl = solid.assem_dres_dcontrol()
        nq = fluid.state["q"].size
        # solid residual wrt fluid state: through p only
        dslu_dq = np.zeros((solid.ndof, nq))
        dslu_dp = dsl_dctrl["u", "p"] @ dslp_dflp
        dslv_dq = np.zeros((solid.ndof, nq))
        dslv_dp = np.zeros((solid.ndof, fluid.state["p"].size))

        dfl_dfl = fluid.assem_dres_dstate()
        dfl_dctrl = fluid.assem_dres_dcontrol()
        # fluid residual wrt solid state: through area(u) only
        dflq_du = dfl_dctrl["q", "area"] @ dflarea_dslu
        dflp_du = dfl_dctrl["p", "area"] @ dflarea_dslu
        dflq_dv = np.zeros((nq, solid.ndof))
        dflp_dv = np.zeros((fluid.state["p"].size, solid.ndof))

        grid = [
            [dsl_dsl["u", "u"], dsl_dsl["u", "v"], dslu_dq, dslu_dp],
            [dsl_dsl["v", "u"], dsl_dsl["v", "v"], dslv_dq, dslv_dp],
            [dflq_du, dflq_dv, dfl_dfl["q", "q"], dfl_dfl["q", "p"]],
            [dflp_du, dflp_dv, dfl_dfl["p", "q"], dfl_dfl["p", "p"]],
        ]
        keys = ("u", "v", "q", "p")
        return bv.BlockMatrix(grid, labels=(keys, keys))

    def assem_dres_dstatet(self) -> bv.BlockMatrix:
        solid, fluid = self.solid, self.fluid
        dsl = solid.assem_dres_dstatet()
        dfl = fluid.assem_dres_dstatet()
        nq, npf = fluid.state["q"].size, fluid.state["p"].size
        n = solid.ndof
        zq = np.zeros((n, nq))
        zp = np.zeros((n, npf))
        grid = [
            [dsl["u", "u"], dsl["u", "v"], zq, zp],
            [dsl["v", "u"], dsl["v", "v"], zq, zp],
            [zq.T, zq.T, dfl["q", "q"], dfl["q", "p"]],
            [zp.T, zp.T, dfl["p", "q"], dfl["p", "p"]],
        ]
        keys = ("u", "v", "q", "p")
        return bv.BlockMatrix(grid, labels=(keys, keys))

    def assem_dres_dcontrol(self) -> bv.BlockMatrix:
        solid, fluid = self.solid, self.fluid
        dfl_dctrl = fluid.assem_dres_dcontrol()
        ctrl_keys = list(self.control.keys())
        rows = []
        for rk, nrow in (
            ("u", solid.ndof),
            ("v", solid.ndof),
            ("q", fluid.state["q"].size),
            ("p", fluid.state["p"].size),
        ):
            row = []
            for ck in ctrl_keys:
                ncol = np.asarray(self.control[ck]).size
                if rk in ("q", "p"):
                    row.append(np.asarray(dfl_dctrl[rk, ck]))
                else:
                    row.append(np.zeros((nrow, ncol)))
            rows.append(row)
        return bv.BlockMatrix(
            rows, labels=(("u", "v", "q", "p"), tuple(ctrl_keys))
        )

    def assem_dres_dprop(self) -> bv.BlockMatrix:
        solid, fluid = self.solid, self.fluid
        dflarea_dslu, _ = self._coupling_mats()
        dsl_dprop = solid.assem_dres_dprop()
        dfl_dprop = fluid.assem_dres_dprop()
        dfl_dctrl = fluid.assem_dres_dcontrol()

        prop_keys = list(self.prop.keys())
        sl_keys = list(solid.prop.keys())
        fl_keys = list(fluid.prop.keys())
        state_rows = (
            ("u", solid.ndof),
            ("v", solid.ndof),
            ("q", fluid.state["q"].size),
            ("p", fluid.state["p"].size),
        )
        grid = []
        for rk, nrow in state_rows:
            row = []
            for pk in prop_keys:
                ncol = np.asarray(self.prop[pk]).size
                blk = np.zeros((nrow, ncol))
                if rk in ("u", "v") and pk in sl_keys:
                    blk = np.asarray(dsl_dprop[rk, pk])
                elif rk in ("q", "p") and pk in fl_keys:
                    blk = np.asarray(dfl_dprop[rk, pk])
                elif rk in ("q", "p") and pk == "umesh":
                    # fluid control (area) depends on the mesh shape
                    blk = np.asarray(dfl_dctrl[rk, "area"]) @ dflarea_dslu
                elif rk in ("q", "p") and pk == "ymid":
                    # area = 2*(ymid - y_srf): d(area)/d(ymid) = 2
                    darea_dymid = np.full(
                        (np.asarray(fluid.control["area"]).size, 1), 2.0
                    )
                    blk = np.asarray(dfl_dctrl[rk, "area"]) @ darea_dymid
                row.append(blk)
            grid.append(row)
        return bv.BlockMatrix(
            grid, labels=(("u", "v", "q", "p"), tuple(prop_keys))
        )


class LinearizedFSIDynamicalModel(FSIDynamicalModel,
                                  BaseLinearizedDynamicalModel):
    """(reference ``dynamical.LinearizedFSIModel``, ``dynamical.py:807-882``)"""

    def __init__(self, solid, fluid, solid_fsi_dofs, fluid_fsi_dofs):
        super().__init__(solid, fluid, solid_fsi_dofs, fluid_fsi_dofs)
        self.dstate = self.state.copy()
        self.dstatet = self.statet.copy()
        self.dcontrol = self.control.copy()
        for b in (self.dstate, self.dstatet, self.dcontrol):
            b[:] = 0.0

    def set_dstate(self, dstate):
        self.dstate[:] = dstate
        self.solid.set_dstate(dstate[["u", "v"]])
        self.fluid.set_dstate(dstate[["q", "p"]])
        # chain the coupling tangents
        dflarea_dslu, dslp_dflp = self._coupling_mats()
        dfl_control = self.fluid.dcontrol.copy()
        dfl_control["area"] = dflarea_dslu @ np.asarray(dstate["u"])
        self.fluid.set_dcontrol(dfl_control)
        dsl_control = self.solid.dcontrol.copy()
        dsl_control["p"] = dslp_dflp @ np.asarray(dstate["p"])
        self.solid.set_dcontrol(dsl_control)

    def set_dstatet(self, dstatet):
        self.dstatet[:] = dstatet
        self.solid.set_dstatet(dstatet[["u", "v"]])
        self.fluid.set_dstatet(dstatet[["q", "p"]])

    def set_dcontrol(self, dcontrol):
        self.dcontrol[:] = dcontrol
        dfl_control = self.fluid.dcontrol.copy()
        for k in dcontrol.keys():
            dfl_control[k] = dcontrol[k]
        self.fluid.set_dcontrol(dfl_control)
