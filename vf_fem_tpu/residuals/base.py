"""
Residual definitions binding forms to meshes.

``FemResidual`` is the TPU-native analogue of the reference's
``FenicsResidual`` (reference: ``src/femvf/residuals/base.py:23-104``): a
signed sum of form-zoo instances bound to a mesh, its marker functions, and
Dirichlet BC specs.  Instead of a UFL graph it compiles the forms into pure
batched element functions plus gather/scatter index arrays.

``JaxResidual`` matches the reference's trivial holder for fluid models
(reference: ``residuals/base.py:115-133``).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..mesh.core import Mesh
from ..fem import assembly
from ..fem.assembly import Topology, build_topology
from ..fem.forms import BaseForm, CoeffSpec

# Dirichlet BC spec: (value, element_type, subdomain_name) as in the
# reference (``residuals/base.py:54-65``); default zero displacement on
# the 'fixed' facet subdomain.
DirichletBCTuple = tuple
DEFAULT_DIRICHLET_BC = {"state/u1": [(0.0, "facet", "fixed")]}


class FemResidual:
    """A signed sum of element forms over a mesh: F_u(u1, v1, a1; g, p)."""

    def __init__(
        self,
        signed_forms: Sequence[tuple],  # [(sign, BaseForm), ...]
        mesh: Mesh,
        traction_subdomains: Sequence[str] = ("pressure",),
        dirichlet_bc_specs: Optional[dict] = None,
    ):
        # accept a FormExpr (form algebra) or a plain signed list
        from ..fem.forms import FormExpr

        if isinstance(signed_forms, FormExpr):
            signed_forms = signed_forms.signed_forms
        self._signed_forms = list(signed_forms)
        self._mesh = mesh
        self._traction_subdomains = tuple(traction_subdomains)
        if dirichlet_bc_specs is None:
            dirichlet_bc_specs = DEFAULT_DIRICHLET_BC
        self._dirichlet_bc_specs = dirichlet_bc_specs

        self.topology: Topology = build_topology(mesh, traction_subdomains)

        # Union of coefficient specs
        self.coefficient_spec: dict = {}
        for _, form in self._signed_forms:
            for key, spec in form.COEFFICIENT_SPEC.items():
                if key in self.coefficient_spec:
                    prev = self.coefficient_spec[key]
                    if prev.space != spec.space:
                        raise ValueError(
                            f"Conflicting spaces for coefficient {key}:"
                            f" {prev.space} vs {spec.space}"
                        )
                else:
                    self.coefficient_spec[key] = spec

        self._cell_forms = [
            (s, f) for s, f in self._signed_forms if f.domain == "cell"
        ]
        self._facet_forms = [
            (s, f) for s, f in self._signed_forms if f.domain == "facet"
        ]

        # Reference mesh coordinates, kept immutable (shape updates add
        # prop/umesh on top; reference ``residuals/base.py:74-81``)
        self.ref_mesh_coords = np.array(mesh.coords, copy=True)

        # Dirichlet vertex mask for the displacement state
        subnames = [
            spec[2] for spec in self._dirichlet_bc_specs.get("state/u1", [])
        ]
        if subnames:
            self.bc_vertex_mask = assembly.dirichlet_vertex_mask(mesh, subnames)
        else:
            self.bc_vertex_mask = np.zeros(mesh.num_vertices, dtype=bool)
        dim = mesh.dim
        bc_verts = np.nonzero(self.bc_vertex_mask)[0]
        self.bc_dofs = np.asarray(
            (bc_verts[:, None] * dim + np.arange(dim)[None, :]).reshape(-1),
            dtype=np.int32,
        )

    # -- Reference-compatible accessors ---------------------------------
    @property
    def form(self):
        """
        Mapping-style view over the residual's coefficient keys
        (reference code queries ``residual.form`` for coefficient presence,
        e.g. ``'prop/umesh' in residual.form``,
        ``src/femvf/models/transient.py:349``).  Values are the
        :class:`CoeffSpec`s — the symbolic-coefficient analog here.
        """
        return self.coefficient_spec

    def mesh(self) -> Mesh:
        return self._mesh

    def mesh_function(self, element_type):
        return self._mesh.mesh_function(element_type)

    def mesh_subdomain(self, element_type):
        return self._mesh.mesh_subdomain(element_type)

    @property
    def dirichlet_bc_specs(self):
        return self._dirichlet_bc_specs

    @property
    def forms(self):
        return self._signed_forms

    def form_instance(self, cls):
        """Return the (first) form instance of a given class, or None."""
        for _, f in self._signed_forms:
            if isinstance(f, cls):
                return f
        return None

    # -- Coefficient plumbing --------------------------------------------
    def coefficient_shape(self, key: str):
        spec = self.coefficient_spec[key]
        nvert, nc, dim = (
            self._mesh.num_vertices,
            self._mesh.num_cells,
            self._mesh.dim,
        )
        return {
            "cg1_vector": (nvert, dim),
            "cg1_scalar": (nvert,),
            "dg0_scalar": (nc,),
            "const_scalar": (1,),
            "const_vector": (dim,),
        }[spec.space]

    def default_coefficients(self) -> dict:
        """Global coefficient arrays filled with each spec's default value."""
        out = {}
        for key, spec in self.coefficient_spec.items():
            arr = np.full(self.coefficient_shape(key), float(spec.default))
            if spec.space == "const_vector" and key == "prop/ncontact":
                # reference sets the default contact normal to +y
                # (``form.py:788-791``)
                arr[:] = 0.0
                arr[1] = 1.0
            out[key] = arr
        return out

    # -- Element functions --------------------------------------------------
    def cell_elem_fn(self) -> Callable:
        topo = self.topology
        cell_forms = self._cell_forms

        def cell_elem(Xe, local):
            geom = assembly.make_cell_geom(Xe, topo)
            res = None
            for sign, form in cell_forms:
                r = sign * form.cell_kernel(geom, local)
                res = r if res is None else res + r
            return res

        return cell_elem

    def facet_elem_fn(self) -> Callable:
        topo = self.topology
        facet_forms = self._facet_forms

        def facet_elem(Xe, sel, opp_sel, local):
            geom = assembly.make_facet_geom(Xe, sel, opp_sel, topo)
            res = None
            for sign, form in facet_forms:
                r = sign * form.facet_kernel(geom, local)
                res = r if res is None else res + r
            return res

        return facet_elem

    def gather_cell_locals(self, fields: dict):
        """Per-cell local coefficient values + vmap in_axes spec."""
        topo = self.topology
        cells = topo.cells
        local, axes = {}, {}
        for key, spec in self.coefficient_spec.items():
            arr = fields[key]
            if spec.space in ("cg1_vector", "cg1_scalar"):
                local[key] = arr[cells]
                axes[key] = 0
            elif spec.space == "dg0_scalar":
                local[key] = arr
                axes[key] = 0
            else:  # const
                local[key] = arr[0] if spec.space == "const_scalar" else arr
                axes[key] = None
        return local, axes

    def gather_facet_locals(self, fields: dict):
        topo = self.topology
        fcells = topo.facet_cells
        cell_verts = topo.cells[fcells]  # (nf, nv)
        local, axes = {}, {}
        for key, spec in self.coefficient_spec.items():
            arr = fields[key]
            if spec.space in ("cg1_vector", "cg1_scalar"):
                local[key] = arr[cell_verts]
                axes[key] = 0
            elif spec.space == "dg0_scalar":
                local[key] = arr[fcells]
                axes[key] = 0
            else:
                local[key] = arr[0] if spec.space == "const_scalar" else arr
                axes[key] = None
        return local, axes

    def n_facets(self) -> int:
        return int(self.topology.facet_cells.shape[0])

    def banded_plan(self):
        """Lazy banded-assembly plan (requires a bandwidth-ordered mesh —
        ``mesh.reorder.rcm_mesh``; raises AssertionError otherwise)."""
        if getattr(self, "_banded_plan", None) is None:
            from .. import config
            from ..fem import banded

            self._banded_plan = banded.plan_banded(
                np.asarray(self.topology.cells),
                self._mesh.num_vertices,
                gc=config.BANDED_GC,
            )
        return self._banded_plan

    def _cell_res_banded(self, fields: dict, X) -> jnp.ndarray:
        """Cell-pass residual via the gather-free banded kernels
        (``fem.banded``): one stacked MXU gather of all cg1 channels (and
        the traced coordinates), the element kernel vmapped with the cell
        axis LAST (SoA — per-element scalars are full lane vectors), one
        MXU scatter.  Numerically equal to the gather/segment_sum path
        (one-hot matmuls are exact copies)."""
        from ..fem import banded as banded_mod

        plan = self.banded_plan()
        mesh = self._mesh
        nvert, dim = mesh.num_vertices, mesh.dim
        ncpad = plan.ngroups * plan.gc

        comps, layout = [], []
        for key, spec in self.coefficient_spec.items():
            if spec.space == "cg1_vector":
                arr2 = jnp.asarray(fields[key]).reshape(nvert, dim)
                comps.extend(arr2[:, c] for c in range(dim))
                layout.append((key, dim))
            elif spec.space == "cg1_scalar":
                comps.append(jnp.asarray(fields[key]).reshape(nvert))
                layout.append((key, 1))
        # traced coordinates ride the same gather (shape derivatives work
        # unchanged; constant-folded by XLA when umesh is absent)
        comps.extend(X[:, c] for c in range(dim))
        layout.append(("__X__", dim))
        F = jnp.stack(comps, axis=0)  # (C, nvert) channels-major
        loc_all = banded_mod.banded_gather(plan, F)  # (nv, C, ncpad)

        local, axes = {}, {}
        c0 = 0
        Xe = None
        for key, ncols in layout:
            v = loc_all[:, c0 : c0 + ncols, :]  # (nv, ncols, ncpad)
            c0 += ncols
            if key == "__X__":
                Xe = v
            else:
                local[key] = v if ncols > 1 else v[:, 0, :]
                axes[key] = -1
        for key, spec in self.coefficient_spec.items():
            if spec.space == "dg0_scalar":
                arr = jnp.asarray(fields[key])
                local[key] = jnp.pad(
                    arr, (0, ncpad - arr.shape[0]), mode="edge"
                )
                axes[key] = -1
            elif spec.space == "const_scalar":
                local[key] = jnp.asarray(fields[key])[0]
                axes[key] = None
            elif spec.space == "const_vector":
                local[key] = jnp.asarray(fields[key])
                axes[key] = None

        cell_elem = self.cell_elem_fn()
        res_c = jax.vmap(cell_elem, in_axes=(-1, axes), out_axes=-1)(
            Xe, local
        )  # (nv, dim, ncpad)
        res_cm = banded_mod.banded_scatter(plan, res_c, nvert)
        return jnp.moveaxis(res_cm, 0, 1)  # (nvert, dim)

    def assemble_res(self, fields: dict, banded: bool = False) -> jnp.ndarray:
        """
        Assemble the (nvert, dim) residual of the 'u' form given *all*
        coefficient fields explicitly (u1/v1/a1 independent).  No BCs.

        ``banded`` routes the cell pass through the gather-free Pallas
        kernels (``fem.banded``; requires a bandwidth-ordered mesh).  Note
        the banded ops carry ``custom_vjp`` rules — reverse-mode exact,
        but not ``jax.jvp``-able; forward-mode callers use the default
        path.
        """
        topo = self.topology
        mesh = self._mesh
        X = jnp.asarray(self.ref_mesh_coords)
        if "prop/umesh" in fields:
            X = X + fields["prop/umesh"]

        if banded:
            res = self._cell_res_banded(fields, X)
        else:
            cell_elem = self.cell_elem_fn()
            local, axes = self.gather_cell_locals(fields)
            Xe = X[topo.cells]
            res_c = jax.vmap(cell_elem, in_axes=(0, axes))(Xe, local)
            res = assembly.scatter_add(res_c, topo.cells, mesh.num_vertices)

        if self._facet_forms and self.n_facets() > 0:
            facet_elem = self.facet_elem_fn()
            flocal, faxes = self.gather_facet_locals(fields)
            cell_verts = topo.cells[topo.facet_cells]
            Xf = X[cell_verts]
            res_f = jax.vmap(facet_elem, in_axes=(0, 0, 0, faxes))(
                Xf, topo.facet_sel, topo.facet_opp_sel, flocal
            )
            res = res + assembly.scatter_add(res_f, cell_verts, mesh.num_vertices)
        return res


    # -- Generic dense Jacobians ------------------------------------------
    def _wrt_cols(self, wrt_key: str):
        """Global column count and per-element column index arrays."""
        spec = self.coefficient_spec[wrt_key]
        mesh = self._mesh
        dim = mesh.dim
        topo = self.topology
        cells = np.asarray(topo.cells)
        fcells = np.asarray(topo.facet_cells)
        if spec.space == "cg1_vector":
            ncols = mesh.num_vertices * dim
            cdofs = assembly.cell_dof_array(cells, dim)
            fdofs = assembly.cell_dof_array(cells[fcells], dim)
        elif spec.space == "cg1_scalar":
            ncols = mesh.num_vertices
            cdofs = cells
            fdofs = cells[fcells]
        elif spec.space == "dg0_scalar":
            ncols = mesh.num_cells
            cdofs = np.arange(mesh.num_cells)[:, None]
            fdofs = fcells[:, None]
        elif spec.space == "const_scalar":
            ncols = 1
            cdofs = np.zeros((mesh.num_cells, 1), dtype=np.int32)
            fdofs = np.zeros((len(fcells), 1), dtype=np.int32)
        else:  # const_vector
            ncols = dim
            cdofs = np.tile(np.arange(dim), (mesh.num_cells, 1))
            fdofs = np.tile(np.arange(dim), (len(fcells), 1))
        return ncols, jnp.asarray(cdofs), jnp.asarray(fdofs)

    def assemble_jac_dense(
        self,
        fields: dict,
        wrt_key: str,
        tangent_fields: Optional[dict] = None,
    ) -> jnp.ndarray:
        """
        Dense Jacobian d(res)/d(fields[wrt_key]) of the assembled 'u'
        residual, by element-level ``jax.jacfwd`` + scatter — this replaces
        ``dfn.derivative`` + dolfin assembly
        (reference: ``models/assemblyutils.py:98-133``).

        With ``tangent_fields`` given, differentiates the *linearized*
        residual ``jvp(res, fields, tangent_fields)`` instead — the building
        block of the reference's ``LinearizedFenicsModel`` second-derivative
        blocks (reference: ``dynamical.py:301-399``).

        No Dirichlet handling is applied; callers mask rows as needed.
        Returns an (nvert*dim, ncols) array.
        """
        mesh = self._mesh
        dim = mesh.dim
        topo = self.topology
        ndof_res = mesh.num_vertices * dim
        X = jnp.asarray(self.ref_mesh_coords)
        has_shape = "prop/umesh" in self.coefficient_spec
        wrt_is_shape = wrt_key == "prop/umesh"

        ncols, cdofs, fdofs = self._wrt_cols(wrt_key)
        out = jnp.zeros((ndof_res, ncols))

        cell_elem = self.cell_elem_fn()
        facet_elem = self.facet_elem_fn()
        cells = topo.cells
        row_cdofs = jnp.asarray(
            assembly.cell_dof_array(np.asarray(cells), dim)
        )

        def make_elem_fn(base_elem, static_args):
            """base residual of one element as fn of the wrt-local value."""

            def with_w(w_e, Xref_e, local, tlocal, extra):
                loc = dict(local)
                loc[wrt_key] = w_e
                if has_shape:
                    um = loc["prop/umesh"]
                    Xe = Xref_e + um
                else:
                    Xe = Xref_e

                def res_of(loc_):
                    return base_elem(Xe, *extra, loc_) if not has_shape else (
                        base_elem(Xref_e + loc_["prop/umesh"], *extra, loc_)
                    )

                if tlocal is None:
                    if has_shape:
                        return base_elem(Xref_e + loc["prop/umesh"], *extra, loc)
                    return base_elem(Xe, *extra, loc)
                # linearized residual: jvp along the tangent locals
                def f(l):
                    if has_shape:
                        return base_elem(
                            Xref_e + l["prop/umesh"], *extra, l
                        )
                    return base_elem(Xe, *extra, l)

                _, dres = jax.jvp(f, (loc,), (tlocal,))
                return dres

            return with_w

        # ---- cell pass ----
        local_c, axes_c = self.gather_cell_locals(fields)
        tlocal_c = None
        taxes_c = None
        if tangent_fields is not None:
            tlocal_c, taxes_c = self.gather_cell_locals(tangent_fields)
        Xe_c = X[cells]

        cell_fn = make_elem_fn(lambda Xe, loc: cell_elem(Xe, loc), ())

        def cell_jac(Xref_e, local, tlocal):
            w_e = local[wrt_key]

            def g(w):
                return cell_fn(w, Xref_e, local, tlocal, ())

            return jax.jacfwd(g)(w_e)

        in_axes = (0, axes_c, taxes_c)
        Jc = jax.vmap(cell_jac, in_axes=in_axes)(Xe_c, local_c, tlocal_c)
        # Jc: (nc, nv, dim, *w_shape)
        nc = Jc.shape[0]
        nv = cells.shape[1]
        nld = nv * dim
        Jc = Jc.reshape(nc, nld, -1)
        rows = row_cdofs[:, :, None]
        cols = cdofs[:, None, :]
        ncw = Jc.shape[-1]
        # broadcast col indices to (nc, nld, ncw)
        out = out.at[
            jnp.broadcast_to(rows, (nc, nld, ncw)),
            jnp.broadcast_to(cols, (nc, nld, ncw)),
        ].add(Jc)

        # ---- facet pass ----
        if self._facet_forms and self.n_facets() > 0:
            fcells = topo.facet_cells
            cell_verts = cells[fcells]
            row_fdofs = jnp.asarray(
                assembly.cell_dof_array(
                    np.asarray(cells)[np.asarray(fcells)], dim
                )
            )
            local_f, axes_f = self.gather_facet_locals(fields)
            tlocal_f, taxes_f = (None, None)
            if tangent_fields is not None:
                tlocal_f, taxes_f = self.gather_facet_locals(tangent_fields)
            Xe_f = X[cell_verts]

            def facet_jac(Xref_e, sel, opp_sel, local, tlocal):
                w_e = local[wrt_key]

                def g(w):
                    loc = dict(local)
                    loc[wrt_key] = w
                    if tlocal is None:
                        if has_shape:
                            return facet_elem(
                                Xref_e + loc["prop/umesh"], sel, opp_sel, loc
                            )
                        return facet_elem(Xref_e, sel, opp_sel, loc)

                    def f(l):
                        if has_shape:
                            return facet_elem(
                                Xref_e + l["prop/umesh"], sel, opp_sel, l
                            )
                        return facet_elem(Xref_e, sel, opp_sel, l)

                    _, dres = jax.jvp(f, (loc,), (tlocal,))
                    return dres

                return jax.jacfwd(g)(w_e)

            Jf = jax.vmap(
                facet_jac, in_axes=(0, 0, 0, axes_f, taxes_f)
            )(Xe_f, topo.facet_sel, topo.facet_opp_sel, local_f, tlocal_f)
            nf = Jf.shape[0]
            Jf = Jf.reshape(nf, nld, -1)
            rows = row_fdofs[:, :, None]
            cols = fdofs[:, None, :]
            ncw = Jf.shape[-1]
            out = out.at[
                jnp.broadcast_to(rows, (nf, nld, ncw)),
                jnp.broadcast_to(cols, (nf, nld, ncw)),
            ].add(Jf)

        return out


class JaxResidual:
    """Holder of a fluid residual callable + prototype args
    (reference: ``residuals/base.py:115-133``)."""

    def __init__(self, res: Callable, res_args: tuple):
        self._res = res
        self._res_args = res_args

    @property
    def res(self):
        return self._res

    @property
    def res_args(self):
        return self._res_args
