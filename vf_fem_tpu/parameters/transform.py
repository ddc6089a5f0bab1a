"""
Parameter transforms (reference: ``src/femvf/parameters/transform.py``).

A ``Transform`` maps an input parameter block vector to a model property
vector, with ``apply_jvp``/``apply_vjp`` linearizations and ``*``
composition (``t1 * t2`` applies t1 then t2, reference
``transform.py:30-166``).  JAX-backed transforms get both linearizations
from one pure function; ``TractionShape`` solves the auxiliary
linear-elastic problem with the framework's own assembly + dense solve in
place of the reference's PETSc LU (reference: ``transform.py:187-333``).
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .. import blocks as bv
from ..fem import forms as F
from ..residuals.base import FemResidual


class Transform:
    """(reference: ``transform.py:30-113``)"""

    _x: bv.BlockVector
    _y: bv.BlockVector

    @property
    def x(self) -> bv.BlockVector:
        return self._x

    @property
    def y(self) -> bv.BlockVector:
        return self._y

    def apply(self, x: bv.BlockVector) -> bv.BlockVector:
        raise NotImplementedError()

    def apply_vjp(self, x, hy) -> bv.BlockVector:
        raise NotImplementedError()

    def apply_jvp(self, x, dx) -> bv.BlockVector:
        raise NotImplementedError()

    def __mul__(self, other):
        return TransformComposition(self, other)

    def __rmul__(self, other):
        return TransformComposition(other, self)


class TransformComposition(Transform):
    """``t1 * t2``: apply t1 then t2 (reference: ``transform.py:118-166``)."""

    def __init__(self, transform_1: Transform, transform_2: Transform):
        self._transforms = (transform_1, transform_2)
        self._x = transform_1.x
        self._y = transform_2.y

    def apply(self, x):
        t1, t2 = self._transforms
        return t2.apply(t1.apply(x))

    def apply_vjp(self, x, hy):
        t1, t2 = self._transforms
        y1 = t1.apply(x)
        hy1 = t2.apply_vjp(y1, hy)
        return t1.apply_vjp(x, hy1)

    def apply_jvp(self, x, dx):
        t1, t2 = self._transforms
        y1 = t1.apply(x)
        dy1 = t1.apply_jvp(x, dx)
        return t2.apply_jvp(y1, dy1)


class JaxTransform(Transform):
    """
    Transform defined by one pure function ``fn(x_dict) -> y_dict``; both
    linearizations are ``jax.jvp``/``jax.vjp``
    (reference: ``transform.py:340-415``).
    """

    def __init__(self, x_proto: bv.BlockVector, y_proto: bv.BlockVector,
                 fn: Callable):
        self._x = x_proto.copy()
        self._y = y_proto.copy()
        self._fn = fn

    def apply(self, x):
        y = self._fn(x.to_dict())
        return bv.BlockVector(
            [np.asarray(y[k]) for k in self._y.keys()],
            labels=[tuple(self._y.keys())],
        )

    def apply_jvp(self, x, dx):
        _, dy = jax.jvp(self._fn, (x.to_dict(),), (dx.to_dict(),))
        return bv.BlockVector(
            [np.asarray(dy[k]) for k in self._y.keys()],
            labels=[tuple(self._y.keys())],
        )

    def apply_vjp(self, x, hy):
        _, vjp = jax.vjp(self._fn, x.to_dict())
        hy_d = {
            k: jnp.asarray(np.asarray(hy[k])) for k in self._y.keys()
        }
        (hx,) = vjp(hy_d)
        return bv.BlockVector(
            [np.asarray(hx[k]) for k in self._x.keys()],
            labels=[tuple(self._x.keys())],
        )


class TransformFromModel(Transform):
    """Output space = ``model.prop`` (reference: ``transform.py:169-184``)."""

    def __init__(self, model):
        self.model = model
        self._y = model.prop.copy()
        self._y[:] = 0.0


def _jax_prop_transform(model, x_proto, fn) -> JaxTransform:
    return JaxTransform(x_proto, model.prop, fn)


class Identity(JaxTransform):
    """y = x over model.prop (reference: ``transform.py:474-483``)."""

    def __init__(self, model):
        prop = model.prop
        super().__init__(prop, prop, lambda x: dict(x))
        self.model = model


class Scale(JaxTransform):
    """y[key] = scale[key] * x[key] (reference: ``transform.py:515-553``)."""

    def __init__(self, model, scale: Optional[dict] = None):
        prop = model.prop
        scale = dict(scale or {})

        def fn(x):
            return {
                k: (jnp.asarray(x[k]) * scale.get(k, 1.0)) for k in x
            }

        super().__init__(prop, prop, fn)
        self.model = model
        self.scale = scale


class ConstantSubset(JaxTransform):
    """Hold a subset of keys at constant values, pass the rest through
    (reference: ``transform.py:486-512``)."""

    def __init__(self, model, const_vals: Optional[dict] = None):
        prop = model.prop
        const_vals = dict(const_vals or {})

        def fn(x):
            out = {}
            for k in x:
                if k in const_vals:
                    out[k] = jnp.full_like(
                        jnp.asarray(x[k]), float(const_vals[k])
                    )
                else:
                    out[k] = jnp.asarray(x[k])
            return out

        super().__init__(prop, prop, fn)
        self.model = model


class ExtractSubset(Transform):
    """Input = a subset of prop keys; other outputs take default values
    (reference: ``transform.py:556-583``)."""

    def __init__(self, model, keys):
        self.model = model
        self._keys = list(keys)
        prop = model.prop
        self._x = prop[self._keys].copy()
        self._y = prop.copy()

    def apply(self, x):
        y = self._y.copy()
        for k in self._keys:
            y[k] = np.asarray(x[k])
        return y

    def apply_jvp(self, x, dx):
        dy = self._y.copy()
        dy[:] = 0.0
        for k in self._keys:
            dy[k] = np.asarray(dx[k])
        return dy

    def apply_vjp(self, x, hy):
        hx = self._x.copy()
        for k in self._keys:
            hx[k] = np.asarray(hy[k])
        return hx


class LayerModuli(Transform):
    """One stiffness value per named cell layer -> DG0 emod field
    (reference: ``transform.py:419-454``)."""

    def __init__(self, model):
        self.model = model
        solid = getattr(model, "solid", model)
        mesh = solid.residual.mesh()
        dim = mesh.dim
        subdomains = mesh.subdomains[dim]
        if not subdomains:
            raise ValueError("Mesh has no named cell subdomains")
        self._layers = list(subdomains.keys())
        markers = mesh.mesh_functions[dim]
        self._masks = {
            name: (markers == val).astype(float)
            for name, val in subdomains.items()
        }
        self._x = bv.BlockVector(
            [np.zeros(1) for _ in self._layers], labels=[tuple(self._layers)]
        )
        self._y = model.prop.copy()

    def apply(self, x):
        y = self.model.prop.copy()
        emod = np.zeros_like(np.asarray(y["emod"]))
        for name in self._layers:
            emod = emod + float(np.asarray(x[name])[0]) * self._masks[name]
        y["emod"] = emod
        return y

    def apply_jvp(self, x, dx):
        dy = self.model.prop.copy()
        dy[:] = 0.0
        demod = np.zeros_like(np.asarray(dy["emod"]))
        for name in self._layers:
            demod = demod + float(np.asarray(dx[name])[0]) * self._masks[name]
        dy["emod"] = demod
        return dy

    def apply_vjp(self, x, hy):
        hx = self._x.copy()
        h_emod = np.asarray(hy["emod"])
        for name in self._layers:
            hx[name] = np.array([np.dot(self._masks[name], h_emod)])
        return hx


class _LameElasticForm(F.BaseForm):
    """Auxiliary linear-elastic form parameterized directly by Lame
    constants (used by ``TractionShape``)."""

    COEFFICIENT_SPEC = {
        "state/u1": F.cg1_vector(),
        "prop/lame_lambda": F.const_scalar(1.0),
        "prop/lame_mu": F.const_scalar(1.0),
    }

    def cell_kernel(self, geom, local):
        from ..fem.continuum import strain_inf

        eps = strain_inf(F.grad_field(local["state/u1"], geom.grads))
        lam = local["prop/lame_lambda"]
        mu = local["prop/lame_mu"]
        sig = 2 * mu * eps + lam * jnp.trace(eps) * jnp.eye(3)
        dim = geom.X.shape[-1]
        return geom.vol * geom.grads @ sig[:dim, :dim].T


class TractionShape(TransformFromModel):
    """
    Map a surface traction to a mesh displacement by solving an auxiliary
    linear-elastic problem (reference: ``transform.py:187-333``):
    ``umesh = K^{-1} T t`` with K the Lame stiffness (Dirichlet rows on the
    'fixed' boundary) and T the surface-traction load operator.  The vjp is
    the transposed solve.

    ``solver``: ``'dense'`` materializes K and T (small meshes only);
    ``'banded'`` factors K in the block-banded/Thomas form
    (``solvers.bsb``/``btd`` — requires an RCM-renumbered mesh,
    ``mesh.reorder.rcm_mesh``) and applies T matrix-free, which scales to
    the 23.7k+/94.8k-dof meshes where the reference's PETSc sparse LU
    would (reference ``transform.py:239-254``); the vjp is the transposed
    Thomas solve (``btd_solve_t``).  ``'auto'`` (default) picks banded
    above ``dense_max_dofs``.
    """

    def __init__(self, model, lame_lambda=1.0, lame_mu=1.0,
                 dirichlet_bcs=None, solver: str = "auto",
                 dense_max_dofs: int = 6000):
        super().__init__(model)
        solid = getattr(model, "solid", model)
        mesh = solid.residual.mesh()
        self._solid = solid

        aux = FemResidual(
            [
                (1.0, _LameElasticForm()),
                (-1.0, F.ManualSurfaceContactTractionForm()),
            ],
            mesh,
            traction_subdomains=solid.residual._traction_subdomains,
            dirichlet_bc_specs=dirichlet_bcs,
        )
        fields = {
            k: jnp.asarray(np.asarray(v))
            for k, v in aux.default_coefficients().items()
        }
        fields["prop/lame_lambda"] = jnp.asarray([float(lame_lambda)])
        fields["prop/lame_mu"] = jnp.asarray([float(lame_mu)])

        ndof = solid.ndof
        self._x = bv.BlockVector(
            [np.zeros(ndof)], labels=[("tmesh",)]
        )
        if solver == "auto":
            solver = "dense" if ndof <= dense_max_dofs else "banded"
        self._solver = solver
        if solver == "banded":
            self._init_banded(aux, fields, mesh, ndof)
            return
        if solver != "dense":
            raise ValueError(f"unknown TractionShape solver {solver!r}")

        K = np.array(aux.assemble_jac_dense(fields, "state/u1"))
        T = np.array(aux.assemble_jac_dense(fields, "control/tcontact"))
        bc = np.asarray(aux.bc_dofs)
        K[bc, :] = 0.0
        K[bc, bc] = 1.0
        T[bc, :] = 0.0
        self._K = K
        self._T = T

    # -- banded (large-mesh) path -----------------------------------------
    def _init_banded(self, aux, fields, mesh, ndof):
        """Block-banded K factored once (block-Thomas), T matrix-free.

        Transform evaluation is host-side analysis (like postprocess):
        everything is jitted on the local CPU device in f64 — the
        factorization is one-time, the per-apply cost is two streaming
        band sweeps.
        """
        from ..fem import assembly
        from ..solvers import bsb as bsb_mod, btd as btd_mod

        topo = aux.topology
        cells = np.asarray(topo.cells)
        dim = mesh.dim
        nvert = mesh.num_vertices
        bc = np.asarray(aux.bc_dofs)
        cell_dofs = assembly.cell_dof_array(cells, dim)
        # the traction form carries no d/du1, so K is cell-only Lame
        plan = bsb_mod.plan_bsb([cell_dofs], ndof, bc)

        cell_elem = aux.cell_elem_fn()
        local_c, axes_c = aux.gather_cell_locals(fields)
        X = jnp.asarray(aux.ref_mesh_coords)

        def cell_fn(u1_e, Xe, local):
            loc = dict(local)
            loc["state/u1"] = u1_e
            return cell_elem(Xe, loc)

        cpu = jax.devices("cpu")[0]

        def assemble_K_blocks():
            nv = cells.shape[1]
            nld = nv * dim
            # linear problem: element stiffness evaluated at u1 = 0
            Jc = jax.vmap(jax.jacfwd(cell_fn), in_axes=(0, 0, axes_c))(
                jnp.zeros((cells.shape[0], nv, dim)), X[cells], local_c
            ).reshape(-1, nld, nld)
            return bsb_mod.bsb_fill(plan, [Jc])

        with jax.default_device(cpu):
            factors = btd_mod.btd_factor(plan, assemble_K_blocks())
            self._factors = jax.tree_util.tree_map(np.asarray, factors)
            self._plan = plan
            # for solve certificates (K umesh = T t residual checks):
            # recomputed on demand — the band array is ~nblk*nb*128^2
            # values (100+ MB at 23.7k dofs), too big to keep alive for
            # the transform's lifetime when only the factors are used
            self._assemble_K_blocks = assemble_K_blocks

        bc_mask = np.ones(ndof)
        bc_mask[bc] = 0.0

        def res_of_t(t_flat):
            f2 = dict(fields)
            f2["control/tcontact"] = t_flat.reshape(nvert, dim)
            # zero u1: only the (linear) traction load survives
            f2["state/u1"] = jnp.zeros((nvert, dim))
            return aux.assemble_res(f2).reshape(-1)

        z = jnp.zeros(ndof)

        def T_mv(t):
            # T = d res / d tcontact, rows zeroed on Dirichlet dofs
            return jax.jvp(res_of_t, (z,), (t,))[1] * bc_mask

        def T_rmv(lam):
            return jax.vjp(res_of_t, z)[1](lam * bc_mask)[0]

        def fwd(factors, t):
            return btd_mod.btd_solve(plan, factors, T_mv(t))

        def bwd(factors, h_umesh):
            lam = btd_mod.btd_solve_t(plan, factors, h_umesh)
            return T_rmv(lam)

        self._fwd = jax.jit(fwd)
        self._bwd = jax.jit(bwd)
        self._T_mv = jax.jit(T_mv)  # for solve certificates in tests

    def _solve_fwd(self, t):
        if self._solver == "banded":
            cpu = jax.devices("cpu")[0]
            with jax.default_device(cpu):
                return np.asarray(self._fwd(self._factors, jnp.asarray(t)))
        return np.linalg.solve(self._K, self._T @ t)

    def _solve_bwd(self, h_umesh):
        if self._solver == "banded":
            cpu = jax.devices("cpu")[0]
            with jax.default_device(cpu):
                return np.asarray(
                    self._bwd(self._factors, jnp.asarray(h_umesh))
                )
        lam = np.linalg.solve(self._K.T, h_umesh)
        return self._T.T @ lam

    def apply(self, x):
        t = np.asarray(x["tmesh"]).reshape(-1)
        y = self.model.prop.copy()
        y["umesh"] = self._solve_fwd(t)
        return y

    def apply_jvp(self, x, dx):
        dt = np.asarray(dx["tmesh"]).reshape(-1)
        dy = self.model.prop.copy()
        dy[:] = 0.0
        dy["umesh"] = self._solve_fwd(dt)
        return dy

    def apply_vjp(self, x, hy):
        h_umesh = np.asarray(hy["umesh"]).reshape(-1)
        hx = self._x.copy()
        hx["tmesh"] = self._solve_bwd(h_umesh)
        return hx


# -- dict <-> BlockVector helpers (reference: ``transform.py:586-600``) -----


def bvec_to_dict(x: bv.BlockVector) -> dict:
    return {k: np.asarray(v) for k, v in x.sub_items()}


def dict_to_bvec(d: dict, labels=None) -> bv.BlockVector:
    keys = list(labels or d.keys())
    return bv.BlockVector([d[k] for k in keys], labels=[tuple(keys)])
