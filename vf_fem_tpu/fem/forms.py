"""
The solid "form zoo" as JAX element kernels.

Each class mirrors one ``PredefinedForm`` of the reference
(reference: ``src/femvf/equations/form.py:516-1062``), but instead of
building a symbolic UFL graph it provides an *element kernel*: a pure
function of the element's nodal values and vertex coordinates returning that
element's contribution to the residual.  Jacobians are obtained with
``jax.jacfwd`` at the element level — this replaces ``dfn.derivative`` and
the FFC-generated C++ tabulation kernels wholesale.

Coefficient layout (global arrays):
- ``cg1_vector``: (n_vertices, dim) nodal field (states, tcontact, umesh)
- ``cg1_scalar``: (n_vertices,) nodal field (pressure p1)
- ``dg0_scalar``: (n_cells,) per-cell field (emod, rho, eta, ...)
- ``const_scalar`` / ``const_vector``: shape (1,) / (dim,) globals

Element kernels receive per-element *local* values: nodal (nv, ...) arrays
for CG1, scalars for DG0/const.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from .elements import interp
from .continuum import (
    def_grad,
    pad_to_3x3,
    pullback_area_normal,
    strain_green_lagrange,
    strain_inf,
    stress_isotropic,
)

I3 = np.eye(3)  # numpy: imports must not touch the device


# -- Coefficient specs --------------------------------------------------------


@dataclass(frozen=True)
class CoeffSpec:
    space: str  # cg1_vector | cg1_scalar | dg0_scalar | const_scalar | const_vector
    default: float = 0.0


def cg1_vector(default=0.0):
    return CoeffSpec("cg1_vector", default)


def cg1_scalar(default=0.0):
    return CoeffSpec("cg1_scalar", default)


def dg0_scalar(default=0.0):
    return CoeffSpec("dg0_scalar", default)


def const_scalar(default=0.0):
    return CoeffSpec("const_scalar", default)


def const_vector(default=0.0):
    return CoeffSpec("const_vector", default)


# -- Element geometry contexts ------------------------------------------------


class CellGeom(NamedTuple):
    X: jnp.ndarray  # (nv, dim) vertex coords
    grads: jnp.ndarray  # (nv, dim) shape-function gradients
    vol: jnp.ndarray  # () cell measure
    bary: jnp.ndarray  # (nq, nv) quadrature barycentric coords
    qw: jnp.ndarray  # (nq,) quadrature weights (sum 1)


class FacetGeom(NamedTuple):
    """
    Facet geometry bound to its adjacent cell.

    Facet-local selection is done with the static one-hot matrix ``sel``
    (nv, dimf) rather than integer indices: ``sel.T @ cell_nodal`` restricts
    cell nodal values to the facet and ``sel @ facet_nodal`` scatters facet
    contributions back — tiny matmuls instead of per-element dynamic
    gathers, which both maps onto the MXU and avoids XLA/TPU issues with
    fused dynamic-index patterns.
    """

    X: jnp.ndarray  # (nv, dim) adjacent-cell vertex coords
    grads: jnp.ndarray  # (nv, dim) adjacent-cell shape gradients
    meas: jnp.ndarray  # () facet measure (length/area)
    normal: jnp.ndarray  # (dim,) outward unit facet normal (reference config)
    fbary: jnp.ndarray  # (nq, dimf) facet quadrature barycentric coords
    fqw: jnp.ndarray  # (nq,) facet quadrature weights
    sel: jnp.ndarray  # (nv, dimf) one-hot facet-vertex selector


# The tiny per-element contractions below are unrolled into elementwise
# multiply-adds (see ``elements.interp``): under ``vmap`` a batched tiny
# dot_general runs the MXU at ~2% utilization and breaks XLA fusion,
# materializing its padded-layout operands in HBM — the dominant cost of
# the vmapped element kernel at large mesh sizes.


def grad_field(field_e: jnp.ndarray, grads: jnp.ndarray) -> jnp.ndarray:
    """Constant gradient of a P1 field: (nv, c) x (nv, d) -> (c, d)."""
    nv, c = field_e.shape
    d = grads.shape[-1]
    rows = [
        [
            sum(field_e[v, i] * grads[v, j] for v in range(nv))
            for j in range(d)
        ]
        for i in range(c)
    ]
    return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)


def _stress_residual(sigma3: jnp.ndarray, geom: CellGeom) -> jnp.ndarray:
    """vol * sigma : strain(test) for all (node, component) tests."""
    nv, dim = geom.grads.shape
    rows = [
        [
            sum(geom.grads[v, j] * sigma3[i, j] for j in range(dim))
            for i in range(dim)
        ]
        for v in range(nv)
    ]
    return geom.vol * jnp.stack(
        [jnp.stack(r, axis=-1) for r in rows], axis=-2
    )


def _force_residual(f_q: jnp.ndarray, geom: CellGeom) -> jnp.ndarray:
    """vol * sum_q w_q f(x_q) . test — f_q: (nq, dim)."""
    nq, nv = geom.bary.shape
    rows = [
        sum(geom.bary[q, k] * geom.qw[q] * f_q[q] for q in range(nq))
        for k in range(nv)
    ]
    return geom.vol * jnp.stack(rows, axis=0)


def facet_restrict(cell_nodal: jnp.ndarray, sel: jnp.ndarray):
    """``sel.T @ cell_nodal``: restrict cell nodal values (nv, ...) to the
    facet's (dimf, ...) — unrolled one-hot contraction."""
    nv, dimf = sel.shape
    return jnp.stack(
        [sum(sel[v, d] * cell_nodal[v] for v in range(nv))
         for d in range(dimf)],
        axis=0,
    )


def facet_interp(values_f: jnp.ndarray, fbary: jnp.ndarray):
    """``fbary @ values_f``: facet quadrature interpolation, unrolled."""
    nq, dimf = fbary.shape
    return jnp.stack(
        [sum(fbary[q, d] * values_f[d] for d in range(dimf))
         for q in range(nq)],
        axis=0,
    )


def _facet_force_residual(t_q, geom: FacetGeom, nv: int) -> jnp.ndarray:
    """Scatter a facet traction integral to cell-local node contributions."""
    nq, dimf = geom.fbary.shape
    res_f = [
        geom.meas
        * sum(geom.fbary[q, d] * geom.fqw[q] * t_q[q] for q in range(nq))
        for d in range(dimf)
    ]  # dimf x (dim,)
    rows = [
        sum(geom.sel[v, d] * res_f[d] for d in range(dimf))
        for v in range(nv)
    ]
    return jnp.stack(rows, axis=0)


def _pk2_residual(S: jnp.ndarray, F: jnp.ndarray, geom: CellGeom) -> jnp.ndarray:
    """vol * S : dE(test) with E the Green-Lagrange strain (PK2 weak form)."""
    from .elements import smallmat_mul

    dim = geom.X.shape[-1]
    FS = smallmat_mul(F, S)
    return _stress_residual(FS, geom)


# -- Cell form classes --------------------------------------------------------


class FormExpr:
    """
    A signed sum of forms — the counterpart of the reference's ``Form``
    algebra (``form_a + form_b``, ``-1.0 * form``; reference
    ``form.py:338-453``).  Coefficients with the same key are shared
    automatically since kernels address coefficients by name.
    """

    def __init__(self, signed_forms):
        self.signed_forms = list(signed_forms)

    def __add__(self, other):
        return FormExpr(self.signed_forms + _as_signed(other))

    def __radd__(self, other):
        return FormExpr(_as_signed(other) + self.signed_forms)

    def __sub__(self, other):
        return FormExpr(
            self.signed_forms + [(-s, f) for s, f in _as_signed(other)]
        )

    def __mul__(self, scalar):
        return FormExpr([(s * scalar, f) for s, f in self.signed_forms])

    __rmul__ = __mul__

    def __neg__(self):
        return self * -1.0

    def __iter__(self):
        return iter(self.signed_forms)


def _as_signed(obj):
    if isinstance(obj, FormExpr):
        return list(obj.signed_forms)
    if isinstance(obj, BaseForm):
        return [(1.0, obj)]
    raise TypeError(f"Cannot combine forms with {type(obj)}")


class BaseForm:
    COEFFICIENT_SPEC: dict = {}
    domain = "cell"  # or 'facet'
    expressions: tuple = ()

    def cell_kernel(self, geom: CellGeom, local: dict) -> jnp.ndarray:
        raise NotImplementedError

    def facet_kernel(self, geom: FacetGeom, local: dict) -> jnp.ndarray:
        raise NotImplementedError

    # form algebra (reference: ``form.py:338-357``)
    def __add__(self, other):
        return FormExpr([(1.0, self)]) + other

    def __radd__(self, other):
        return _as_signed(other) and FormExpr(_as_signed(other) + [(1.0, self)])

    def __sub__(self, other):
        return FormExpr([(1.0, self)]) - other

    def __mul__(self, scalar):
        return FormExpr([(float(scalar), self)])

    __rmul__ = __mul__

    def __neg__(self):
        return FormExpr([(-1.0, self)])


class InertialForm(BaseForm):
    """rho * a . test (reference: ``form.py:516-534``)."""

    COEFFICIENT_SPEC = {
        "state/a1": cg1_vector(),
        "prop/rho": dg0_scalar(1.0),
    }

    def cell_kernel(self, geom, local):
        a_q = interp(local["state/a1"], geom.bary)
        return _force_residual(local["prop/rho"] * a_q, geom)


class IsotropicElasticForm(BaseForm):
    """Linear isotropic elasticity (reference: ``form.py:540-572``)."""

    COEFFICIENT_SPEC = {
        "state/u1": cg1_vector(),
        "state/v1": cg1_vector(),
        "prop/emod": dg0_scalar(1.0),
        "prop/nu": const_scalar(0.45),
    }
    expressions = ("stress_elastic", "strain_energy", "strain_energy_rate")

    def stress(self, geom, local):
        eps = strain_inf(grad_field(local["state/u1"], geom.grads))
        return stress_isotropic(eps, local["prop/emod"], local["prop/nu"])

    def cell_kernel(self, geom, local):
        return _stress_residual(self.stress(geom, local), geom)


class IsotropicIncompressibleElasticSwellingForm(BaseForm):
    """Incompressible swelling elasticity (reference: ``form.py:575-609``)."""

    COEFFICIENT_SPEC = {
        "state/u1": cg1_vector(),
        "prop/emod": dg0_scalar(1.0),
        "prop/v_swelling": dg0_scalar(1.0),
        "prop/k_swelling": dg0_scalar(1.0),
    }

    def stress(self, geom, local):
        eps = strain_inf(grad_field(local["state/u1"], geom.grads))
        nu = 0.5
        lame_mu = local["prop/emod"] / 2 / (1 + nu)
        v, k = local["prop/v_swelling"], local["prop/k_swelling"]
        tr = eps[0, 0] + eps[1, 1] + eps[2, 2]
        return 2 * lame_mu * eps + k * (tr - (v - 1.0)) * I3

    def cell_kernel(self, geom, local):
        return _stress_residual(self.stress(geom, local), geom)


class IsotropicElasticSwellingForm(BaseForm):
    """Gou2016 swelling hyperelasticity (reference: ``form.py:613-664``)."""

    COEFFICIENT_SPEC = {
        "state/u1": cg1_vector(),
        "prop/emod": dg0_scalar(1.0),
        "prop/nu": const_scalar(0.45),
        "prop/v_swelling": dg0_scalar(1.0),
        "prop/m_swelling": dg0_scalar(0.0),
    }

    def pk2(self, geom, local):
        grad_u = grad_field(local["state/u1"], geom.grads)
        E = strain_green_lagrange(grad_u)
        v, m = local["prop/v_swelling"], local["prop/m_swelling"]
        E_v = v ** (-2 / 3) * E + 0.5 * (v ** (-2 / 3) - 1.0) * I3
        mhat = m * (v - 1.0) + 1.0
        # NOTE: the reference hardcodes nu=0.45 here while declaring a
        # `nu` property (reference ``form.py:639``) — a known bug SURVEY
        # §2.12 says NOT to replicate; we honor the declared coefficient.
        S = (
            mhat
            * v ** (1 / 3)
            * stress_isotropic(E_v, local["prop/emod"], local["prop/nu"])
        )
        return S, def_grad(grad_u)

    def cell_kernel(self, geom, local):
        S, F = self.pk2(geom, local)
        return _pk2_residual(S, F, geom)


class IsotropicElasticSwellingPowerLawForm(BaseForm):
    """Power-law swelling hyperelasticity (reference: ``form.py:667-727``)."""

    COEFFICIENT_SPEC = {
        "state/u1": cg1_vector(),
        "state/v1": cg1_vector(),
        "prop/emod": dg0_scalar(1.0),
        "prop/nu": const_scalar(0.45),
        "prop/v_swelling": dg0_scalar(1.0),
        "prop/m_swelling": dg0_scalar(0.0),
    }

    def pk2(self, geom, local):
        grad_u = grad_field(local["state/u1"], geom.grads)
        E = strain_green_lagrange(grad_u)
        v, m = local["prop/v_swelling"], local["prop/m_swelling"]
        E_v = v ** (-2 / 3) * E + 0.5 * (v ** (-2 / 3) - 1.0) * I3
        mbar_v = v**m
        # honor the declared `prop/nu` (the reference hardcodes 0.45;
        # see IsotropicElasticSwellingForm.pk2 note / SURVEY §2.12)
        S = (
            mbar_v
            * v ** (1 / 3)
            * stress_isotropic(E_v, local["prop/emod"], local["prop/nu"])
        )
        return S, def_grad(grad_u)

    def cell_kernel(self, geom, local):
        S, F = self.pk2(geom, local)
        return _pk2_residual(S, F, geom)


class RayleighDampingForm(BaseForm):
    """Rayleigh damping (reference: ``form.py:918-956``)."""

    COEFFICIENT_SPEC = {
        "state/v1": cg1_vector(),
        "prop/rho": dg0_scalar(1.0),
        "prop/emod": dg0_scalar(1.0),
        "prop/nu": const_scalar(0.45),
        "prop/rayleigh_m": const_scalar(1.0),
        "prop/rayleigh_k": const_scalar(1.0),
    }

    def cell_kernel(self, geom, local):
        v_e = local["state/v1"]
        eps_rate = strain_inf(grad_field(v_e, geom.grads))
        stress_visco = local["prop/rayleigh_k"] * stress_isotropic(
            eps_rate, local["prop/emod"], local["prop/nu"]
        )
        res = _stress_residual(stress_visco, geom)
        v_q = interp(v_e, geom.bary)
        f = local["prop/rayleigh_m"] * local["prop/rho"] * v_q
        return res + _force_residual(f, geom)


class KelvinVoigtForm(BaseForm):
    """Kelvin-Voigt viscosity (reference: ``form.py:965-990``)."""

    COEFFICIENT_SPEC = {
        "state/v1": cg1_vector(),
        "prop/eta": dg0_scalar(1.0),
    }
    expressions = ("kv_stress", "kv_strain_rate")

    def stress(self, geom, local):
        return local["prop/eta"] * strain_inf(
            grad_field(local["state/v1"], geom.grads)
        )

    def cell_kernel(self, geom, local):
        return _stress_residual(self.stress(geom, local), geom)


class APForceForm(BaseForm):
    """Anterior-posterior force approximating 3D effects
    (reference: ``form.py:993-1033``).  The form's own value is
    ``-(stiffness + viscous)``."""

    COEFFICIENT_SPEC = {
        "state/u1": cg1_vector(),
        "state/v1": cg1_vector(),
        "prop/eta": dg0_scalar(1.0),
        "prop/emod": dg0_scalar(1.0),
        "prop/nu": const_scalar(0.45),
        "prop/u_ant": dg0_scalar(0.0),
        "prop/u_pos": dg0_scalar(0.0),
        "prop/length": dg0_scalar(1.0),
        "prop/muscle_stress": dg0_scalar(0.0),
    }

    def cell_kernel(self, geom, local):
        u_q = interp(local["state/u1"], geom.bary)
        v_q = interp(local["state/v1"], geom.bary)
        emod, nu = local["prop/emod"], local["prop/nu"]
        lame_mu = emod / 2 / (1 + nu)
        u_ant, u_pos = local["prop/u_ant"], local["prop/u_pos"]
        length = local["prop/length"]
        d2u = (u_ant - 2 * u_q + u_pos) / length**2
        d2v = (u_ant - 2 * v_q + u_pos) / length**2
        f_el = (lame_mu + local["prop/muscle_stress"]) * d2u
        f_vis = 0.5 * local["prop/eta"] * d2v
        return -_force_residual(f_el + f_vis, geom)


class ShapeForm(BaseForm):
    """Registers the mesh-shape parameter ``prop/umesh``
    (reference: ``form.py:1037-1062``).  The shape enters every other kernel
    through the traced vertex coordinates, so the kernel itself is zero."""

    COEFFICIENT_SPEC = {"prop/umesh": cg1_vector()}

    def cell_kernel(self, geom, local):
        nv, dim = geom.X.shape
        return jnp.zeros((nv, dim))


# -- Facet form classes -------------------------------------------------------


class SurfacePressureForm(BaseForm):
    """Follower pressure load via Nanson pullback
    (reference: ``form.py:733-756``)."""

    domain = "facet"
    COEFFICIENT_SPEC = {
        "state/u1": cg1_vector(),
        "control/p1": cg1_scalar(),
    }
    expressions = ("fluid_traction",)

    def facet_kernel(self, geom: FacetGeom, local):
        u_e = local["state/u1"]
        nv = u_e.shape[0]
        grad_u = grad_field(u_e, geom.grads)
        pn = pullback_area_normal(grad_u, geom.normal)  # (dim,)
        p_f = facet_restrict(local["control/p1"], geom.sel)  # (dimf,)
        p_q = facet_interp(p_f, geom.fbary)  # (nq,)
        t_q = -p_q[:, None] * pn[None, :]
        return _facet_force_residual(t_q, geom, nv)


class ManualSurfaceContactTractionForm(BaseForm):
    """Surface integral of a nodal contact traction
    (reference: ``form.py:759-794``).  The traction field itself is computed
    from the displacement by the model layer (cubic penalty,
    ``src/femvf/models/transient.py:538-552``), so differentiating the
    residual through it yields the contact stiffness automatically —
    replacing the reference's manual ``diagonalScale`` Jacobian fix-up."""

    domain = "facet"
    COEFFICIENT_SPEC = {
        "state/u1": cg1_vector(),
        "control/tcontact": cg1_vector(),
        "prop/ycontact": const_scalar(np.inf),
        "prop/ncontact": const_vector(),
        "prop/kcontact": const_scalar(1.0),
    }

    def facet_kernel(self, geom: FacetGeom, local):
        tc_e = local["control/tcontact"]
        nv = tc_e.shape[0]
        t_q = facet_interp(facet_restrict(tc_e, geom.sel), geom.fbary)
        return _facet_force_residual(t_q, geom, nv)


class IsotropicMembraneForm(BaseForm):
    """Isotropic elastic membrane (epithelium)
    (reference: ``form.py:800-855``)."""

    domain = "facet"
    COEFFICIENT_SPEC = {
        "state/u1": cg1_vector(),
        "prop/emod_membrane": dg0_scalar(0.0),
        "prop/nu_membrane": dg0_scalar(0.45),
        "prop/th_membrane": dg0_scalar(0.0),
    }

    def _planar_stress(self, geom, local, nu):
        dim = geom.X.shape[-1]
        eps = strain_inf(grad_field(local["state/u1"], geom.grads))
        from .elements import smallmat_mul

        n3 = jnp.concatenate([geom.normal, jnp.zeros(3 - dim)])
        P = I3 - n3[:, None] * n3[None, :]
        eps_pp = smallmat_mul(smallmat_mul(P, eps), P)
        emod = local["prop/emod_membrane"]
        mu = emod / 2 / (1 + nu)
        lmbda = emod * nu / (1 + nu) / (1 - 2 * nu)
        # plane-stress lambda, guarding the 0/0 at emod = 0
        # (reference: ``form.py:848-850``).  NOTE: the unselected branch must
        # not produce NaN — XLA TPU may rewrite select into arithmetic under
        # fused fast-math, leaking NaN*0; hence the guarded denominator.
        denom = jnp.where(emod == 0, 1.0, lmbda + 2 * mu)
        lmbda_pp = jnp.where(emod == 0, 0.0, 2 * mu * lmbda / denom)
        tr_pp = eps_pp[0, 0] + eps_pp[1, 1] + eps_pp[2, 2]
        return 2 * mu * eps_pp + lmbda_pp * tr_pp * P

    def facet_kernel(self, geom: FacetGeom, local):
        dim = geom.X.shape[-1]
        stress_pp = self._planar_stress(geom, local, local["prop/nu_membrane"])
        th = local["prop/th_membrane"]
        # integrand is constant over the facet; tests are all cell nodes
        nv = geom.grads.shape[0]
        rows = [
            [
                sum(geom.grads[v, j] * stress_pp[i, j] for j in range(dim))
                for i in range(dim)
            ]
            for v in range(nv)
        ]
        return geom.meas * th * jnp.stack(
            [jnp.stack(r, axis=-1) for r in rows], axis=-2
        )


class IsotropicIncompressibleMembraneForm(BaseForm):
    """Incompressible membrane (reference: ``form.py:862-912``)."""

    domain = "facet"
    COEFFICIENT_SPEC = {
        "state/u1": cg1_vector(),
        "prop/emod_membrane": dg0_scalar(0.0),
        "prop/th_membrane": dg0_scalar(0.0),
    }

    def facet_kernel(self, geom: FacetGeom, local):
        dim = geom.X.shape[-1]
        eps = strain_inf(grad_field(local["state/u1"], geom.grads))
        from .elements import smallmat_mul

        n3 = jnp.concatenate([geom.normal, jnp.zeros(3 - dim)])
        P = I3 - n3[:, None] * n3[None, :]
        eps_pp = smallmat_mul(smallmat_mul(P, eps), P)
        nu = 0.5
        lame_mu = local["prop/emod_membrane"] / 2 / (1 + nu)
        tr_pp = eps_pp[0, 0] + eps_pp[1, 1] + eps_pp[2, 2]
        stress_pp = 2 * lame_mu * eps_pp + 2 * lame_mu * tr_pp * P
        th = local["prop/th_membrane"]
        nv = geom.grads.shape[0]
        rows = [
            [
                sum(geom.grads[v, j] * stress_pp[i, j] for j in range(dim))
                for i in range(dim)
            ]
            for v in range(nv)
        ]
        return geom.meas * th * jnp.stack(
            [jnp.stack(r, axis=-1) for r in rows], axis=-2
        )
