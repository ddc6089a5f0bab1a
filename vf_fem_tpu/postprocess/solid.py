"""
Solid field measures (reference: ``src/femvf/postprocess/solid.py``).

All stress/strain fields are DG0 (per-cell) and evaluated directly from the
constant P1 element gradients — the reference's cached-LU DG0 projections
(``postprocess/solid.py:600-654``) are unnecessary here.

Measures implement the traceable ``assem_pure`` (see ``postprocess.base``):
state/control entries may be JAX tracers (the batched ``TimeSeries`` path
vmaps over them), while ``prop`` stays host-side numpy.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..fem import assembly
from ..fem.continuum import (
    pressure_contact_cubic_penalty,
    strain_inf,
    stress_isotropic,
)
from ..fem.forms import grad_field
from .base import BaseStateMeasure


def _solid(model):
    return getattr(model, "solid", model)


def _cell_grads_of(model, w_flat):
    """(n_cells, dim, dim) constant gradients of a CG1 vector field."""
    solid = _solid(model)
    topo = solid.residual.topology
    dim = solid.dim
    w = jnp.asarray(w_flat).reshape(-1, dim)
    X = jnp.asarray(solid.residual.ref_mesh_coords)

    def per_cell(w_e, Xe):
        grads, vol = assembly.elements.cell_shape_gradients(Xe)
        return grad_field(w_e, grads), vol

    return jax.vmap(per_cell)(w[topo.cells], X[topo.cells])


def _stress_field(model, state, prop):
    """(n_cells, 3, 3) Cauchy stress (small strain)."""
    grads_u, vol = _cell_grads_of(model, state["u"])
    eps = jax.vmap(strain_inf)(grads_u)
    emod = jnp.asarray(np.asarray(prop["emod"]))
    nu = float(np.asarray(prop["nu"])[0])
    sig = jax.vmap(lambda e, E: stress_isotropic(e, E, nu))(eps, emod)
    return sig, eps, vol


class BaseSolidMeasure(BaseStateMeasure):
    pass


class StressI1Field(BaseSolidMeasure):
    """First stress invariant tr(sigma)
    (reference: ``postprocess/solid.py:88-110``)."""

    def assem_pure(self, state, control, prop):
        sig, _, _ = _stress_field(self.model, state, prop)
        return jnp.trace(sig, axis1=1, axis2=2)


class StressI2Field(BaseSolidMeasure):
    """Second stress invariant (reference: ``postprocess/solid.py:113-132``)."""

    def assem_pure(self, state, control, prop):
        sig, _, _ = _stress_field(self.model, state, prop)
        tr = jnp.trace(sig, axis1=1, axis2=2)
        tr2 = jnp.trace(sig @ sig, axis1=1, axis2=2)
        return 0.5 * (tr**2 - tr2)


class StressI3Field(BaseSolidMeasure):
    """Third stress invariant det(sigma)
    (reference: ``postprocess/solid.py:135-146``)."""

    def assem_pure(self, state, control, prop):
        sig, _, _ = _stress_field(self.model, state, prop)
        return jnp.linalg.det(sig)


class StressHydrostaticField(BaseSolidMeasure):
    """-tr(sigma)/3 (reference: ``postprocess/solid.py:150-166``)."""

    def assem_pure(self, state, control, prop):
        sig, _, _ = _stress_field(self.model, state, prop)
        return -jnp.trace(sig, axis1=1, axis2=2) / 3


class StressVonMisesField(BaseSolidMeasure):
    """Von Mises stress (reference: ``postprocess/solid.py:169-186``)."""

    def assem_pure(self, state, control, prop):
        sig, _, _ = _stress_field(self.model, state, prop)
        tr = jnp.trace(sig, axis1=1, axis2=2)
        dev = sig - tr[:, None, None] / 3 * jnp.eye(3)
        j2 = 0.5 * jnp.sum(dev * dev, axis=(1, 2))
        return jnp.sqrt(3 * j2)


class ElasticStressField(BaseSolidMeasure):
    """Full elastic stress tensor field
    (reference: ``postprocess/solid.py:189-201``)."""

    def assem_pure(self, state, control, prop):
        sig, _, _ = _stress_field(self.model, state, prop)
        return sig


class StrainEnergy(BaseSolidMeasure):
    """Total strain energy integral sigma:eps dx
    (reference: ``postprocess/solid.py:204-219``)."""

    def assem_pure(self, state, control, prop):
        sig, eps, vol = _stress_field(self.model, state, prop)
        return jnp.sum(vol * jnp.sum(sig * eps, axis=(1, 2)))


class StrainEnergyRate(BaseSolidMeasure):
    """d/dt of strain energy: 2 sigma(v):eps(u) style rate
    (reference: ``postprocess/solid.py:222-232``)."""

    def assem_pure(self, state, control, prop):
        sig, eps, vol = _stress_field(self.model, state, prop)
        grads_v, _ = _cell_grads_of(self.model, state["v"])
        eps_rate = jax.vmap(strain_inf)(grads_v)
        return 2 * jnp.sum(vol * jnp.sum(sig * eps_rate, axis=(1, 2)))


class PositiveStrainEnergyRate(BaseSolidMeasure):
    """max(0, strain energy rate) (reference: ``postprocess/solid.py:235-244``)."""

    def assem_pure(self, state, control, prop):
        rate = StrainEnergyRate(self.model).assem_pure(state, control, prop)
        return jnp.maximum(0.0, rate)


class ContactPressureField(BaseSolidMeasure):
    """Nodal penalty contact pressure (reference: ``postprocess/solid.py:248-268``)."""

    def assem_pure(self, state, control, prop):
        solid = _solid(self.model)
        dim = solid.dim
        X = np.asarray(solid.residual.ref_mesh_coords)
        u = jnp.asarray(state["u"]).reshape(-1, dim)
        n = np.asarray(prop["ncontact"])
        y = float(np.asarray(prop["ycontact"])[0])
        k = float(np.asarray(prop["kcontact"])[0])
        gap = (X + u) @ n - y
        return pressure_contact_cubic_penalty(gap, k)


class ViscousDissipationField(BaseSolidMeasure):
    """Per-cell KV dissipation density eta * eps_rate:eps_rate
    (reference: ``postprocess/solid.py:272-287``)."""

    def assem_pure(self, state, control, prop):
        grads_v, vol = _cell_grads_of(self.model, state["v"])
        rate = jax.vmap(strain_inf)(grads_v)
        eta = jnp.asarray(np.asarray(prop["eta"]))
        return eta * jnp.sum(rate * rate, axis=(1, 2))


class ViscousDissipationRate(BaseSolidMeasure):
    """Total KV dissipation rate (reference: ``postprocess/solid.py:430-446``)."""

    def assem_pure(self, state, control, prop):
        grads_v, vol = _cell_grads_of(self.model, state["v"])
        rate = jax.vmap(strain_inf)(grads_v)
        eta = jnp.asarray(np.asarray(prop["eta"]))
        return jnp.sum(vol * eta * jnp.sum(rate * rate, axis=(1, 2)))


class ContactAreaDensity(BaseSolidMeasure):
    """Indicator of nodal contact (gap > 0)
    (reference: ``postprocess/solid.py:290-307``)."""

    def assem_pure(self, state, control, prop):
        solid = _solid(self.model)
        dim = solid.dim
        X = np.asarray(solid.residual.ref_mesh_coords)
        u = jnp.asarray(state["u"]).reshape(-1, dim)
        n = np.asarray(prop["ncontact"])
        y = float(np.asarray(prop["ycontact"])[0])
        gap = (X + u) @ n - y
        return (gap > 0).astype(float)


class XMomentum(BaseSolidMeasure):
    """Total x-momentum integral rho v_x dx
    (reference: ``postprocess/solid.py:335-356``)."""

    component = 0

    def assem_pure(self, state, control, prop):
        solid = _solid(self.model)
        topo = solid.residual.topology
        dim = solid.dim
        v = jnp.asarray(state["v"]).reshape(-1, dim)
        X = jnp.asarray(solid.residual.ref_mesh_coords)
        rho = jnp.asarray(np.asarray(prop["rho"]))
        comp = self.component

        def per_cell(v_e, rho_c, Xe):
            grads, vol = assembly.elements.cell_shape_gradients(Xe)
            v_q = topo.cell_bary @ v_e
            return rho_c * vol * jnp.sum(topo.cell_qw * v_q[:, comp])

        return jnp.sum(jax.vmap(per_cell)(v[topo.cells], rho, X[topo.cells]))


class YMomentum(XMomentum):
    """(reference: ``postprocess/solid.py:358-379``)"""

    component = 1


class FieldStats(BaseSolidMeasure):
    """(max, min, avg, total) of another field measure
    (reference: ``postprocess/solid.py:449-481``)."""

    def __init__(self, model, field_measure: BaseStateMeasure, **kwargs):
        super().__init__(model, **kwargs)
        self.field = field_measure

    def assem_pure(self, state, control, prop):
        vals = self.field.assem_pure(state, control, prop)
        return {
            "max": vals.max(),
            "min": vals.min(),
            "avg": vals.mean(),
            "total": vals.sum(),
        }


def _surface_areas(model, state, prop):
    """Per-interface-dof channel areas 2*(ymid - y_surface)."""
    solid = _solid(model)
    dim = solid.dim
    X = np.asarray(solid.residual.ref_mesh_coords)
    u = jnp.asarray(state["u"]).reshape(-1, dim)
    sdofs = np.asarray(model._solid_dofs)
    ymid = float(np.asarray(prop["ymid"])[0])
    y_srf = (X + u)[sdofs, 1]
    return 2.0 * (ymid - y_srf)


class MeanGlottalWidth(BaseSolidMeasure):
    """Mean channel area over the interface
    (reference: ``postprocess/solid.py:487-501``)."""

    def assem_pure(self, state, control, prop):
        return jnp.mean(_surface_areas(self.model, state, prop))


class MidpointGlottalWidth(BaseSolidMeasure):
    """Channel area at the interface midpoint
    (reference: ``postprocess/solid.py:504-528``)."""

    def assem_pure(self, state, control, prop):
        areas = _surface_areas(self.model, state, prop)
        return areas[areas.shape[0] // 2]


class MinGlottalWidthFromSolid(BaseSolidMeasure):
    """Minimum glottal width from the solid surface
    (reference: ``postprocess/solid.py:531-550``)."""

    def assem_pure(self, state, control, prop):
        return jnp.min(_surface_areas(self.model, state, prop))


class VertexGlottalWidth(BaseSolidMeasure):
    """Glottal width at a named vertex
    (reference: ``postprocess/solid.py:553-597``)."""

    def __init__(self, model, vertex_name: str = "separation", **kwargs):
        super().__init__(model, **kwargs)
        solid = _solid(model)
        mesh = solid.residual.mesh()
        from ..mesh.interface import locate_separation_vertex

        self.vertex = locate_separation_vertex(mesh, vertex_name)

    def assem_pure(self, state, control, prop):
        solid = _solid(self.model)
        dim = solid.dim
        X = np.asarray(solid.residual.ref_mesh_coords)
        u = jnp.asarray(state["u"]).reshape(-1, dim)
        ymid = float(np.asarray(prop["ymid"])[0])
        y = (X + u)[self.vertex, 1]
        return 2.0 * (ymid - y)


class FSIPressure(BaseSolidMeasure):
    """Solid-side interface pressure values
    (reference: ``postprocess/solid.py:24-47``)."""

    def assem_pure(self, state, control, prop):
        model = self.model
        p = jnp.asarray(state["p"])
        sdofs = np.asarray(model._solid_dofs)
        fdofs = np.asarray(model._fluid_dofs)
        out = jnp.zeros(model.solid.nvert, dtype=p.dtype)
        return out.at[sdofs].set(p[fdofs])


class FluidTractionPowerDensity(BaseSolidMeasure):
    """Interface power density p * (cof(F) n) . v
    (reference: ``postprocess/solid.py:310-332``)."""

    def assem_pure(self, state, control, prop):
        from ..functional.fsi import _fluid_work_rate

        return _fluid_work_rate(
            self.model,
            jnp.asarray(state["u"]),
            jnp.asarray(state["v"]),
            jnp.asarray(state["p"]),
        )
