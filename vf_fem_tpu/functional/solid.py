"""
Solid-state trajectory functionals
(reference: ``src/femvf/functional/solid.py``).

Volume/surface integrals are evaluated with the same batched element
quadrature as the residual assembly; every derivative comes from autodiff
instead of the reference's hand-assembled UFL derivative forms.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..fem import assembly
from ..fem.continuum import strain_inf, stress_isotropic
from ..fem.forms import grad_field
from .base import AbstractFunctional


def _solid(model):
    return model.solid


def _cell_quad_sum(model, integrand_fn):
    """
    sum over cells of vol * sum_q w_q integrand(q) for a scalar integrand.

    ``integrand_fn(cell_index, bary_matrix, grads, X_e)`` -> (nq,) values.
    """
    solid = _solid(model)
    topo = solid.residual.topology
    X = jnp.asarray(solid.residual.ref_mesh_coords)

    def per_cell(c_idx, Xe):
        grads, vol = assembly.elements.cell_shape_gradients(Xe)
        vals = integrand_fn(c_idx, topo.cell_bary, grads, Xe)
        return vol * jnp.sum(topo.cell_qw * vals)

    n_cells = topo.cells.shape[0]
    return jnp.sum(
        jax.vmap(per_cell)(jnp.arange(n_cells), X[topo.cells])
    )


def _l2_volume_sq(model, w_flat):
    """integral over the domain of ||w||^2 for a CG1 vector field."""
    solid = _solid(model)
    topo = solid.residual.topology
    dim = solid.dim
    w = w_flat.reshape(-1, dim)
    X = jnp.asarray(solid.residual.ref_mesh_coords)

    def per_cell(w_e, Xe):
        grads, vol = assembly.elements.cell_shape_gradients(Xe)
        w_q = topo.cell_bary @ w_e  # (nq, dim)
        return vol * jnp.sum(topo.cell_qw * jnp.sum(w_q**2, axis=-1))

    return jnp.sum(jax.vmap(per_cell)(w[topo.cells], X[topo.cells]))


def _l2_surface_sq(model, w_flat):
    """integral over the 'pressure' surface of ||w||^2."""
    solid = _solid(model)
    topo = solid.residual.topology
    dim = solid.dim
    w = w_flat.reshape(-1, dim)
    X = jnp.asarray(solid.residual.ref_mesh_coords)
    cell_verts = topo.cells[np.asarray(topo.facet_cells)]

    def per_facet(w_e, Xe, sel, opp_sel):
        geom = assembly.make_facet_geom(Xe, sel, opp_sel, topo)
        w_f = sel.T @ w_e
        w_q = geom.fbary @ w_f
        return geom.meas * jnp.sum(geom.fqw * jnp.sum(w_q**2, axis=-1))

    return jnp.sum(
        jax.vmap(per_facet)(
            w[cell_verts], X[cell_verts], topo.facet_sel, topo.facet_opp_sel
        )
    )


def _elastic_energy(model, u_flat, props):
    """integral of sigma(u) : eps(u) (reference ``biform_k`` usage at
    ``functional/solid.py:481-520``)."""
    solid = _solid(model)
    topo = solid.residual.topology
    dim = solid.dim
    u = u_flat.reshape(-1, dim)
    X = jnp.asarray(solid.residual.ref_mesh_coords)
    emod = props["emod"]
    nu = props["nu"][0]

    def per_cell(u_e, e_c, Xe):
        grads, vol = assembly.elements.cell_shape_gradients(Xe)
        eps = strain_inf(grad_field(u_e, grads))
        sig = stress_isotropic(eps, e_c, nu)
        return vol * jnp.sum(sig * eps)

    return jnp.sum(jax.vmap(per_cell)(u[topo.cells], emod, X[topo.cells]))


def _kv_dissipation_rate(model, v_flat, props):
    """integral of eta * strain_rate : strain_rate
    (reference ``KVDampingWork`` form, ``functional/solid.py:586-700``)."""
    solid = _solid(model)
    topo = solid.residual.topology
    dim = solid.dim
    v = v_flat.reshape(-1, dim)
    X = jnp.asarray(solid.residual.ref_mesh_coords)
    eta = props["eta"]

    def per_cell(v_e, eta_c, Xe):
        grads, vol = assembly.elements.cell_shape_gradients(Xe)
        rate = strain_inf(grad_field(v_e, grads))
        return vol * eta_c * jnp.sum(rate * rate)

    return jnp.sum(jax.vmap(per_cell)(v[topo.cells], eta, X[topo.cells]))


def _trapz(y, t):
    dt = jnp.diff(t)
    return jnp.sum(0.5 * dt * (y[1:] + y[:-1]))


class SolidFunctional(AbstractFunctional):
    pass


class PeriodicError(SolidFunctional):
    """alpha^2 * ||u(T)-u(0)||_L2^2 + ||v(T)-v(0)||^2 + ||a(T)-a(0)||^2
    (reference: ``functional/solid.py:81-175``)."""

    default_constants = {"alpha": 1e3}

    def eval_traj(self, traj, times, controls, props):
        alpha = self.constants["alpha"]
        erru = _l2_volume_sq(self.model, traj["u"][-1] - traj["u"][0])
        errv = _l2_volume_sq(self.model, traj["v"][-1] - traj["v"][0])
        erra = _l2_volume_sq(self.model, traj["a"][-1] - traj["a"][0])
        return alpha**2 * erru + errv + erra


class ComponentPeriodicError(SolidFunctional):
    """Single-component periodic error
    (reference: ``functional/solid.py:178-242``)."""

    component = "u"

    def eval_traj(self, traj, times, controls, props):
        c = self.component
        return _l2_volume_sq(self.model, traj[c][-1] - traj[c][0])


class UPeriodicError(ComponentPeriodicError):
    component = "u"


class VPeriodicError(ComponentPeriodicError):
    component = "v"


class APeriodicError(ComponentPeriodicError):
    component = "a"


class PeriodicEnergyError(SolidFunctional):
    """Error in (kinetic + elastic) energy over a period
    (reference: ``functional/solid.py:245-339``)."""

    default_constants = {"alpha": 1.0}

    def _energy(self, u, v, props):
        solid = _solid(self.model)
        topo = solid.residual.topology
        dim = solid.dim
        v2 = v.reshape(-1, dim)
        X = jnp.asarray(solid.residual.ref_mesh_coords)
        rho = props["rho"]

        def kin_cell(v_e, rho_c, Xe):
            grads, vol = assembly.elements.cell_shape_gradients(Xe)
            v_q = topo.cell_bary @ v_e
            return 0.5 * rho_c * vol * jnp.sum(
                topo.cell_qw * jnp.sum(v_q**2, axis=-1)
            )

        kinetic = jnp.sum(
            jax.vmap(kin_cell)(v2[topo.cells], rho, X[topo.cells])
        )
        elastic = 0.5 * _elastic_energy(self.model, u, props)
        return kinetic + elastic

    def eval_traj(self, traj, times, controls, props):
        e0 = self._energy(traj["u"][0], traj["v"][0], props)
        eN = self._energy(traj["u"][-1], traj["v"][-1], props)
        return (eN - e0) ** 2


class FinalDisplacementNorm(SolidFunctional):
    """||u(T)||_L2 (reference: ``functional/solid.py:342-384``)."""

    def eval_traj(self, traj, times, controls, props):
        return jnp.sqrt(_l2_volume_sq(self.model, traj["u"][-1]))


class FinalVelocityNorm(SolidFunctional):
    """||v(T)||_L2 (reference: ``functional/solid.py:387-429``)."""

    def eval_traj(self, traj, times, controls, props):
        return jnp.sqrt(_l2_volume_sq(self.model, traj["v"][-1]))


class FinalSurfaceDisplacementNorm(SolidFunctional):
    """||u(T)||_L2 over the pressure surface
    (reference: ``functional/solid.py:432-478``)."""

    def eval_traj(self, traj, times, controls, props):
        return jnp.sqrt(_l2_surface_sq(self.model, traj["u"][-1]))


class ElasticEnergyDifference(SolidFunctional):
    """(E_elastic(T) - E_elastic(0))^2
    (reference: ``functional/solid.py:481-585``)."""

    def eval_traj(self, traj, times, controls, props):
        e0 = _elastic_energy(self.model, traj["u"][0], props)
        eN = _elastic_energy(self.model, traj["u"][-1], props)
        return (eN - e0) ** 2


class KVDampingWork(SolidFunctional):
    """Viscous dissipation integrated over time (trapezoid)
    (reference: ``functional/solid.py:586-813``)."""

    default_constants = {"n_start": 0}

    def eval_traj(self, traj, times, controls, props):
        n0 = self.constants["n_start"]
        rates = jax.vmap(
            lambda v: _kv_dissipation_rate(self.model, v, props)
        )(traj["v"][n0:])
        return _trapz(rates, times[n0:])


class KV3DDampingWork(SolidFunctional):
    """Approximate-3D viscous dissipation: the planar Kelvin–Voigt rate
    plus the anterior–posterior term ``eta |v|^2 / length^2`` from the
    second-z-derivative approximation with clamped anterior/posterior
    planes (reference ``functional/solid.py:586-614``:
    ``inner(eta*eps(v1), eps(v1)) + inner(-0.5*eta*(0-2v+0)/length^2, v1)``;
    pairs with ``APForceForm``, reference ``equations/form.py:993-1033``).

    Requires a ``length`` property (the AP fold length); defaults to 1 if
    the solid residual does not carry one.
    """

    default_constants = {"n_start": 0}

    def _rate(self, v_flat, props):
        solid = _solid(self.model)
        topo = solid.residual.topology
        dim = solid.dim
        v = v_flat.reshape(-1, dim)
        X = jnp.asarray(solid.residual.ref_mesh_coords)
        eta = props["eta"]
        length = props.get("length", jnp.ones(()))
        length = jnp.broadcast_to(jnp.asarray(length), eta.shape)

        def per_cell(v_e, eta_c, l_c, Xe):
            grads, vol = assembly.elements.cell_shape_gradients(Xe)
            rate = strain_inf(grad_field(v_e, grads))
            planar = vol * eta_c * jnp.sum(rate * rate)
            v_q = topo.cell_bary @ v_e  # (nq, dim)
            ap = vol * eta_c / l_c**2 * jnp.sum(
                topo.cell_qw * jnp.sum(v_q**2, axis=-1)
            )
            return planar + ap

        return jnp.sum(
            jax.vmap(per_cell)(v[topo.cells], eta, length, X[topo.cells])
        )

    def eval_traj(self, traj, times, controls, props):
        n0 = self.constants["n_start"]
        rates = jax.vmap(lambda v: self._rate(v, props))(traj["v"][n0:])
        return _trapz(rates, times[n0:])


class RayleighDampingWork(SolidFunctional):
    """Rayleigh-damping dissipation over time
    (reference: ``functional/solid.py:816-898``)."""

    default_constants = {"n_start": 0}

    def _rate(self, v_flat, props):
        solid = _solid(self.model)
        topo = solid.residual.topology
        dim = solid.dim
        v = v_flat.reshape(-1, dim)
        X = jnp.asarray(solid.residual.ref_mesh_coords)
        emod, nu = props["emod"], props["nu"][0]
        rho = props["rho"]
        ray_m = props["rayleigh_m"][0]
        ray_k = props["rayleigh_k"][0]

        def per_cell(v_e, e_c, rho_c, Xe):
            grads, vol = assembly.elements.cell_shape_gradients(Xe)
            rate = strain_inf(grad_field(v_e, grads))
            sig = ray_k * stress_isotropic(rate, e_c, nu)
            visc_stress = vol * jnp.sum(sig * rate)
            v_q = topo.cell_bary @ v_e
            visc_mass = ray_m * rho_c * vol * jnp.sum(
                topo.cell_qw * jnp.sum(v_q**2, axis=-1)
            )
            return visc_stress + visc_mass

        return jnp.sum(
            jax.vmap(per_cell)(v[topo.cells], emod, rho, X[topo.cells])
        )

    def eval_traj(self, traj, times, controls, props):
        n0 = self.constants["n_start"]
        rates = jax.vmap(lambda v: self._rate(v, props))(traj["v"][n0:])
        return _trapz(rates, times[n0:])


class GlottalWidthErrorNorm(SolidFunctional):
    """Sum-of-squares error between the model's glottal width signal and a
    measured one (reference: ``functional/solid.py:901-976``, which is
    partly broken — this is the working reimplementation).  Constants:
    ``gw_meas`` (the measured signal at each stored state) and
    ``smooth_min_alpha``."""

    default_constants = {"gw_meas": None, "smooth_min_alpha": -2000.0}

    def eval_traj(self, traj, times, controls, props):
        model = self.model
        solid = _solid(model)
        dim = solid.dim
        XREF = jnp.asarray(solid.residual.ref_mesh_coords)
        idx = jnp.asarray(np.asarray(model._solid_dofs))
        ymid = props["ymid"][0]
        alpha = self.constants["smooth_min_alpha"]

        def gw_of(u_flat):
            y_srf = (XREF + u_flat.reshape(-1, dim))[idx, 1]
            area = 2.0 * (ymid - y_srf)
            # smooth minimum via log-sum-exp
            return jax.nn.logsumexp(alpha * area) / alpha

        gw = jax.vmap(gw_of)(traj["u"])
        gw_meas = jnp.asarray(self.constants["gw_meas"])
        return jnp.sum((gw - gw_meas) ** 2)
