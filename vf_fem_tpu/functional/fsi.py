"""
FSI energy-transfer functionals
(reference: ``src/femvf/functional/fsi.py``).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..fem import assembly
from ..fem.continuum import pullback_area_normal
from ..fem.forms import grad_field
from .base import AbstractFunctional


def _fluid_work_rate(model, u_flat, v_flat, p_fluid):
    """
    Instantaneous fluid-to-solid power: integral over the interface of
    p * (cof(F) n) . v ds (reference: ``functional/fsi.py:47-196``).
    """
    solid = model.solid
    topo = solid.residual.topology
    dim = solid.dim
    u = u_flat.reshape(-1, dim)
    v = v_flat.reshape(-1, dim)
    X = jnp.asarray(solid.residual.ref_mesh_coords)
    # map fluid pressure to solid-side nodal values
    p_solid = jnp.zeros(solid.nvert, dtype=p_fluid.dtype).at[
        jnp.asarray(np.asarray(model._solid_dofs))
    ].set(p_fluid[jnp.asarray(np.asarray(model._fluid_dofs))])

    cell_verts = topo.cells[np.asarray(topo.facet_cells)]

    def per_facet(u_e, v_e, p_e, Xe, sel, opp_sel):
        geom = assembly.make_facet_geom(Xe, sel, opp_sel, topo)
        grad_u = grad_field(u_e, geom.grads)
        pn = pullback_area_normal(grad_u, geom.normal)
        p_q = geom.fbary @ (sel.T @ p_e)
        v_q = geom.fbary @ (sel.T @ v_e)
        power_q = p_q * (v_q @ pn)
        return geom.meas * jnp.sum(geom.fqw * power_q)

    return jnp.sum(
        jax.vmap(per_facet)(
            u[cell_verts],
            v[cell_verts],
            p_solid[cell_verts],
            X[cell_verts],
            topo.facet_sel,
            topo.facet_opp_sel,
        )
    )


class TransferWorkbyVelocity(AbstractFunctional):
    """Total work transferred to the solid, time-integrated p cof(F)n . v
    (reference: ``functional/fsi.py:47-196``)."""

    default_constants = {"n_start": 0}

    def eval_traj(self, traj, times, controls, props):
        n0 = self.constants["n_start"]
        rates = jax.vmap(
            lambda u, v, p: _fluid_work_rate(self.model, u, v, p)
        )(traj["u"][n0:], traj["v"][n0:], traj["p"][n0:])
        t = times[n0:]
        dt = jnp.diff(t)
        return jnp.sum(0.5 * dt * (rates[1:] + rates[:-1]))


class TransferWorkbyDisplacementIncrement(AbstractFunctional):
    """Work via displacement increments: sum_n integral p_n cof(F_n) n .
    (u_{n+1} - u_n) ds (reference: ``functional/fsi.py:199-309``)."""

    default_constants = {"n_start": 0}

    def eval_traj(self, traj, times, controls, props):
        n0 = self.constants["n_start"]
        u = traj["u"][n0:]
        p = traj["p"][n0:]
        du = u[1:] - u[:-1]
        works = jax.vmap(
            lambda u_n, du_n, p_n: _fluid_work_rate(
                self.model, u_n, du_n, p_n
            )
        )(u[:-1], du, p[:-1])
        return jnp.sum(works)
