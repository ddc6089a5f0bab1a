"""
Static (equilibrium) solvers.

The reference recovers statics from the transient forms by substituting
``u0 := u1`` so Newmark velocity/acceleration vanish
(reference: ``src/femvf/static.py:1-20``).  The solid model exposes exactly
that residual (``res_u_static``: v1 = a1 = 0) with a Newton solver; coupled
static configurations alternate solid and fluid solves (Picard)
(reference: ``static.py:197-254``).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from . import blocks as bv
from .models.transient import (
    BaseTransientFSIModel,
    SolidModel,
    _params_key,
)

Info = dict


def static_solid_configuration(
    model: SolidModel,
    control: bv.BlockVector,
    prop: bv.BlockVector,
    options: Optional[dict] = None,
):
    """
    Static configuration of a solid under a fixed control/property set
    (reference: ``static.py:67-168``).
    """
    params = _params_key(options)
    control_d = model.control_to_dict(control)
    prop_d = model.prop_to_dict(prop)
    u_guess = jnp.asarray(model.state0["u"])
    u1, info = model.solve_static_u1(u_guess, control_d, prop_d, params)
    state = bv.BlockVector(
        [np.asarray(u1), np.zeros(model.ndof), np.zeros(model.ndof)],
        labels=[("u", "v", "a")],
    )
    info_d = {
        "num_iter": int(info.num_iter),
        "abs_err": float(info.abs_err),
        "rel_err": float(info.rel_err),
    }
    return state, info_d


def static_coupled_configuration_picard(
    model: BaseTransientFSIModel,
    control: bv.BlockVector,
    prop: bv.BlockVector,
    options: Optional[dict] = None,
    max_iter: int = 50,
    abs_tol: float = 1e-8,
    rel_tol: float = 1e-11,
):
    """
    Fixed-point iteration over (solid static solve) <-> (fluid solve)
    (reference: ``static.py:197-254``).
    """
    params = _params_key(options)
    solid, fluid = model.solid, model.fluid
    prop_d = {k: jnp.asarray(v) for k, v in model.prop.sub_items()}
    for k, v in prop.sub_items():
        prop_d[k] = jnp.asarray(v)
    sl_prop = {k: prop_d[k] for k in model._solid_prop_keys}
    fl_prop = {k: prop_d[k] for k in model._fluid_prop_keys}
    control_d = {k: jnp.asarray(v) for k, v in control.sub_items()}

    u1 = jnp.asarray(model.solid.state0["u"])
    qp = {
        "q": jnp.zeros_like(jnp.asarray(fluid.state0["q"])),
        "p": jnp.zeros_like(jnp.asarray(fluid.state0["p"])),
    }

    # One jitted Picard iteration (cached on the model): running the
    # static Newton + fluid solve eagerly re-dispatches thousands of ops
    # per iteration — minutes per solve at CAD-mesh size, and the
    # accumulated tiny executables can exhaust the process mmap budget.
    piter = getattr(model, "_picard_iter_jit", None)
    if piter is None:

        def _piter(u1, qp, control_d, sl_prop, fl_prop, prop_d, params):
            p_solid = model._pressure_to_solid(qp["p"])
            u1_new, newton_info = solid.solve_static_u1(
                u1, {"p1": p_solid}, sl_prop, params
            )
            area = model._area_from_u1(u1_new, prop_d)
            fl_control = {"area": area, **control_d}
            qp_new = fluid.solve_pure(fl_control, fl_prop, qp)
            return u1_new, qp_new, newton_info

        piter = jax.jit(_piter, static_argnums=(6,))
        model._picard_iter_jit = piter

    info = {}
    err0 = None
    for it in range(max_iter):
        u1_new, qp_new, newton_info = piter(
            u1, qp, control_d, sl_prop, fl_prop, prop_d, params
        )

        err = float(
            np.linalg.norm(np.asarray(u1_new - u1))
            + np.linalg.norm(np.asarray(qp_new["p"] - qp["p"]))
        )
        u1, qp = u1_new, qp_new
        if err0 is None:
            err0 = err if err else 1.0
        info = {
            "num_iter": it + 1,
            "abs_err": err,
            "rel_err": err / err0,
        }
        if err < abs_tol or err < rel_tol * err0:
            break

    nsolid = model.solid.ndof
    state = bv.BlockVector(
        [
            np.asarray(u1),
            np.zeros(nsolid),
            np.zeros(nsolid),
            np.asarray(qp["q"]),
            np.asarray(qp["p"]),
        ],
        labels=[("u", "v", "a", "q", "p")],
    )
    return state, info


def static_coupled_configuration_newton(
    model: BaseTransientFSIModel,
    control: bv.BlockVector,
    prop: bv.BlockVector,
    options: Optional[dict] = None,
):
    """
    Static coupled solve via one transient step with a huge time step
    (dt -> 1e6 makes the Newmark terms negligible; reference rationale at
    ``static.py:1-20,259-295``).
    """
    model.set_prop(prop)
    model.set_control(control)
    model.dt = 1e6
    state0 = model.state0.copy()
    state0[:] = 0.0
    state, info = model.solve_state1(state0, options=options)
    return state, info
