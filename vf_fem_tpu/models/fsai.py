"""
Coupled fluid-solid-acoustic interaction (FSAI).

The reference kept its coupled FSI + 1D vocal-tract model only as dead
code "in case you want to update it" (reference:
``src/femvf/models/transient.py:1147-1595``) while the acoustic
functionals stayed live.  This is the working two-way coupling: inside
every scanned step the glottal flow drives the wave-reflection-analog
tract, and the tract's glottal-end pressure feeds back as the fluid's
supraglottal boundary pressure — acoustic loading influences phonation,
not just the other way around.

Staggered-explicit update (consistent with ``ExplicitFSIModel``):

1. solid Newton step with the previous fluid pressure,
2. quasi-steady fluid solve with ``area(u1)``, ``psub`` from the
   control, and ``psup = pinc0[0] + pref0[0]`` (the tract's input-end
   pressure at the *previous* acoustic state),
3. WRA tract step driven by the new glottal flow ``q1``.

The acoustic time step is geometry-locked (``dt = 2 L / (N c)``); drive
the model at that dt (``model.dt``), like the reference FSAI did.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp

from .. import blocks as bv
from .acoustic import WRAnalog
from .transient import (
    BaseTransientModel,
    ExplicitFSIModel,
    _params_key,
)

__all__ = ["ExplicitFSAIModel"]


class ExplicitFSAIModel(BaseTransientModel):
    """Two-way coupled FSI + WRA acoustics.

    State ``[u, v, a, q, p, pinc, pref]``; control ``[psub]`` (``psup``
    is now internal — the tract provides it); props = FSI props +
    acoustic props.
    """

    def __init__(self, fsi: ExplicitFSIModel, acoustic: WRAnalog):
        self.fsi = fsi
        self.acoustic = acoustic
        self.solid = fsi.solid
        self.fluid = fsi.fluid

        self.state0 = bv.concatenate([fsi.state0, acoustic.state0])
        self.state1 = self.state0.copy()
        # the supraglottal pressure is coupled; remaining fluid controls
        # (psub or qsub) stay external
        ext_keys = [k for k in fsi.control.keys() if k != "psup"]
        self.control = fsi.control[ext_keys]
        self._ext_control_keys = ext_keys
        self.prop = bv.concatenate([fsi.prop, acoustic.prop])
        self._fsi_prop_keys = list(fsi.prop.keys())
        self._ac_prop_keys = list(acoustic.prop.keys())
        assert len(
            set(self._fsi_prop_keys) & set(self._ac_prop_keys)
        ) == 0, "FSI/acoustic property name collision"
        self._build_pure_fns()

    # -- pure functional core ------------------------------------------------
    def _build_pure_fns(self):
        fsi = self.fsi
        acoustic = self.acoustic
        fsi_keys = self._fsi_prop_keys
        ac_keys = self._ac_prop_keys
        wra = acoustic._step

        def split(prop):
            return (
                {k: prop[k] for k in fsi_keys},
                {k: prop[k] for k in ac_keys},
            )

        def psup_of(state):
            # tract input-junction pressure p = f + b, kept (1,)-shaped
            # to match the fluid's psup control
            return state["pinc"][:1] + state["pref"][:1]

        def fsi_views(state):
            fsi_state = {
                k: state[k] for k in ("u", "v", "a", "q", "p")
            }
            ac_state = {k: state[k] for k in ("pinc", "pref")}
            return fsi_state, ac_state

        def couple(step_out, state0, ac_prop):
            """Drive the tract with the step's new glottal flow."""
            pinc1, pref1 = wra(
                state0["pinc"], state0["pref"], step_out["q"], ac_prop
            )
            return {**step_out, "pinc": pinc1, "pref": pref1}

        def fsi_control(control, state0):
            c = {k: control[k] for k in self._ext_control_keys}
            c["psup"] = psup_of(state0)
            return c

        def step_pure(state1_guess, state0, control, prop, dt,
                      params=_params_key(None)):
            fsi_prop, ac_prop = split(prop)
            f_state0, _ = fsi_views(state0)
            f_guess, _ = fsi_views(state1_guess)
            out, info = fsi.step_pure(
                f_guess, f_state0, fsi_control(control, state0),
                fsi_prop, dt, params,
            )
            return couple(out, state0, ac_prop), info

        self.step_pure = step_pure

        def step_pure_fwd(state1_guess, state0, control, prop, dt,
                          params=_params_key(None)):
            fsi_prop, ac_prop = split(prop)
            f_state0, _ = fsi_views(state0)
            f_guess, _ = fsi_views(state1_guess)
            out, info = fsi.step_pure_fwd(
                f_guess, f_state0, fsi_control(control, state0),
                fsi_prop, dt, params,
            )
            return couple(out, state0, ac_prop), info

        self.step_pure_fwd = step_pure_fwd

        def factorize(state0, control, prop, dt, params=_params_key(None)):
            fsi_prop, _ = split(prop)
            f_state0, _ = fsi_views(state0)
            return fsi.factorize(
                f_state0, fsi_control(control, state0), fsi_prop, dt,
                params,
            )

        self.factorize = factorize

        def refresh_factors(factors, state0, control, prop, dt,
                            params=_params_key(None)):
            fsi_prop, _ = split(prop)
            f_state0, _ = fsi_views(state0)
            return fsi.refresh_factors(
                factors, f_state0, fsi_control(control, state0),
                fsi_prop, dt, params,
            )

        self.refresh_factors = refresh_factors

        def step_pure_stale(state1_guess, factors, state0, control, prop,
                            dt, params=_params_key(None)):
            fsi_prop, ac_prop = split(prop)
            f_state0, _ = fsi_views(state0)
            f_guess, _ = fsi_views(state1_guess)
            out, info = fsi.step_pure_stale(
                f_guess, factors, f_state0,
                fsi_control(control, state0), fsi_prop, dt, params,
            )
            return couple(out, state0, ac_prop), info

        self.step_pure_stale = step_pure_stale

        def res_pure(state1, state0, control, prop, dt):
            fsi_prop, ac_prop = split(prop)
            f_state1, _ = fsi_views(state1)
            f_state0, _ = fsi_views(state0)
            res = fsi.res_pure(
                f_state1, f_state0, fsi_control(control, state0),
                fsi_prop, dt,
            )
            pinc1, pref1 = wra(
                state0["pinc"], state0["pref"], state1["q"], ac_prop
            )
            res["pinc"] = state1["pinc"] - pinc1
            res["pref"] = state1["pref"] - pref1
            return res

        self.res_pure = res_pure

    # -- OO API ----------------------------------------------------------------
    @property
    def dt(self):
        """Geometry-locked acoustic time step (drive the model at this
        dt; reference ``transient.py:1188-1198``)."""
        return self.acoustic.dt

    @dt.setter
    def dt(self, value):
        ac_dt = self.acoustic.dt
        if abs(float(value) - ac_dt) > 1e-12 * ac_dt:
            raise ValueError(
                f"FSAI dt is locked to the tract: {ac_dt!r}"
            )
        self.fsi.dt = value

    def set_ini_state(self, state):
        self.state0[:] = state

    def set_fin_state(self, state):
        self.state1[:] = state

    def set_control(self, control):
        self.control[:] = control

    def set_prop(self, prop):
        self.prop[:] = prop
        for k in self._fsi_prop_keys:
            self.fsi.prop[k] = self.prop[k]
        for k in self._ac_prop_keys:
            self.acoustic.prop[k] = self.prop[k]
        self.fsi.set_prop(self.fsi.prop)

    def control_to_dict(self, control: bv.BlockVector) -> dict:
        return {k: np.asarray(v) for k, v in control.sub_items()}

    def prop_to_dict(self, prop: bv.BlockVector) -> dict:
        return {k: np.asarray(v) for k, v in prop.sub_items()}

    def _pytree_args(self):
        state0 = {k: np.asarray(v) for k, v in self.state0.sub_items()}
        control = {k: np.asarray(v) for k, v in self.control.sub_items()}
        prop = {k: np.asarray(v) for k, v in self.prop.sub_items()}
        return state0, control, prop

    def _jitted(self, name, fn, static_argnums=()):
        import jax

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
        return result, {
            "num_iter": int(info.num_iter),
            "abs_err": float(info.abs_err),
            "rel_err": float(info.rel_err),
        }

    def assem_res(self) -> bv.BlockVector:
        state1 = {k: np.asarray(v) for k, v in self.state1.sub_items()}
        state0, control, prop = self._pytree_args()
        res_fn = self._jitted("res_pure", self.res_pure)
        r = res_fn(state1, state0, control, prop, self.dt)
        keys = list(self.state1.keys())
        return bv.BlockVector(
            [np.asarray(r[k]) for k in keys], labels=[keys]
        )
