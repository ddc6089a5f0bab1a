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

Interactive update (Titze's source-filter interaction, made implicit
within the step):

1. solid Newton step with the previous fluid pressure (staggered, as in
   ``ExplicitFSIModel``),
2. the WRA half-step exposes the tract's *instantaneous* input-pressure
   law ``psup = z q + 2 b2`` (``acoustic.make_wra_parts``); the
   quasi-steady fluid and that law are solved together by a bracketed
   root solve on the scalar ``q`` (:func:`solve_flow_root`) — acoustic
   loading acts on the flow with zero delay.  (A one-step-lagged
   explicit exchange is marginally unstable here: the loop gain
   ``z dq/dp`` approaches 1 for narrow pharynx areas and the coupled
   run locks onto a delay oscillation.)
3. WRA full step driven by the converged glottal flow ``q1``.

The acoustic time step is geometry-locked (``dt = 2 L / (N c)``); drive
the model at that dt (``model.dt``), like the reference FSAI did.

The in-step root solve does not require the coupled source-tract map to
be a contraction, so strong-interaction configurations (narrow pharynx,
collision through the channel midline into the clamped-area regime)
step robustly; gradients through the solve are implicit-function exact.
Phonation-like setups should still place the contact plane below the
midline (``ycontact < ymid``) so collision stops closure at a positive
glottal area.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .. import blocks as bv
from .acoustic import WRAnalog
from .transient import (
    BaseTransientModel,
    ExplicitFSIModel,
    _params_key,
)

__all__ = ["ExplicitFSAIModel", "FSAISolveInfo", "solve_flow_root"]


class FSAISolveInfo(NamedTuple):
    """Per-step solver telemetry for the coupled FSAI step.

    Extends the solid Newton's ``SolveInfo`` with ``bracketed``: whether
    the interactive flow root solve bracketed a sign change.  A step
    with ``bracketed == False`` fell back to the one-step-LAGGED
    exchange — the scheme measured marginally unstable — so
    ``forward.finalize_run`` counts these and warns (the runtime half of
    the envelope guard; the static half is
    :meth:`ExplicitFSAIModel.check_envelope`)."""

    num_iter: jnp.ndarray
    abs_err: jnp.ndarray
    rel_err: jnp.ndarray
    bracketed: jnp.ndarray


def solve_flow_root(fluid_at, q0, n_expand=6, n_bisect=20):
    """Solve the interactive source-tract flow ``q = Q(psup(q))``.

    ``fluid_at(q)`` evaluates the quasi-steady fluid at the tract's
    instantaneous input pressure ``psup(q) = z q + 2 b2`` and returns the
    fluid state dict; ``q0`` is the previous-step flow (the lagged
    fallback).

    Method: bracketed bisection on ``g(q) = Q(psup(q)) - q``.  In the
    physical regime ``dQ/dpsup <= 0`` and ``dpsup/dq = z >= 0``, so ``g``
    is strictly decreasing (``g' <= -1``) and has a unique root —
    bisection converges *regardless of the loop gain*, unlike a damped
    Picard iteration which requires the coupled map to be a contraction
    (|z dQ/dpsup| < 1 breaks down for narrow pharynx / clamped-area
    configurations).  The bracket/bisection phase runs under
    ``stop_gradient``; the returned flow is polished with two
    differentiable chord-Newton steps at the converged root, which makes
    the gradients implicit-function-theorem exact without
    differentiating through the iteration.

    Falls back to the one-step-lagged evaluation if no sign change was
    bracketed (no root in reach — outside any physical regime).

    Budget: in-regime the initial interval ``[q0, f(q0)]`` already
    brackets (``g' <= -1``; n_expand is pure robustness margin, each
    iteration doubling the interval — 6 gives 64x growth) and
    ``n_bisect`` + the two quadratic polish steps set the accuracy.
    Measured on TPU (``benchmarks/probe_fsai.py``): trajectories are
    bit-identical in ``q`` to the conservative (12, 34) budget down to
    (4, 20) over 140 coupled M5 steps, while (2, 14) deviates (~4e-6);
    the step-rate gain is real but tunnel-noise-limited to measure at
    M5 scale (~20 fewer sequential fluid evaluations per step, one
    probe session showed 1.56x).  Override per run with the
    ``fsai_expand_iterations`` / ``fsai_bisect_iterations`` params.

    Returns ``(fluid_state_dict, bracketed)``.
    """
    sg = jax.lax.stop_gradient

    def f(q):
        return jnp.squeeze(fluid_at(q)["q"])

    def fng(q):  # primal-only evaluations for the bracketing phase
        return sg(f(sg(q)))

    q0s = sg(jnp.squeeze(q0))
    f0 = fng(q0s)
    a = jnp.minimum(q0s, f0)
    b = jnp.maximum(q0s, f0)
    w0 = jnp.maximum(b - a, 1e-3 * (1.0 + jnp.abs(q0s)))
    a = a - 0.05 * w0
    b = b + 0.05 * w0
    ga = fng(a) - a
    gb = fng(b) - b

    def expand(c, _):
        a, b, ga, gb, w = c
        need = ga * gb > 0.0
        a2 = jnp.where(need, a - w, a)
        b2 = jnp.where(need, b + w, b)
        ga2 = jnp.where(need, fng(a2) - a2, ga)
        gb2 = jnp.where(need, fng(b2) - b2, gb)
        return (a2, b2, ga2, gb2, 2.0 * w), None

    (a, b, ga, gb, _), _ = jax.lax.scan(
        expand, (a, b, ga, gb, w0), None, length=n_expand
    )
    bracketed = ga * gb <= 0.0

    def bisect(c, _):
        a, b, ga, gb = c
        m = 0.5 * (a + b)
        gm = fng(m) - m
        left = ga * gm <= 0.0
        return (
            jnp.where(left, a, m),
            jnp.where(left, m, b),
            jnp.where(left, ga, gm),
            jnp.where(left, gm, gb),
        ), None

    (a, b, _, _), _ = jax.lax.scan(
        bisect, (a, b, ga, gb), None, length=n_bisect
    )
    q_star = sg(0.5 * (a + b))

    # two differentiable chord-Newton polish steps at the root: values
    # converge quadratically-then-linearly past the bisection tolerance,
    # and d(q_out)/d(params) = -g_params/g' — the IFT gradient — since
    # q_star and g' carry no derivative.
    dg = sg(jax.grad(lambda q: f(q) - q)(q_star))
    # physically g' <= -1; guard the (measure-zero) g' ~ 0 pathology
    dg = jnp.where(jnp.abs(dg) < 0.25, -1.0, dg)
    q_ref = q_star - (f(q_star) - q_star) / dg
    q_ref = q_ref - (f(q_ref) - q_ref) / dg

    q_out = jnp.where(bracketed, q_ref, jnp.squeeze(q0))
    return fluid_at(q_out), bracketed


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
        from .acoustic import make_wra_parts

        fsi = self.fsi
        solid = self.solid
        fluid = self.fluid
        acoustic = self.acoustic
        fsi_keys = self._fsi_prop_keys
        ac_keys = self._ac_prop_keys
        half, full, input_coeffs = make_wra_parts(acoustic.num_tube)

        def split(prop):
            return (
                {k: prop[k] for k in fsi_keys},
                {k: prop[k] for k in ac_keys},
            )

        def sl_views(state):
            return {k: state[k] for k in ("u", "v", "a")}

        def solve_flow(u1, state0, control, prop, fl_prop, ac_prop,
                       params=_params_key(None)):
            """Interactive source: solve ``q`` against the tract's
            instantaneous input-pressure law ``psup = z q + 2 b2``
            jointly with the quasi-steady fluid (bracketed root solve —
            no contraction requirement; the law is exact for the WRA
            input junction)."""
            pinc_1 = half(state0["pinc"], state0["pref"], ac_prop)
            z0, b2_0 = input_coeffs(pinc_1, ac_prop)
            area = fsi._area_from_u1(u1, prop)
            proto = {"q": state0["q"], "p": state0["p"]}
            ext = {k: control[k] for k in self._ext_control_keys}

            def fluid_at(q):
                psup = (z0 * q + 2.0 * b2_0).reshape((1,))
                return fluid.solve_pure(
                    {"area": area, **ext, "psup": psup}, fl_prop, proto
                )

            pd = dict(params)
            qp, bracketed = solve_flow_root(
                fluid_at, state0["q"],
                n_expand=int(pd.get("fsai_expand_iterations", 6)),
                n_bisect=int(pd.get("fsai_bisect_iterations", 20)),
            )
            return qp, pinc_1, bracketed

        def step_with(solid_solve, state1_guess, state0, control, prop,
                      dt, params):
            fsi_prop, ac_prop = split(prop)
            sl_prop, fl_prop = fsi._split_prop(fsi_prop)
            p_solid = fsi._pressure_to_solid(state0["p"])
            uva1, info = solid_solve(
                sl_views(state1_guess), sl_views(state0),
                {"p1": p_solid}, sl_prop, dt, params,
            )
            qp1, pinc_1, bracketed = solve_flow(
                uva1["u"], state0, control, fsi_prop, fl_prop, ac_prop,
                params,
            )
            pinc1, pref1 = full(
                pinc_1, state0["pinc"], state0["pref"], qp1["q"], ac_prop
            )
            info = FSAISolveInfo(
                num_iter=info.num_iter,
                abs_err=info.abs_err,
                rel_err=info.rel_err,
                bracketed=bracketed,
            )
            return {**uva1, **qp1, "pinc": pinc1, "pref": pref1}, info

        def step_pure(state1_guess, state0, control, prop, dt,
                      params=_params_key(None)):
            return step_with(
                solid.solve_state1_pure, state1_guess, state0, control,
                prop, dt, params,
            )

        self.step_pure = step_pure

        def step_pure_fwd(state1_guess, state0, control, prop, dt,
                          params=_params_key(None)):
            return step_with(
                solid.solve_state1_pure_fwd, state1_guess, state0,
                control, prop, dt, params,
            )

        self.step_pure_fwd = step_pure_fwd

        def factorize(state0, control, prop, dt, params=_params_key(None)):
            fsi_prop, _ = split(prop)
            sl_prop, _ = fsi._split_prop(fsi_prop)
            p_solid = fsi._pressure_to_solid(state0["p"])
            return solid.factorize(
                sl_views(state0), {"p1": p_solid}, sl_prop, dt, params
            )

        self.factorize = factorize

        def refresh_factors(factors, state0, control, prop, dt,
                            params=_params_key(None)):
            fsi_prop, _ = split(prop)
            sl_prop, _ = fsi._split_prop(fsi_prop)
            p_solid = fsi._pressure_to_solid(state0["p"])
            return solid.refresh_factors(
                factors, sl_views(state0), {"p1": p_solid}, sl_prop, dt,
                params,
            )

        self.refresh_factors = refresh_factors

        def step_pure_stale(state1_guess, factors, state0, control, prop,
                            dt, params=_params_key(None)):
            def solve(guess, s0, ctrl, sp, dt_, prm):
                return solid.solve_state1_stale(
                    guess, factors, s0, ctrl, sp, dt_, prm
                )

            return step_with(
                solve, state1_guess, state0, control, prop, dt, params
            )

        self.step_pure_stale = step_pure_stale

        def res_pure(state1, state0, control, prop, dt):
            fsi_prop, ac_prop = split(prop)
            sl_prop, fl_prop = fsi._split_prop(fsi_prop)
            p_solid = fsi._pressure_to_solid(state0["p"])
            res_sl = solid.res_transient(
                sl_views(state1), sl_views(state0), {"p1": p_solid},
                sl_prop, dt,
            )
            # the coupled flow satisfies the fluid residual at the
            # tract's instantaneous input pressure psup(q1)
            pinc_1 = half(state0["pinc"], state0["pref"], ac_prop)
            z0, b2_0 = input_coeffs(pinc_1, ac_prop)
            area = fsi._area_from_u1(state1["u"], fsi_prop)
            psup = (z0 * jnp.squeeze(state1["q"]) + 2.0 * b2_0).reshape(
                (1,)
            )
            ext = {k: control[k] for k in self._ext_control_keys}
            res_fl = fluid.res_pure(
                {"q": state1["q"], "p": state1["p"]},
                {"area": area, **ext, "psup": psup},
                fl_prop,
            )
            pinc1, pref1 = full(
                pinc_1, state0["pinc"], state0["pref"], state1["q"],
                ac_prop,
            )
            return {
                **res_sl,
                **res_fl,
                "pinc": state1["pinc"] - pinc1,
                "pref": state1["pref"] - pref1,
            }

        self.res_pure = res_pure

    def check_envelope(self, prop: Optional[dict] = None) -> bool:
        """Warn when the configuration leaves the supported FSAI envelope.

        Supported regime: the contact plane BELOW the channel midline
        (``ycontact < ymid``), so collision stops closure at a positive
        glottal area.  At/above the midline (or with no contact plane at
        all, the ``ycontact = inf`` default) large oscillations can drive
        the fluid into the clamped-area regime where the interactive
        ``q`` fixed point has no physical root and steps silently fall
        back to the LAGGED exchange — the scheme measured marginally
        unstable (module docstring).  ``forward.integrate`` calls this
        with the run's property dict; the runtime complement is the
        per-step ``bracketed`` telemetry (``FSAISolveInfo``).

        Returns True when inside the envelope."""
        if prop is None:
            prop = {k: np.asarray(v) for k, v in self.prop.sub_items()}
        yc = float(np.asarray(prop["ycontact"]).ravel()[0])
        ymid = float(np.asarray(prop["ymid"]).ravel()[0])
        if not yc < ymid:
            import warnings

            warnings.warn(
                "FSAI configuration outside the supported envelope: the"
                f" contact plane (ycontact={yc:g}) must lie BELOW the"
                f" channel midline (ymid={ymid:g}) so collision stops"
                " closure at a positive glottal area.  In the clamped-"
                "area regime the interactive flow solve can fail to"
                " bracket and steps fall back to the marginally-unstable"
                " lagged exchange (watch the 'lagged_fallback_steps'"
                " run info).",
                RuntimeWarning,
            )
            return False
        return True

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
