"""
1D wave-reflection-analog (WRA) vocal tract acoustics.

The reference kept this model as commented-out legacy code "in case you want
to update it" (reference: ``src/femvf/models/transient.py:1147-1595``) while
its functionals stayed live; this is the working reimplementation the SURVEY
calls for (section 2.12), as a pure jittable JAX model.

The tract is N equal-length tube segments; the state holds interlaced
forward/backward partial pressures at even junctions:

- ``pinc`` (incident: f1, b2 interlaced), ``pref`` (reflected: b1, f2),
  each of length ``(N//2 + 1) * 2``
- control: glottal flow ``qin``
- props: ``length, area (N,), proploss (N,), rhoac, soundspeed, rrad, lrad``

One acoustic step = reflections at odd junctions (half step) then at even
junctions including the flow-source input junction and the Story/Flanagan
piston radiation load at the mouth (R = 128/(9 pi^2),
L = 16/dt * a_piston / (3 pi c)).

The time step is pinned by tract geometry: dt = (2 L / N) / c.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from .. import blocks as bv
from ..solvers.newton import SolveInfo
from .transient import BaseTransientModel


def make_wra_parts(n_tube: int):
    """
    Return ``(half, full)``, the two phases of the WRA update
    (reference ``wra()``: ``transient.py:1310-1563``):

    - ``half(pinc, pref, prop) -> pinc_1``: reflections at odd junctions,
      producing the incident partial pressures at even junctions.  The
      glottal flow does not enter yet, so the input junction's incoming
      backward wave ``b2 = gamma2[0] * pinc_1[1]`` — and hence the
      tract's instantaneous input pressure ``p = z q + 2 b2`` — is
      available *before* choosing ``q``.  This is what lets the FSAI
      model couple the source and tract implicitly within one step
      (``models.fsai``).
    - ``full(pinc_1, pinc, pref, qin, prop) -> (pinc1, pref1)``:
      reflections at even junctions including the flow-source input and
      the piston radiation load.
    """
    assert n_tube % 2 == 0

    def _setup(prop):
        area = prop["area"]
        gamma = prop["proploss"]
        rho = prop["rhoac"][0]
        c = prop["soundspeed"][0]
        length = prop["length"][0]
        dt = (2 * length / n_tube) / c

        # piston radiation constants (Story & Flanagan)
        piston_rad = jnp.sqrt(area[-1] / jnp.pi)
        R = 128.0 / (9 * jnp.pi**2)
        L = 16.0 / dt * piston_rad / (3 * jnp.pi * c)

        # areas/losses left (1) and right (2) of even junctions; the end
        # entries are fictitious
        a1 = jnp.concatenate([jnp.ones(1), area[1::2]])
        a2 = jnp.concatenate([area[:-1:2], jnp.ones(1)])
        gamma1 = jnp.concatenate([jnp.ones(1), gamma[1::2]])
        gamma2 = jnp.concatenate([gamma[:-1:2], jnp.ones(1)])
        z1 = rho * c / a1
        z2 = rho * c / a2
        return a1, a2, gamma1, gamma2, z1, z2, R, L

    def half(pinc, pref, prop):
        a1, a2, gamma1, gamma2, z1, z2, R, L = _setup(prop)

        def reflect05(pinc_05):
            z1_, z2_ = z2[:-1], z1[1:]
            g1_, g2_ = gamma2[:-1], gamma1[1:]
            f1 = g1_ * pinc_05[:-1:2]
            b2 = g2_ * pinc_05[1::2]
            r = (z2_ - z1_) / (z2_ + z1_)
            b1 = b2 + (f1 - b2) * r
            f2 = f1 + (f1 - b2) * r
            return jnp.stack([b1, f2], axis=-1).reshape(-1)

        # half step: reflected (even) -> incident at odd junctions
        b1, f2 = pref[:-1:2], pref[1::2]
        pinc_05 = jnp.stack([f2[:-1], b1[1:]], axis=-1).reshape(-1)
        pref_05 = reflect05(pinc_05)
        b1_05, f2_05 = pref_05[:-1:2], pref_05[1::2]

        f1_1 = jnp.concatenate([jnp.zeros(1), f2_05])
        b2_1 = jnp.concatenate([b1_05, jnp.zeros(1)])
        return jnp.stack([f1_1, b2_1], axis=-1).reshape(-1)

    def full(pinc_1, pinc, pref, qin, prop):
        a1, a2, gamma1, gamma2, z1, z2, R, L = _setup(prop)

        def inputq(q, pinc_inp):
            z, g = z2[0], gamma2[0]
            f1, b2 = pinc_inp[0], pinc_inp[1]
            b2 = g * b2
            f2 = z * q + b2
            b1 = b2 + f2 - f1
            return jnp.array([b1, f2])

        def radiation(pinc_rad, pinc_rad_prev, pref_rad_prev):
            g = gamma1[-1]
            f1prev = pinc_rad_prev[0]
            b1prev, f2prev = pref_rad_prev[0], pref_rad_prev[1]
            f1 = g * pinc_rad[0]
            _a1 = -R + L - R * L
            _a2 = -R - L + R * L
            _b1 = -R + L + R * L
            _b2 = R + L + R * L
            b1 = 1 / _b2 * (f1 * _a2 + f1prev * _a1 + b1prev * _b1)
            f2 = 1 / _b2 * (
                f2prev * _b1 + f1 * (_b2 + _a2) + f1prev * (_a1 - _b1)
            )
            return jnp.array([b1, f2])

        def reflect00(pinc_1, pinc_prev, pref_prev, q):
            f1 = gamma1 * pinc_1[:-1:2]
            b2 = gamma2 * pinc_1[1::2]
            r1 = (z2 - z1) / (z2 + z1)
            f2int = (f1 + (f1 - b2) * r1)[1:-1]
            b1int = (b2 + (f1 - b2) * r1)[1:-1]
            pref_int = jnp.stack([b1int, f2int], axis=-1).reshape(-1)
            pref_inp = inputq(q, pinc_1[:2])
            pref_rad = radiation(pinc_1[-2:], pinc_prev[-2:], pref_prev[-2:])
            return jnp.concatenate([pref_inp, pref_int, pref_rad])

        return pinc_1, reflect00(pinc_1, pinc, pref, jnp.squeeze(qin))

    def input_coeffs(pinc_1, prop):
        """Instantaneous input-pressure law ``p = z q + 2 b2`` of the
        tract at this step: returns ``(z, b2)`` with ``b2`` the
        attenuated incoming backward wave at the input junction."""
        a1, a2, gamma1, gamma2, z1, z2, R, L = _setup(prop)
        return z2[0], gamma2[0] * pinc_1[1]

    return half, full, input_coeffs


def make_wra_step(n_tube: int):
    """
    Return ``step(pinc, pref, qin, prop) -> (pinc1, pref1)``, the pure WRA
    update (reference ``wra()``: ``transient.py:1310-1563``).
    """
    half, full, _ = make_wra_parts(n_tube)

    def step(pinc, pref, qin, prop):
        pinc_1 = half(pinc, pref, prop)
        return full(pinc_1, pinc, pref, qin, prop)

    return step


class WRAnalog(BaseTransientModel):
    """Transient WRA tract model (reference ``WRAnalog``,
    ``transient.py:1229-1295``)."""

    def __init__(self, num_tube: int = 44):
        assert num_tube % 2 == 0
        self.num_tube = num_tube
        n_junc2 = (num_tube // 2 + 1) * 2

        self.state0 = bv.BlockVector(
            (np.zeros(n_junc2), np.zeros(n_junc2)), labels=[("pinc", "pref")]
        )
        self.state1 = self.state0.copy()
        self.control = bv.BlockVector((np.zeros(1),), labels=[("qin",)])
        self.prop = bv.BlockVector(
            (
                np.full(1, 17.46),  # tract length ~17.5 cm
                np.ones(num_tube),
                np.full(num_tube, 1.0),
                np.full(1, 1.225e-3),
                np.full(1, 340e2),
                np.ones(1),
                np.ones(1),
            ),
            labels=[
                ("length", "area", "proploss", "rhoac", "soundspeed",
                 "rrad", "lrad")
            ],
        )

        self._step = make_wra_step(num_tube)

        def step_pure(state1_guess, state0, control, prop, dt, params=None):
            pinc1, pref1 = self._step(
                state0["pinc"], state0["pref"], control["qin"], prop
            )
            info = SolveInfo(
                num_iter=jnp.array(0),
                abs_err=jnp.array(0.0),
                rel_err=jnp.array(0.0),
            )
            return {"pinc": pinc1, "pref": pref1}, info

        self.step_pure = step_pure
        self.step_pure_fwd = step_pure

    # dt is geometry-locked (reference: ``transient.py:1188-1198``)
    @property
    def dt(self):
        n = self.num_tube
        length = float(self.prop["length"][0])
        c = float(self.prop["soundspeed"][0])
        return (2 * length / n) / c

    @dt.setter
    def dt(self, value):
        raise NotImplementedError(
            "You can't set the time step of a WRAnalog tube"
        )

    def set_ini_state(self, state):
        self.state0[:] = state

    def set_fin_state(self, state):
        self.state1[:] = state

    def set_control(self, control):
        self.control[:] = control

    def set_prop(self, prop):
        self.prop[:] = prop

    def control_to_dict(self, control):
        return {k: np.asarray(v) for k, v in control.sub_items()}

    def prop_to_dict(self, prop):
        return {k: np.asarray(v) for k, v in prop.sub_items()}

    def solve_state1(self, state1=None, options=None):
        state0 = {k: jnp.asarray(np.asarray(v)) for k, v in self.state0.sub_items()}
        control = {k: jnp.asarray(np.asarray(v)) for k, v in self.control.sub_items()}
        prop = {k: jnp.asarray(np.asarray(v)) for k, v in self.prop.sub_items()}
        out, info = self.step_pure(state0, state0, control, prop, self.dt)
        keys = ("pinc", "pref")
        return (
            bv.BlockVector([np.asarray(out[k]) for k in keys], labels=[keys]),
            {},
        )

    def assem_res(self):
        state1, _ = self.solve_state1()
        return bv.BlockVector(
            [
                np.asarray(self.state1[k]) - np.asarray(state1[k])
                for k in ("pinc", "pref")
            ],
            labels=[("pinc", "pref")],
        )


def input_and_output_impedance(model: WRAnalog, n: int = 2**12):
    """Impulse-response input/output impedances of the tract
    (reference: ``transient.py:1566-1595``), computed with a jitted scan."""
    step = model._step
    prop = {k: jnp.asarray(np.asarray(v)) for k, v in model.prop.sub_items()}
    n_junc2 = (model.num_tube // 2 + 1) * 2

    pinc0 = jnp.zeros(n_junc2)
    pref0 = jnp.zeros(n_junc2)
    # impulse input
    qimp = 1.0
    # seed the input junction with the impulse
    area = prop["area"]
    rho, c = prop["rhoac"][0], prop["soundspeed"][0]
    z0 = rho * c / area[0]
    pref0 = pref0.at[0].set(z0 * qimp)
    pref0 = pref0.at[1].set(z0 * qimp)

    @jax.jit
    def run(pinc0, pref0):
        def body(carry, _):
            pinc, pref = carry
            pinc1, pref1 = step(pinc, pref, jnp.zeros(1), prop)
            pinp = pinc1[0] + pref1[0]
            pout = pinc1[-1] + pref1[-1]
            return (pinc1, pref1), (pinp, pout)

        _, (pinp, pout) = jax.lax.scan(body, (pinc0, pref0), None, length=n - 1)
        return pinp, pout

    pinp_t, pout_t = run(pinc0, pref0)
    pinp = np.concatenate([[float(pinc0[0] + pref0[0])], np.asarray(pinp_t)])
    pout = np.concatenate([[float(pinc0[-1] + pref0[-1])], np.asarray(pout_t)])
    qinp = np.zeros(n)
    qinp[0] = qimp
    zinp = np.fft.fft(pinp) / np.fft.fft(qinp)
    zout = np.fft.fft(pout) / np.fft.fft(qinp)
    return zinp, zout
