"""
Acoustic functionals (reference: ``src/femvf/functional/acoustic.py``).

These pair with the WRAnalog 1D wave-reflection vocal-tract model
(``vf_fem_tpu.models.acoustic``; the reference keeps its version commented
out at ``models/transient.py:1147-1595`` while the functionals remain,
``functional/acoustic.py:60-180``).  The acoustic state trajectory stores
incident/reflected wave amplitudes; the radiated pressure is their sum at
the mouth end.
"""

from __future__ import annotations

import jax.numpy as jnp

from .base import AbstractFunctional


class RmsRadiatedPressure(AbstractFunctional):
    """RMS radiated mouth pressure over the trajectory
    (reference: ``functional/acoustic.py:60-105``)."""

    default_constants = {"n_start": 0}

    def eval_traj(self, traj, times, controls, props):
        n0 = self.constants["n_start"]
        # mouth pressure = incident + reflected partial pressures at the
        # last junction
        prad = traj["pinc"][n0:, -1] + traj["pref"][n0:, -1]
        t = times[n0:]
        dt = jnp.diff(t)
        mean_sq = jnp.sum(0.5 * dt * (prad[1:] ** 2 + prad[:-1] ** 2)) / (
            t[-1] - t[0]
        )
        return jnp.sqrt(mean_sq)


class AcousticPower(AbstractFunctional):
    """Mean acoustic power radiated at the mouth
    (reference: ``functional/acoustic.py:108-180``)."""

    default_constants = {"n_start": 0, "rho": 0.001225, "c": 350e2}

    def eval_traj(self, traj, times, controls, props):
        n0 = self.constants["n_start"]
        # outgoing-wave power at the mouth: A * f^2 / (rho c) with f the
        # forward-travelling partial pressure at the last tract section
        f_wave = traj["pref"][n0:, -1]
        rho = props["rhoac"][0]
        c = props["soundspeed"][0]
        area = props["area"][-1]
        power = area * f_wave**2 / (rho * c)
        t = times[n0:]
        dt = jnp.diff(t)
        return jnp.sum(0.5 * dt * (power[1:] + power[:-1])) / (t[-1] - t[0])
