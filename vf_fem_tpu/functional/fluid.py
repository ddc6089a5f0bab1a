"""
Fluid-state trajectory functionals
(reference: ``src/femvf/functional/fluid.py``).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .base import AbstractFunctional


def _tukey(n: int, alpha: float) -> jnp.ndarray:
    """Tukey (tapered cosine) window, matching scipy.signal.windows.tukey."""
    if alpha <= 0:
        return jnp.ones(n)
    if alpha >= 1:
        x = jnp.linspace(0, 1, n)
        return 0.5 * (1 - jnp.cos(2 * jnp.pi * x))
    x = jnp.linspace(0.0, 1.0, n)
    w = jnp.ones(n)
    left = x < alpha / 2
    right = x >= 1 - alpha / 2
    w = jnp.where(
        left, 0.5 * (1 + jnp.cos(2 * jnp.pi / alpha * (x - alpha / 2))), w
    )
    w = jnp.where(
        right,
        0.5 * (1 + jnp.cos(2 * jnp.pi / alpha * (x - 1 + alpha / 2))),
        w,
    )
    return w


class FluidFunctional(AbstractFunctional):
    pass


class FinalPressureNorm(FluidFunctional):
    """||p(T)||_2 (reference: ``functional/fluid.py:51-82``)."""

    def eval_traj(self, traj, times, controls, props):
        return jnp.linalg.norm(traj["p"][-1])


class FinalFlowRateNorm(FluidFunctional):
    """||q(T)|| (reference: ``functional/fluid.py:85-112``)."""

    def eval_traj(self, traj, times, controls, props):
        return jnp.linalg.norm(traj["q"][-1])


class AvgSubglottalPower(FluidFunctional):
    """Time-averaged subglottal power trapz(q * psub)/T
    (reference: ``functional/fluid.py:115-196``)."""

    default_constants = {"n_start": 0}

    def eval_traj(self, traj, times, controls, props):
        n0 = self.constants["n_start"]
        q = traj["q"][n0:, 0]
        # psub control history; held-last semantics make the stored control
        # trajectory aligned with states 1..T
        psub = controls["psub"][:, 0]
        n_q = q.shape[0]
        if psub.shape[0] != n_q:
            psub = jnp.broadcast_to(psub[-1], (n_q,))
        t = times[n0:]
        power = q * psub
        dt = jnp.diff(t)
        total = jnp.sum(0.5 * dt * (power[1:] + power[:-1]))
        return total / (t[-1] - t[0])


class AvgAcousticPower(FluidFunctional):
    """Mean radiated acoustic power via a piston-in-baffle radiation
    impedance of the windowed flow-rate spectrum
    (reference: ``functional/fluid.py:199-304``)."""

    default_constants = {
        "n_start": 0,
        "rho": 0.001225,
        "c": 350 * 1e2,
        "a": 0.5,
        "tukey_alpha": 0.05,
    }

    def eval_traj(self, traj, times, controls, props):
        n0 = self.constants["n_start"]
        q = traj["q"][n0:-1, 0]
        t = times[n0:-1]

        w = _tukey(q.shape[0], self.constants["tukey_alpha"])
        qw = w * q

        dft_qw = jnp.fft.fft(qw)
        dft_freq = jnp.fft.fftfreq(qw.shape[0], d=t[1] - t[0])

        rho = self.constants["rho"]
        c = self.constants["c"]
        a = self.constants["a"]
        k = 2 * jnp.pi * dft_freq / c
        z = 0.5 * (k * a) ** 2 + 1j * 8 * k * a / (3 * jnp.pi)
        z_rad = z * rho * c / (jnp.pi * a**2)

        psd = jnp.real(z_rad) * jnp.abs(dft_qw) ** 2
        n = qw.shape[0]
        return jnp.sum(psd) / n / n


class SubglottalWork(FluidFunctional):
    """Total subglottal work trapz(q * psub) over the run."""

    default_constants = {"n_start": 0}

    def eval_traj(self, traj, times, controls, props):
        n0 = self.constants["n_start"]
        q = traj["q"][n0:, 0]
        psub = controls["psub"][:, 0]
        if psub.shape[0] != q.shape[0]:
            psub = jnp.broadcast_to(psub[-1], q.shape)
        t = times[n0:]
        power = q * psub
        dt = jnp.diff(t)
        return jnp.sum(0.5 * dt * (power[1:] + power[:-1]))
