"""
1D quasi-steady Bernoulli fluid residuals.

The reference already defines these in JAX
(reference: ``src/femvf/residuals/fluid.py``); this module reimplements the
same physics functionally (no in-place dict mutation, so the residuals are
safely jit/vmap/grad-able) with the same state/control/prop layouts:

- state ``{q, p}``; control ``{area, psub|qsub, psup}``; props per variant
- multiple stacked 1D channels via leading dims of the interface coordinate
  array ``s`` (extruded-3D meshes; reference ``fluid.py:70-71``)

Core Bernoulli relations (reference ``fluid.py:17-34``):
``q = sign(dp) * sqrt(2/rho |dp| / (asep^-2 - asub^-2))`` and
``p = psep + rho q^2 (asep^-2 - a^-2) / 2``.
"""

from __future__ import annotations

import numpy as np
import jax
from jax import numpy as jnp

from ..equations.smoothapprox import smooth_min_weight, wavg
from .base import JaxResidual


# NaN guard at full glottal closure: area -> 0 makes area**-2 -> inf,
# whose reverse-mode gradient is NaN even where the primal is finite
# (measured: shape sweeps that close the glottis through umesh returned
# NaN d/d(umesh) while the loss stayed finite).  The floor is far below
# any phonatory area (q at 1e-8 cm^2 is ~4e-5 cm^3/s), so it changes no
# physics — closed nodes just carry zero area-sensitivity.
# BernoulliAreaRatioSep already clamps via its explicit area_lb prop.
_AREA_FLOOR = 1e-8


def bernoulliq_from_psub_psep(psub, psep, area_sub, area_sep, rho):
    """Flow rate from the pressure drop (reference: ``fluid.py:17-27``)."""
    flow_sign = jnp.sign(psub - psep)
    q = (
        flow_sign
        * (2 / rho * jnp.abs(psub - psep) / (area_sep**-2 - area_sub**-2)) ** 0.5
    )
    return q


def bernoullip_from_q_psep(qsub, psep, area_sep, area, rho):
    """Pressure from the flow rate (reference: ``fluid.py:30-34``)."""
    return psep + 1 / 2 * rho * qsub**2 * (area_sep**-2 - area**-2)


class PredefinedFluidResidual(JaxResidual):
    """(reference: ``fluid.py:39-54``)"""

    def __init__(self, mesh: np.ndarray, *args, **kwargs):
        res, res_args = self._make_residual(np.asarray(mesh), *args, **kwargs)
        super().__init__(res, res_args)
        self._mesh = np.asarray(mesh)

    def mesh(self):
        return self._mesh

    def _make_residual(self, mesh, *args, **kwargs):
        raise NotImplementedError("Subclasses must implement this method")


def _shapes(s: np.ndarray):
    shape_fluid = s.shape[:-1]
    n_fluid = int(np.prod(shape_fluid)) if shape_fluid else 1
    n_total = s.size
    return shape_fluid, n_fluid, n_total


def _reshape_qp_state(shape_fluid, state):
    return (
        state["q"].reshape(*shape_fluid, 1),
        state["p"].reshape(*shape_fluid, -1),
    )


def _reshape_control(shape_fluid, control, flow_key="psub"):
    return (
        control["area"].reshape(*shape_fluid, -1),
        control[flow_key].reshape(*shape_fluid, 1),
        control["psup"].reshape(*shape_fluid, 1),
    )


class BernoulliFixedSep(PredefinedFluidResidual):
    """Hard separation at a fixed index (reference: ``fluid.py:58-128``)."""

    def _make_residual(self, mesh, idx_sep: int = 0):
        s = mesh
        shape_fluid, n_fluid, n_total = _shapes(s)

        f = np.ones(s.shape)
        f[..., idx_sep + 1 :] = 0.0
        f = jnp.asarray(f)

        def bernoulli_qp(area, psub, psup, rho):
            area = jnp.maximum(area, _AREA_FLOOR)
            area_sep = area[..., idx_sep : idx_sep + 1]
            q = bernoulliq_from_psub_psep(psub, psup, jnp.inf, area_sep, rho)
            p = bernoullip_from_q_psep(q, psup, area_sep, area, rho)
            p = f * p + (1 - f) * psup
            return q, p

        def res(state, control, prop):
            q, p = _reshape_qp_state(shape_fluid, state)
            area, psub, psup = _reshape_control(shape_fluid, control)
            rho = prop["rho_air"].reshape(*shape_fluid, 1)
            q_, p_ = bernoulli_qp(area, psub, psup, rho)
            return {"q": (q - q_).reshape(-1), "p": (p - p_).reshape(-1)}

        _state = {"q": np.ones(n_fluid), "p": np.ones(n_total)}
        _control = {
            "area": np.ones(n_total),
            "psub": np.ones(n_fluid),
            "psup": np.ones(n_fluid),
        }
        _props = {"rho_air": np.ones(n_fluid)}
        return res, (_state, _control, _props)


class BernoulliSmoothMinSep(PredefinedFluidResidual):
    """Softmax smooth-min area + sigmoid separation cut-off
    (reference: ``fluid.py:131-220``).  Fully differentiable — the default
    variant for gradient-based studies."""

    def _make_residual(self, mesh):
        s = jnp.asarray(mesh)
        shape_fluid, n_fluid, n_total = _shapes(np.asarray(mesh))

        def coeff_sep(s_, ssep, zeta_sep):
            return jax.nn.sigmoid(-1 * (s_ - ssep) / zeta_sep)

        def bernoulli_qp(area, psub, psup, rho, zeta_min, zeta_sep):
            area = jnp.maximum(area, _AREA_FLOOR)
            wmin = smooth_min_weight(area, zeta_min, axis=-1)
            amin = wavg(s, area, wmin, axis=-1)[..., None]
            smin = wavg(s, s * jnp.ones_like(area), wmin, axis=-1)[..., None]
            asep, ssep = amin, smin
            q = bernoulliq_from_psub_psep(psub, psup, jnp.inf, asep, rho)
            p = bernoullip_from_q_psep(q, psup, asep, area, rho)
            f_sep = coeff_sep(s, ssep, zeta_sep)
            p = f_sep * p
            return q, p

        def res(state, control, prop):
            q, p = _reshape_qp_state(shape_fluid, state)
            area, psub, psup = _reshape_control(shape_fluid, control)
            rho = prop["rho_air"].reshape(*shape_fluid, 1)
            zeta_min = prop["zeta_min"].reshape(*shape_fluid, 1)
            # NOTE: the reference reshapes 'zeta_sep' from 'zeta_min' —
            # an apparent slip (``fluid.py:157``); here each prop maps to
            # itself.
            zeta_sep = prop["zeta_sep"].reshape(*shape_fluid, 1)
            q_, p_ = bernoulli_qp(area, psub, psup, rho, zeta_min, zeta_sep)
            return {"q": (q - q_).reshape(-1), "p": (p - p_).reshape(-1)}

        _state = {"q": np.ones(n_fluid), "p": np.ones(n_total)}
        _control = {
            "area": np.ones(n_total),
            "psub": np.ones(n_fluid),
            "psup": np.ones(n_fluid),
        }
        _props = {
            "rho_air": np.ones(n_fluid),
            "zeta_sep": np.ones(n_fluid),
            "zeta_min": np.ones(n_fluid),
        }
        return res, (_state, _control, _props)


class BernoulliAreaRatioSep(PredefinedFluidResidual):
    """Separation where the area first exceeds ``r_sep * a_min`` downstream
    of the minimum (reference: ``fluid.py:223-311``).  Uses argmin-style
    masks, so it is forward-exact but non-smooth; prefer
    ``BernoulliSmoothMinSep`` when differentiating."""

    def _make_residual(self, mesh):
        s = jnp.asarray(mesh)
        shape_fluid, n_fluid, n_total = _shapes(np.asarray(mesh))

        def bernoulli_qp(area, psub, psup, rho, r_sep, area_lb):
            area = jnp.maximum(area, area_lb)
            amin = jnp.min(area, axis=-1, keepdims=True)
            idx_min = jnp.argmax(area == amin, axis=-1, keepdims=True)
            smin = jnp.take_along_axis(
                jnp.broadcast_to(s, area.shape), idx_min, axis=-1
            )

            asep = r_sep * amin
            # only coordinates downstream of the minimum can separate.
            # A large-but-finite sentinel (not inf) keeps the masked branch
            # NaN-free under fused TPU fast-math rewrites of select.
            big = jnp.asarray(1e30, dtype=area.dtype)
            _area = jnp.where(s >= smin, area, big)
            gap = jnp.abs(_area - asep)
            # nanargmin equivalent: inf entries never win
            idx_sep = jnp.argmin(gap, axis=-1, keepdims=True)
            ssep = jnp.take_along_axis(
                jnp.broadcast_to(s, area.shape), idx_sep, axis=-1
            )

            f_sep = (s < ssep).astype(area.dtype)

            q = bernoulliq_from_psub_psep(psub, psup, jnp.inf, asep, rho)
            p = bernoullip_from_q_psep(q, psup, asep, area, rho)
            p = f_sep * p + (1 - f_sep) * psup
            return q, p

        def res(state, control, prop):
            q, p = _reshape_qp_state(shape_fluid, state)
            area, psub, psup = _reshape_control(shape_fluid, control)
            rho = prop["rho_air"].reshape(*shape_fluid, 1)
            r_sep = prop["r_sep"].reshape(*shape_fluid, 1)
            area_lb = prop["area_lb"].reshape(*shape_fluid, 1)
            q_, p_ = bernoulli_qp(area, psub, psup, rho, r_sep, area_lb)
            return {"q": (q - q_).reshape(-1), "p": (p - p_).reshape(-1)}

        _state = {"q": np.ones(n_fluid), "p": np.ones(n_total)}
        _control = {
            "area": np.ones(n_total),
            "psub": np.ones(n_fluid),
            "psup": np.ones(n_fluid),
        }
        _props = {
            "rho_air": np.ones(n_fluid),
            "r_sep": np.ones(n_fluid),
            "area_lb": np.zeros(n_fluid),
        }
        return res, (_state, _control, _props)


class BernoulliFlowFixedSep(PredefinedFluidResidual):
    """Prescribed flow with fixed separation (reference: ``fluid.py:314-382``)."""

    def _make_residual(self, mesh, idx_sep: int = 0):
        s = mesh
        shape_fluid, n_fluid, n_total = _shapes(s)

        f = np.ones(s.shape)
        f[..., idx_sep + 1 :] = 0.0
        f = jnp.asarray(f)

        def bernoulli_qp(area, qsub, psup, rho):
            area = jnp.maximum(area, _AREA_FLOOR)
            area_sep = area[..., idx_sep : idx_sep + 1]
            p = bernoullip_from_q_psep(qsub, psup, area_sep, area, rho)
            p = f * p + (1 - f) * psup
            return qsub, p

        def res(state, control, prop):
            q, p = _reshape_qp_state(shape_fluid, state)
            area, qsub, psup = _reshape_control(shape_fluid, control, "qsub")
            rho = prop["rho_air"].reshape(*shape_fluid, 1)
            q_, p_ = bernoulli_qp(area, qsub, psup, rho)
            return {"q": (q - q_).reshape(-1), "p": (p - p_).reshape(-1)}

        _state = {"q": np.ones(n_fluid), "p": np.ones(n_total)}
        _control = {
            "area": np.ones(n_total),
            "qsub": np.ones(n_fluid),
            "psup": np.ones(n_fluid),
        }
        _props = {"rho_air": np.ones(n_fluid)}
        return res, (_state, _control, _props)
