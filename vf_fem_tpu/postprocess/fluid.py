"""
Fluid measures (reference: ``src/femvf/postprocess/fluid.py``, whose import
is broken in the reference — SURVEY section 2.12; reimplemented working).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .base import BaseStateMeasure


class BaseFluidMeasure(BaseStateMeasure):
    pass


class FlowRate(BaseFluidMeasure):
    """Glottal flow rate q."""

    def assem_pure(self, state, control, prop):
        return jnp.asarray(state["q"])


class PressureField(BaseFluidMeasure):
    """1D channel pressure distribution p(s)."""

    def assem_pure(self, state, control, prop):
        return jnp.asarray(state["p"])


class MinArea(BaseFluidMeasure):
    """Minimum channel area from the control history."""

    def assem_pure(self, state, control, prop):
        return jnp.min(jnp.asarray(control["area"]))
