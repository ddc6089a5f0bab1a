"""
Fluid measures (reference: ``src/femvf/postprocess/fluid.py``, whose import
is broken in the reference — SURVEY section 2.12; reimplemented working).
"""

from __future__ import annotations

import numpy as np

from .base import BaseStateMeasure


class BaseFluidMeasure(BaseStateMeasure):
    pass


class FlowRate(BaseFluidMeasure):
    """Glottal flow rate q."""

    def assem(self, state, control, prop):
        return np.asarray(state["q"]).copy()


class PressureField(BaseFluidMeasure):
    """1D channel pressure distribution p(s)."""

    def assem(self, state, control, prop):
        return np.asarray(state["p"]).copy()


class MinArea(BaseFluidMeasure):
    """Minimum channel area from the control history."""

    def assem(self, state, control, prop):
        return float(np.min(np.asarray(control["area"])))
