"""
Post-processing measures
(reference: ``src/femvf/postprocess/base.py``).

``BaseStateMeasure`` maps a single ``(state, control, prop)`` instant to a
value; ``TimeSeries`` maps it over a statefile; ``TimeSeriesStats``
aggregates.  Where the reference projects UFL expressions onto DG0 with
cached PETSc LU solves (reference: ``postprocess/solid.py:600-654``), the
P1 kernels here evaluate the expressions *directly* per cell — gradients of
P1 fields are constant per element, so the DG0 "projection" is exact
pointwise evaluation with no linear solve at all.
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np


class BaseStateMeasure:
    """Map an instant ``(state, control, prop)`` to a value
    (reference: ``postprocess/base.py:21-65``)."""

    def __init__(self, model, **kwargs):
        self.model = model
        self.kwargs = kwargs

    def __call__(self, state, control, prop):
        return self.assem(state, control, prop)

    def assem(self, state, control, prop):
        raise NotImplementedError


class TimeSeries:
    """Evaluate a measure at every stored state
    (reference: ``postprocess/base.py:138-175``)."""

    def __init__(self, measure: BaseStateMeasure):
        self.measure = measure

    @property
    def model(self):
        return self.measure.model

    def __call__(self, f, ns: Optional[range] = None):
        if ns is None:
            ns = range(f.size)
        prop = f.get_prop()
        # Post-processing is host-side analysis of stored trajectories:
        # pin the (eager, per-state) array ops to the local CPU device.
        # On remote-tunnelled TPU backends each eager op costs a network
        # round-trip (~0.2 s/state measured), a 20x+ slowdown for zero
        # benefit — the data starts and ends on the host.
        import jax

        out = []
        with jax.default_device(jax.devices("cpu")[0]):
            for n in ns:
                state = f.get_state(n)
                control = f.get_control(n)
                out.append(np.asarray(self.measure(state, control, prop)))
        return np.array(out)


class TimeSeriesStats:
    """Statistics of a time series (reference: ``postprocess/base.py:178-207``)."""

    def __init__(self, measure: BaseStateMeasure):
        self.series = TimeSeries(measure)

    def mean(self, f, **kwargs):
        return np.mean(self.series(f, **kwargs), axis=0)

    def min(self, f, **kwargs):
        return np.min(self.series(f, **kwargs), axis=0)

    def max(self, f, **kwargs):
        return np.max(self.series(f, **kwargs), axis=0)

    def total(self, f, **kwargs):
        return np.sum(self.series(f, **kwargs), axis=0)
