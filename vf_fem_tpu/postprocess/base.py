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

Measures implement ``assem_pure(state, control, prop)``: a traceable
function of the state/control arrays (``prop`` is host-side, closed over
as constants).  ``TimeSeries`` exploits this to evaluate the whole stored
trajectory as ONE jitted ``vmap`` over the stacked states instead of
dispatching every array op eagerly per state (measured 10x+ on a
100-state file; the reference's per-state Python loop is
``postprocess/base.py:138-175``).
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

    def assem_pure(self, state, control, prop):
        """Traceable measure kernel: ``state``/``control`` entries may be
        JAX tracers; ``prop`` is host-side numpy."""
        raise NotImplementedError

    def assem(self, state, control, prop):
        import jax

        out = self.assem_pure(state, control, prop)
        return jax.tree_util.tree_map(np.asarray, out)


class BaseDerivedStateMeasure(BaseStateMeasure):
    """Extension point: a measure derived from another instant measure
    (reference: ``postprocess/base.py:68-86``).

    Subclasses implement ``assem_pure`` in terms of ``self.func``'s
    ``assem_pure`` — when they do, the derived measure batches under
    ``TimeSeries`` exactly like a primitive one."""

    def __init__(self, func: BaseStateMeasure):
        super().__init__(func.model)
        self.func = func


class BaseStateHistoryMeasure:
    """Extension point: a measure of a whole state *history* (statefile)
    (reference: ``postprocess/base.py:89-110``)."""

    def __init__(self, model, **kwargs):
        self.model = model
        self.kwargs = kwargs

    def __call__(self, f, **kwargs):
        return self.assem(f, **kwargs)

    def assem(self, f, **kwargs):
        raise NotImplementedError


class BaseDerivedStateHistoryMeasure(BaseStateHistoryMeasure):
    """History measure derived from an instant measure
    (reference: ``postprocess/base.py:113-135``)."""

    def __init__(self, func: BaseStateMeasure):
        super().__init__(func.model)
        self.func = func


class TimeSeries(BaseDerivedStateHistoryMeasure):
    """Evaluate a measure at every stored state
    (reference: ``postprocess/base.py:138-175``).

    When the measure implements ``assem_pure``, the whole series runs as
    one jitted ``vmap`` over the stacked trajectory; otherwise it falls
    back to the per-state loop.

    The wrapped measure is the base class's ``self.func`` (one source of
    truth — no duplicate alias).
    """

    def __call__(self, f, ns: Optional[range] = None):
        return self.assem(f, ns=ns)

    def _batched(self, f, ns):
        import jax
        import jax.numpy as jnp

        if len(ns) == 0:
            return np.array([])
        prop = f.get_prop()
        prop_d = {k: np.asarray(v) for k, v in prop.sub_items()}

        states = [f.get_state(n) for n in ns]
        controls = [f.get_control(n) for n in ns]
        sstack = {
            k: jnp.asarray(np.stack([np.asarray(s[k]) for s in states]))
            for k in states[0].keys()
        }
        cstack = {
            k: jnp.asarray(np.stack([np.asarray(c[k]) for c in controls]))
            for k in controls[0].keys()
        }

        # measures treat prop as host-side constants (python-float
        # conversions), so prop is closed over — key the compiled-fn
        # cache on its contents to avoid stale closures
        key = tuple(
            (k, prop_d[k].tobytes()) for k in sorted(prop_d)
        )
        cached = getattr(self.func, "_series_cache", None)
        if cached is not None and cached[0] == key:
            fn = cached[1]
        else:
            fn = jax.jit(
                jax.vmap(
                    lambda s, c: self.func.assem_pure(s, c, prop_d)
                )
            )
            self.func._series_cache = (key, fn)
        out = fn(sstack, cstack)
        return jax.tree_util.tree_map(np.asarray, out)

    def assem(self, f, ns: Optional[range] = None):
        if ns is None:
            ns = range(f.size)
        import jax

        # Post-processing is host-side analysis of stored trajectories:
        # pin the array ops to the local CPU device.  On remote-tunnelled
        # TPU backends each eager op costs a network round-trip (~0.2
        # s/state measured) and even the batched evaluation's inputs
        # start and end on the host.
        with jax.default_device(jax.devices("cpu")[0]):
            try:
                return self._batched(f, ns)
            except NotImplementedError:
                pass
            prop = f.get_prop()
            out = []
            for n in ns:
                state = f.get_state(n)
                control = f.get_control(n)
                out.append(np.asarray(self.func(state, control, prop)))
        return np.array(out)


class TimeSeriesStats(BaseDerivedStateHistoryMeasure):
    """Statistics of a time series (reference: ``postprocess/base.py:178-207``)."""

    def __init__(self, measure: BaseStateMeasure):
        super().__init__(measure)
        self.series = TimeSeries(measure)

    def assem(self, f, **kwargs):
        return self.mean(f, **kwargs)

    def std(self, f, **kwargs):
        return np.std(self.series(f, **kwargs), axis=0)

    def mean(self, f, **kwargs):
        return np.mean(self.series(f, **kwargs), axis=0)

    def min(self, f, **kwargs):
        return np.min(self.series(f, **kwargs), axis=0)

    def max(self, f, **kwargs):
        return np.max(self.series(f, **kwargs), axis=0)

    def total(self, f, **kwargs):
        return np.sum(self.series(f, **kwargs), axis=0)
