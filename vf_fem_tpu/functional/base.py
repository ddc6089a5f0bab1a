"""
Trajectory functionals.

The reference's ``AbstractFunctional`` maps a solved ``StateFile`` to a
scalar and requires hand-written derivatives ``eval_dstate/eval_dprops/
eval_ddt`` per subclass plus hand-written product/power rules for functional
algebra (reference: ``src/femvf/functional/base.py:39-433``).

Here every functional is defined by one pure function
``eval_traj(traj, times, controls, props)`` of the full stored trajectory
(dict of (T, n) arrays).  All derivatives — including the functional
algebra's — are ``jax.grad`` of that function, so subclasses write only the
forward formula.  The reference's per-file value caching is kept.
"""

from __future__ import annotations

import operator
import numpy as np
import jax
import jax.numpy as jnp

from .. import blocks as bv


def _load_statefile(model, f):
    """Load the full trajectory from a statefile as jnp-ready arrays."""
    traj = {k: np.asarray(v) for k, v in f.get_state_trajectory().items()}
    times = np.asarray(f.get_times())
    controls = {
        k: np.asarray(v) for k, v in f.get_control_trajectory().items()
    }
    try:
        props = {k: np.asarray(v) for k, v in f.get_prop().sub_items()}
    except KeyError:
        props = {k: np.asarray(v) for k, v in model.prop.sub_items()}
    return traj, times, controls, props


class AbstractFunctional:
    """
    Base functional: scalar = ``eval_traj(traj, times, controls, props)``.

    Supports the reference's functional algebra (+, -, *, /, **) with other
    functionals and scalars (reference: ``functional/base.py:190-433``),
    with derivatives supplied by autodiff instead of hand-written rules.
    """

    CACHE = True
    default_constants: dict = {}

    def __init__(self, model, *funcs):
        self.model = model
        self.funcs = tuple(funcs)
        import copy

        self.constants = copy.deepcopy(type(self).default_constants)
        self.cache: dict = {}
        self._value = None
        self._f = None

    # -- to be implemented by subclasses ------------------------------------
    def eval_traj(self, traj, times, controls, props):
        raise NotImplementedError

    # -- evaluation over a statefile -----------------------------------------
    def __call__(self, f):
        if self._f is not f or self._value is None or not self.CACHE:
            self._value = self.eval(f)
            self._f = f
            self.cache.clear()
        return self._value

    def eval(self, f) -> float:
        traj, times, controls, props = _load_statefile(self.model, f)
        return float(self.eval_traj(traj, times, controls, props))

    # -- derivatives ------------------------------------------------------------
    def _grads(self, f):
        key = ("grads", id(f))
        if key not in self.cache:
            traj, times, controls, props = _load_statefile(self.model, f)
            g_traj, g_times, g_controls, g_props = jax.grad(
                self.eval_traj, argnums=(0, 1, 2, 3)
            )(
                {k: jnp.asarray(v) for k, v in traj.items()},
                jnp.asarray(times),
                {k: jnp.asarray(v) for k, v in controls.items()},
                {k: jnp.asarray(v) for k, v in props.items()},
            )
            self.cache[key] = (
                {k: np.asarray(v) for k, v in g_traj.items()},
                np.asarray(g_times),
                {k: np.asarray(v) for k, v in g_controls.items()},
                {k: np.asarray(v) for k, v in g_props.items()},
            )
        return self.cache[key]

    def eval_dstate(self, f, n: int) -> bv.BlockVector:
        """dJ/d(state at stored index n) (reference: per-subclass
        ``eval_dstate``)."""
        g_traj, _, _, _ = self._grads(f)
        keys = list(self.model.state0.keys())
        return bv.BlockVector(
            [g_traj[k][n] for k in keys], labels=[tuple(keys)]
        )

    def dstate(self, f, n):
        return self.eval_dstate(f, n)

    def eval_dprops(self, f) -> bv.BlockVector:
        _, _, _, g_props = self._grads(f)
        keys = list(self.model.prop.keys())
        return bv.BlockVector(
            [g_props[k] for k in keys], labels=[tuple(keys)]
        )

    def dprop(self, f):
        return self.eval_dprops(f)

    def eval_dtimes(self, f) -> np.ndarray:
        _, g_times, _, _ = self._grads(f)
        return g_times

    def eval_ddt(self, f, n: int) -> float:
        """dJ/d(dt_n) with dt_n = t_n - t_{n-1}: since t_m = t_0 + sum dt,
        dJ/ddt_n = sum_{m >= n} dJ/dt_m."""
        g_times = self.eval_dtimes(f)
        return float(np.sum(g_times[n:]))

    def ddt(self, f, n):
        return self.eval_ddt(f, n)

    def eval_dt0(self, f, n=None) -> float:
        return float(np.sum(self.eval_dtimes(f)))

    def dt0(self, f, n=None):
        return self.eval_dt0(f)

    # -- algebra ------------------------------------------------------------
    def _combine(self, other, op, name):
        return _BinaryFunctional(self.model, self, other, op, name)

    def __add__(self, other):
        return self._combine(other, operator.add, "sum")

    def __radd__(self, other):
        return self._combine(other, operator.add, "sum")

    def __sub__(self, other):
        return self._combine(other, operator.sub, "diff")

    def __rsub__(self, other):
        return _BinaryFunctional(
            self.model, other, self, operator.sub, "diff"
        )

    def __mul__(self, other):
        return self._combine(other, operator.mul, "product")

    def __rmul__(self, other):
        return self._combine(other, operator.mul, "product")

    def __truediv__(self, other):
        return self._combine(other, operator.truediv, "quotient")

    def __pow__(self, other):
        return self._combine(other, operator.pow, "power")


class _BinaryFunctional(AbstractFunctional):
    """Composed functional (reference Sum/Product/Power functionals,
    ``functional/base.py:190-433``)."""

    def __init__(self, model, a, b, op, name):
        super().__init__(model)
        self._a, self._b, self._op = a, b, op
        self._name = name

    def _term(self, term, traj, times, controls, props):
        if isinstance(term, AbstractFunctional):
            return term.eval_traj(traj, times, controls, props)
        return term  # scalar constant

    def eval_traj(self, traj, times, controls, props):
        return self._op(
            self._term(self._a, traj, times, controls, props),
            self._term(self._b, traj, times, controls, props),
        )


class Scalar(AbstractFunctional):
    """A constant functional (reference: ``functional/base.py`` Scalar)."""

    def __init__(self, model, value):
        super().__init__(model)
        self._const = float(value)

    def eval_traj(self, traj, times, controls, props):
        return jnp.asarray(self._const)
