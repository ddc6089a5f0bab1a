"""
Smooth approximation functions for separation-point models
(reference: ``src/femvf/equations/smoothapproximation.py``).
"""

import jax
from jax import numpy as jnp


def trapezoid(y, x, axis=-1):
    """Trapezoid-rule integral of samples y(x) along ``axis``."""
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    dx = jnp.diff(x, axis=axis)
    y0 = jax.lax.slice_in_dim(y, 0, y.shape[axis] - 1, axis=axis)
    y1 = jax.lax.slice_in_dim(y, 1, y.shape[axis], axis=axis)
    return jnp.sum(0.5 * dx * (y0 + y1), axis=axis)


def wavg(s, f, w, axis=-1):
    """Weighted average of f(s) with weights w(s)
    (reference: ``smoothapproximation.py:10-15``)."""
    return trapezoid(f * w, s, axis=axis) / trapezoid(w, s, axis=axis)


def smooth_min_weight(f, zeta=1, axis=-1):
    """Softmax weights selecting the smooth minimum of f
    (reference: ``smoothapproximation.py:20-30``)."""
    return jax.nn.softmax(-f / zeta, axis=axis)
