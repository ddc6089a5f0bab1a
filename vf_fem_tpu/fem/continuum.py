"""
Continuum-mechanics operators in JAX.

These mirror the reference's UFL continuum operators one-for-one
(reference: ``src/femvf/equations/uflcontinuum.py``), operating on
displacement *gradients* (constant per P1 element) rather than symbolic
fields.  In 2D all strain/stress tensors are padded to 3x3 exactly as the
reference does (plane strain), so scalar invariants match.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .elements import det_small, inv_small

# numpy, not jnp: module import must not touch the device (an eager op
# here would fail in any process whose remote TPU is busy/unclaimed)
I3 = np.eye(3)


# Tiny per-element tensor ops are unrolled into elementwise stacks (no
# ``@``/swapaxes/.at[] on the minor dims): under ``vmap`` those lower to
# batched tiny dot_generals and transposes that break XLA fusion and
# materialize padded-layout intermediates (see ``fem.elements.interp``).


def pad_to_3x3(A: jnp.ndarray) -> jnp.ndarray:
    """Embed a 2x2 tensor into the upper-left of a 3x3 zero tensor."""
    if A.shape[-1] == 3:
        return A
    z = jnp.zeros_like(A[..., 0, 0])
    rows = [
        [A[..., i, j] if (i < 2 and j < 2) else z for j in range(3)]
        for i in range(3)
    ]
    return jnp.stack(
        [jnp.stack(r, axis=-1) for r in rows], axis=-2
    )


def strain_inf(grad_u: jnp.ndarray) -> jnp.ndarray:
    """Infinitesimal strain, padded to 3x3 in 2D
    (reference: ``uflcontinuum.py:73-88``)."""
    d = grad_u.shape[-1]
    z = jnp.zeros_like(grad_u[..., 0, 0])
    rows = [
        [
            0.5 * (grad_u[..., i, j] + grad_u[..., j, i])
            if (i < d and j < d)
            else z
            for j in range(3)
        ]
        for i in range(3)
    ]
    return jnp.stack(
        [jnp.stack(r, axis=-1) for r in rows], axis=-2
    )


def def_grad(grad_u: jnp.ndarray) -> jnp.ndarray:
    """Deformation gradient F = I + grad(u), 3x3
    (reference: ``uflcontinuum.py:29-44``)."""
    return pad_to_3x3(grad_u) + I3


def def_cauchy_green(grad_u: jnp.ndarray) -> jnp.ndarray:
    F = def_grad(grad_u)
    rows = [
        [
            sum(F[..., k, i] * F[..., k, j] for k in range(3))
            for j in range(3)
        ]
        for i in range(3)
    ]
    return jnp.stack(
        [jnp.stack(r, axis=-1) for r in rows], axis=-2
    )


def strain_green_lagrange(grad_u: jnp.ndarray) -> jnp.ndarray:
    """Green-Lagrange strain E = (C - I)/2
    (reference: ``uflcontinuum.py:60-70``)."""
    return 0.5 * (def_cauchy_green(grad_u) - I3)


def stress_isotropic(strain: jnp.ndarray, emod, nu) -> jnp.ndarray:
    """Linear isotropic stress from (E, nu)
    (reference: ``uflcontinuum.py:9-26``)."""
    lame_lambda = emod * nu / (1 + nu) / (1 - 2 * nu)
    lame_mu = emod / 2 / (1 + nu)
    d = strain.shape[-1]
    tr = sum(strain[..., i, i] for i in range(d))
    return 2 * lame_mu * strain + (lame_lambda * tr)[..., None, None] * jnp.eye(
        d, dtype=strain.dtype
    )


def pullback_area_normal(grad_u: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """
    Nanson pullback cof(F) @ n, in the mesh's geometric dimension
    (reference: ``uflcontinuum.py:172-187``).

    ``grad_u``: (dim, dim) displacement gradient; ``n``: (dim,) reference
    facet normal.  Returns the deformed area-weighted normal (dim,).
    """
    dim = n.shape[-1]
    F = grad_u + jnp.eye(dim, dtype=grad_u.dtype)
    detF = det_small(F)
    Finv = inv_small(F)
    # cof(F) @ n = det(F) * F^-T @ n, unrolled (no batched tiny matmuls)
    rows = [
        detF * sum(Finv[..., j, i] * n[..., j] for j in range(dim))
        for i in range(dim)
    ]
    return jnp.stack(rows, axis=-1)


def positive_gap(gap: jnp.ndarray) -> jnp.ndarray:
    """Macaulay bracket <gap> (reference: ``form.py:1173-1185``)."""
    return jnp.maximum(gap, 0.0)


def pressure_contact_cubic_penalty(gap, kcoll):
    """Cubic penalty contact pressure (reference: ``form.py:1188-1194``)."""
    return kcoll * positive_gap(gap) ** 3


def dform_cubic_penalty_pressure(gap, kcoll):
    """Contact pressure derivative (reference: ``form.py:1196-1202``)."""
    pg = positive_gap(gap)
    return kcoll * 3 * pg**2 * jnp.sign(gap), pg**3
