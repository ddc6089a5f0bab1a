"""
P1 simplex element geometry and quadrature (pure JAX, jit/vmap-friendly).

This is the numeric core that replaces FEniCS' FFC-generated element kernels
(reference: element tabulation is delegated to dolfin C++,
``src/femvf/models/assemblyutils.py:13-50``).  Every function here takes the
element vertex coordinates ``X_e`` as a traced argument so that mesh-shape
derivatives (the reference's ``prop/umesh`` shape parameter,
``src/femvf/equations/form.py:1037-1062``) come for free from ``jax.grad``.

All solid fields are P1 (CG1) on triangles/tets; coefficients are DG0 or
global constants — exactly the space set used by the reference
(``src/femvf/equations/form.py:522-524`` etc.).  Volume integrands are then
polynomials of degree <= 2, so the degree-2 rules here integrate every form
in the zoo exactly.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# -- Quadrature rules (barycentric coordinates, weights sum to 1) -----------

# Triangle, degree-2 exact (3 interior points)
TRI_QP = np.array(
    [
        [2 / 3, 1 / 6, 1 / 6],
        [1 / 6, 2 / 3, 1 / 6],
        [1 / 6, 1 / 6, 2 / 3],
    ]
)
TRI_QW = np.array([1 / 3, 1 / 3, 1 / 3])

# Tetrahedron, degree-2 exact (4 points)
_TET_A = (5.0 + 3.0 * np.sqrt(5.0)) / 20.0
_TET_B = (5.0 - np.sqrt(5.0)) / 20.0
TET_QP = np.array(
    [
        [_TET_A, _TET_B, _TET_B, _TET_B],
        [_TET_B, _TET_A, _TET_B, _TET_B],
        [_TET_B, _TET_B, _TET_A, _TET_B],
        [_TET_B, _TET_B, _TET_B, _TET_A],
    ]
)
TET_QW = np.array([0.25, 0.25, 0.25, 0.25])

# Interval (2D facet), 2-point Gauss (degree-3 exact)
_G = 0.5 / np.sqrt(3.0)
EDGE_QP = np.array([[0.5 + _G, 0.5 - _G], [0.5 - _G, 0.5 + _G]])
EDGE_QW = np.array([0.5, 0.5])

# Triangle facet of a tet: reuse TRI_QP/TRI_QW.


def cell_quadrature(dim: int):
    """(barycentric points, weights) for the cell of dimension ``dim``."""
    if dim == 2:
        return TRI_QP, TRI_QW
    if dim == 3:
        return TET_QP, TET_QW
    raise ValueError(f"Unsupported cell dimension {dim}")


def facet_quadrature(dim: int):
    """(barycentric points, weights) for a facet of a ``dim``-cell."""
    if dim == 2:
        return EDGE_QP, EDGE_QW
    if dim == 3:
        return TRI_QP, TRI_QW
    raise ValueError(f"Unsupported cell dimension {dim}")


# -- Element geometry ---------------------------------------------------------


def det2(A):
    return A[..., 0, 0] * A[..., 1, 1] - A[..., 0, 1] * A[..., 1, 0]


def inv2(A):
    d = det2(A)
    return (
        jnp.stack(
            [
                jnp.stack([A[..., 1, 1], -A[..., 0, 1]], axis=-1),
                jnp.stack([-A[..., 1, 0], A[..., 0, 0]], axis=-1),
            ],
            axis=-2,
        )
        / d[..., None, None]
    )


def det3(A):
    return (
        A[..., 0, 0] * (A[..., 1, 1] * A[..., 2, 2] - A[..., 1, 2] * A[..., 2, 1])
        - A[..., 0, 1] * (A[..., 1, 0] * A[..., 2, 2] - A[..., 1, 2] * A[..., 2, 0])
        + A[..., 0, 2] * (A[..., 1, 0] * A[..., 2, 1] - A[..., 1, 1] * A[..., 2, 0])
    )


def inv3(A):
    # cofactor/adjugate form — closed-form so it runs in f64 on TPU (no LU)
    # and maps onto the VPU as pure elementwise math.
    c00 = A[..., 1, 1] * A[..., 2, 2] - A[..., 1, 2] * A[..., 2, 1]
    c01 = A[..., 0, 2] * A[..., 2, 1] - A[..., 0, 1] * A[..., 2, 2]
    c02 = A[..., 0, 1] * A[..., 1, 2] - A[..., 0, 2] * A[..., 1, 1]
    c10 = A[..., 1, 2] * A[..., 2, 0] - A[..., 1, 0] * A[..., 2, 2]
    c11 = A[..., 0, 0] * A[..., 2, 2] - A[..., 0, 2] * A[..., 2, 0]
    c12 = A[..., 0, 2] * A[..., 1, 0] - A[..., 0, 0] * A[..., 1, 2]
    c20 = A[..., 1, 0] * A[..., 2, 1] - A[..., 1, 1] * A[..., 2, 0]
    c21 = A[..., 0, 1] * A[..., 2, 0] - A[..., 0, 0] * A[..., 2, 1]
    c22 = A[..., 0, 0] * A[..., 1, 1] - A[..., 0, 1] * A[..., 1, 0]
    adj = jnp.stack(
        [
            jnp.stack([c00, c01, c02], axis=-1),
            jnp.stack([c10, c11, c12], axis=-1),
            jnp.stack([c20, c21, c22], axis=-1),
        ],
        axis=-2,
    )
    return adj / det3(A)[..., None, None]


def det_small(A):
    """Determinant of a (..., d, d) matrix, d in {2, 3}, closed form."""
    return det2(A) if A.shape[-1] == 2 else det3(A)


def inv_small(A):
    """Inverse of a (..., d, d) matrix, d in {2, 3}, closed form."""
    return inv2(A) if A.shape[-1] == 2 else inv3(A)


def cell_shape_gradients(X_e: jnp.ndarray):
    """
    Return (grads, volume) for a P1 simplex with vertices ``X_e`` (nv, dim).

    ``grads`` has shape (nv, dim): the (constant) gradient of each barycentric
    shape function.  ``volume`` is the signed measure's absolute value.
    """
    dim = X_e.shape[-1]
    # D[i, j] = edge vector j, component i — built by unrolled component
    # stacking (no transpose: batched minor-dim transposes break fusion)
    D = jnp.stack(
        [
            jnp.stack(
                [X_e[1 + j, i] - X_e[0, i] for j in range(dim)], axis=-1
            )
            for i in range(dim)
        ],
        axis=-2,
    )
    detD = det_small(D)
    fact = 2.0 if dim == 2 else 6.0
    vol = jnp.abs(detD) / fact
    Dinv = inv_small(D)  # rows are grad(lambda_i), i=1..dim
    grad0 = jnp.stack(
        [-sum(Dinv[k, j] for k in range(dim)) for j in range(dim)], axis=-1
    )
    grads = jnp.stack(
        [grad0] + [Dinv[k] for k in range(dim)], axis=0
    )  # (nv, dim)
    return grads, vol


def facet_measure_normal(Xf: jnp.ndarray, X_opp: jnp.ndarray):
    """
    Return (measure, outward unit normal) of a boundary facet.

    ``Xf``: facet vertex coordinates (dim, dim) — 2 points in 2D (an edge) or
    3 points in 3D (a triangle).  ``X_opp``: the adjacent cell's remaining
    vertex, used to orient the normal outward.
    """
    dim = Xf.shape[-1]
    if dim == 2:
        t = Xf[1] - Xf[0]
        length = jnp.linalg.norm(t)
        n = jnp.array([t[1], -t[0]]) / length
        meas = length
    else:
        e1 = Xf[1] - Xf[0]
        e2 = Xf[2] - Xf[0]
        c = jnp.cross(e1, e2)
        nc = jnp.linalg.norm(c)
        n = c / nc
        meas = 0.5 * nc
    # orient outward: away from the opposite vertex
    to_opp = X_opp - Xf[0]
    n = jnp.where(jnp.dot(n, to_opp) > 0, -n, n)
    return meas, n


def interp(values_e: jnp.ndarray, bary: jnp.ndarray):
    """
    Interpolate nodal values at barycentric points.

    ``values_e``: (nv, ...) nodal values; ``bary``: (nq, nv) barycentric
    coordinates.  Returns (nq, ...).

    Unrolled over the (tiny, static) quadrature/vertex dims rather than a
    ``tensordot``: under ``vmap`` a batched tiny dot_general becomes an
    MXU call at ~2% utilization AND a fusion boundary that materializes
    its padded-layout operands in HBM; the unrolled multiply-adds fuse
    into one elementwise pass (measured 5-8x on the full element kernel).
    """
    nq, nv = bary.shape
    rows = [
        sum(bary[q, k] * values_e[k] for k in range(nv)) for q in range(nq)
    ]
    return jnp.stack(rows, axis=0)


def smallmat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """``a @ b`` for (m, k) x (k, n) with tiny static dims, unrolled into
    elementwise multiply-adds (see :func:`interp` for why)."""
    m, k = a.shape[-2], a.shape[-1]
    n = b.shape[-1]
    rows = [
        [
            sum(a[..., i, l] * b[..., l, j] for l in range(k))
            for j in range(n)
        ]
        for i in range(m)
    ]
    return jnp.stack(
        [jnp.stack(r, axis=-1) for r in rows], axis=-2
    )
