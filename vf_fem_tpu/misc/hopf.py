"""
Linear stability (Hopf) analysis of the coupled FSI system.

The reference's dynamical-model block Jacobians exist to feed external
eigen/Hopf-bifurcation consumers (SURVEY section 3.5); this module is that
consumer, in-repo: find the coupled static configuration, assemble the
first-order Jacobians ``A = dF/dx`` and ``B = dF/dxt`` at it, and solve the
generalized eigenproblem ``(A + lambda B) x = 0``.  Eigenvalues with
``Re(lambda) > 0`` mark phonation onset.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import scipy.linalg as sla

from .. import static


def linear_stability(
    transient_model,
    dyn_model,
    control,
    prop,
    n_modes: int = 8,
):
    """
    Return the ``n_modes`` least-damped eigenvalues (and the equilibrium).

    Parameters
    ----------
    transient_model / dyn_model:
        The same coupled FSI configuration loaded as 'transient' and
        'dynamical' models (the former supplies the static solver, the
        latter the first-order Jacobians).
    control, prop:
        BlockVectors for both models.

    Returns
    -------
    eigvals: (n_modes,) complex, sorted by descending real part
    eq_state: BlockVector equilibrium
    """
    # 1. coupled static configuration
    eq_state, info = static.static_coupled_configuration_picard(
        transient_model, control, prop
    )

    # 2. linearization point: x = (u*, v*=0, q*, p*), xt = 0
    dyn_model.set_control(control)
    dyn_model.set_prop(prop)
    state = dyn_model.state.copy()
    state["u"] = np.asarray(eq_state["u"])
    state["v"] = 0.0
    state["q"] = np.asarray(eq_state["q"])
    state["p"] = np.asarray(eq_state["p"])
    dyn_model.set_state(state)
    statet = dyn_model.statet.copy()
    statet[:] = 0.0
    dyn_model.set_statet(statet)

    # 3. block Jacobians; F(x, xt) ~ A dx + B dxt = 0 -> A v = -lambda B v
    A = dyn_model.assem_dres_dstate().to_mono_ndarray()
    B = dyn_model.assem_dres_dstatet().to_mono_ndarray()

    # Dirichlet rows: constrain fixed solid dofs (the dynamical Jacobians
    # are assembled without BCs, like the reference's)
    solid = dyn_model.solid
    bc = np.asarray(solid.residual.bc_dofs)
    ndof = solid.ndof
    for off in (0, ndof):  # u rows, v rows
        rows = bc + off
        A[rows, :] = 0.0
        A[rows, rows] = 1.0
        B[rows, :] = 0.0

    # 4. generalized eigenproblem via QZ (B is singular: the quasi-steady
    # fluid contributes algebraic constraints -> infinite eigenvalues,
    # which QZ reports as inf and we drop)
    w = sla.eigvals(A, -B)
    finite = np.isfinite(w)
    w = w[finite]
    order = np.argsort(-w.real)
    return w[order][:n_modes], eq_state


def growth_rate_and_frequency(eigvals: np.ndarray):
    """(sigma, f) of the least-damped oscillatory mode."""
    osc = eigvals[np.abs(eigvals.imag) > 1e-6]
    if len(osc) == 0:
        return float(eigvals[0].real), 0.0
    lead = osc[np.argmax(osc.real)]
    return float(lead.real), float(abs(lead.imag) / (2 * np.pi))
