"""
Linear stability (Hopf) analysis of the coupled FSI system.

The reference's dynamical-model block Jacobians exist to feed external
eigen/Hopf-bifurcation consumers (SURVEY section 3.5); this module is that
consumer, in-repo: find the coupled static configuration, assemble the
first-order Jacobians ``A = dF/dx`` and ``B = dF/dxt`` at it, and solve the
generalized eigenproblem ``(A + lambda B) x = 0``.  Eigenvalues with
``Re(lambda) > 0`` mark phonation onset.

Two solvers:

- ``solver='dense'`` — QZ on the dense blocks (M5 scale, <~5k dofs).
- ``solver='banded'`` — shift-invert Arnoldi at large mesh, where the
  dense Jacobians are unbuildable (the regime the reference's *sparse*
  PETSc block Jacobians exist for, reference
  ``src/femvf/models/dynamical.py:239-298``).  The solid pencil blocks
  ``K = dFu/du``, ``D = dFu/dv``, ``M = dFu/dvt`` are assembled banded
  (``SolidDynamicalModel.assem_banded_state_blocks``); eliminating the
  trivial ``v``-rows and the small fluid block reduces every
  shift-invert action to ONE complex banded direct solve with
  ``K + sigma*D + sigma^2*M`` (``solvers.cbtd`` — block-Thomas on the
  2x real embedding) plus a rank-``n_fluid`` Woodbury correction for
  the FSI coupling.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import scipy.linalg as sla

from .. import static


def _linearization_point(transient_model, dyn_model, control, prop,
                         static_options=None):
    """Coupled equilibrium + dynamical model set to it."""
    eq_state, info = static.static_coupled_configuration_picard(
        transient_model, control, prop, options=static_options
    )
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
    return eq_state


def linear_stability(
    transient_model,
    dyn_model,
    control,
    prop,
    n_modes: int = 8,
    solver: str = "dense",
    sigma: Optional[complex] = None,
    arnoldi_m: int = 80,
    static_options: Optional[dict] = None,
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
    solver:
        'dense' (QZ; M5 scale) or 'banded' (shift-invert Arnoldi; scales
        with the banded direct solvers).
    sigma:
        Shift for the banded solver (complex).  Defaults to
        ``2*pi*150j`` — mid phonation range; eigenvalues nearest the
        shift converge first.
    arnoldi_m:
        Krylov dimension for the banded solver.
    static_options:
        Solver params for the equilibrium solve (e.g.
        ``{'linear_solver': 'btd'}`` at large mesh).

    Returns
    -------
    eigvals: (n_modes,) complex, sorted by descending real part
    eq_state: BlockVector equilibrium
    """
    if solver == "banded":
        return linear_stability_banded(
            transient_model, dyn_model, control, prop,
            n_modes=n_modes, sigma=sigma, arnoldi_m=arnoldi_m,
            static_options=static_options,
        )

    # 1./2. equilibrium + linearization point
    eq_state = _linearization_point(
        transient_model, dyn_model, control, prop, static_options
    )

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


def _filter_ritz(theta, Y, resid, n_modes, arnoldi_m, sigma):
    """Convergence-filter shift-invert Ritz values; map back to eigenvalues.

    UNCONVERGED Ritz values (approximating the ``theta ~ 0`` cluster from
    strongly-damped / algebraic modes) map through ``lam = sigma - 1/theta``
    to huge spurious eigenvalues — sorting by ``Re(lam)`` without this
    filter surfaces exactly those.  Raises when NOTHING converged (the
    returned spectrum would be pure noise); warns when fewer than the
    requested ``n_modes`` converged (the result is valid but partial).
    """
    keep = np.abs(theta) > 1e-12
    theta, Y, resid = theta[keep], Y[:, keep], resid[keep]
    conv = (resid / np.abs(theta)) < 1e-6
    n_conv = int(conv.sum())
    if n_conv == 0:
        best = (
            f"{float((resid / np.abs(theta)).min()):.1e}"
            if theta.size else "n/a (all Ritz values ~ 0)"
        )
        raise RuntimeError(
            "linear_stability(banded): no Ritz pair converged"
            f" (best rel residual {best}"
            f" over {theta.size} values, arnoldi_m={arnoldi_m},"
            f" sigma={sigma}) — raise arnoldi_m or move the shift"
            " closer to the expected mode"
        )
    if n_conv < n_modes:
        import warnings

        warnings.warn(
            f"linear_stability(banded): only {n_conv} of the"
            f" requested {n_modes} modes converged"
            f" (arnoldi_m={arnoldi_m}); the returned spectrum is"
            " the least-damped CONVERGED modes — raise arnoldi_m"
            " for the full set",
            RuntimeWarning,
        )
    lam = sigma - 1.0 / theta[conv]
    order = np.argsort(-lam.real)
    return lam[order][:n_modes]


def linear_stability_banded(
    transient_model,
    dyn_model,
    control,
    prop,
    n_modes: int = 8,
    sigma: Optional[complex] = None,
    arnoldi_m: int = 80,
    static_options: Optional[dict] = None,
):
    """Shift-invert Arnoldi on the banded Hopf pencil (large mesh).

    Finds the ``n_modes`` eigenvalues NEAREST the shift ``sigma`` of
    ``A x = -lambda B x``: each Arnoldi step applies
    ``x -> (A + sigma B)^{-1} B x``, whose Ritz values ``theta`` map back
    as ``lambda = sigma - 1/theta``.  Pick ``sigma = i*2*pi*f_guess``
    near the expected onset frequency; onset tracking sweeps psub and
    watches ``Re(lambda)`` cross zero.
    """
    import jax
    import jax.numpy as jnp

    from ..solvers import bsb as bsb_mod, cbtd

    if sigma is None:
        sigma = 1j * 2.0 * np.pi * 150.0
    sigma = complex(sigma)
    sr, si = sigma.real, sigma.imag

    eq_state = _linearization_point(
        transient_model, dyn_model, control, prop, static_options
    )

    solid = dyn_model.solid
    fluid = dyn_model.fluid
    ndof = solid.ndof
    dim = solid.dim
    fsimap = dyn_model.fsimap

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        plan, Kb, Db, Mb = solid.assem_banded_state_blocks()
        Kb, Db, Mb = (np.asarray(x) for x in (Kb, Db, Mb))

        # ---- small dense coupling pieces --------------------------------
        nq = fluid.state["q"].size
        npf = fluid.state["p"].size
        nf = nq + npf
        Ff = fluid.assem_dres_dstate().to_mono_ndarray()  # (nf, nf)
        dfl_dctrl = fluid.assem_dres_dcontrol()
        dQa = np.asarray(dfl_dctrl["q", "area"])  # (nq, n_area)
        dPa = np.asarray(dfl_dctrl["p", "area"])  # (npf, n_area)

        vs = np.asarray(fsimap.dofs_solid)  # interface solid vertices
        vf = np.asarray(fsimap.dofs_fluid)  # matching fluid point ids
        ydofs = vs * dim + 1
        # G = dFfluid/du: columns live only at the interface y dofs
        # (area_j = 2*(ymid - y_j): d(area)/d(u_y) = -2)
        G_cols = np.concatenate(
            [dQa[:, vf], dPa[:, vf]], axis=0
        ) * (-2.0)  # (nf, n_ifc)

        # C = dFu/dp_fluid, restricted to the interface columns
        C_ifc = solid.assem_dresu_dp1_cols(vs)  # (ndof, n_ifc)
        C_f = np.zeros((ndof, nf))
        C_f[:, nq + vf] = C_ifc

        U_w = C_f @ np.linalg.inv(Ff)  # (ndof, nf)

        # ---- complex shifted banded factor ------------------------------
        blocks_re = Kb + sr * Db + (sr * sr - si * si) * Mb
        blocks_im = si * Db + 2.0 * sr * si * Mb
        facz = cbtd.cbtd_factor(
            plan, jnp.asarray(blocks_re), jnp.asarray(blocks_im)
        )
        solve_c = jax.jit(
            lambda rr, ri: cbtd.cbtd_solve(plan, facz, rr, ri)
        )

        # W = Kz^{-1} U_w (complex ndof x nf), column by column
        W = np.zeros((ndof, nf), dtype=complex)
        for j in range(nf):
            xr, xi = solve_c(
                jnp.asarray(U_w[:, j]), jnp.zeros(ndof)
            )
            W[:, j] = np.asarray(xr) + 1j * np.asarray(xi)
        # Woodbury capacitance: (I - G W)
        Scap = np.eye(nf, dtype=complex) - (G_cols @ W[ydofs, :])
        Scap_lu = sla.lu_factor(Scap)

        bc = np.asarray(solid.residual.bc_dofs)
        bcmask = np.ones(ndof)
        bcmask[bc] = 0.0

        mm_M = jax.jit(lambda c: bsb_mod.bsb_matvec(plan, jnp.asarray(Mb), c))
        blocksDs_re = Db + sr * Mb
        mm_Dre = jax.jit(
            lambda c: bsb_mod.bsb_matvec(plan, jnp.asarray(blocksDs_re), c)
        )
        mm_Dim = jax.jit(
            lambda c: bsb_mod.bsb_matvec(plan, jnp.asarray(si * Mb), c)
        )

        def mv_M(c):  # complex M @ c (M has real entries)
            return np.asarray(mm_M(c.real)) + 1j * np.asarray(mm_M(c.imag))

        def mv_Dsig(c):  # (D + sigma*M) @ c, complex
            re = np.asarray(mm_Dre(c.real)) - np.asarray(mm_Dim(c.imag))
            im = np.asarray(mm_Dre(c.imag)) + np.asarray(mm_Dim(c.real))
            return re + 1j * im

        def solve_shift(b):  # (K + sigma D + sigma^2 M - U_w G)^{-1} b
            yr, yi = solve_c(jnp.asarray(b.real), jnp.asarray(b.imag))
            y0 = np.asarray(yr) + 1j * np.asarray(yi)
            t = G_cols @ y0[ydofs]
            s = sla.lu_solve(Scap_lu, t)
            return y0 + W @ s

        def op(x):
            """x -> (A + sigma B)^{-1} B x on (u, v, f) complex."""
            xu, xv, xf = x[:ndof], x[ndof:2 * ndof], x[2 * ndof:]
            # r = B x (B: u-row dFu/dvt = M; v-row -I on u; fluid 0)
            ru = mv_M(xv)
            rv = -(bcmask * xu)
            # eliminate v and the fluid block
            b = ru - mv_Dsig(rv)  # r_f = 0
            u = solve_shift(b)
            v = rv + sigma * (bcmask * u)
            f = np.linalg.solve(Ff, -(G_cols @ u[ydofs]))
            f_full = np.zeros(nf, dtype=complex)
            f_full[:] = f
            return np.concatenate([u, v, f_full])

        # ---- Arnoldi (host, complex128) ----------------------------------
        n = 2 * ndof + nf
        rng = np.random.default_rng(0)
        v0 = rng.standard_normal(n) + 1j * rng.standard_normal(n)
        v0[:ndof] *= bcmask
        v0[ndof:2 * ndof] *= bcmask
        v0 /= np.linalg.norm(v0)
        m = min(arnoldi_m, n - 1)
        V = np.zeros((n, m + 1), dtype=complex)
        H = np.zeros((m + 1, m), dtype=complex)
        V[:, 0] = v0
        for k in range(m):
            w = op(V[:, k])
            # modified Gram-Schmidt, one reorthogonalization pass
            for _ in range(2):
                for i in range(k + 1):
                    hik = np.vdot(V[:, i], w)
                    H[i, k] += hik
                    w -= hik * V[:, i]
            hk = np.linalg.norm(w)
            H[k + 1, k] = hk
            if hk < 1e-12:
                m = k + 1
                break
            V[:, k + 1] = w / hk

        theta, Y = np.linalg.eig(H[:m, :m])
        # Ritz residuals: |h_{m+1,m} * y_m| bounds the eigen-residual of
        # the shift-invert operator; relative to |theta| it bounds the
        # backward error of the Ritz pair.
        h_last = np.abs(H[m, m - 1]) if m <= H.shape[0] - 1 else 0.0
        resid = h_last * np.abs(Y[-1, :])
        lam = _filter_ritz(theta, Y, resid, n_modes, arnoldi_m, sigma)
        return lam, eq_state


def growth_rate_and_frequency(eigvals: np.ndarray):
    """(sigma, f) of the least-damped oscillatory mode."""
    osc = eigvals[np.abs(eigvals.imag) > 1e-6]
    if len(osc) == 0:
        return float(eigvals[0].real), 0.0
    lead = osc[np.argmax(osc.real)]
    return float(lead.real), float(abs(lead.imag) / (2 * np.pi))
