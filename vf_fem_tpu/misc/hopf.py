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
    **banded_kwargs,
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
            static_options=static_options, **banded_kwargs,
        )
    if banded_kwargs:
        raise TypeError(
            "linear_stability(solver='dense') does not accept banded-"
            f"solver options {sorted(banded_kwargs)}"
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

    Returns ``(lam, Ysel)``: ALL converged eigenvalues sorted by
    descending real part and the matching Ritz-vector coefficient
    columns (for eigenpair residual certificates).  The caller
    truncates to ``n_modes`` AFTER certificate gating, so a spurious
    pair that fails the independent eigenpair certificate does not
    crowd out a genuine mode.

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
    Ysel = Y[:, conv]
    order = np.argsort(-lam.real)
    return lam[order], Ysel[:, order]


def _np_band_matvec(plan, blocks, x):
    """Host (numpy) mirror of ``bsb.bsb_matvec`` — supports complex x.

    Used by the eigenpair-residual certificate, which must be computed
    INDEPENDENTLY of the device factors (on TPU the factors are f32; the
    certificate bounds the eigenpair backward error against the blocks
    as assembled)."""
    b, h, nb, nblk, ndof = plan.b, plan.h, plan.nb, plan.nblk, plan.ndof
    pad_tail = nblk * b - ndof
    xpad = np.concatenate([
        np.zeros(h * b, dtype=x.dtype), x,
        np.zeros(h * b + pad_tail, dtype=x.dtype),
    ])
    wins = np.stack(
        [xpad[m * b: m * b + nblk * b].reshape(nblk, b) for m in range(nb)],
        axis=1,
    )
    y = np.einsum("nmij,nmj->ni", blocks, wins)
    return y.reshape(-1)[:ndof]


def _np_band_matmat(plan, blocks, X):
    """Multi-vector host band matvec: ``X`` is (ndof, k) real; returns
    (ndof, k).  One einsum per call — the (large) block array is read
    once for all k columns, so stacking an action's real/imag parts and
    several operand vectors costs barely more than one matvec."""
    b, h, nb, nblk, ndof = plan.b, plan.h, plan.nb, plan.nblk, plan.ndof
    k = X.shape[1]
    pad_tail = nblk * b - ndof
    xpad = np.concatenate([
        np.zeros((h * b, k), dtype=X.dtype), X,
        np.zeros((h * b + pad_tail, k), dtype=X.dtype),
    ])
    wins = np.stack(
        [
            xpad[m * b: m * b + nblk * b].reshape(nblk, b, k)
            for m in range(nb)
        ],
        axis=1,
    )  # (nblk, nb, b, k)
    y = np.einsum("nmij,nmjk->nik", blocks, wins)
    return y.reshape(-1, k)[:ndof]


def linear_stability_banded(
    transient_model,
    dyn_model,
    control,
    prop,
    n_modes: int = 8,
    sigma: Optional[complex] = None,
    arnoldi_m: int = 80,
    static_options: Optional[dict] = None,
    device=None,
    factor_dtype=None,
    refine: Optional[int] = None,
    cert_tol: Optional[float] = None,
    return_info: bool = False,
):
    """Shift-invert Arnoldi on the banded Hopf pencil (large mesh).

    Finds the ``n_modes`` eigenvalues NEAREST the shift ``sigma`` of
    ``A x = -lambda B x``: each Arnoldi step applies
    ``x -> (A + sigma B)^{-1} B x``, whose Ritz values ``theta`` map back
    as ``lambda = sigma - 1/theta``.  Pick ``sigma = i*2*pi*f_guess``
    near the expected onset frequency; onset tracking sweeps psub and
    watches ``Re(lambda)`` cross zero.

    Device offload (round 4/5): the complex banded factorization, the
    batched ``W = Kz^{-1} U_w`` coupling solves, and the per-step
    coupled solve (complex block-Thomas + Woodbury correction, ONE
    jitted call per refinement pass) run on ``device`` — by default the
    session's default accelerator, i.e. the TPU under a TPU backend.
    The action's rhs ``b = B x`` (after v/fluid elimination), the
    refinement residuals, and the Krylov recurrence (modified
    Gram–Schmidt on the ~``arnoldi_m`` basis vectors) stay on the host
    in float64/complex128: computing ``b`` in the factor dtype would
    perturb the pencil at that dtype's rounding level, which the
    shifted pencil's conditioning amplifies to ~1e-4..1e-5 eigenpair
    backward error — the round-4 certificate floor.  On TPU the factors
    are float32 (no f64 LU on device); the returned eigenpairs carry an
    independent host-side residual certificate computed against the
    blocks as assembled (``info['res_rel']``), so f32-factor runs are
    self-validating.

    Parameters
    ----------
    device:
        ``None`` (session default device), a platform string
        (``'cpu'``/``'tpu'``), or a ``jax.Device``.
    factor_dtype:
        dtype of the device factors/solves.  Default: float64 on a CPU
        device with x64 enabled, else float32 (the TPU has no f64 LU).
    refine:
        iterative-refinement passes per shift-invert action: residual
        against the shifted coupled operator computed ON THE HOST in
        float64 (the coupled residual cancels ~5 orders, so a
        working-dtype residual stalls near its rounding floor),
        correction through the same device factors.  Measured
        contraction ~1.4e-4 per pass from the ~10% raw f32 solve
        error: refine=1 reaches ~3e-5 solve accuracy, refine=2 ~4e-9
        (the rhs is host-f64, so refinement is not floored by an f32
        rhs).  Costs one extra device call + 4 host band matvecs per
        pass.  Default: 0 for f64 factors, 2 for f32.
    cert_tol:
        eigenpair-residual gate: Ritz pairs whose independent host-side
        certificate exceeds this are DROPPED (with a warning) before
        the ``n_modes`` truncation.  Inexact f32 shift-invert actions
        can produce Arnoldi-converged but spurious pairs (the internal
        Ritz filter cannot see solve error); the certificate can.
        Default: 1e-5 for f64 factors and for refined (refine>=2) f32
        runs (the host-f64 rhs makes refined f32 actions certify at the
        f64 Arnoldi level); 1e-4 at refine=1; 2e-3 unrefined.
    return_info:
        also return a dict with the per-mode eigenpair residual
        certificate ``res_rel`` (``||(A + lam B) x|| / scale``, host
        precision), ``n_conv``, ``factor_dtype`` and ``device``.

    Returns
    -------
    ``(eigvals, eq_state)`` or ``(eigvals, eq_state, info)``.
    """
    import jax
    import jax.numpy as jnp

    from ..solvers import cbtd

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
    if device is None:
        device = jax.devices()[0]
    elif isinstance(device, str):
        device = jax.devices(device)[0]
    if factor_dtype is None:
        x64 = bool(jax.config.jax_enable_x64)
        factor_dtype = (
            np.float64 if (device.platform == "cpu" and x64) else np.float32
        )
    wp = np.dtype(factor_dtype)

    # ---- assembly + small dense coupling pieces (host CPU, numpy) ------
    with jax.default_device(cpu):
        plan, Kb, Db, Mb = solid.assem_banded_state_blocks()
        Kb, Db, Mb = (np.asarray(x) for x in (Kb, Db, Mb))

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

        FfI = np.linalg.inv(Ff)
        U_w = C_f @ FfI  # (ndof, nf)

        bc = np.asarray(solid.residual.bc_dofs)
        bcmask = np.ones(ndof)
        bcmask[bc] = 0.0

    # complex shifted band: Kz = K + sigma D + sigma^2 M
    blocks_re = Kb + sr * Db + (sr * sr - si * si) * Mb
    blocks_im = si * Db + 2.0 * sr * si * Mb

    # ---- device factor + batched coupling solves ------------------------
    def put(a):
        return jax.device_put(np.asarray(a, dtype=wp), device)

    br_d, bi_d = put(blocks_re), put(blocks_im)
    facz = jax.jit(lambda br, bi: cbtd.cbtd_factor(plan, br, bi))(
        br_d, bi_d
    )

    # W = Kz^{-1} U_w: ALL nf columns in one vmapped device call
    # (stored transposed, (nf, ndof) — lanes-last for the rank-nf update)
    def _w_cols(fac, R):
        return jax.vmap(
            lambda rr: cbtd.cbtd_solve(plan, fac, rr, jnp.zeros_like(rr))
        )(R)

    WrT, WiT = jax.jit(_w_cols)(facz, put(np.ascontiguousarray(U_w.T)))

    # Woodbury capacitance (I - G W) — tiny (nf x nf): invert on host
    yd = np.asarray(ydofs)
    Wy_r, Wy_i = (
        np.asarray(a).astype(np.float64)
        for a in jax.jit(lambda wr, wi: (wr[:, yd], wi[:, yd]))(WrT, WiT)
    )
    Scap = np.eye(nf, dtype=complex) - (G_cols @ (Wy_r + 1j * Wy_i).T)
    ScapI = np.linalg.inv(Scap)

    P = dict(
        Gc=put(G_cols),
        ScapIr=put(ScapI.real),
        ScapIi=put(ScapI.imag),
        Wr=WrT,
        Wi=WiT,
        ydofs=jax.device_put(np.asarray(ydofs, dtype=np.int32), device),
    )

    if refine is None:
        refine = 0 if wp == np.float64 else 2

    def _solve_coupled(fac, p, b_r, b_i):
        """(Kz - U_w G~)^{-1} b: block-Thomas + rank-nf Woodbury."""
        y0r, y0i = cbtd.cbtd_solve(plan, fac, b_r, b_i)
        t_r = p["Gc"] @ y0r[p["ydofs"]]
        t_i = p["Gc"] @ y0i[p["ydofs"]]
        s_r = p["ScapIr"] @ t_r - p["ScapIi"] @ t_i
        s_i = p["ScapIr"] @ t_i + p["ScapIi"] @ t_r
        u_r = y0r + s_r @ p["Wr"] - s_i @ p["Wi"]
        u_i = y0i + s_i @ p["Wr"] + s_r @ p["Wi"]
        return u_r, u_i

    def _correct(fac, p, rin):
        """One preconditioner application: (Kz - U_w G~)^{-1} r."""
        r_r, r_i = rin.reshape(2, -1)
        du_r, du_i = _solve_coupled(fac, p, r_r, r_i)
        return jnp.concatenate([du_r, du_i])

    correct = jax.jit(_correct)

    # Host blocks for the f64 rhs/residual.  The action's rhs b = B x
    # (after v/fluid elimination) must be computed ABOVE the factor
    # dtype: a device-f32 b perturbs the pencil at the f32 rounding
    # level, which the shifted pencil's conditioning amplifies to a
    # ~1e-4..1e-5 eigenpair backward error — the round-4 cert floor
    # (5.5e-5 at 23.7k dofs) that no amount of refinement against that
    # b could beat.  With a host-f64 b the device solve is a pure
    # preconditioner and refinement contracts to the f64 floor.
    DsM_h = Db + sr * Mb

    def op(x):
        xu, xv = x[:ndof], x[ndof:2 * ndof]
        rv = -(bcmask * xu)
        # b = M xv - (D + sigma M) rv  [complex, host f64; one einsum
        # per block array via the multi-vector matvec]
        colsM = np.stack([xv.real, xv.imag, rv.real, rv.imag], axis=1)
        mvM = _np_band_matmat(plan, Mb, colsM)
        mvD = _np_band_matmat(plan, DsM_h, colsM[:, 2:])
        ru = mvM[:, 0] + 1j * mvM[:, 1]
        Mrv = mvM[:, 2] + 1j * mvM[:, 3]
        Drv = mvD[:, 0] + 1j * mvD[:, 1]
        b = ru - (Drv + 1j * si * Mrv)
        # Initial f32 preconditioner solve + host-f64 iterative
        # refinement.  The f32 factor solve error is O(10%) at this
        # conditioning, and a residual computed in the working dtype
        # STALLS near 3e-2: the coupled residual b - Kz u + U_w (G u_y)
        # cancels ~5 orders, so its f32 rounding floor is above the
        # refinement target.  In f64 (against the blocks as assembled)
        # each pass contracts the solve error ~1.4e-4x (measured; the
        # Woodbury W error does not limit the rate): refine=1 reaches
        # ~3e-5, refine=2 ~1e-8-grade actions.
        u = np.zeros(ndof, dtype=complex)
        r = b
        for k in range(refine + 1):
            rin = np.concatenate([r.real, r.imag]).astype(wp)
            d = np.asarray(correct(facz, P, rin)).astype(np.float64)
            u = u + d[:ndof] + 1j * d[ndof:]
            if k == refine:
                break
            cols = np.stack([u.real, u.imag], axis=1)
            Kr = _np_band_matmat(plan, blocks_re, cols)
            Ki = _np_band_matmat(plan, blocks_im, cols)
            Ku = (Kr[:, 0] - Ki[:, 1]) + 1j * (Kr[:, 1] + Ki[:, 0])
            r = b - Ku + U_w @ (G_cols @ u[ydofs])
        # back-substitution (host, f64): v then the fluid block
        v = rv + sigma * (bcmask * u)
        f = -(FfI @ (G_cols @ u[ydofs]))
        return np.concatenate([u, v, f])

    # ---- Arnoldi (host, complex128) -------------------------------------
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
    lam, Ysel = _filter_ritz(theta, Y, resid, n_modes, arnoldi_m, sigma)

    # ---- host eigenpair-residual certificate ----------------------------
    # ||(A + lam B) x|| row-wise against the blocks AS ASSEMBLED —
    # independent of the (possibly f32) device factors, so inexact
    # shift-invert applications are caught here rather than trusted.
    X = V[:, :m] @ Ysel
    res_rel = np.zeros(len(lam))
    for j, lj in enumerate(lam):
        x = X[:, j] / np.linalg.norm(X[:, j])
        u, v, f = x[:ndof], x[ndof:2 * ndof], x[2 * ndof:]
        Ku = _np_band_matvec(plan, Kb, u)
        Dv = _np_band_matvec(plan, Db, v)
        Mv = _np_band_matvec(plan, Mb, v)
        Cf = C_f @ f
        r_u = Ku + Dv + lj * Mv + Cf
        r_v = v - lj * (bcmask * u)
        Gu = G_cols @ u[ydofs]
        r_f = Ff @ f + Gu
        num = np.sqrt(
            np.sum(np.abs(r_u) ** 2) + np.sum(np.abs(r_v) ** 2)
            + np.sum(np.abs(r_f) ** 2)
        )
        den = (
            np.linalg.norm(Ku) + np.linalg.norm(Dv)
            + abs(lj) * np.linalg.norm(Mv) + np.linalg.norm(Cf)
            + np.linalg.norm(v) + abs(lj) * np.linalg.norm(u)
            + np.linalg.norm(Ff @ f) + np.linalg.norm(Gu) + 1e-300
        )
        res_rel[j] = num / den

    # certificate gate: drop Arnoldi-converged but spurious pairs (the
    # internal Ritz filter measures only the Krylov recurrence residual
    # and cannot see inexact-solve error; with f32 factors such pairs DO
    # occur and can out-rank genuine modes in Re(lam))
    if cert_tol is None:
        # With the host-f64 rhs + refinement, f32-factor runs certify at
        # the f64 Arnoldi-convergence level (measured: refine=2 max cert
        # 4.6e-7, best 2.4e-9 on the small test pencil; refine=3 gains
        # nothing -> the floor is Ritz convergence, not the factors; the
        # same A/B at 23.7k dofs leaves the returned-mode certs flat at
        # 4.7e-6/2.7e-6, benchmarks/probe_hopf_refine.py), so the gate
        # matches the f64 default.  Unrefined f32 actions leave
        # genuine modes near ~5e-4; keep the loose historical gate there.
        if wp == np.float64 or refine >= 2:
            cert_tol = 1e-5
        elif refine == 1:
            cert_tol = 1e-4
        else:
            cert_tol = 2e-3
    n_conv_ritz = len(lam)  # converged Ritz pairs, BEFORE cert gating
    keep = res_rel < cert_tol
    if not np.any(keep):
        raise RuntimeError(
            "linear_stability(banded): every converged Ritz pair FAILED"
            f" the independent eigenpair-residual certificate (best"
            f" {res_rel.min():.1e} vs cert_tol {cert_tol:.1e};"
            f" factor_dtype {wp}) — the shift-invert factor precision is"
            " insufficient at this conditioning; use f64 factors (CPU)"
            " or move the shift closer to the target modes"
        )
    if not np.all(keep):
        import warnings

        warnings.warn(
            f"linear_stability(banded): dropped {int((~keep).sum())} of"
            f" {len(lam)} converged Ritz pairs whose eigenpair residual"
            f" exceeded cert_tol={cert_tol:.1e} (inexact"
            f" {wp}-factor shift-invert artifacts); {int(keep.sum())}"
            " certified modes remain",
            RuntimeWarning,
        )
    lam, res_rel = lam[keep][:n_modes], res_rel[keep][:n_modes]

    if return_info:
        info = {
            "res_rel": res_rel,
            # converged Ritz pairs (the arnoldi_m sizing signal) vs
            # what survived the certificate gate and n_modes truncation
            "n_conv": n_conv_ritz,
            "n_cert_dropped": n_conv_ritz - int(keep.sum()),
            "n_returned": len(lam),
            "factor_dtype": str(wp),
            "device": str(device),
            "arnoldi_m": m,
            "cert_tol": cert_tol,
            "refine": refine,
        }
        return lam, eq_state, info
    return lam, eq_state


def growth_rate_and_frequency(eigvals: np.ndarray):
    """(sigma, f) of the least-damped oscillatory mode."""
    osc = eigvals[np.abs(eigvals.imag) > 1e-6]
    if len(osc) == 0:
        return float(eigvals[0].real), 0.0
    lead = osc[np.argmax(osc.real)]
    return float(lead.real), float(abs(lead.imag) / (2 * np.pi))
