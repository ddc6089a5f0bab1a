"""
Linear stability / Hopf analysis (the consumer of the dynamical models,
SURVEY section 3.5): phonation onset appears between low and high
subglottal pressure, consistent with the nonlinear oscillation test.
"""

import numpy as np
import pytest

from vf_fem_tpu.load import load_fsi_model
from vf_fem_tpu.mesh import vocal_fold_mesh
from vf_fem_tpu.misc.hopf import growth_rate_and_frequency, linear_stability
from vf_fem_tpu.residuals import fluid as flr, solid as slr


def test_ritz_filter_diagnostics():
    """The shift-invert Ritz filter must (a) error actionably when no
    pair converged, (b) warn when only a partial set converged, and
    (c) pass a fully-converged set through, sorted by descending
    Re(lambda) after the ``lam = sigma - 1/theta`` map (round-4
    review: spurious huge eigenvalues from unconverged theta ~ 0)."""
    from vf_fem_tpu.misc.hopf import _filter_ritz

    sigma = 1j * 2 * np.pi * 150.0
    theta = np.array([0.5 + 0.1j, -0.2 + 0.3j, 1e-14 + 0j])
    Y = np.eye(3, dtype=complex)

    # (a) nothing converged -> RuntimeError naming the best residual
    with pytest.raises(RuntimeError, match="no Ritz pair converged"):
        _filter_ritz(theta, Y, np.array([1.0, 1.0, 1.0]), 4, 30, sigma)
    # ... including the all-theta-filtered edge (empty after keep mask)
    with pytest.raises(RuntimeError, match="all Ritz values ~ 0"):
        _filter_ritz(
            np.array([1e-14 + 0j]), Y[:, :1], np.array([1.0]), 4, 30, sigma
        )

    # (b) one of four requested converged -> RuntimeWarning, result kept
    with pytest.warns(RuntimeWarning, match="only 1 of the requested 4"):
        lam, ysel = _filter_ritz(
            theta, Y, np.array([1e-9, 1.0, 1.0]), 4, 30, sigma
        )
    np.testing.assert_allclose(lam, sigma - 1.0 / theta[0], rtol=1e-12)
    assert ysel.shape == (3, 1)

    # (c) all converged -> no warning, sorted by descending real part,
    # Ritz-vector columns permuted consistently with the eigenvalues
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        lam, ysel = _filter_ritz(
            theta, Y, np.array([1e-9, 1e-9, 0.0]), 2, 30, sigma
        )
    expect = sigma - 1.0 / theta[:2]
    order = np.argsort(-expect.real)
    np.testing.assert_allclose(lam, expect[order], rtol=1e-12)
    np.testing.assert_array_equal(ysel, Y[:, :2][:, order])


def test_np_band_matvec_matches_device_and_dense():
    """The host numpy band-matvec mirror (the INDEPENDENT arithmetic
    behind the eigenpair certificate) must agree with the device
    ``bsb_matvec`` and with an explicit dense reconstruction, including
    complex vectors and the padded tail block."""
    import jax.numpy as jnp

    from vf_fem_tpu.misc.hopf import _np_band_matvec
    from vf_fem_tpu.solvers import bsb

    rng = np.random.default_rng(3)
    b, nblk, h, ndof = 4, 5, 1, 17  # ndof < nblk*b: pad tail exercised
    nb = 2 * h + 1
    plan = bsb.BSBPlan(
        ndof=ndof, b=b, nblk=nblk, nb=nb, h=h,
        tgt_idx=np.zeros(1, np.int32), src_keep=np.zeros(1, bool),
        bc_dofs=np.zeros(0, np.int32), diag_ones=np.zeros(0, np.int32),
    )
    blocks = rng.standard_normal((nblk, nb, b, b))
    # dense reconstruction: block-row n couples to block-cols n+m-h
    npad = nblk * b
    A = np.zeros((npad, npad))
    for n in range(nblk):
        for m in range(nb):
            c = n + m - h
            if 0 <= c < nblk:
                A[n * b:(n + 1) * b, c * b:(c + 1) * b] = blocks[n, m]
    x = rng.standard_normal(ndof) + 1j * rng.standard_normal(ndof)
    xpad = np.concatenate([x, np.zeros(npad - ndof, complex)])
    y_dense = (A @ xpad)[:ndof]

    y_host = _np_band_matvec(plan, blocks, x)
    np.testing.assert_allclose(y_host, y_dense, rtol=1e-13)
    y_dev = np.asarray(
        bsb.bsb_matvec(plan, jnp.asarray(blocks), jnp.asarray(x.real))
    ) + 1j * np.asarray(
        bsb.bsb_matvec(plan, jnp.asarray(blocks), jnp.asarray(x.imag))
    )
    np.testing.assert_allclose(y_host, y_dev, rtol=1e-12)


@pytest.mark.slow
def test_phonation_onset():
    mesh = vocal_fold_mesh(8, 4)
    ymax = mesh.coords[:, 1].max()

    def make(model_type):
        m = load_fsi_model(
            mesh, slr.KelvinVoigt, flr.BernoulliSmoothMinSep,
            model_type=model_type,
        )
        p = m.prop
        p["emod"][:] = 3e4
        p["rho"][:] = 1.0
        p["eta"][:] = 2.0
        p["ycontact"][:] = ymax + 0.05
        p["kcontact"][:] = 1e8
        p["rho_air"][:] = 1.1225e-3
        p["zeta_min"][:] = 1e-3
        p["zeta_sep"][:] = 1e-3
        p["ymid"][:] = ymax + 0.01
        m.set_prop(p)
        return m

    tm = make("transient")
    dm = make("dynamical")

    sigmas = {}
    for psub in (1000.0, 8000.0):
        c = tm.control.copy()
        c["psub"][:] = psub
        c["psup"][:] = 0.0
        eigs, eq = linear_stability(tm, dm, c, tm.prop)
        sig, f = growth_rate_and_frequency(eigs)
        sigmas[psub] = (sig, f)

    # damped at low pressure, self-oscillating at high pressure
    assert sigmas[1000.0][0] < 0, sigmas
    assert sigmas[8000.0][0] > 0, sigmas
    # unstable-mode frequency in the phonation range
    assert 30.0 < sigmas[8000.0][1] < 1000.0


def _banded_test_models():
    mesh = vocal_fold_mesh(8, 4)
    from vf_fem_tpu.mesh.reorder import rcm_mesh

    mesh = rcm_mesh(mesh)
    ymax = mesh.coords[:, 1].max()

    def make(model_type):
        m = load_fsi_model(
            mesh, slr.KelvinVoigt, flr.BernoulliSmoothMinSep,
            model_type=model_type,
        )
        p = m.prop
        p["emod"][:] = 3e4
        p["rho"][:] = 1.0
        p["eta"][:] = 2.0
        p["ycontact"][:] = ymax + 0.05
        p["kcontact"][:] = 1e8
        p["rho_air"][:] = 1.1225e-3
        p["zeta_min"][:] = 1e-3
        p["zeta_sep"][:] = 1e-3
        p["ymid"][:] = ymax + 0.01
        m.set_prop(p)
        return m

    tm = make("transient")
    dm = make("dynamical")
    c = tm.control.copy()
    c["psub"][:] = 8000.0
    c["psup"][:] = 0.0
    return tm, dm, c


def test_banded_hopf_matches_dense():
    """Shift-invert Arnoldi on the banded Hopf pencil (round-4: the
    large-mesh path) reproduces the dense QZ eigenvalues near the shift.
    The pencil is real, so the spectrum is conjugate-symmetric and the
    banded solver may return either partner."""
    tm, dm, c = _banded_test_models()

    eigs_d, _ = linear_stability(tm, dm, c, tm.prop)
    sig_d, f_d = growth_rate_and_frequency(eigs_d)
    eigs_b, _, info = linear_stability(
        tm, dm, c, tm.prop, solver="banded",
        sigma=1j * 2 * np.pi * f_d, arnoldi_m=60, return_info=True,
    )
    # every banded mode must match a dense mode (or its conjugate)
    for lb in eigs_b[:4]:
        d = np.minimum(
            np.abs(eigs_d - lb), np.abs(np.conj(eigs_d) - lb)
        ).min()
        assert d < 1e-5 * max(abs(lb), 1.0), (lb, eigs_d)
    # and the growth/frequency of the least-damped mode agrees
    sig_b, f_b = growth_rate_and_frequency(eigs_b)
    np.testing.assert_allclose(sig_b, sig_d, rtol=1e-5)
    np.testing.assert_allclose(f_b, f_d, rtol=1e-6)
    # the eigenpair-residual certificate confirms the f64 pairs to the
    # Ritz convergence gate (the filter accepts rel residual < 1e-6 on
    # the shift-invert operator, so certified pairs sit just under it —
    # NOT at machine precision)
    assert np.all(info["res_rel"][:4] < 1e-6), info["res_rel"]


def test_banded_hopf_f32_factors_certified():
    """With float32 device factors (the TPU configuration — the chip has
    no f64 LU) the shift-invert applications are inexact.

    Without refinement (``refine=0``) Arnoldi CAN converge spurious
    pairs that out-rank the genuine modes in Re(lambda) (observed: a
    cert-2.8e-2 pair at Re=+132 above the true +40.6 mode) — the
    independent host-side eigenpair certificate must gate them out.
    With the default device-side iterative refinement the solve error
    contracts to the f32 matvec floor and the f32 run matches the f64
    one with tight certificates."""
    tm, dm, c = _banded_test_models()
    sigma = 1j * 2 * np.pi * 130.0

    eigs64, _, info64 = linear_stability(
        tm, dm, c, tm.prop, solver="banded",
        sigma=sigma, arnoldi_m=60, return_info=True,
    )
    s64, f64_ = growth_rate_and_frequency(eigs64)
    scale = abs(eigs64[0])
    # every RETURNED mode passed its certificate gate; f64 pairs
    # converge to the 1e-6 Ritz gate
    assert np.all(info64["res_rel"] < info64["cert_tol"])
    assert np.all(info64["res_rel"][:4] < 1e-6), info64["res_rel"]

    # --- refine=0: the gate must separate spurious from genuine ------
    eigs32, _, info32 = linear_stability(
        tm, dm, c, tm.prop, solver="banded",
        sigma=sigma, arnoldi_m=60, return_info=True,
        factor_dtype="float32", refine=0,
    )
    assert info32["factor_dtype"] == "float32"
    assert np.all(info32["res_rel"] < info32["cert_tol"])
    # least-damped mode: growth/frequency at raw f32-factor accuracy —
    # ~5e-4 relative on |lam| (the spurious +132 1/s pair would miss
    # by 0.11 relative, two orders above this gate)
    s32, f32_ = growth_rate_and_frequency(eigs32)
    assert abs(s32 - s64) < 3e-3 * scale, (s32, s64)
    np.testing.assert_allclose(f32_, f64_, rtol=1e-3)

    # --- default refine: certs tighten well below the raw-f32 level
    # and the least-damped mode sharpens toward the f64 answer --------
    eigs32r, _, info32r = linear_stability(
        tm, dm, c, tm.prop, solver="banded",
        sigma=sigma, arnoldi_m=60, return_info=True,
        factor_dtype="float32",
    )
    assert info32r["refine"] > 0
    # cert floor with refinement + host-f64 rhs: both the solve error
    # (contraction 1.4e-4/pass) AND the rhs rounding are gone — what
    # remains is Arnoldi convergence of the weaker modes (measured
    # 4.6e-7 max / 2.4e-9 best at refine=2; refine=3 gains nothing,
    # vs 1.6e-4 when the rhs was computed on-device in f32)
    assert np.all(info32r["res_rel"] < 2e-6), info32r["res_rel"]
    assert info32r["res_rel"].min() < 1e-7, info32r["res_rel"]
    # the least-damped mode itself is f64-grade (measured 8e-8 on
    # growth, 2.4e-7 on frequency)
    s32r, f32r_ = growth_rate_and_frequency(eigs32r)
    assert abs(s32r - s64) < 1e-5 * scale, (s32r, s64)
    np.testing.assert_allclose(f32r_, f64_, rtol=1e-5)
