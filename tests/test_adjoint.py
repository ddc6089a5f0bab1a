"""
Adjoint/gradient correctness through the full coupled FSI time loop
(modelled on the reference's Taylor methodology, ``misc/taylor.py:15-86``
and ``tests/test_transform.py:134-158``; BASELINE config 4).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vf_fem_tpu import adjoint, forward
from vf_fem_tpu.residuals import fluid as flr

from fixture_models import make_vf_fsi_model, make_unit_solid_model

N_STEPS = 8
DT = 2e-5


@pytest.fixture(scope="module")
def model():
    # the smooth separation model is the differentiation default
    return make_vf_fsi_model(FluidResidual=flr.BernoulliSmoothMinSep, nx=8, ny=4)


def _functional(traj, controls, prop, times):
    """Mean-square final displacement + flow work (an arbitrary smooth
    trajectory functional)."""
    u_fin = traj["u"][-1]
    q = traj["q"]
    return jnp.sum(u_fin**2) * 1e4 + 1e-8 * jnp.sum(q**2)


def _run_value(model, ini_state, controls, prop, times):
    state0 = {k: jnp.asarray(v) for k, v in ini_state.sub_items()}
    cs = forward._stack_controls(model, controls)
    prop_d = model.prop_to_dict(prop)
    fin, traj, infos = forward.integrate_pure(model, state0, cs, prop_d, times)
    return float(_functional(traj, cs, prop_d, jnp.asarray(times)))


def test_grad_matches_fd(model):
    times = DT * np.arange(N_STEPS)
    ini_state = model.state0.copy()
    ini_state[:] = 0.0

    value, grads = adjoint.integrate_grad(
        model, _functional, ini_state, [model.control], model.prop, times
    )
    assert np.isfinite(value) and value > 0

    # -- FD check of d/d(psub) --------------------------------------------
    g_psub = grads["controls"]["psub"].sum()
    h = 1.0  # 1 barye perturbation on 8000
    cp, cm = model.control.copy(), model.control.copy()
    cp["psub"][:] = cp["psub"] + h
    cm["psub"][:] = cm["psub"] - h
    vp = _run_value(model, ini_state, [cp], model.prop, times)
    vm = _run_value(model, ini_state, [cm], model.prop, times)
    fd = (vp - vm) / (2 * h)
    assert fd != 0
    np.testing.assert_allclose(g_psub, fd, rtol=1e-5)

    # -- FD check of d/d(emod), uniform perturbation -----------------------
    g_emod = float(grads["prop"]["emod"].sum())
    h = 1e-1
    pp, pm = model.prop.copy(), model.prop.copy()
    pp["emod"][:] = pp["emod"] + h
    pm["emod"][:] = pm["emod"] - h
    vp = _run_value(model, ini_state, [model.control], pp, times)
    vm = _run_value(model, ini_state, [model.control], pm, times)
    fd = (vp - vm) / (2 * h)
    np.testing.assert_allclose(g_emod, fd, rtol=1e-4)


def test_grad_wrt_times(model):
    """dJ/d(times) — the reference's per-time-point dt gradients
    (reference: ``adjoint.py:83-93``)."""
    times = DT * np.arange(N_STEPS)
    ini_state = model.state0.copy()
    ini_state[:] = 0.0
    value, grads = adjoint.integrate_grad(
        model, _functional, ini_state, [model.control], model.prop, times
    )
    g_t = grads["times"]
    assert g_t.shape == times.shape

    h = 1e-9
    tp = times.copy()
    tp[-1] += h
    vp = _run_value(model, ini_state, [model.control], model.prop, tp)
    fd = (vp - value) / h
    np.testing.assert_allclose(g_t[-1], fd, rtol=1e-3)


def test_jvp_vjp_duality(model):
    """<hy, J dx> == <J^T hy, dx> through the whole loop
    (reference: ``tests/test_transform.py:134-158``)."""
    times = DT * np.arange(5)
    rng = np.random.default_rng(2)

    state0 = {
        k: jnp.asarray(np.zeros_like(np.asarray(v)))
        for k, v in model.state0.sub_items()
    }
    cs = forward._stack_controls(model, [model.control])
    prop_d = model.prop_to_dict(model.prop)

    def run_u_fwd(prop_emod):
        p = dict(prop_d)
        p["emod"] = prop_emod
        fin, traj, _ = forward.integrate_pure(model, state0, cs, p, times,
                                              mode="fwd")
        return fin["u"]

    def run_u_rev(prop_emod):
        p = dict(prop_d)
        p["emod"] = prop_emod
        fin, traj, _ = forward.integrate_pure(
            model, state0, cs, p, times, use_remat=True
        )
        return fin["u"]

    emod0 = prop_d["emod"]
    dx = jnp.asarray(rng.standard_normal(emod0.shape))
    hy = jnp.asarray(rng.standard_normal(model.solid.ndof))

    # cross-validates the custom_jvp (fwd) and custom_vjp (rev) IFT rules
    _, jdx = jax.jvp(run_u_fwd, (emod0,), (dx,))
    _, vjp = jax.vjp(run_u_rev, emod0)
    (jt_hy,) = vjp(hy)

    lhs = float(jnp.vdot(hy, jdx))
    rhs = float(jnp.vdot(jt_hy, dx))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-9)


def test_implicit_fsi_grad_matches_fd():
    """Gradient through the implicit (Picard) FSI step via the coupled
    IFT custom_vjp (reference's coupled (u,p) adjoint solve,
    ``transient.py:1062-1145``)."""
    model = make_vf_fsi_model(
        FluidResidual=flr.BernoulliSmoothMinSep, coupling="implicit",
        nx=6, ny=3,
    )
    times = DT * np.arange(4)
    ini_state = model.state0.copy()
    ini_state[:] = 0.0

    value, grads = adjoint.integrate_grad(
        model, _functional, ini_state, [model.control], model.prop, times
    )
    assert np.isfinite(value)

    g_psub = grads["controls"]["psub"].sum()
    h = 1.0
    cp, cm = model.control.copy(), model.control.copy()
    cp["psub"][:] = cp["psub"] + h
    cm["psub"][:] = cm["psub"] - h
    vp = _run_value(model, ini_state, [cp], model.prop, times)
    vm = _run_value(model, ini_state, [cm], model.prop, times)
    fd = (vp - vm) / (2 * h)
    assert fd != 0
    np.testing.assert_allclose(g_psub, fd, rtol=1e-4)


def test_statefile_replay_adjoint(model, tmp_path):
    """adjoint.integrate replays a stored run and returns gradients that
    match finite differences (working version of the reference's broken
    statefile adjoint, reference ``adjoint.py:19-93``)."""
    from vf_fem_tpu import statefile as sf
    from vf_fem_tpu.functional.solid import FinalDisplacementNorm

    times = 2e-5 * np.arange(6)
    ini = model.state0.copy()
    ini[:] = 0.0
    path = str(tmp_path / "replay.h5")
    with sf.StateFile(model, path, mode="w") as f:
        forward.integrate(model, f, ini, [model.control], model.prop, times)

        func = FinalDisplacementNorm(model)
        value, grads = adjoint.integrate(model, f, func)
        # value agrees with direct statefile evaluation
        np.testing.assert_allclose(value, func(f), rtol=1e-10)

    # FD check of d value / d psub
    h = 1.0
    vals = []
    for s in (+h, -h):
        c = model.control.copy()
        c["psub"][:] = c["psub"] + s
        fin, _ = forward.integrate(
            model, None, ini, [c], model.prop, times, write=False
        )
        with sf.StateFile(model, str(tmp_path / f"fd{s}.h5"), mode="w") as g:
            forward.integrate(model, g, ini, [c], model.prop, times)
            vals.append(FinalDisplacementNorm(model)(g))
    fd = (vals[0] - vals[1]) / (2 * h)
    g_psub = float(np.sum(grads["controls"]["psub"]))
    np.testing.assert_allclose(g_psub, fd, rtol=1e-5)
