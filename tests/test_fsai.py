"""
Two-way coupled fluid-solid-acoustic (FSAI) model tests: the WRA vocal
tract inside the scanned step, its feedback on phonation, the acoustic
functionals on a truly coupled run, gradients through the coupling, and
a golden-trajectory regression.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vf_fem_tpu import forward
from vf_fem_tpu.load import load_fsai_model, load_fsi_model
from vf_fem_tpu.mesh import vocal_fold_mesh
from vf_fem_tpu.residuals import fluid as flr, solid as slr

GOLDEN = os.path.join(
    os.path.dirname(__file__), "data", "golden_fsai_explicit.npz"
)


def make_fsai_model(nx=10, ny=5, num_tube=12):
    mesh = vocal_fold_mesh(nx, ny)
    ymax = mesh.coords[:, 1].max()
    model = load_fsai_model(
        mesh, slr.KelvinVoigt, flr.BernoulliSmoothMinSep,
        num_tube=num_tube,
    )
    prop = model.prop
    prop["emod"][:] = 5e4
    prop["rho"][:] = 1.0
    prop["eta"][:] = 3.0
    prop["nu"][:] = 0.45
    # contact plane BELOW the channel midline: collision stops closure
    # while the glottal area is still positive (area 2*(ymid-ycontact) =
    # 0.01 at full contact), as in phonation.  With contact above ymid
    # the fold would close straight through the midline into negative
    # areas — an unphysical regime the earlier golden accidentally
    # encoded.
    prop["ycontact"][:] = ymax + 0.005
    prop["kcontact"][:] = 1e8
    prop["rho_air"][:] = 1.1225e-3
    prop["zeta_min"][:] = 1e-3
    prop["zeta_sep"][:] = 1e-3
    prop["ymid"][:] = ymax + 0.01
    # a short /a/-ish tract: narrow pharynx, wide mouth
    n = model.acoustic.num_tube
    prop["area"][:] = np.concatenate(
        [np.full(n // 2, 0.6), np.full(n - n // 2, 2.6)]
    )
    prop["proploss"][:] = 1.0
    model.set_prop(prop)
    model.control["psub"][:] = 8000.0
    model.set_control(model.control)
    return model


def _run(model, n_steps, prop=None):
    state0 = {k: np.zeros_like(np.asarray(v))
              for k, v in model.state0.sub_items()}
    cs = forward._stack_controls(model, [model.control])
    pd = prop if prop is not None else model.prop_to_dict(model.prop)
    times = model.dt * np.arange(n_steps + 1)
    return forward.integrate_pure(model, state0, cs, pd, times), times


def test_fsai_two_way_coupling_changes_phonation():
    """Acoustic loading must feed BACK into the fluid: the coupled run's
    glottal flow differs measurably from an uncoupled (psup = 0) FSI run
    at the same dt, and the tract state is genuinely driven."""
    model = make_fsai_model()
    (fin, traj, infos), times = _run(model, 160)
    q = np.asarray(traj["q"]).ravel()
    assert np.all(np.isfinite(q)) and np.abs(q).max() > 1.0
    prad = np.asarray(traj["pinc"])[:, -1] + np.asarray(traj["pref"])[:, -1]
    assert np.abs(prad).max() > 1e-3

    # uncoupled reference: same solid/fluid, psup pinned to zero
    fsi = model.fsi
    state0 = {k: np.zeros_like(np.asarray(v))
              for k, v in fsi.state0.sub_items()}
    cs = forward._stack_controls(fsi, [fsi.control])
    pd = fsi.prop_to_dict(fsi.prop)
    _, traj_u, _ = forward.integrate_pure(
        fsi, state0, cs, pd, times
    )
    q_unc = np.asarray(traj_u["q"]).ravel()
    dq = np.abs(q - q_unc).max()
    assert dq > 1e-6 * max(np.abs(q).max(), 1.0), (
        "tract feedback had no effect on the glottal flow"
    )


def test_fsai_acoustic_functionals_and_grad():
    """The acoustic functionals evaluate on the coupled trajectory, and
    gradients flow through the two-way coupling (tract props included)."""
    from vf_fem_tpu.functional.acoustic import RmsRadiatedPressure

    model = make_fsai_model(nx=8, ny=4)
    state0 = {k: np.zeros_like(np.asarray(v))
              for k, v in model.state0.sub_items()}
    cs = forward._stack_controls(model, [model.control])
    pd = model.prop_to_dict(model.prop)
    times = jnp.asarray(model.dt * np.arange(41))

    func = RmsRadiatedPressure(model)

    def loss(p):
        fin, traj, _ = forward.integrate_pure(
            model, state0, cs, p, times, use_remat=True
        )
        full = {
            k: jnp.concatenate(
                [jnp.asarray(state0[k])[None], traj[k]], axis=0
            )
            for k in traj
        }
        return func.eval_traj(full, times, cs, p)

    val, grads = jax.value_and_grad(loss)(pd)
    assert np.isfinite(float(val)) and float(val) > 0
    # sensitivity reaches the solid (through the full acoustic chain)
    # and the tract geometry
    assert np.all(np.isfinite(np.asarray(grads["emod"])))
    assert float(np.abs(np.asarray(grads["emod"])).sum()) > 0
    assert np.all(np.isfinite(np.asarray(grads["area"])))
    assert float(np.abs(np.asarray(grads["area"])).sum()) > 0

    # FD check of d/d(psub) through the coupled loop
    g_psub = float(
        jax.grad(
            lambda c: loss_with_control(model, state0, cs, pd, times,
                                        func, c)
        )(jnp.asarray(8000.0))
    )
    h = 1.0
    vp = loss_with_control(model, state0, cs, pd, times, func,
                           jnp.asarray(8000.0 + h))
    vm = loss_with_control(model, state0, cs, pd, times, func,
                           jnp.asarray(8000.0 - h))
    fd = (float(vp) - float(vm)) / (2 * h)
    np.testing.assert_allclose(g_psub, fd, rtol=1e-4)


def loss_with_control(model, state0, cs, pd, times, func, psub):
    cs2 = {**cs, "psub": jnp.full_like(jnp.asarray(cs["psub"]), psub)}
    fin, traj, _ = forward.integrate_pure(
        model, state0, cs2, pd, times, use_remat=True
    )
    full = {
        k: jnp.concatenate(
            [jnp.asarray(state0[k])[None], traj[k]], axis=0
        )
        for k in traj
    }
    return func.eval_traj(full, times, cs2, pd)


def test_fsai_stale_matches_exact():
    """The stale-factor FSAI integrator reproduces the exact-Jacobian
    coupled trajectory."""
    model = make_fsai_model(nx=8, ny=4)
    state0 = {k: np.zeros_like(np.asarray(v))
              for k, v in model.state0.sub_items()}
    cs = forward._stack_controls(model, [model.control])
    pd = model.prop_to_dict(model.prop)
    times = model.dt * np.arange(33)
    _, t0_, _ = forward.integrate_pure(
        model, state0, cs, pd, times, {"jacobian_refresh_steps": 1}
    )
    _, t1_, _ = forward.integrate_pure(
        model, state0, cs, pd, times, {"jacobian_refresh_steps": 8}
    )
    np.testing.assert_allclose(
        np.asarray(t1_["u"]), np.asarray(t0_["u"]), rtol=1e-8, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(t1_["pref"]), np.asarray(t0_["pref"]),
        rtol=1e-8, atol=1e-12,
    )


@pytest.mark.skipif(not os.path.exists(GOLDEN), reason="no golden data")
def test_fsai_trajectory_matches_golden():
    data = np.load(GOLDEN)
    model = make_fsai_model()
    (fin, traj, infos), times = _run(model, int(data["n_steps"]))
    np.testing.assert_allclose(
        np.asarray(traj["u"])[::8], data["u"], rtol=1e-8, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(traj["q"]).ravel(), data["q"], rtol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(traj["pref"])[-1], data["pref_final"],
        rtol=1e-8, atol=1e-10,
    )


if __name__ == "__main__":
    # regenerate the golden trajectory (deliberate action only); force
    # the CPU f64 backend like conftest does for pytest runs
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    model = make_fsai_model()
    n_steps = 160
    (fin, traj, infos), times = _run(model, n_steps)
    np.savez(
        GOLDEN,
        n_steps=n_steps,
        times=times,
        u=np.asarray(traj["u"])[::8],
        q=np.asarray(traj["q"]).ravel(),
        pref_final=np.asarray(traj["pref"])[-1],
    )
    print("wrote", GOLDEN)


def test_fsai_statefile_roundtrip(tmp_path):
    """FSAI trajectories persist through the reference-schema statefile
    (acoustic state blocks included) and resume exactly."""
    from vf_fem_tpu import statefile as sf

    model = make_fsai_model(nx=8, ny=4)
    ini = model.state0.copy()
    ini[:] = 0.0
    times = model.dt * np.arange(9)
    path = str(tmp_path / "fsai.h5")
    with sf.StateFile(model, path, mode="w") as f:
        fin, info = forward.integrate(
            model, f, ini, [model.control], model.prop, times
        )
        assert f.size == len(times)
        stored = f.get_state(f.size - 1)
        for k in ("u", "q", "pinc", "pref"):
            np.testing.assert_allclose(
                stored[k], fin[k], rtol=1e-12, atol=1e-14
            )
        # resume for 4 more steps and compare against one 12-step run
        fin2, _ = forward.integrate_extend(
            model, f, [model.control], model.dt * np.arange(5)
        )
    fin_full, _ = forward.integrate(
        model, None, ini, [model.control], model.prop,
        model.dt * np.arange(13), write=False,
    )
    for k in ("u", "pinc", "pref"):
        np.testing.assert_allclose(
            np.asarray(fin2[k]), np.asarray(fin_full[k]),
            rtol=1e-9, atol=1e-12,
        )


def test_fsai_strong_interaction_regime_stays_bounded():
    """Contact above the midline (the fold closes through ymid into the
    clamped-area regime) makes the source-tract map non-contractive —
    the regime where a damped Picard iteration runs away (historically
    |u| ~ 1e46 within one step).  The bracketed root solve
    (``solve_flow_root``) does not need a contraction: the coupled flow
    still converges each step and the run stays bounded."""
    model = make_fsai_model(nx=8, ny=4)
    prop = model.prop
    ymax = float(np.asarray(model.solid._Xref)[:, 1].max())
    prop["ycontact"][:] = ymax + 0.05  # above ymid: unsupported regime
    model.set_prop(prop)
    (fin, traj, infos), times = _run(model, 160)
    q = np.asarray(traj["q"])
    u = np.asarray(traj["u"])
    assert np.all(np.isfinite(q)) and np.all(np.isfinite(u))
    assert np.abs(q).max() < 1e8 and np.abs(u).max() < 1e3


def test_fsai_envelope_guard_warns():
    """The envelope guard (round-4): a midline-crossing configuration
    (contact plane at/above ymid) must raise a RuntimeWarning at
    ``integrate`` entry instead of silently stepping into the regime
    where the flow solve degrades to the lagged exchange."""
    model = make_fsai_model(nx=8, ny=4)
    prop = model.prop
    ymax = float(np.asarray(model.solid._Xref)[:, 1].max())
    prop["ycontact"][:] = ymax + 0.05  # above ymid: out of envelope
    model.set_prop(prop)
    ini = model.state0.copy()
    ini[:] = 0.0
    times = model.dt * np.arange(4)
    with pytest.warns(RuntimeWarning, match="outside the supported envelope"):
        fin, info = forward.integrate(
            model, None, ini, [model.control], prop, times, write=False
        )
    # the runtime telemetry is present on every FSAI run
    assert "lagged_fallback_steps" in info

    # in-envelope runs pass the guard silently and report zero fallbacks
    model2 = make_fsai_model(nx=8, ny=4)
    assert model2.check_envelope()
    fin2, info2 = forward.integrate(
        model2, None, ini, [model2.control], model2.prop, times,
        write=False,
    )
    assert info2["lagged_fallback_steps"] == 0


def test_solve_flow_root_reports_bracket_failure():
    """A root-free coupled map (g(q) = f(q) - q with no sign change in
    reach) must come back flagged ``bracketed=False`` and fall back to
    the lagged flow, which is what the integrate-level warning counts."""
    from vf_fem_tpu.models.fsai import solve_flow_root

    # f(q) = q + 1: g(q) = 1 everywhere — no root exists at all
    def fluid_at(q):
        return {"q": jnp.reshape(q + 1.0, (1,)), "p": jnp.zeros((3,))}

    q0 = jnp.asarray([2.5])
    out, bracketed = solve_flow_root(fluid_at, q0, n_expand=4, n_bisect=8)
    assert not bool(bracketed)
    # lagged fallback: the fluid is evaluated AT the previous flow
    np.testing.assert_allclose(np.asarray(out["q"]), [3.5], rtol=1e-12)
