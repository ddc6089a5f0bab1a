"""
End-to-end forward integration tests
(modelled on reference ``tests/test_forward.py:163-257``, with the
correctness assertions the reference lacks).
"""

import numpy as np
import pytest

from vf_fem_tpu import forward, statefile as sf
from vf_fem_tpu.blocks import BlockVector

from fixture_models import make_vf_fsi_model


@pytest.fixture(scope="module")
def model():
    return make_vf_fsi_model()


def test_integrate_writes_statefile(model, tmp_path):
    times = 2e-5 * np.arange(64)
    ini_state = model.state0.copy()
    ini_state[:] = 0.0

    path = str(tmp_path / "fwd.h5")
    with sf.StateFile(model, path, mode="w") as f:
        fin_state, info = forward.integrate(
            model, f, ini_state, [model.control], model.prop, times
        )
        assert f.size == len(times)
        # stored final state matches returned one
        stored = f.get_state(f.size - 1)
        for k in ("u", "v", "a", "q", "p"):
            np.testing.assert_allclose(stored[k], fin_state[k], rtol=1e-12)
        # all steps converged
        all_info = info["all"]
        assert np.all(all_info["abs_err"] < 1e-6)
        # physically active: flow is positive, fold moved
        assert float(np.abs(fin_state["u"]).max()) > 1e-6
        assert float(fin_state["q"][0]) > 0

    # sequential per-step integration matches the scanned loop
    model.set_ini_state(ini_state)
    state = ini_state
    for n in range(3):
        model.dt = times[n + 1] - times[n]
        state, _ = model.solve_state1(state)
        model.set_ini_state(state)
    with sf.StateFile(model, path, mode="r") as f:
        stored3 = f.get_state(3)
    for k in ("u", "q", "p"):
        np.testing.assert_allclose(
            stored3[k], state[k], rtol=1e-8, atol=1e-12
        )


def test_integrate_extend(model, tmp_path):
    times = 2e-5 * np.arange(10)
    ini_state = model.state0.copy()
    ini_state[:] = 0.0
    path = str(tmp_path / "ext.h5")

    with sf.StateFile(model, path, mode="w") as f:
        forward.integrate(model, f, ini_state, [model.control], model.prop, times)
        fin_a, _ = forward.integrate_extend(
            model, f, [model.control], 2e-5 * np.arange(6)
        )
        assert f.size == 15

    # one continuous run over the same 15 time points matches
    times_full = 2e-5 * np.arange(15)
    path2 = str(tmp_path / "full.h5")
    with sf.StateFile(model, path2, mode="w") as f2:
        fin_b, _ = forward.integrate(
            model, f2, ini_state, [model.control], model.prop, times_full
        )
    for k in ("u", "v", "a", "q", "p"):
        np.testing.assert_allclose(fin_a[k], fin_b[k], rtol=1e-9, atol=1e-13)


def test_integrate_validates_times(model):
    ini_state = model.state0.copy()
    with pytest.raises(ValueError):
        forward.integrate(
            model, None, ini_state, [model.control], model.prop, [], write=False
        )
    with pytest.raises(ValueError):
        forward.integrate(
            model, None, ini_state, [model.control], model.prop,
            [1.0, 0.5], write=False,
        )


def test_time_varying_controls(model):
    """Last control is held for remaining steps
    (reference: ``forward.py:170``)."""
    times = 2e-5 * np.arange(6)
    ini_state = model.state0.copy()
    ini_state[:] = 0.0

    ramp = []
    for fac in (0.25, 0.5, 1.0):
        c = model.control.copy()
        c["psub"][:] = 8000.0 * fac
        ramp.append(c)

    fin_ramp, _ = forward.integrate(
        model, None, ini_state, ramp, model.prop, times, write=False
    )
    fin_const, _ = forward.integrate(
        model, None, ini_state, [ramp[-1]], model.prop, times, write=False
    )
    # ramped start -> different trajectory than constant full pressure
    assert not np.allclose(fin_ramp["u"], fin_const["u"])


def test_windowed_integration_matches(model):
    """Windowed (chunked-scan) integration matches the single scan."""
    times = 2e-5 * np.arange(13)
    ini_state = model.state0.copy()
    ini_state[:] = 0.0
    fin_a, _ = forward.integrate(
        model, None, ini_state, [model.control], model.prop, times,
        write=False,
    )
    fin_b, _ = forward.integrate(
        model, None, ini_state, [model.control], model.prop, times,
        write=False, window=5, use_tqdm=True,
    )
    for k in ("u", "v", "a", "q", "p"):
        np.testing.assert_allclose(fin_a[k], fin_b[k], rtol=1e-10, atol=1e-14)


def test_integrate_linear_matches_fd(model, tmp_path):
    """Tangent propagation (reference ``integrate_linear``,
    ``forward.py:189-244``) matches a finite difference of the forward run."""
    times = 2e-5 * np.arange(6)
    ini_state = model.state0.copy()
    ini_state[:] = 0.0
    path = str(tmp_path / "lin.h5")
    with sf.StateFile(model, path, mode="w") as f:
        forward.integrate(model, f, ini_state, [model.control], model.prop, times)

        # perturbation direction: uniform psub bump
        dcontrol = model.control.copy()
        dcontrol[:] = 0.0
        dcontrol["psub"][:] = 1.0
        dstate = ini_state.copy()
        dstate[:] = 0.0
        dprop = model.prop.copy()
        dprop[:] = 0.0
        dtimes = np.zeros_like(times)

        dfin = forward.integrate_linear(
            model, f, dstate, [dcontrol], dprop, dtimes
        )

    h = 1.0
    cp, cm = model.control.copy(), model.control.copy()
    cp["psub"][:] = cp["psub"] + h
    cm["psub"][:] = cm["psub"] - h
    fp, _ = forward.integrate(
        model, None, ini_state, [cp], model.prop, times, write=False
    )
    fm, _ = forward.integrate(
        model, None, ini_state, [cm], model.prop, times, write=False
    )
    for k in ("u", "q", "p"):
        fd = (np.asarray(fp[k]) - np.asarray(fm[k])) / (2 * h)
        np.testing.assert_allclose(
            np.asarray(dfin[k]), fd, rtol=1e-4, atol=1e-12
        )


def test_line_search(model, tmp_path):
    """Batched line search writes per-step groups with consistent runs
    (reference: ``utils.py:16-57``)."""
    from vf_fem_tpu.utils import line_search

    times = 2e-5 * np.arange(5)
    ini_state = model.state0.copy()
    ini_state[:] = 0.0
    dstate = ini_state.copy()
    dstate[:] = 0.0
    dcontrol = model.control.copy()
    dcontrol[:] = 0.0
    dcontrol["psub"][:] = 1000.0
    dprop = model.prop.copy()
    dprop[:] = 0.0

    path = str(tmp_path / "ls.h5")
    line_search(
        [0.0, 1.0],
        model,
        ini_state,
        [model.control],
        model.prop,
        times,
        dstate,
        [dcontrol],
        dprop,
        np.zeros_like(times),
        filepath=path,
    )

    # h=1 run equals a direct run at psub + 1000
    c1 = model.control.copy()
    c1["psub"][:] = c1["psub"] + 1000.0
    fin_direct, _ = forward.integrate(
        model, None, ini_state, [c1], model.prop, times, write=False
    )
    with sf.StateFile(model, path, group="1", mode="r") as f:
        assert f.size == len(times)
        stored = f.get_state(f.size - 1)
    for k in ("u", "q", "p"):
        np.testing.assert_allclose(
            stored[k], fin_direct[k], rtol=1e-10, atol=1e-14
        )

    # functional evaluated on every stored run (reference utils.py:91-98)
    from vf_fem_tpu.utils import functional_on_line_search
    from vf_fem_tpu.functional.solid import FinalDisplacementNorm

    vals = functional_on_line_search(
        [0.0, 1.0], FinalDisplacementNorm(model), model, path
    )
    assert vals.shape == (2,)
    assert np.all(np.isfinite(vals))
    # h=1 raised psub by 1000 Ba: the fold must deflect more
    assert vals[1] > vals[0]


def test_stale_and_ns_refresh_match_exact(model):
    """Frozen-Jacobian windows and Newton–Schulz inverse refresh both
    reproduce the per-step-exact-Jacobian trajectory (the factors are a
    solver preconditioner; convergence is residual-certified)."""
    times = 5e-5 * np.arange(91)  # not divisible by the window: tests rem
    ini_state = model.state0.copy()
    ini_state[:] = 0.0
    state0 = {k: np.asarray(v) for k, v in ini_state.sub_items()}
    cs = forward._stack_controls(model, [model.control])
    prop = model.prop_to_dict(model.prop)

    fin_ref, traj_ref, _ = forward.integrate_pure(
        model, state0, cs, prop, times, {"jacobian_refresh_steps": 1}
    )
    fin_st, traj_st, info_st = forward.integrate_pure(
        model, state0, cs, prop, times, {"jacobian_refresh_steps": 8}
    )
    fin_ns, traj_ns, info_ns = forward.integrate_pure(
        model, state0, cs, prop, times,
        {
            "jacobian_refresh_steps": 8,
            "jacobian_refresh_mode": "ns",
            "jacobian_full_refresh_windows": 4,
        },
    )
    for fin, traj, info in ((fin_st, traj_st, info_st),
                            (fin_ns, traj_ns, info_ns)):
        np.testing.assert_allclose(
            np.asarray(traj["u"]), np.asarray(traj_ref["u"]),
            rtol=1e-8, atol=1e-11,
        )
        np.testing.assert_allclose(
            np.asarray(fin["u"]), np.asarray(fin_ref["u"]),
            rtol=1e-8, atol=1e-11,
        )
        assert np.all(np.asarray(info.abs_err) < 1e-6)


def test_extrapolated_guess_matches_and_grads_agree(model):
    """``initial_guess='extrapolated'`` (Newmark predictor + the previous
    step's converged correction carried through the scan) reproduces the
    default trajectory to solver tolerance — the converged state is
    guess-independent — on both the plain and the stale-factor scan paths,
    and the adjoint is unchanged (the IFT bwd rule's guess cotangent is
    exactly zero, so the carried correction contributes nothing)."""
    import jax
    import jax.numpy as jnp

    times = 5e-5 * np.arange(61)
    ini_state = model.state0.copy()
    ini_state[:] = 0.0
    state0 = {k: np.asarray(v) for k, v in ini_state.sub_items()}
    cs = forward._stack_controls(model, [model.control])
    prop = model.prop_to_dict(model.prop)

    for base in ({}, {"jacobian_refresh_steps": 8,
                      "jacobian_refresh_mode": "ns",
                      "jacobian_full_refresh_windows": 4,
                      "jacobian_update": "once_per_step"}):
        fin_a, traj_a, _ = forward.integrate_pure(
            model, state0, cs, prop, times, dict(base)
        )
        fin_b, traj_b, info_b = forward.integrate_pure(
            model, state0, cs, prop, times,
            dict(base, initial_guess="extrapolated"),
        )
        np.testing.assert_allclose(
            np.asarray(traj_b["u"]), np.asarray(traj_a["u"]),
            rtol=1e-8, atol=1e-11,
        )
        assert np.all(np.asarray(info_b.abs_err) < 1e-6)

    def loss(prop_d, prm):
        fin, traj, _ = forward.integrate_pure(
            model, state0, cs, prop_d, jnp.asarray(times), prm
        )
        return jnp.sum(traj["u"][-1] ** 2)

    g_a = jax.grad(loss)(prop, None)
    g_b = jax.grad(loss)(prop, {"initial_guess": "extrapolated"})
    for k in ("emod", "psub") if "psub" in g_a else ("emod",):
        ref = np.abs(np.asarray(g_a[k])).max()
        # Gradients agree because both runs converge well past the Newton
        # tolerance (quadratic convergence) and the IFT guess cotangent
        # is exactly zero; rtol matches the solver-tolerance level rather
        # than assuming convergence margin beyond it.
        np.testing.assert_allclose(
            np.asarray(g_b[k]), np.asarray(g_a[k]),
            rtol=1e-8, atol=1e-12 * max(ref, 1.0),
        )


def test_implicit_fsi_stale_matches_exact():
    """Implicit (Picard) coupling with window-frozen solid factors matches
    the per-step-exact implicit integration."""
    from vf_fem_tpu.residuals import fluid as flr
    from fixture_models import make_vf_fsi_model

    model = make_vf_fsi_model(
        FluidResidual=flr.BernoulliSmoothMinSep, coupling="implicit"
    )
    times = 5e-5 * np.arange(25)
    ini_state = model.state0.copy()
    ini_state[:] = 0.0
    state0 = {k: np.asarray(v) for k, v in ini_state.sub_items()}
    cs = forward._stack_controls(model, [model.control])
    prop = model.prop_to_dict(model.prop)

    fin_ref, traj_ref, _ = forward.integrate_pure(
        model, state0, cs, prop, times, {"jacobian_refresh_steps": 1}
    )
    fin_st, traj_st, info_st = forward.integrate_pure(
        model, state0, cs, prop, times, {"jacobian_refresh_steps": 8}
    )
    np.testing.assert_allclose(
        np.asarray(traj_st["u"]), np.asarray(traj_ref["u"]),
        rtol=1e-7, atol=1e-10,
    )
    # the Picard residual carries ~1/(beta dt^2) mass-scale terms, so the
    # meaningful convergence measure is relative
    assert np.all(np.asarray(info_st.rel_err) < 1e-10)
    assert np.all(np.asarray(info_st.abs_err) < 1e-4)


def test_implicit_fsi_aitken_matches_plain():
    """Aitken dynamic relaxation for the implicit Picard coupling (the
    partitioned-FSI accelerator; no reference analog) converges to the
    same trajectory with no more iterations."""
    from vf_fem_tpu.residuals import fluid as flr
    from fixture_models import make_vf_fsi_model

    model = make_vf_fsi_model(
        FluidResidual=flr.BernoulliSmoothMinSep, coupling="implicit"
    )
    times = 5e-5 * np.arange(15)
    ini_state = model.state0.copy()
    ini_state[:] = 0.0
    state0 = {k: np.asarray(v) for k, v in ini_state.sub_items()}
    cs = forward._stack_controls(model, [model.control])
    prop = model.prop_to_dict(model.prop)

    f0, _, i0 = forward.integrate_pure(model, state0, cs, prop, times, {})
    f1, _, i1 = forward.integrate_pure(
        model, state0, cs, prop, times, {"aitken": True}
    )
    np.testing.assert_allclose(
        np.asarray(f1["u"]), np.asarray(f0["u"]), rtol=1e-8, atol=1e-11
    )
    assert np.all(np.asarray(i1.rel_err) < 1e-10)
    assert np.asarray(i1.num_iter).mean() <= np.asarray(i0.num_iter).mean() + 0.5


def test_fixed_iteration_certification_guard(model):
    """An insufficient ``fixed_iterations`` count (the sweep-optimal
    configs are statically unrolled and skip the adaptive stagnation
    stop) is caught by the host-side residual certification in
    ``integrate`` (measured failure mode: fixed-2 left trajectories 8x
    worse at 53k DOFs while fixed-3 was at the noise floor)."""
    import warnings

    times = 2e-5 * np.arange(17)
    ini = model.state0.copy()
    ini[:] = 0.0

    with pytest.warns(RuntimeWarning, match="certification threshold"):
        fin, info = forward.integrate(
            model, None, ini, [model.control], model.prop, times,
            write=False,
            newton_solver_prm={
                "fixed_iterations": 1, "jacobian_refresh_steps": 8,
            },
        )
    assert info["uncertified_steps"] > 0

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        fin, info = forward.integrate(
            model, None, ini, [model.control], model.prop, times,
            write=False,
            newton_solver_prm={
                "fixed_iterations": 4, "jacobian_refresh_steps": 8,
            },
        )
    assert info["uncertified_steps"] == 0
