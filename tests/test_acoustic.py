"""
WRAnalog vocal-tract model tests (restores the reference's commented-out
acoustic model, reference ``models/transient.py:1147-1595``).
"""

import numpy as np
import pytest

from vf_fem_tpu import forward
from vf_fem_tpu.models.acoustic import WRAnalog, input_and_output_impedance
from vf_fem_tpu.functional import acoustic as fac


@pytest.fixture(scope="module")
def tract():
    model = WRAnalog(num_tube=20)
    # uniform tube of area 3 cm^2 with slight propagation loss
    model.prop["area"][:] = 3.0
    model.prop["proploss"][:] = 0.99
    model.prop["length"][:] = 17.0
    model.set_prop(model.prop)
    return model


def test_dt_locked(tract):
    dt = tract.dt
    c = float(tract.prop["soundspeed"][0])
    L = float(tract.prop["length"][0])
    np.testing.assert_allclose(dt, (2 * L / 20) / c)
    with pytest.raises(NotImplementedError):
        tract.dt = 1e-4


def test_step_propagates_wave(tract):
    state = tract.state0.copy()
    state[:] = 0.0
    tract.set_ini_state(state)
    tract.control["qin"][:] = 100.0
    tract.set_control(tract.control)
    # step a few times; a forward wave should appear and move
    p_mouth = []
    for _ in range(25):
        state1, _ = tract.solve_state1()
        tract.set_ini_state(state1)
        p_mouth.append(float(state1["pinc"][-1] + state1["pref"][-1]))
    p_mouth = np.array(p_mouth)
    assert np.all(np.isfinite(p_mouth))
    # wave needs ~num_tube/2 steps to reach the mouth
    assert np.allclose(p_mouth[:5], 0.0)
    assert np.abs(p_mouth).max() > 0


def test_scanned_integration_and_functionals(tract):
    times = tract.dt * np.arange(64)
    ini = tract.state0.copy()
    ini[:] = 0.0
    control = tract.control.copy()
    control["qin"][:] = 50.0
    fin, info = forward.integrate(
        tract, None, ini, [control], tract.prop, times, write=False
    )
    assert np.all(np.isfinite(fin.to_mono_ndarray()))

    # functionals over an in-memory trajectory
    import jax.numpy as jnp

    state0 = {k: np.asarray(v) for k, v in ini.sub_items()}
    cs = forward._stack_controls(tract, [control])
    prop_d = tract.prop_to_dict(tract.prop)
    _, traj, _ = forward.integrate_pure(tract, state0, cs, prop_d, times)

    func = fac.RmsRadiatedPressure(tract)
    val = func.eval_traj(
        {k: jnp.asarray(v) for k, v in traj.items()},
        jnp.asarray(times[1:]),
        {k: jnp.asarray(v) for k, v in cs.items()},
        {k: jnp.asarray(v) for k, v in prop_d.items()},
    )
    assert np.isfinite(float(val)) and float(val) > 0

    power = fac.AcousticPower(tract)
    val2 = power.eval_traj(
        {k: jnp.asarray(v) for k, v in traj.items()},
        jnp.asarray(times[1:]),
        {k: jnp.asarray(v) for k, v in cs.items()},
        {k: jnp.asarray(v) for k, v in prop_d.items()},
    )
    assert np.isfinite(float(val2)) and float(val2) >= 0


def test_impedance_finite(tract):
    zin, zout = input_and_output_impedance(tract, n=256)
    assert np.all(np.isfinite(zin))
    assert np.all(np.isfinite(zout))
    # input impedance of a closed-ish tube should have resonant structure
    assert np.abs(zin).max() > np.abs(zin).min()
