"""
End-to-end phonation: the coupled model self-oscillates and the glottal
width signal has a physiological fundamental frequency
(reference: ``tests/test_forward.py:163-257``, which computed f0/amplitude
but asserted nothing).
"""

import numpy as np
import pytest

from vf_fem_tpu import forward
from vf_fem_tpu.misc.signal import fundamental_mode_from_rfft
from vf_fem_tpu.postprocess.solid import MinGlottalWidthFromSolid

from fixture_models import make_vf_fsi_model


@pytest.mark.slow
def test_self_oscillation_f0():
    from vf_fem_tpu.residuals import fluid as flr

    model = make_vf_fsi_model(FluidResidual=flr.BernoulliAreaRatioSep,
                              nx=16, ny=8)
    # softer fold + higher pressure to drive oscillation
    model.prop["emod"][:] = 3e4
    model.prop["eta"][:] = 2.0
    model.set_prop(model.prop)
    model.control["psub"][:] = 8000.0
    model.set_control(model.control)

    dt = 5e-5
    n_steps = 600
    times = dt * np.arange(n_steps + 1)
    ini = model.state0.copy()
    ini[:] = 0.0
    state0 = {k: np.asarray(v) for k, v in ini.sub_items()}
    cs = forward._stack_controls(model, [model.control])
    prop = model.prop_to_dict(model.prop)
    fin, traj, infos = forward.integrate_pure(model, state0, cs, prop, times)

    # glottal width signal from the displacement trajectory
    mesh = model.solid.residual.mesh()
    sdofs = np.asarray(model._solid_dofs)
    ymid = float(model.prop["ymid"][0])
    u = np.asarray(traj["u"]).reshape(n_steps, -1, 2)
    y_srf = mesh.coords[None, sdofs, 1] + u[:, sdofs, 1]
    gw = 2.0 * (ymid - y_srf.max(axis=1))

    assert np.all(np.isfinite(gw))
    # discard transient, analyze steady portion
    steady = gw[n_steps // 3 :]
    f0, amp = fundamental_mode_from_rfft(steady, dt)
    # physiological phonation range (CGS/Hz)
    assert 30.0 < f0 < 1000.0, f"f0 = {f0} Hz"
    assert amp > 1e-4, f"amplitude {amp} too small — no oscillation"
