"""
Per-step residual diagnostics
(reference: ``src/femvf/stepfunctional/base.py:8-22``).
"""

import numpy as np

from vf_fem_tpu.stepfunctional import make_residuals

from fixture_models import make_unit_solid_model, make_vf_fsi_model


def test_step_residuals_vanish_at_solution():
    """After solving a solid step, the per-block step residual norms are
    at the solver tolerance; at a wrong state they are O(1)."""
    model = make_unit_solid_model()
    model.dt = 1e-4
    control = model.control.copy()
    control["p"][:] = 500.0
    model.set_control(control)
    state0 = model.state0.copy()
    state0[:] = 0.0
    state1, info = model.solve_state1(state0)

    residuals = make_residuals(model)
    r = residuals(state1, state0, control, model.prop, 1e-4)
    assert set(r) == {"u", "v", "a"}
    assert r["u"] < 1e-5
    assert r["v"] < 1e-8 and r["a"] < 1e-8  # explicit Newmark updates

    bad = state1.copy()
    bad["u"] = np.asarray(bad["u"]) * 1.5 + 1e-3
    r_bad = residuals(bad, state0, control, model.prop, 1e-4)
    assert r_bad["u"] > 100 * max(r["u"], 1e-12)


def test_step_residuals_fsi_blocks():
    """The coupled model reports one residual norm per state block.  For
    the *explicit* (staggered) coupling the monolithic 'u' residual is
    nonzero at the staggered solution — the solid saw the previous
    step's pressure (reference explicit-coupling semantics,
    ``transient.py:821-920``); the fluid blocks are quasi-steady exact."""
    model = make_vf_fsi_model(nx=6, ny=3)
    model.dt = 1e-4
    state0 = model.state0.copy()
    state0[:] = 0.0
    state1, info = model.solve_state1(state0)

    r = make_residuals(model)(state1, state0, model.control, model.prop, 1e-4)
    assert set(r) == {"u", "v", "a", "q", "p"}
    assert r["q"] < 1e-6 and r["p"] < 1e-6
    assert np.isfinite(r["u"])
