"""
Per-step residual functionals
(reference: ``src/femvf/stepfunctional/base.py:8-22``).
"""

from __future__ import annotations

import numpy as np


def make_residuals(model):
    """
    Return a function mapping (state1, state0, control, prop, dt) to a dict
    of per-block residual norms for one time step — the reference's
    per-submodel step residual diagnostics.
    """

    def residuals(state1, state0, control, prop, dt):
        model.dt = dt
        model.set_ini_state(state0)
        model.set_fin_state(state1)
        model.set_control(control)
        model.set_prop(prop)
        res = model.assem_res()
        return {k: float(np.linalg.norm(v)) for k, v in res.sub_items()}

    return residuals
