"""
Mixed-precision (f64 state / f32 factors) integration: the machinery for
reference-tolerance accuracy on TPU, validated on CPU where a pure-f64
reference is available.
"""

import numpy as np

import jax
import jax.numpy as jnp

from vf_fem_tpu import forward
from vf_fem_tpu.load import load_fsi_model
from vf_fem_tpu.mesh import vocal_fold_mesh
from vf_fem_tpu.mesh.reorder import rcm_mesh
from vf_fem_tpu.residuals import fluid as flr, solid as slr


def _mixed_precision_model():
    mesh = rcm_mesh(vocal_fold_mesh(10, 5))
    ymax = mesh.coords[:, 1].max()
    model = load_fsi_model(
        mesh, slr.KelvinVoigt, flr.BernoulliSmoothMinSep, coupling="explicit"
    )
    prop = model.prop
    prop["emod"][:] = 5e4
    prop["rho"][:] = 1.0
    prop["eta"][:] = 3.0
    prop["nu"][:] = 0.45
    prop["ycontact"][:] = ymax + 0.05
    prop["kcontact"][:] = 1e8
    prop["rho_air"][:] = 1.1225e-3
    prop["zeta_min"][:] = 1e-3
    prop["zeta_sep"][:] = 1e-3
    prop["ymid"][:] = ymax + 0.01
    model.set_prop(prop)
    model.control["psub"][:] = 8000.0
    model.set_control(model.control)

    state0 = {k: np.zeros_like(np.asarray(v))
              for k, v in model.state0.sub_items()}
    cs = forward._stack_controls(model, [model.control])
    pd = model.prop_to_dict(model.prop)
    times = np.asarray(5e-5 * np.arange(25))
    return model, state0, cs, pd, times


def _check_mixed(model, state0, cs, pd, times, traj_d, solver_params):
    fin_m, traj_m, infos_m = forward.integrate_pure(
        model, state0, cs, pd, times, solver_params
    )
    # reference tolerances met by every step despite f32 factors
    abs_err = np.asarray(infos_m.abs_err)
    rel_err = np.asarray(infos_m.rel_err)
    assert np.all((abs_err < 1e-8) | (rel_err < 1e-10))
    # trajectory at the f64 level
    du = np.abs(np.asarray(traj_m["u"]) - np.asarray(traj_d["u"])).max()
    uscale = np.abs(np.asarray(traj_d["u"])).max()
    assert du < 1e-10 * max(uscale, 1e-30)
    # factors really were f32 (the solve still returns f64)
    assert np.asarray(traj_m["u"]).dtype == np.float64


def test_f32_factor_newton_reaches_f64_floor():
    """With ``btd_factor_dtype='float32'`` the band factors and solves
    run in f32 while state + residuals stay f64; the residual-certified
    Newton must still reach the reference tolerances and reproduce the
    pure-f64 dense trajectory (the TPU mixed-precision contract —
    elementwise f64 exists there, f64 LU does not)."""
    model, state0, cs, pd, times = _mixed_precision_model()
    fin_d, traj_d, _ = forward.integrate_pure(
        model, state0, cs, pd, times, {"jacobian_refresh_steps": 1}
    )
    _check_mixed(
        model, state0, cs, pd, times, traj_d,
        {
            "linear_solver": "btd",
            "btd_factor_dtype": "float32",
            "jacobian_refresh_steps": 8,
            "absolute_tolerance": 1e-8,
            "relative_tolerance": 1e-10,
        },
    )
    # the SPIKE-partitioned direct solver (the distributed family)
    # honors the same mixed-precision contract
    _check_mixed(
        model, state0, cs, pd, times, traj_d,
        {
            "linear_solver": "spike",
            "spike_partitions": 4,
            "btd_factor_dtype": "float32",
            "jacobian_refresh_steps": 8,
            "absolute_tolerance": 1e-8,
            "relative_tolerance": 1e-10,
        },
    )
