"""
Gradient-based inverse problem: recover tissue stiffness from a glottal
width signal.

This is the workflow the reference exists for (adjoint gradients of
trajectory functionals w.r.t. model parameters) — here it runs as plain
``jax.value_and_grad`` through the scanned FSI loop with optax.

A 'measured' glottal-width signal is synthesized with a target stiffness;
starting from a wrong stiffness, L-BFGS-free gradient descent (adam)
recovers it.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import numpy as np
import jax.numpy as jnp
import optax

from vf_fem_tpu import forward
from vf_fem_tpu.load import load_fsi_model
from vf_fem_tpu.mesh import vocal_fold_mesh
from vf_fem_tpu.residuals import fluid as flr, solid as slr


def build_model():
    mesh = vocal_fold_mesh(10, 5)
    ymax = mesh.coords[:, 1].max()
    model = load_fsi_model(
        mesh, slr.KelvinVoigt, flr.BernoulliSmoothMinSep, coupling="explicit"
    )
    prop = model.prop
    prop["rho"][:] = 1.0
    prop["eta"][:] = 3.0
    prop["ycontact"][:] = ymax + 0.05
    prop["kcontact"][:] = 1e8
    prop["rho_air"][:] = 1.1225e-3
    prop["zeta_min"][:] = 1e-3
    prop["zeta_sep"][:] = 1e-3
    prop["ymid"][:] = ymax + 0.01
    model.set_prop(prop)
    model.control["psub"][:] = 8000.0
    model.set_control(model.control)
    return model, mesh


def main():
    model, mesh = build_model()
    times = 2e-5 * np.arange(32)
    ini = model.state0.copy()
    ini[:] = 0.0
    state0 = {k: np.asarray(v) for k, v in ini.sub_items()}
    cs = forward._stack_controls(model, [model.control])
    prop0 = model.prop_to_dict(model.prop)
    sdofs = np.asarray(model._solid_dofs)
    ymid = float(model.prop["ymid"][0])
    ycoords = jnp.asarray(mesh.coords[sdofs, 1])

    def gw_signal(traj):
        u = traj["u"].reshape(len(times) - 1, -1, 2)
        y = ycoords[None, :] + u[:, sdofs, 1]
        return 2.0 * (ymid - y.max(axis=1))

    def simulate(log_emod):
        prop = dict(prop0)
        prop["emod"] = jnp.exp(log_emod) * jnp.ones_like(
            jnp.asarray(prop0["emod"])
        )
        fin, traj, infos = forward.integrate_pure(
            model, state0, cs, prop, times, use_remat=True
        )
        return gw_signal(traj)

    emod_true = 5e4
    gw_meas = simulate(jnp.log(emod_true))
    print(f"target emod = {emod_true:.3e}")

    def loss(log_emod):
        return jnp.sum((simulate(log_emod) - gw_meas) ** 2) * 1e4

    value_and_grad = jax.jit(jax.value_and_grad(loss))

    log_emod = jnp.log(2e4)  # start 2.5x too soft
    schedule = optax.exponential_decay(0.15, 10, 0.5)
    opt = optax.adam(schedule)
    opt_state = opt.init(log_emod)
    for it in range(60):
        val, g = value_and_grad(log_emod)
        updates, opt_state = opt.update(g, opt_state)
        log_emod = optax.apply_updates(log_emod, updates)
        if it % 10 == 0:
            print(
                f"iter {it:2d}: J = {float(val):.3e},"
                f" emod = {float(jnp.exp(log_emod)):.3e}"
            )

    emod_final = float(jnp.exp(log_emod))
    err = abs(emod_final - emod_true) / emod_true
    print(f"recovered emod = {emod_final:.3e} (rel err {err:.1%})")
    assert err < 0.05, "optimization failed to recover stiffness"


if __name__ == "__main__":
    main()
