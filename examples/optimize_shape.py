"""
Gradient-based SHAPE optimization: recover the prephonatory fold shape
from a glottal-width signal.

This is the flagship differentiable-FEM workflow (reference shape
calculus: ``equations/form.py:1037-1062`` + the TractionShape transform
``transform.py:187-333``): a surface traction field parameterizes the
mesh displacement ``umesh = K^{-1} T t`` through an auxiliary elastic
solve, the transient FSI loop runs on the displaced geometry, and the
adjoint gradient chains back through BOTH the scanned time loop
(``jax.value_and_grad`` over ``integrate_pure``) and the transform
(``TractionShape.apply_vjp`` = transposed elastic solve).

The traction lives in a 3-mode smooth basis; a target surface-edge
trajectory (the kymogram a high-speed camera records — the scalar
glottal width alone is rank-deficient in these modes) is synthesized at
a known mode vector and gradient descent recovers it from zero.  The identical code path scales: at 23.7k+ dofs
``TractionShape`` switches to the block-banded/Thomas factorization
(``solver='auto'``, certified in
``tests/test_functional.py::test_traction_shape_large_mesh_23k``) and
the time-loop gradient to the banded stale-factor adjoint.
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
from vf_fem_tpu.parameters import transform as tf
from vf_fem_tpu.residuals import fluid as flr, solid as slr


def build_model():
    mesh = vocal_fold_mesh(10, 5)
    ymax = mesh.coords[:, 1].max()
    model = load_fsi_model(
        mesh, slr.KelvinVoigtWShape, flr.BernoulliSmoothMinSep,
        coupling="explicit",
    )
    prop = model.prop
    prop["emod"][:] = 5e4
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


def traction_modes(mesh, shape_map, n_modes=3, target_umesh=3e-3):
    """Smooth y-traction modes sin(k pi s) over the fold length, each
    column scaled so a unit coefficient displaces the mesh ~target."""
    X = mesh.coords
    s = (X[:, 0] - X[:, 0].min()) / max(np.ptp(X[:, 0]), 1e-9)
    nvert = X.shape[0]
    B = np.zeros((2 * nvert, n_modes))
    for k in range(n_modes):
        t = np.zeros((nvert, 2))
        t[:, 1] = np.sin((k + 1) * np.pi * s)
        B[:, k] = t.reshape(-1)
        x = shape_map.x.copy()
        x["tmesh"] = B[:, k]
        umax = np.abs(np.asarray(shape_map.apply(x)["umesh"])).max()
        B[:, k] *= target_umesh / max(umax, 1e-30)
    return B


def main():
    model, mesh = build_model()
    shape_map = tf.TractionShape(model.solid)  # auto: dense here, banded >6k
    B = traction_modes(mesh, shape_map)
    n_modes = B.shape[1]

    times = 2e-5 * np.arange(32)
    ini = model.state0.copy()
    ini[:] = 0.0
    state0 = {k: np.asarray(v) for k, v in ini.sub_items()}
    cs = forward._stack_controls(model, [model.control])
    prop0 = model.prop_to_dict(model.prop)
    sdofs = np.asarray(model._solid_dofs)
    ymid = float(model.prop["ymid"][0])
    ycoords = jnp.asarray(mesh.coords[sdofs, 1])

    def edge_signal(traj, umesh):
        # the fold's moving upper edge: y(t) of every surface vertex —
        # what a kymogram observes (the scalar max-based glottal width
        # sees only the peak vertex and is rank-deficient in the modes)
        u = traj["u"].reshape(len(times) - 1, -1, 2)
        um = umesh.reshape(-1, 2)
        return (ycoords + um[sdofs, 1])[None, :] + u[:, sdofs, 1]

    def simulate(umesh):
        prop = dict(prop0)
        prop["umesh"] = umesh
        fin, traj, infos = forward.integrate_pure(
            model, state0, cs, prop, times, use_remat=True
        )
        return edge_signal(traj, umesh)

    def umesh_of(c):
        x = shape_map.x.copy()
        x["tmesh"] = B @ np.asarray(c)
        return np.asarray(shape_map.apply(x)["umesh"])

    c_true = np.array([1.0, -0.6, 0.4])
    umesh_true = umesh_of(c_true)
    edge_meas = jnp.asarray(simulate(jnp.asarray(umesh_true)))
    print(
        f"target modes = {c_true}, |umesh|max = {np.abs(umesh_true).max():.2e}"
        f" cm, edge y range"
        f" [{float(edge_meas.min()):.4f}, {float(edge_meas.max()):.4f}]"
    )

    def loss_umesh(umesh):
        return jnp.sum((simulate(umesh) - edge_meas) ** 2) * 1e6

    value_and_grad = jax.jit(jax.value_and_grad(loss_umesh))

    def value_and_grad_c(c):
        # chain: c -> tmesh (basis) -> umesh (elastic solve) -> loss
        umesh = umesh_of(c)
        val, g_umesh = value_and_grad(jnp.asarray(umesh))
        hy = shape_map.y.copy()
        hy[:] = 0.0
        hy["umesh"] = np.asarray(g_umesh)
        x = shape_map.x.copy()
        x["tmesh"] = B @ np.asarray(c)
        g_tmesh = np.asarray(shape_map.apply_vjp(x, hy)["tmesh"])
        return float(val), B.T @ g_tmesh

    c = np.zeros(n_modes)
    opt = optax.adam(optax.exponential_decay(0.25, 20, 0.5))
    opt_state = opt.init(jnp.asarray(c))
    J0 = None
    for it in range(80):
        val, g = value_and_grad_c(c)
        if J0 is None:
            J0 = val
        updates, opt_state = opt.update(jnp.asarray(g), opt_state)
        c = np.asarray(optax.apply_updates(jnp.asarray(c), updates))
        if it % 10 == 0:
            print(f"iter {it:2d}: J = {val:.3e}, c = {np.round(c, 3)}")

    val, _ = value_and_grad_c(c)
    err = np.linalg.norm(c - c_true) / np.linalg.norm(c_true)
    print(
        f"recovered c = {np.round(c, 4)} (rel err {err:.1%}),"
        f" misfit {val:.3e} (from {J0:.3e})"
    )
    assert err < 0.05, "shape optimization failed to recover the modes"
    assert val < 1e-4 * J0, "misfit did not collapse"


if __name__ == "__main__":
    main()
