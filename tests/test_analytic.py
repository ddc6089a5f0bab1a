"""
Analytic-solution validation (BASELINE config 1).

FEniCS is not installable in this environment, so these closed-form checks
stand in for the reference cross-validation (reference static solver:
``src/femvf/static.py:67-168``):

1. Patch test: for an affine displacement field the linear-elastic stress
   is constant, so interior FEM residual entries vanish *exactly* and
   boundary entries equal the closed-form traction integrals.
2. Uniaxial exact solve: with nu = 0, a unit square clamped at y=0 under
   uniform pressure p on y=1 has the exact solution u = (0, -p/E * y),
   affine and therefore reproduced exactly by P1 elements.  The only model
   nonlinearity is the follower (cofactor-pullback) pressure, O(p/E)
   relative; at p/E = 1e-8 the solve matches the closed form to ~1e-8
   relative / ~1e-16 absolute.
3. Newmark temporal convergence: free vibration from a static preload
   converges at second order in dt (gamma=1/2, beta=1/4).
"""

import numpy as np
import pytest

from vf_fem_tpu import forward, static
from vf_fem_tpu.load import load_solid_model
from vf_fem_tpu.mesh import unit_square_mesh
from vf_fem_tpu.residuals import solid as slr

EMOD = 1e4


def _uniaxial_model(nx=5, ny=5):
    """Unit square: clamped bottom, pressure on the top edge only."""
    mesh = unit_square_mesh(nx, ny)
    eps = 1e-12

    def on_bottom(mids, vcoords):
        return np.all(vcoords[..., 1] < eps, axis=-1)

    def on_top(mids, vcoords):
        return np.all(vcoords[..., 1] > 1 - eps, axis=-1)

    mesh.mark_entities(1, on_bottom, 1, name="fixed", boundary_only=True)
    mesh.mark_entities(1, on_top, 2, name="pressure", boundary_only=True)

    model = load_solid_model(mesh, slr.KelvinVoigt)
    prop = model.prop
    prop["emod"][:] = EMOD
    prop["nu"][:] = 0.0
    prop["rho"][:] = 1.0
    prop["eta"][:] = 0.0
    prop["ycontact"][:] = 1e6  # contact disabled
    prop["kcontact"][:] = 0.0
    model.set_prop(prop)
    return mesh, model


def test_patch_test_interior_residual_vanishes():
    """Affine u => constant stress => zero interior residual (exact)."""
    import jax.numpy as jnp

    mesh, model = _uniaxial_model(4, 3)
    # affine displacement: u = A x + b
    A = np.array([[2e-3, 1e-3], [-5e-4, 3e-3]])
    b = np.array([1e-3, -2e-3])
    u = (mesh.coords @ A.T + b).reshape(-1)

    state1 = {
        "u": jnp.asarray(u),
        "v": jnp.zeros_like(jnp.asarray(u)),
        "a": jnp.zeros_like(jnp.asarray(u)),
    }
    control = {"p1": jnp.zeros(mesh.num_vertices)}
    prop = model.prop_to_dict(model.prop)
    res = np.asarray(
        model.res_u_static(state1["u"], control, prop)
    ).reshape(-1, 2)

    # interior vertices: not on the boundary, unconstrained
    bverts = np.unique(mesh.facets[mesh.boundary_facets].reshape(-1))
    interior = np.setdiff1d(np.arange(mesh.num_vertices), bverts)
    assert interior.size > 0
    scale = np.abs(res).max()
    assert scale > 0  # boundary rows carry the traction integrals
    np.testing.assert_allclose(res[interior], 0.0, atol=1e-14 * scale)

    # boundary rows equal the closed-form traction integral of the
    # constant stress: r_i = sum_facets |f|/2 * (sigma . n)
    eps = 0.5 * (A + A.T)
    eps3 = np.zeros((3, 3))
    eps3[:2, :2] = eps
    E, nu = EMOD, 0.0
    lam = E * nu / ((1 + nu) * (1 - 2 * nu))
    mu = E / (2 * (1 + nu))
    sig = (lam * np.trace(eps3) * np.eye(3) + 2 * mu * eps3)[:2, :2]

    expected = np.zeros((mesh.num_vertices, 2))
    for f in mesh.boundary_facets:
        va, vb = mesh.facets[f]
        xa, xb = mesh.coords[va], mesh.coords[vb]
        t = xb - xa
        length = np.linalg.norm(t)
        # outward normal: the facet's cell centroid lies inside
        n = np.array([t[1], -t[0]]) / length
        cell = mesh.facet_to_cell[f]
        cen = mesh.coords[mesh.cells[cell]].mean(axis=0)
        if np.dot(cen - 0.5 * (xa + xb), n) > 0:
            n = -n
        tr = sig @ n * (length / 2)
        expected[va] += tr
        expected[vb] += tr
    # Dirichlet rows hold the BC identity (u - 0), not tractions
    free = np.ones(mesh.num_vertices, dtype=bool)
    fixed_facets = mesh.facets_by_subdomain(["fixed"])
    free[np.unique(mesh.facets[fixed_facets].reshape(-1))] = False
    np.testing.assert_allclose(
        res[free], expected[free], atol=1e-12 * scale
    )


def test_uniaxial_static_solve_matches_closed_form():
    """BASELINE config 1: static solve matches the exact displacement
    field (nu=0 uniaxial compression)."""
    p_over_E = 1e-8
    mesh, model = _uniaxial_model(6, 7)
    control = model.control.copy()
    control["p"][:] = p_over_E * EMOD
    state, info = static.static_solid_configuration(
        model, control, model.prop,
        options={"absolute_tolerance": 1e-16, "relative_tolerance": 1e-14},
    )
    u = np.asarray(state["u"]).reshape(-1, 2)
    u_exact = np.zeros_like(u)
    u_exact[:, 1] = -p_over_E * mesh.coords[:, 1]

    err = np.abs(u - u_exact).max()
    assert err < 1e-8 * p_over_E  # ~follower-load nonlinearity floor
    assert info["abs_err"] < 1e-12


def test_newmark_temporal_convergence():
    """Second-order (gamma=1/2, beta=1/4) convergence of the transient
    solid: free vibration from a uniaxial preload; Richardson ratios of
    the final displacement approach 4 as dt halves."""
    mesh, model = _uniaxial_model(4, 4)
    prop = model.prop
    prop["eta"][:] = 0.5  # some damping to keep the motion smooth
    model.set_prop(prop)

    # initial condition: static preload, then release (p = 0)
    control = model.control.copy()
    control["p"][:] = 0.05 * EMOD
    state0_bv, _ = static.static_solid_configuration(model, control, model.prop)
    release = model.control.copy()
    release["p"][:] = 0.0

    T = 2e-3
    state0 = {k: np.asarray(v) for k, v in state0_bv.sub_items()}
    cs = forward._stack_controls(model, [release])
    prop_d = model.prop_to_dict(model.prop)

    # consistent initial acceleration a(0) = M^-1 (f - K u0 - C v0):
    # Newmark needs it as data or the first step injects an O(dt) error
    # that destroys the second-order rate.  A micro-step recovers it.
    tiny = 1e-4 * T  # small enough for a(0) accuracy, large enough that
    # u1 - u0 ~ dt^2 a stays far above f64 cancellation
    fin0, _, _ = forward.integrate_pure(
        model, state0, cs, prop_d, np.array([0.0, tiny]),
        {"absolute_tolerance": 1e-16, "relative_tolerance": 1e-15},
    )
    state0["a"] = np.asarray(fin0["a"])

    finals = []
    for n_steps in (8, 16, 32, 64):
        times = np.linspace(0.0, T, n_steps + 1)
        fin, _, _ = forward.integrate_pure(
            model, state0, cs, prop_d, times,
            {"absolute_tolerance": 1e-14, "relative_tolerance": 1e-14},
        )
        finals.append(np.asarray(fin["u"]))
    errs = [
        np.linalg.norm(finals[i] - finals[i + 1])
        for i in range(len(finals) - 1)
    ]
    rates = [errs[i] / errs[i + 1] for i in range(len(errs) - 1)]
    # second order: ratios ~4
    for r in rates:
        assert 3.0 < r < 5.5, rates
