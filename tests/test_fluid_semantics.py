"""
Quantitative Bernoulli semantics on a triangular constriction
(reference checks this shape qualitatively,
``tests/residuals/test_fluid.py:37-51``; here the values are asserted
against the closed-form Bernoulli relations of ``fluid.py:17-34``).
"""

import numpy as np
import pytest

from vf_fem_tpu.load import load_fluid_model, load_fsi_model
from vf_fem_tpu.mesh import mark_unit_mesh_fixtures, unit_square_mesh
from vf_fem_tpu.residuals import fluid as flr, solid as slr


def _triangular_channel(n=21):
    s = np.linspace(0.0, 1.0, n)
    # area narrows linearly to a_min at the midpoint then widens
    a_min, a_max = 0.1, 1.0
    area = a_max - (a_max - a_min) * (1 - np.abs(2 * s - 1))
    return s, area, a_min


def test_fixed_sep_matches_closed_form():
    s, area, a_min = _triangular_channel()
    idx_sep = len(s) // 2  # separation at the constriction
    model = load_fluid_model(s, flr.BernoulliFixedSep, idx_sep=idx_sep)
    rho = 1.2e-3
    psub, psup = 8000.0, 0.0
    model.control["area"][:] = area
    model.control["psub"][:] = psub
    model.control["psup"][:] = psup
    model.prop["rho_air"][:] = rho
    model.set_control(model.control)
    model.set_prop(model.prop)

    qp, _ = model.solve_state1(model.state1)
    q = float(qp["q"][0])
    p = np.asarray(qp["p"])

    a_sep = area[idx_sep]
    q_exact = np.sqrt(2 / rho * (psub - psup) / (a_sep**-2))
    np.testing.assert_allclose(q, q_exact, rtol=1e-12)

    # upstream pressure follows Bernoulli; downstream of separation = psup
    p_exact = psup + 0.5 * rho * q_exact**2 * (a_sep**-2 - area**-2)
    np.testing.assert_allclose(p[:idx_sep + 1], p_exact[:idx_sep + 1],
                               rtol=1e-10)
    np.testing.assert_allclose(p[idx_sep + 1:], psup, atol=1e-10)

    # pressure recovers the full stagnation value far upstream (wide area)
    assert p[0] < psub
    # minimum pressure at the constriction (before separation)
    assert np.argmin(p[: idx_sep + 1]) == idx_sep


def test_area_ratio_sep_separation_point():
    s, area, a_min = _triangular_channel()
    model = load_fluid_model(s, flr.BernoulliAreaRatioSep)
    rho = 1.2e-3
    model.control["area"][:] = area
    model.control["psub"][:] = 8000.0
    model.control["psup"][:] = 0.0
    model.prop["rho_air"][:] = rho
    model.prop["r_sep"][:] = 1.2
    model.prop["area_lb"][:] = 1e-6
    model.set_control(model.control)
    model.set_prop(model.prop)

    qp, _ = model.solve_state1(model.state1)
    p = np.asarray(qp["p"])
    q = float(qp["q"][0])

    # separation where area first reaches r_sep * a_min downstream of min
    i_min = int(np.argmin(area))
    a_sep = 1.2 * area[i_min]
    i_sep = i_min + int(np.argmin(np.abs(area[i_min:] - a_sep)))
    q_exact = np.sqrt(2 / rho * 8000.0 / (a_sep**-2))
    np.testing.assert_allclose(q, q_exact, rtol=1e-10)
    # beyond separation the pressure equals psup
    np.testing.assert_allclose(p[i_sep:], 0.0, atol=1e-9)


def test_fixed_sep_idx_from_mesh_label():
    """load_fsi_model wires idx_sep from the 'separation' vertex label
    (resolves the reference TODO at ``residuals/fluid.py:56-57``)."""
    mesh = mark_unit_mesh_fixtures(unit_square_mesh(4, 4))
    model = load_fsi_model(
        mesh, slr.KelvinVoigt, flr.BernoulliFixedSep, coupling="explicit"
    )
    # the separation vertex is the top-right corner; it must appear in the
    # interface dof list and idx_sep must point at it
    from vf_fem_tpu.mesh import locate_separation_vertex

    sep_vert = locate_separation_vertex(mesh)
    sdofs = np.asarray(model._solid_dofs)
    idx = int(np.nonzero(sdofs == sep_vert)[0][0])
    # the residual's separation mask f drops to zero after idx
    res = model.fluid.residual
    # probe: constant area channel -> pressure equals psup beyond idx
    model.fluid.control["area"][:] = 0.5
    model.fluid.control["psub"][:] = 1000.0
    model.fluid.control["psup"][:] = 0.0
    model.fluid.prop["rho_air"][:] = 1.2e-3
    model.fluid.set_control(model.fluid.control)
    model.fluid.set_prop(model.fluid.prop)
    qp, _ = model.fluid.solve_state1(model.fluid.state1)
    p = np.asarray(qp["p"])
    np.testing.assert_allclose(p[idx + 1:], 0.0, atol=1e-9)


def test_gradients_finite_at_full_closure():
    """area -> 0 (full glottal closure, e.g. a shape sweep that pushes
    the surface to ymid) must not NaN the gradients: area**-2 -> inf has
    a NaN cotangent even where the primal is finite.  All fluid variants
    carry a tiny area floor as the NaN guard (AreaRatioSep via its
    explicit area_lb)."""
    import jax
    import jax.numpy as jnp
    from vf_fem_tpu.residuals import fluid as flr

    s = np.linspace(0.0, 1.0, 12)
    for cls, extra in (
        (flr.BernoulliSmoothMinSep, {"zeta_min": 1e-3, "zeta_sep": 1e-3}),
        (flr.BernoulliFixedSep, {}),
    ):
        resid = (
            cls(s, idx_sep=6) if cls is flr.BernoulliFixedSep else cls(s)
        )
        res, (state, control, prop) = resid.res, resid.res_args
        prop = {k: np.full_like(np.asarray(v), 1.0) for k, v in prop.items()}
        prop["rho_air"] = np.full_like(prop["rho_air"], 1.1225e-3)
        for k, v in extra.items():
            prop[k] = np.full_like(prop[k], v)
        area = np.full(12, 0.5)
        area[5:8] = 0.0  # fully closed mid-channel
        control = {
            "area": jnp.asarray(area),
            "psub": jnp.asarray([8000.0]),
            "psup": jnp.asarray([0.0]),
        }
        zero = {k: jnp.zeros_like(jnp.asarray(v)) for k, v in state.items()}

        def qp_of_area(a):
            r = res(zero, {**control, "area": a}, prop)
            return jnp.sum(r["q"] ** 2) + 1e-8 * jnp.sum(r["p"] ** 2)

        val, g = jax.value_and_grad(qp_of_area)(control["area"])
        assert np.isfinite(float(val)), cls.__name__
        assert np.all(np.isfinite(np.asarray(g))), cls.__name__
