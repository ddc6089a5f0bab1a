import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vf_fem_tpu.fem import elements
from vf_fem_tpu.mesh import mark_unit_mesh_fixtures, unit_cube_mesh, unit_square_mesh
from vf_fem_tpu.residuals import solid as slr


def test_cell_shape_gradients_triangle():
    X = jnp.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
    grads, vol = elements.cell_shape_gradients(X)
    assert np.isclose(float(vol), 0.5)
    np.testing.assert_allclose(np.asarray(grads), [[-1, -1], [1, 0], [0, 1]], atol=1e-14)


def test_cell_shape_gradients_tet():
    X = jnp.array(
        [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    )
    grads, vol = elements.cell_shape_gradients(X)
    assert np.isclose(float(vol), 1 / 6)
    np.testing.assert_allclose(
        np.asarray(grads), [[-1, -1, -1], [1, 0, 0], [0, 1, 0], [0, 0, 1]], atol=1e-14
    )


def test_facet_measure_normal_2d():
    Xf = jnp.array([[0.0, 0.0], [1.0, 0.0]])
    X_opp = jnp.array([0.5, 1.0])
    meas, n = elements.facet_measure_normal(Xf, X_opp)
    assert np.isclose(float(meas), 1.0)
    np.testing.assert_allclose(np.asarray(n), [0.0, -1.0], atol=1e-14)


def _make_fields(residual, seed=0):
    """Random small states/controls + physically sensible property defaults."""
    rng = np.random.default_rng(seed)
    fields = {k: jnp.asarray(v) for k, v in residual.default_coefficients().items()}
    overrides = {
        "prop/emod": 1.0,
        "prop/rho": 1.0,
        "prop/eta": 1.0,
        "prop/emod_membrane": 1.0,
        "prop/th_membrane": 0.1,
        "prop/v_swelling": 1.0,
        "prop/k_swelling": 1.0,
        "prop/length": 1.0,
    }
    for key in residual.coefficient_spec:
        shape = residual.coefficient_shape(key)
        if key.startswith("state/") or key.startswith("control/"):
            fields[key] = jnp.asarray(0.01 * rng.standard_normal(shape))
        elif key in overrides:
            fields[key] = jnp.full(shape, overrides[key])
    return fields


@pytest.mark.parametrize("nz", [0, 2])
def test_inertial_mass_consistency(nz):
    """Inertial residual with rho=1 and constant a equals M @ a; the total
    equals mass * a (partition of unity)."""
    mesh = unit_square_mesh(4, 4) if nz == 0 else unit_cube_mesh(3, 3, nz)
    mark_unit_mesh_fixtures(mesh)
    residual = slr.KelvinVoigt(mesh)
    dim = mesh.dim

    fields = {
        key: jnp.zeros(residual.coefficient_shape(key))
        for key in residual.coefficient_spec
    }
    fields["prop/rho"] = jnp.ones(mesh.num_cells)
    fields["prop/ycontact"] = jnp.asarray([np.inf])
    fields["prop/ncontact"] = jnp.zeros(dim).at[1].set(1.0)
    fields["prop/kcontact"] = jnp.asarray([1.0])
    a_const = np.zeros((mesh.num_vertices, dim))
    a_const[:, 0] = 2.0
    fields["state/a1"] = jnp.asarray(a_const)

    res = np.asarray(residual.assemble_res(fields))
    # With only the inertial term active (everything else zero), total
    # residual = integral of rho * a = volume * a
    total = res.sum(axis=0)
    np.testing.assert_allclose(total[0], 2.0, rtol=1e-12)
    np.testing.assert_allclose(total[1:], 0.0, atol=1e-12)


def test_elastic_energy_identity():
    """res_elastic(u) . u = 2 * strain energy for linear elasticity with a
    linear displacement field (constant strain)."""
    mesh = unit_square_mesh(4, 4)
    mark_unit_mesh_fixtures(mesh)
    residual = slr.KelvinVoigt(mesh)
    dim = 2

    A = np.array([[0.1, 0.03], [0.02, -0.05]])
    u = mesh.coords @ A.T  # grad u = A everywhere

    fields = {
        key: jnp.zeros(residual.coefficient_shape(key))
        for key in residual.coefficient_spec
    }
    fields["prop/emod"] = jnp.ones(mesh.num_cells) * 3.0
    fields["prop/nu"] = jnp.asarray([0.3])
    fields["prop/ycontact"] = jnp.asarray([np.inf])
    fields["prop/ncontact"] = jnp.asarray([0.0, 1.0])
    fields["prop/kcontact"] = jnp.asarray([1.0])
    fields["state/u1"] = jnp.asarray(u)

    res = np.asarray(residual.assemble_res(fields))
    energy_assembled = float((res * u).sum())

    # analytic: sigma : eps * volume (volume = 1)
    eps = 0.5 * (A + A.T)
    eps3 = np.zeros((3, 3))
    eps3[:2, :2] = eps
    emod, nu = 3.0, 0.3
    lam = emod * nu / (1 + nu) / (1 - 2 * nu)
    mu = emod / 2 / (1 + nu)
    sig = 2 * mu * eps3 + lam * np.trace(eps3) * np.eye(3)
    energy_exact = float((sig * eps3).sum())
    np.testing.assert_allclose(energy_assembled, energy_exact, rtol=1e-12)


@pytest.mark.parametrize(
    "Residual",
    [
        slr.Rayleigh,
        slr.KelvinVoigt,
        slr.KelvinVoigtWEpithelium,
        slr.SwellingKelvinVoigt,
        slr.IncompSwellingKelvinVoigt,
        slr.SwellingPowerLawKelvinVoigtWEpitheliumNoShape,
        slr.Approximate3DKelvinVoigt,
        slr.KelvinVoigtWShape,
    ],
)
def test_residual_assembles(Residual):
    mesh = unit_square_mesh(3, 3)
    mark_unit_mesh_fixtures(mesh)
    residual = Residual(mesh)
    fields = _make_fields(residual)
    res = np.asarray(residual.assemble_res(fields))
    assert res.shape == (mesh.num_vertices, 2)
    assert np.all(np.isfinite(res))
    assert np.linalg.norm(res) > 0
