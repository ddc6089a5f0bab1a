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


# ---------------------------------------------------------------------------
# Per-form-family exactness checks (BASELINE config 1 companion: closed
# forms instead of a FEniCS cross-check)
# ---------------------------------------------------------------------------


def _zero_fields(residual, mesh):
    fields = {
        key: jnp.zeros(residual.coefficient_shape(key))
        for key in residual.coefficient_spec
    }
    # keep contact/pressure inert and denominators sane
    for key, val in (
        ("prop/ycontact", [np.inf]),
        ("prop/kcontact", [0.0]),
        ("prop/nu", [0.45]),
        ("prop/v_swelling", None),  # ones, set below
        ("prop/m_swelling", [0.0]),
        ("prop/length", [1.0]),
        ("prop/muscle_stress", [0.0]),
    ):
        if key in fields:
            if key == "prop/v_swelling":
                fields[key] = jnp.ones(residual.coefficient_shape(key))
            else:
                fields[key] = jnp.broadcast_to(
                    jnp.asarray(val), fields[key].shape
                )
    if "prop/ncontact" in fields:
        fields["prop/ncontact"] = (
            jnp.zeros(mesh.dim).at[1].set(1.0)
        )
    return fields


@pytest.mark.parametrize("Residual", [
    slr.Rayleigh,
    slr.KelvinVoigt,
    slr.KelvinVoigtWEpithelium,
    slr.IncompSwellingKelvinVoigt,
    slr.SwellingKelvinVoigt,
    slr.SwellingKelvinVoigtWEpithelium,
    slr.SwellingPowerLawKelvinVoigtWEpitheliumNoShape,
    # NOT Approximate3DKelvinVoigt: its APForceForm models the restoring
    # force of anterior/posterior clamped planes (-2 mu u / length^2,
    # reference ``form.py:993-1033``), which by design reacts to rigid
    # in-plane translation.
])
def test_translation_invariance_per_family(Residual):
    """Rigid translation produces exactly zero residual for every solid
    form family (quadrature-exactness: any spurious constant term or
    mis-integrated gradient would break this identically-zero result)."""
    mesh = mark_unit_mesh_fixtures(unit_square_mesh(4, 4))
    residual = Residual(mesh)
    fields = _zero_fields(residual, mesh)
    fields["prop/emod"] = jnp.full(mesh.num_cells, 3e4)
    if "prop/rho" in fields:
        fields["prop/rho"] = jnp.ones(mesh.num_cells)

    u_rigid = np.tile([0.37, -0.12], (mesh.num_vertices, 1))
    fields["state/u1"] = jnp.asarray(u_rigid)
    res = np.asarray(residual.assemble_res(fields))
    scale = 3e4 * mesh.num_vertices
    np.testing.assert_allclose(res, 0.0, atol=1e-12 * scale)


def test_swelling_reduces_to_elastic_at_unit_volume():
    """The Gou2016 swelling stress at v_swelling = 1 (no swelling) equals
    the plain isotropic elastic response for small strains (reference
    ``form.py:613-663``: at v=1 the swelling kinematics are the identity).
    The swelling form uses Green-Lagrange strain, so agreement is to
    O(|grad u|^2) — checked by halving the strain (rate 2)."""
    mesh = mark_unit_mesh_fixtures(unit_square_mesh(4, 4))
    res_sw = slr.SwellingKelvinVoigt(mesh)
    res_el = slr.KelvinVoigt(mesh)

    errs = []
    for eps in (1e-3, 5e-4, 2.5e-4):
        A = eps * np.array([[1.0, 0.3], [0.2, -0.5]])
        u = mesh.coords @ A.T

        out = []
        for residual in (res_sw, res_el):
            fields = _zero_fields(residual, mesh)
            fields["prop/emod"] = jnp.full(mesh.num_cells, 3e4)
            fields["prop/nu"] = jnp.broadcast_to(
                jnp.asarray([0.45]), fields["prop/nu"].shape
            )
            fields["state/u1"] = jnp.asarray(u)
            out.append(np.asarray(residual.assemble_res(fields)))
        denom = np.abs(out[1]).max()
        errs.append(np.abs(out[0] - out[1]).max() / denom)
    # second-order agreement in strain
    assert errs[0] / errs[1] > 1.7
    assert errs[1] / errs[2] > 1.7


def test_rayleigh_mass_damping_identity():
    """Rayleigh damping with only the mass term (rayleigh_k = 0) and a
    constant velocity integrates exactly to rayleigh_m * mass * v."""
    mesh = mark_unit_mesh_fixtures(unit_square_mesh(4, 4))
    residual = slr.Rayleigh(mesh)
    fields = _zero_fields(residual, mesh)
    fields["prop/emod"] = jnp.full(mesh.num_cells, 3e4)
    fields["prop/rho"] = jnp.ones(mesh.num_cells)
    fields["prop/rayleigh_m"] = jnp.broadcast_to(
        jnp.asarray([2.5]), fields["prop/rayleigh_m"].shape
    )
    fields["prop/rayleigh_k"] = jnp.zeros_like(fields["prop/rayleigh_k"])
    v = np.tile([3.0, 0.0], (mesh.num_vertices, 1))
    fields["state/v1"] = jnp.asarray(v)
    res = np.asarray(residual.assemble_res(fields))
    total = res.sum(axis=0)
    # unit square: mass = 1
    np.testing.assert_allclose(total[0], 2.5 * 3.0, rtol=1e-12)
    np.testing.assert_allclose(total[1], 0.0, atol=1e-12)


@pytest.mark.parametrize(
    "Residual",
    [slr.SwellingKelvinVoigt, slr.SwellingPowerLawKelvinVoigtWEpitheliumNoShape],
)
def test_swelling_nu_is_live(Residual):
    """d(residual)/d(nu) != 0 for the swelling hyperelastic forms.

    The reference hardcodes nu=0.45 inside both swelling stress laws while
    declaring a `nu` property (reference ``form.py:639``) — a known bug
    (SURVEY §2.12) this package fixes: the declared coefficient must be
    live.  Checked by forward-difference agreement with jax.grad (Taylor)
    plus nonzero magnitude."""
    mesh = mark_unit_mesh_fixtures(unit_square_mesh(3, 3))
    residual = Residual(mesh)
    fields = _zero_fields(residual, mesh)
    fields["prop/emod"] = jnp.full(mesh.num_cells, 3e4)
    A = 1e-2 * np.array([[1.0, 0.3], [0.2, -0.5]])
    fields["state/u1"] = jnp.asarray(mesh.coords @ A.T)

    def total_sq(nu):
        f = dict(fields)
        f["prop/nu"] = jnp.broadcast_to(nu, fields["prop/nu"].shape)
        r = residual.assemble_res(f)
        return jnp.sum(r * r)

    nu0 = jnp.asarray(0.3, dtype=fields["prop/emod"].dtype)
    g = float(jax.grad(total_sq)(nu0))
    assert abs(g) > 1e-6 * abs(float(total_sq(nu0)))
    h = 1e-5
    g_fd = (float(total_sq(nu0 + h)) - float(total_sq(nu0 - h))) / (2 * h)
    np.testing.assert_allclose(g, g_fd, rtol=1e-4)
