"""
Dynamical model derivative correctness — the reference's core test strategy
(reference: ``tests/models/test_dynamical.py:172-291``): Taylor convergence
of every Jacobian block, plus consistency between the Jacobian-action and
the separately-built linearized models
(reference: ``test_dynamical.py:293-383``).
"""

import numpy as np
import pytest

from vf_fem_tpu.load import load_fsi_model, load_solid_model
from vf_fem_tpu.mesh import mark_unit_mesh_fixtures, unit_square_mesh, vocal_fold_mesh
from vf_fem_tpu.misc.taylor import taylor_convergence
from vf_fem_tpu.residuals import fluid as flr, solid as slr


def _setup_solid(Residual=slr.KelvinVoigt):
    mesh = mark_unit_mesh_fixtures(unit_square_mesh(3, 3))
    model = load_solid_model(mesh, Residual, model_type="dynamical")
    model.prop["emod"][:] = 1e4
    model.prop["rho"][:] = 1.0
    if "eta" in model.prop:
        model.prop["eta"][:] = 3.0
    model.prop["ycontact"][:] = 10.0
    model.set_prop(model.prop)

    rng = np.random.default_rng(0)
    state = model.state.copy()
    state[:] = 1e-2 * rng.standard_normal(state.size)
    model.set_state(state)
    statet = model.statet.copy()
    statet[:] = 1e-2 * rng.standard_normal(statet.size)
    model.set_statet(statet)
    control = model.control.copy()
    control[:] = 100.0 * rng.random(control.size)
    model.set_control(control)
    return model, rng


def _res_mono(model):
    return model.assem_res().to_mono_ndarray()


class TestSolidDynamical:
    @pytest.fixture(scope="class")
    def model_rng(self):
        return _setup_solid()

    def test_dres_dstate(self, model_rng):
        model, rng = model_rng
        x0 = model.state.copy()
        dx = 1e-3 * rng.standard_normal(x0.size)

        def f(x_flat):
            x = model.state.copy()
            x[:] = x_flat
            model.set_state(x)
            return _res_mono(model)

        def jac(x_flat, dx_flat):
            x = model.state.copy()
            x[:] = x_flat
            model.set_state(x)
            A = model.assem_dres_dstate().to_mono_ndarray()
            return A @ dx_flat

        taylor_convergence(x0.to_mono_ndarray(), dx, f, jac)

    def test_dres_dstatet(self, model_rng):
        model, rng = model_rng
        x0 = model.statet.copy()
        dx = 1e-3 * rng.standard_normal(x0.size)

        def f(x_flat):
            x = model.statet.copy()
            x[:] = x_flat
            model.set_statet(x)
            return _res_mono(model)

        def jac(x_flat, dx_flat):
            x = model.statet.copy()
            x[:] = x_flat
            model.set_statet(x)
            A = model.assem_dres_dstatet().to_mono_ndarray()
            return A @ dx_flat

        taylor_convergence(x0.to_mono_ndarray(), dx, f, jac)

    def test_dres_dcontrol(self, model_rng):
        model, rng = model_rng
        g0 = model.control.copy()
        dg = rng.standard_normal(g0.size)

        def f(g_flat):
            g = model.control.copy()
            g[:] = g_flat
            model.set_control(g)
            return _res_mono(model)

        def jac(g_flat, dg_flat):
            g = model.control.copy()
            g[:] = g_flat
            model.set_control(g)
            A = model.assem_dres_dcontrol().to_mono_ndarray()
            return A @ dg_flat

        taylor_convergence(g0.to_mono_ndarray(), dg, f, jac)

    def test_dres_dprop_emod(self, model_rng):
        model, rng = model_rng
        p0 = np.array(model.prop["emod"])
        dp = 100.0 * rng.random(p0.size)

        def f(emod):
            model.prop["emod"][:] = emod
            model.set_prop(model.prop)
            return _res_mono(model)

        def jac(emod, d):
            model.prop["emod"][:] = emod
            model.set_prop(model.prop)
            A = model.assem_dres_dprop()
            return np.concatenate([A["u", "emod"] @ d, A["v", "emod"] @ d])

        taylor_convergence(p0, dp, f, jac)


class TestSolidDynamicalShape:
    def test_dres_dprop_umesh(self):
        """Shape (mesh-coordinate) derivative — the reference gets this from
        UFL ``SpatialCoordinate`` calculus (``dynamical.py:285-298``); here
        it falls out of tracing X_e."""
        mesh = mark_unit_mesh_fixtures(unit_square_mesh(3, 3))
        model = load_solid_model(
            mesh, slr.KelvinVoigtWShape, model_type="dynamical"
        )
        model.prop["emod"][:] = 1e4
        model.prop["rho"][:] = 1.0
        model.prop["eta"][:] = 3.0
        model.prop["ycontact"][:] = 10.0
        model.set_prop(model.prop)
        rng = np.random.default_rng(1)
        state = model.state.copy()
        state[:] = 1e-2 * rng.standard_normal(state.size)
        model.set_state(state)
        statet = model.statet.copy()
        statet[:] = 1e-2 * rng.standard_normal(statet.size)
        model.set_statet(statet)

        p0 = np.array(model.prop["umesh"])
        dp = 1e-2 * rng.standard_normal(p0.size)

        def f(umesh):
            model.prop["umesh"][:] = umesh
            model.set_prop(model.prop)
            return _res_mono(model)

        def jac(umesh, d):
            model.prop["umesh"][:] = umesh
            model.set_prop(model.prop)
            A = model.assem_dres_dprop()
            return np.concatenate([A["u", "umesh"] @ d, A["v", "umesh"] @ d])

        taylor_convergence(p0, dp, f, jac)


class TestFluidDynamical:
    @pytest.fixture(
        scope="class",
        params=[
            flr.BernoulliSmoothMinSep,
            flr.BernoulliFixedSep,
            flr.BernoulliFlowFixedSep,
        ],
    )
    def model(self, request):
        from vf_fem_tpu.load import load_fluid_model

        s = np.linspace(0, 1, 12)
        kwargs = (
            {"idx_sep": 6}
            if request.param is flr.BernoulliFlowFixedSep
            else {}
        )
        model = load_fluid_model(
            s, request.param, model_type="dynamical", **kwargs
        )
        rng = np.random.default_rng(3)
        model.control["area"][:] = 0.5 + 0.3 * rng.random(12)
        if "psub" in model.control:
            model.control["psub"][:] = 8000.0
        else:  # flow-driven variant
            model.control["qsub"][:] = 50.0
        model.control["psup"][:] = 0.0
        model.set_control(model.control)
        model.prop["rho_air"][:] = 1.1225e-3
        if "zeta_min" in model.prop:
            model.prop["zeta_min"][:] = 1e-2
            model.prop["zeta_sep"][:] = 1e-2
        model.set_prop(model.prop)
        state = model.state.copy()
        state["q"][:] = 50.0
        state["p"][:] = 100.0
        model.set_state(state)
        return model

    def test_dres_dstate(self, model):
        A = model.assem_dres_dstate().to_mono_ndarray()
        # residual is state - f(control): identity wrt state
        np.testing.assert_allclose(A, np.eye(A.shape[0]), atol=1e-12)

    def test_dres_dcontrol(self, model):
        rng = np.random.default_rng(4)
        g0 = model.control.copy()
        dg = np.zeros(g0.size)
        # perturb area only (and keep it positive)
        dg[: model.control["area"].size] = 1e-2 * rng.random(
            model.control["area"].size
        )

        def f(g_flat):
            g = model.control.copy()
            g[:] = g_flat
            model.set_control(g)
            return _res_mono(model)

        def jac(g_flat, d):
            g = model.control.copy()
            g[:] = g_flat
            model.set_control(g)
            A = model.assem_dres_dcontrol().to_mono_ndarray()
            return A @ d

        taylor_convergence(g0.to_mono_ndarray(), dg, f, jac)


class TestFSIDynamical:
    @pytest.fixture(scope="class")
    def model(self):
        mesh = vocal_fold_mesh(8, 4)
        model = load_fsi_model(
            mesh,
            slr.KelvinVoigt,
            flr.BernoulliSmoothMinSep,
            model_type="dynamical",
        )
        ymax = mesh.coords[:, 1].max()
        model.prop["emod"][:] = 5e4
        model.prop["rho"][:] = 1.0
        model.prop["eta"][:] = 3.0
        model.prop["ycontact"][:] = ymax + 0.05
        model.prop["rho_air"][:] = 1.1225e-3
        model.prop["zeta_min"][:] = 1e-2
        model.prop["zeta_sep"][:] = 1e-2
        model.prop["ymid"][:] = ymax + 0.01
        model.set_prop(model.prop)
        control = model.control.copy()
        control["psub"][:] = 8000.0
        control["psup"][:] = 0.0
        model.set_control(control)

        rng = np.random.default_rng(5)
        state = model.state.copy()
        state["u"][:] = 1e-3 * rng.standard_normal(state["u"].size)
        state["v"][:] = 1e-3 * rng.standard_normal(state["v"].size)
        state["q"][:] = 50.0
        state["p"][:] = 100.0
        model.set_state(state)
        statet = model.statet.copy()
        statet[:] = 1e-3 * rng.standard_normal(statet.size)
        model.set_statet(statet)
        return model

    def test_dres_dstate(self, model):
        rng = np.random.default_rng(6)
        x0 = model.state.copy()
        dx = 1e-4 * rng.standard_normal(x0.size)

        def f(x_flat):
            x = model.state.copy()
            x[:] = x_flat
            model.set_state(x)
            return _res_mono(model)

        def jac(x_flat, d):
            x = model.state.copy()
            x[:] = x_flat
            model.set_state(x)
            A = model.assem_dres_dstate().to_mono_ndarray()
            return A @ d

        taylor_convergence(x0.to_mono_ndarray(), dx, f, jac)

    def test_dres_dstatet(self, model):
        rng = np.random.default_rng(7)
        x0 = model.statet.copy()
        dx = 1e-4 * rng.standard_normal(x0.size)

        def f(x_flat):
            x = model.statet.copy()
            x[:] = x_flat
            model.set_statet(x)
            return _res_mono(model)

        def jac(x_flat, d):
            x = model.statet.copy()
            x[:] = x_flat
            model.set_statet(x)
            A = model.assem_dres_dstatet().to_mono_ndarray()
            return A @ d

        taylor_convergence(x0.to_mono_ndarray(), dx, f, jac)

    def test_dres_dcontrol(self, model):
        """Coupled dres/dcontrol (psub/psup) Taylor test
        (reference ``tests/models/test_dynamical.py:293-383`` applies this
        to every block; round 1 only covered state/statet)."""
        rng = np.random.default_rng(8)
        g0 = model.control.copy()
        dg = 10.0 * rng.standard_normal(g0.size)

        def f(g_flat):
            g = model.control.copy()
            g[:] = g_flat
            model.set_control(g)
            return _res_mono(model)

        def jac(g_flat, d):
            g = model.control.copy()
            g[:] = g_flat
            model.set_control(g)
            A = model.assem_dres_dcontrol().to_mono_ndarray()
            return A @ d

        taylor_convergence(g0.to_mono_ndarray(), dg, f, jac)

    @pytest.mark.parametrize("key", ["emod", "ymid", "rho_air"])
    def test_dres_dprop(self, model, key):
        """Coupled dres/dprop Taylor test per property block, including
        'ymid' which enters only through the solid-area coupling."""
        rng = np.random.default_rng(9)
        p0 = model.prop.copy()
        dp = model.prop.copy()
        dp[:] = 0.0
        scale = {"emod": 1e3, "ymid": 1e-3, "rho_air": 1e-4}[key]
        dp[key][:] = scale * rng.standard_normal(np.asarray(p0[key]).size)

        def f(p_flat):
            p = model.prop.copy()
            p[:] = p_flat
            model.set_prop(p)
            return _res_mono(model)

        def jac(p_flat, d):
            p = model.prop.copy()
            p[:] = p_flat
            model.set_prop(p)
            A = model.assem_dres_dprop().to_mono_ndarray()
            return A @ d

        taylor_convergence(
            p0.to_mono_ndarray(), dp.to_mono_ndarray(), f, jac
        )


class TestLinearizedFSIDynamical:
    """The linearized coupled model must equal the Jacobian action of the
    nonlinear coupled model (reference consistency tests,
    ``tests/models/test_dynamical.py:293-383``)."""

    @pytest.fixture(scope="class")
    def models(self):
        def build(model_type):
            mesh = vocal_fold_mesh(8, 4)
            model = load_fsi_model(
                mesh,
                slr.KelvinVoigt,
                flr.BernoulliSmoothMinSep,
                model_type=model_type,
            )
            ymax = mesh.coords[:, 1].max()
            model.prop["emod"][:] = 5e4
            model.prop["rho"][:] = 1.0
            model.prop["eta"][:] = 3.0
            model.prop["ycontact"][:] = ymax + 0.05
            model.prop["rho_air"][:] = 1.1225e-3
            model.prop["zeta_min"][:] = 1e-2
            model.prop["zeta_sep"][:] = 1e-2
            model.prop["ymid"][:] = ymax + 0.01
            model.set_prop(model.prop)
            control = model.control.copy()
            control["psub"][:] = 8000.0
            control["psup"][:] = 0.0
            model.set_control(control)

            rng = np.random.default_rng(5)
            state = model.state.copy()
            state["u"][:] = 1e-3 * rng.standard_normal(state["u"].size)
            state["v"][:] = 1e-3 * rng.standard_normal(state["v"].size)
            state["q"][:] = 50.0
            state["p"][:] = 100.0
            model.set_state(state)
            statet = model.statet.copy()
            statet[:] = 1e-3 * rng.standard_normal(statet.size)
            model.set_statet(statet)
            return model

        return build("dynamical"), build("linearized_dynamical")

    def test_linearized_matches_jacobian_action(self, models):
        nonlin, lin = models
        rng = np.random.default_rng(11)

        dstate = nonlin.state.copy()
        dstate[:] = rng.standard_normal(dstate.size)
        dstatet = nonlin.statet.copy()
        dstatet[:] = rng.standard_normal(dstatet.size)

        A = nonlin.assem_dres_dstate().to_mono_ndarray()
        At = nonlin.assem_dres_dstatet().to_mono_ndarray()
        expected = (
            A @ dstate.to_mono_ndarray() + At @ dstatet.to_mono_ndarray()
        )

        lin.set_dstate(dstate)
        lin.set_dstatet(dstatet)
        got = lin.assem_res().to_mono_ndarray()
        np.testing.assert_allclose(
            got, expected, rtol=1e-8,
            atol=1e-10 * np.abs(expected).max(),
        )

    def test_linearized_dcontrol_action(self, models):
        nonlin, lin = models
        rng = np.random.default_rng(12)
        dg = nonlin.control.copy()
        dg[:] = rng.standard_normal(dg.size)

        B = nonlin.assem_dres_dcontrol().to_mono_ndarray()
        expected = B @ dg.to_mono_ndarray()

        # zero the state tangents, drive only the control tangent
        z_dx = nonlin.state.copy(); z_dx[:] = 0.0
        z_dxt = nonlin.statet.copy(); z_dxt[:] = 0.0
        lin.set_dstate(z_dx)
        lin.set_dstatet(z_dxt)
        lin.set_dcontrol(dg)
        got = lin.assem_res().to_mono_ndarray()
        np.testing.assert_allclose(
            got, expected, rtol=1e-8,
            atol=1e-10 * max(np.abs(expected).max(), 1e-30),
        )
        # reset for other tests
        zg = nonlin.control.copy(); zg[:] = 0.0
        lin.set_dcontrol(zg)
