"""
Batched/sharded parameter sweeps — BASELINE config 5
(the reference has no parallel equivalent: ``models/fsi.py:38-39``).

Runs on the 8 virtual CPU devices configured in conftest.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vf_fem_tpu import forward
from vf_fem_tpu.parallel import batch_mesh, sweep_grad, sweep_integrate

from fixture_models import make_vf_fsi_model


@pytest.fixture(scope="module")
def model():
    from vf_fem_tpu.residuals import fluid as flr

    return make_vf_fsi_model(FluidResidual=flr.BernoulliSmoothMinSep, nx=6, ny=3)


@pytest.fixture(scope="module")
def sweep_args(model):
    state0 = {
        k: jnp.zeros_like(jnp.asarray(np.asarray(v)))
        for k, v in model.state0.sub_items()
    }
    controls = forward._stack_controls(model, [model.control])
    prop0 = model.prop_to_dict(model.prop)
    times = 2e-5 * np.arange(6)

    batch = 8
    prop_batch = {k: jnp.stack([jnp.asarray(v)] * batch) for k, v in prop0.items()}
    emods = jnp.linspace(4e4, 8e4, batch)[:, None]
    prop_batch["emod"] = jnp.broadcast_to(
        emods, (batch,) + prop0["emod"].shape
    )
    return state0, controls, prop_batch, times


def test_sweep_matches_single(model, sweep_args):
    state0, controls, prop_batch, times = sweep_args
    mesh = batch_mesh(8)
    (fin, infos) = sweep_integrate(
        model, state0, controls, prop_batch, times, mesh=mesh
    )
    u = np.asarray(fin["u"])
    assert u.shape[0] == 8
    assert np.all(np.isfinite(u))
    # variants differ (stiffness sweep)
    assert not np.allclose(u[0], u[-1])

    # single run with variant 3's props matches the sweep row
    prop3 = {k: np.asarray(v)[3] for k, v in prop_batch.items()}
    fin3, _, _ = forward.integrate_pure(model, state0, controls, prop3, times)
    np.testing.assert_allclose(
        np.asarray(fin3["u"]), u[3], rtol=1e-10, atol=1e-14
    )


def test_sweep_is_sharded(model, sweep_args):
    state0, controls, prop_batch, times = sweep_args
    mesh = batch_mesh(8)
    fin, infos = sweep_integrate(
        model, state0, controls, prop_batch, times, mesh=mesh
    )
    # the output batch axis is sharded over the device mesh
    sharding = fin["u"].sharding
    assert len(sharding.device_set) == 8


def test_sweep_grad(model, sweep_args):
    state0, controls, prop_batch, times = sweep_args
    mesh = batch_mesh(8)

    def functional(traj, cs, p, ts):
        return jnp.sum(traj["u"][-1] ** 2)

    values, grads = sweep_grad(
        model, functional, state0, controls, prop_batch, times, mesh=mesh
    )
    values = np.asarray(values)
    assert values.shape == (8,)
    assert np.all(np.isfinite(values))
    g = np.asarray(grads["emod"])
    assert g.shape[0] == 8
    assert np.all(np.isfinite(g))
    assert np.linalg.norm(g) > 0
