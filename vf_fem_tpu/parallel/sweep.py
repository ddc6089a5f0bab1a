"""
Batched parameter sweeps across TPU cores.

The reference's only "parallelism" is sequential batch-over-parameters in
driver scripts (SURVEY section 2.10; the author "never runs stuff in
parallel", reference ``models/fsi.py:38-39``).  Here a sweep is
``vmap`` over a leading batch axis of (properties, controls), sharded over
a ``jax.sharding.Mesh`` of devices — each device integrates its shard of
phonation variants with zero cross-device communication (reductions over
the sweep, if requested, become ICI ``psum``s inserted by XLA).

This is BASELINE config 5: "256 vmapped M5 geometry/stiffness variants
across TPU cores".
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..forward import integrate_pure
from ..models.transient import _params_key


def batch_mesh(n_devices: Optional[int] = None, axis: str = "batch") -> Mesh:
    """1D device mesh over the sweep axis."""
    devices = np.asarray(jax.devices()[: n_devices or len(jax.devices())])
    return Mesh(devices, (axis,))


def stack_props(props: list) -> dict:
    """Stack a list of property dicts/BlockVectors into a batch pytree."""
    dicts = [
        p.to_dict() if hasattr(p, "to_dict") else dict(p) for p in props
    ]
    return {
        k: jnp.stack([jnp.asarray(d[k]) for d in dicts], axis=0)
        for k in dicts[0]
    }


def sweep_integrate(
    model,
    ini_state: dict,
    controls_stacked: dict,
    prop_batch: dict,
    times,
    params: Optional[dict] = None,
    mesh: Optional[Mesh] = None,
    batch_controls: bool = False,
):
    """
    Integrate a batch of property variants (and optionally control
    variants) in parallel.

    ``prop_batch`` leaves have a leading batch axis.  With ``mesh`` given,
    the batch axis is sharded across devices: XLA runs each shard's scan on
    its own core (pure data parallelism over ICI).

    Unless overridden, ``assembly='plain'`` is pinned: in the vmapped
    regime the indexed gather amortizes its (batch-shared) indices over
    the batch axis and beats the banded Pallas path (measured 15882 vs
    10189 variant-steps/s at batch 256 on the M5 CAD mesh).
    """
    params = {"assembly": "plain", **(params or {})}
    times = jnp.asarray(times)

    in_axes_c = 0 if batch_controls else None

    def run_one(prop, controls):
        fin, traj, infos = integrate_pure(
            model, ini_state, controls, prop, times, params
        )
        return fin, infos

    vrun = jax.vmap(run_one, in_axes=(0, in_axes_c))

    if mesh is not None:
        axis = mesh.axis_names[0]
        shard = NamedSharding(mesh, P(axis))
        prop_batch = jax.device_put(prop_batch, shard)
        if batch_controls:
            controls_stacked = jax.device_put(controls_stacked, shard)

    return vrun(prop_batch, controls_stacked)


def sweep_grad(
    model,
    functional: Callable,
    ini_state: dict,
    controls_stacked: dict,
    prop_batch: dict,
    times,
    params: Optional[dict] = None,
    mesh: Optional[Mesh] = None,
):
    """
    Per-variant gradients of a scalar trajectory functional, batched and
    sharded like :func:`sweep_integrate` — a full "training step" for
    gradient-based phonation studies (one backward per variant, all
    variants in parallel).  ``assembly='plain'`` is pinned as in
    :func:`sweep_integrate` (the vmapped-regime measured best).
    """
    params = {"assembly": "plain", **(params or {})}
    times = jnp.asarray(times)

    def loss(prop):
        fin, traj, infos = integrate_pure(
            model, ini_state, controls_stacked, prop, times, params,
            use_remat=True,
        )
        return functional(traj, controls_stacked, prop, times)

    vgrad = jax.vmap(jax.value_and_grad(loss))

    if mesh is not None:
        axis = mesh.axis_names[0]
        shard = NamedSharding(mesh, P(axis))
        prop_batch = jax.device_put(prop_batch, shard)

    return vgrad(prop_batch)
