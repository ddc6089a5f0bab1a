"""
Gradients of trajectory functionals.

The reference implements a hand-written discrete adjoint: a reverse Python
loop of transposed Newmark-structured solves accumulating sensitivities
(reference: ``src/femvf/adjoint.py:19-93``) — a path that is partly broken
in the reference because required ``apply_dres_*_adj`` methods no longer
exist (reference: ``models/transient.py:156-161``, SURVEY section 2.12).

Here the adjoint is exactly ``jax.grad`` through the scanned forward loop:
each Newton solve carries a ``custom_vjp`` implementing the
implicit-function-theorem transposed solve (see
``models/transient.py::solve_u1_bwd``), and ``jax.checkpoint`` on the step
rematerializes forward states instead of storing every intermediate.
Gradients are with respect to the initial state, controls, properties and
the time vector simultaneously — strictly more than the reference's working
derivative surface.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from . import blocks as bv
from .forward import _stack_controls, integrate_pure


def integrate_grad(
    model,
    functional: Callable,
    ini_state: bv.BlockVector,
    controls: list,
    prop: bv.BlockVector,
    times,
    params: Optional[dict] = None,
):
    """
    Return ``(value, grads)`` of a scalar trajectory functional.

    ``functional(traj, controls_stacked, prop, times)`` maps the stacked
    state trajectory (leading time axis, *excluding* the initial state) to a
    scalar.  ``grads`` is a dict with BlockVector gradients w.r.t.
    ``ini_state``, ``controls``, ``prop`` and a numpy gradient w.r.t.
    ``times`` — the same sensitivity set as the reference's
    ``adjoint.integrate_grad`` (reference: ``adjoint.py:96-131``).
    """
    state0 = {k: np.asarray(v) for k, v in ini_state.sub_items()}
    controls_stacked = _stack_controls(model, controls)
    prop_d = model.prop_to_dict(prop)
    times_j = jnp.asarray(np.asarray(times, dtype=float))
    T = times_j.shape[0]

    if hasattr(functional, "eval_traj"):
        # AbstractFunctional protocol: trajectories include the initial
        # state row and a full-length control schedule (the statefile
        # convention, see functional/base._load_statefile).  Rebuilding
        # the full trajectory from the traced s0 keeps the direct
        # d(functional)/d(initial state) term in the gradient.
        def scalar_fn(s0, traj, cs, p, ts):
            full_traj = {
                k: jnp.concatenate([jnp.asarray(s0[k])[None], traj[k]], 0)
                for k in traj
            }
            idx = jnp.minimum(
                jnp.arange(T), next(iter(cs.values())).shape[0] - 1
            )
            cs_full = jax.tree_util.tree_map(lambda a: a[idx], cs)
            return functional.eval_traj(full_traj, ts, cs_full, p)

    else:

        def scalar_fn(s0, traj, cs, p, ts):
            return functional(traj, cs, p, ts)

    def loss(s0, cs, p, ts):
        fin, traj, infos = integrate_pure(
            model, s0, cs, p, ts, params, use_remat=True
        )
        return scalar_fn(s0, traj, cs, p, ts)

    value, grads = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(
        state0, controls_stacked, prop_d, times_j
    )
    g_state0, g_controls, g_prop, g_times = grads

    state_keys = list(ini_state.keys())
    out = {
        "ini_state": bv.BlockVector(
            [np.asarray(g_state0[k]) for k in state_keys], labels=[state_keys]
        ),
        "controls": {k: np.asarray(v) for k, v in g_controls.items()},
        "prop": bv.BlockVector(
            [np.asarray(g_prop[k]) for k in prop.keys()],
            labels=[list(prop.keys())],
        ),
        "times": np.asarray(g_times),
    }
    return float(value), out


def integrate(model, f, functional, params: Optional[dict] = None):
    """
    Reference-compatible adjoint entry point operating on a statefile
    (reference: ``adjoint.py:19-93`` and ``integrate_grad``,
    ``adjoint.py:96-131`` — broken there because the required
    ``apply_dres_*_adj`` methods no longer exist on its models).

    Replays the forward problem from the inputs stored in ``f`` (initial
    state, control schedule, properties, times) and differentiates the
    scanned loop with :func:`jax.grad`.  ``functional`` is either an
    :class:`~vf_fem_tpu.functional.base.AbstractFunctional` (its
    ``eval_traj`` is used, including the stored initial state row, matching
    the statefile convention) or a plain callable
    ``f(traj, controls_stacked, prop, times)`` as in
    :func:`integrate_grad`.

    Returns ``(value, grads)`` with the same gradient set as
    :func:`integrate_grad` (initial state, controls, properties, times).
    """
    ini_state = f.get_state(0)
    prop = f.get_prop()
    times = np.asarray(f.get_times())

    # stored control schedule: one row per append (held-last semantics)
    ctrl_keys = list(model.control.keys())
    n_rows = f.root_group["control"][ctrl_keys[0]].shape[0]
    controls = [f.get_control(n) for n in range(min(n_rows, f.size))]

    return integrate_grad(
        model, functional, ini_state, controls, prop, times, params
    )
