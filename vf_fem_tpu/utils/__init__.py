"""
Driver-script utilities (reference: ``src/femvf/utils.py``).

The reference's ``line_search`` runs one forward simulation per step size,
sequentially.  Here all step sizes integrate in one batched (vmapped) run —
the script-level "parallelism" of the reference turned into real data
parallelism (SURVEY section 2.10) — and results are written to per-step
groups in one HDF5 file with the reference's layout.
"""

from __future__ import annotations

import os
from os import path
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from .. import statefile as sf
from ..forward import _stack_controls, integrate_pure


def line_search(
    hs: Sequence[float],
    model,
    ini_state,
    controls,
    prop,
    times,
    dstate,
    dcontrols,
    dprop,
    dtimes,
    filepath: str = "temp.h5",
):
    """
    Integrate the model at ``x + h * dx`` for every step size in ``hs``
    (reference: ``utils.py:16-57``), batched with ``vmap`` over ``h``.

    Each run is stored under group ``f'{n}'`` of ``filepath``.
    """
    if path.exists(filepath):
        os.remove(filepath)

    hs = np.asarray(list(hs), dtype=float)
    times = np.asarray(times, dtype=float)
    dtimes = np.asarray(dtimes, dtype=float)

    state0 = {k: np.asarray(v) for k, v in ini_state.sub_items()}
    dstate0 = {k: np.asarray(v) for k, v in dstate.sub_items()}
    cs = _stack_controls(model, controls)
    dcs = _stack_controls(model, dcontrols)
    dcs = {k: np.broadcast_to(v, cs[k].shape) for k, v in dcs.items()}
    prop_d = model.prop_to_dict(prop)
    dprop_d = model.prop_to_dict(dprop)

    def run_one(h):
        s0 = jax.tree_util.tree_map(lambda a, d: a + h * d, state0, dstate0)
        c = jax.tree_util.tree_map(lambda a, d: a + h * d, cs, dcs)
        p = jax.tree_util.tree_map(lambda a, d: a + h * d, prop_d, dprop_d)
        t = jnp.asarray(times) + h * jnp.asarray(dtimes)
        fin, traj, infos = integrate_pure(model, s0, c, p, t)
        return fin, traj, infos

    fins, trajs, infos = jax.vmap(run_one)(jnp.asarray(hs))

    state_keys = list(model.state0.keys())
    ctrl_keys = list(model.control.keys())
    for n, h in enumerate(hs):
        with sf.StateFile(model, filepath, group=f"{n}", mode="a") as f:
            f.init_layout()
            s0_n = ini_state.copy()
            s0_n[:] = s0_n.to_mono_ndarray() + h * dstate.to_mono_ndarray()
            f.append_state(s0_n)
            f.append_control(controls[0])
            f.append_time(times[0] + h * dtimes[0])
            f.append_solver_info({"num_iter": 0, "abs_err": 0, "rel_err": 0})
            prop_n = prop.copy()
            prop_n[:] = prop.to_mono_ndarray() + h * dprop.to_mono_ndarray()
            f.append_prop(prop_n)

            n_steps = len(times) - 1
            ctrl_traj = {}
            for bk, pk in zip(ctrl_keys, cs.keys()):
                arr = np.asarray(cs[pk]) + h * np.asarray(dcs[pk])
                idx = np.minimum(np.arange(n_steps), arr.shape[0] - 1)
                ctrl_traj[bk] = arr[idx]
            f.append_window(
                {k: np.asarray(trajs[k][n]) for k in state_keys},
                ctrl_traj,
                np.asarray(times[1:]) + h * np.asarray(dtimes[1:]),
                {
                    "num_iter": np.asarray(infos.num_iter[n]),
                    "abs_err": np.asarray(infos.abs_err[n]),
                    "rel_err": np.asarray(infos.rel_err[n]),
                },
            )
    return filepath


def functional_on_line_search(hs, functional, model, filepath):
    """Evaluate ``functional`` on every stored line-search run
    (reference: ``utils.py:91-98``).

    ``filepath`` is a file produced by :func:`line_search` /
    :func:`line_search_p`: run ``n`` lives under group ``f'{n}'``.
    Returns ``np.array([functional(f_0), functional(f_1), ...])``.
    """
    values = []
    for n, _h in enumerate(hs):
        with sf.StateFile(model, filepath, group=f"{n}", mode="r") as f:
            values.append(functional(f))
    return np.array(values)


def line_search_p(
    hs, model, p, dp, ini_state=None, controls=None, times=None,
    filepath: str = "temp.h5",
):
    """Line search over properties only (reference: ``utils.py:60+``)."""
    zero_state = model.state0.copy()
    zero_state[:] = 0.0
    dstate = model.state0.copy()
    dstate[:] = 0.0
    dcontrols = [c.copy() for c in (controls or [model.control])]
    for c in dcontrols:
        c[:] = 0.0
    dprop = dp
    dtimes = np.zeros_like(np.asarray(times))
    return line_search(
        hs,
        model,
        ini_state if ini_state is not None else zero_state,
        controls or [model.control],
        p,
        times,
        dstate,
        dcontrols,
        dprop,
        dtimes,
        filepath=filepath,
    )
