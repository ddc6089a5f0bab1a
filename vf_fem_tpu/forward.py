"""
Forward time integration.

The reference integrates with a per-step Python loop crossing the
Python/C++/PETSc/HDF5 boundary ~15 times per step
(reference: ``src/femvf/forward.py:139-186``, SURVEY section 3.2).  Here the
whole time loop is one ``lax.scan`` inside one jitted XLA program; states,
controls and solver telemetry stream back as stacked arrays and are written
to the HDF5 statefile in windows.

Units are CGS (reference: ``forward.py:4``).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from . import blocks as bv
from . import statefile as sf
from .equations import newmark
from .models.transient import BaseTransientModel, _params_key

Options = dict


def _stack_controls(model, controls) -> dict:
    """Stack a list of control BlockVectors into a leading-axis pytree."""
    dicts = [model.control_to_dict(c) for c in controls]
    return {
        k: np.stack([np.asarray(d[k]) for d in dicts], axis=0)
        for k in dicts[0]
    }


def _get_scan_fn(
    model,
    params: tuple,
    n_controls: int,
    use_remat: bool = False,
    mode: str = "rev",
):
    """
    Build (and cache on the model) the jitted scanned integrator.

    ``mode='rev'`` uses the custom_vjp solver (reverse-mode/adjoint capable);
    ``mode='fwd'`` uses the custom_jvp solver (tangent propagation,
    ``integrate_linear``).
    """
    cache = getattr(model, "_scan_cache", None)
    if cache is None:
        cache = {}
        model._scan_cache = cache
    key = (params, n_controls, use_remat, mode)
    if key in cache:
        return cache[key]

    step_pure = model.step_pure if mode == "rev" else model.step_pure_fwd

    # Stale-factor quasi-Newton: refresh the (expensive) Jacobian
    # factorization only every K steps, carrying the factors through the
    # scan.  Residual-certified convergence keeps the trajectory exact to
    # the solver tolerance; K amortizes the assembly+factor cost.
    refresh_k = int(dict(params).get("jacobian_refresh_steps", 1))
    use_stale = (
        refresh_k > 1
        and mode == "rev"
        and hasattr(model, "factorize")
        and hasattr(model, "step_pure_stale")
    )

    # Correction-memory predictor (``initial_guess='extrapolated'``): seed
    # each step's nonlinear solve with Newmark-predictor + the PREVIOUS
    # step's converged correction (u1 - predictor), carried through the
    # scan.  On smooth trajectories the correction changes O(dt) per step,
    # so the seed error drops by ~|delta| / |d delta| — fixed-iteration
    # chord Newton reaches the same trajectory error with fewer iterations
    # (or better error at the same count).  Gradient-exact: the converged
    # state is guess-independent and the IFT bwd rule returns a zero guess
    # cotangent, so the carried ``delta`` contributes nothing to adjoints.
    # ``model.factorize``/``refresh_factors`` keep the UN-rewritten params
    # ('extrapolated' falls through to the plain-predictor branch of
    # ``_initial_guess``; 'given' would dereference a None guess there).
    extrap = dict(params).get("initial_guess", "predictor") == "extrapolated"
    step_params = (
        tuple(sorted({**dict(params), "initial_guess": "given"}.items()))
        if extrap
        else params
    )

    def step(state1_guess, state0, control, prop, dt):
        state1, info = step_pure(
            state1_guess, state0, control, prop, dt, step_params
        )
        return state1, info

    if use_remat:
        step = jax.checkpoint(step)

    def stale_step(state1_guess, factors, state0, control, prop, dt):
        return model.step_pure_stale(
            state1_guess, factors, state0, control, prop, dt, step_params
        )

    if use_remat and use_stale:
        stale_step = jax.checkpoint(stale_step)

    def _seed_carry(state):
        if extrap:
            # derive the zero delta from the operand (never a fresh
            # jnp.zeros constant): under shard_map, scan carries must
            # carry the operands' varying-axes type (round-3 VMA rule)
            return (state, 0.0 * jnp.asarray(state["u"]))
        return state

    def _carry_state(carry):
        return carry[0] if extrap else carry

    def _advance(carry, stepfn, control, prop, dt):
        """One step from a scan carry; returns (new_carry, (state1, info))."""
        if extrap:
            state0, delta = carry
            pred = newmark.newmark_predict_u(
                state0["u"], state0["v"], state0["a"], dt
            )
            guess = {**state0, "u": pred + delta}
            state1, info = stepfn(guess, state0, control, prop, dt)
            return (state1, state1["u"] - pred), (state1, info)
        state1, info = stepfn(carry, carry, control, prop, dt)
        return state1, (state1, info)

    def scan_fn(ini_state, controls_stacked, prop, times):
        dts = jnp.diff(times)
        n_steps = dts.shape[0]

        def control_at(n):
            idx = jnp.minimum(n, n_controls - 1)
            return jax.tree_util.tree_map(
                lambda a: a[idx], controls_stacked
            )

        if not use_stale:

            def body(carry, xs):
                dt, n = xs
                return _advance(carry, step, control_at(n), prop, dt)

            fin_carry, (traj, infos) = jax.lax.scan(
                body, _seed_carry(ini_state), (dts, jnp.arange(n_steps))
            )
            return _carry_state(fin_carry), traj, infos

        # Stale-factor path as a nested scan: the Jacobian is factored once
        # at the start of each refresh window (outer scan) and the window's
        # steps reuse it (inner scan).  Hoisting the factorization out of
        # the per-step body keeps it out of any per-step conditional — under
        # ``vmap`` (batched sweeps) a data-dependent ``lax.cond`` would be
        # select-executed, refactoring every variant every step.
        #
        # ``jacobian_refresh_mode='ns'`` replaces the per-window LU
        # factorization with a Newton–Schulz inverse update (matmul-only,
        # MXU-friendly) carried across windows; a full LU re-factorization
        # runs every ``jacobian_full_refresh_windows`` windows to reset
        # accumulated drift.  All refresh decisions key off the (unbatched)
        # window counter, so vmapped sweeps keep true conditionals.
        params_d = dict(params)
        use_ns = (
            params_d.get("jacobian_refresh_mode", "full") == "ns"
            and hasattr(model, "refresh_factors")
        )
        full_every = int(params_d.get("jacobian_full_refresh_windows", 8))

        def inner(carry0, factors, dts_w, n0):
            def stepfn(guess, state0, control, prop, dt):
                return stale_step(guess, factors, state0, control, prop, dt)

            def body(carry, xs):
                dt, n = xs
                return _advance(carry, stepfn, control_at(n), prop, dt)

            return jax.lax.scan(
                body, carry0, (dts_w, n0 + jnp.arange(dts_w.shape[0]))
            )

        def window(carry0, dts_w, n0):
            factors = model.factorize(
                _carry_state(carry0), control_at(n0), prop, dts_w[0], params
            )
            return inner(carry0, factors, dts_w, n0)

        n_win = n_steps // refresh_k
        rem = n_steps - n_win * refresh_k
        trajs, infoss = [], []
        fin_carry = _seed_carry(ini_state)
        fin_factors = None
        if n_win:
            dts_main = dts[: n_win * refresh_k].reshape(n_win, refresh_k)
            n0s = refresh_k * jnp.arange(n_win)

            if use_ns:
                factors0 = model.factorize(
                    ini_state, control_at(0), prop, dts[0], params
                )

                def outer(carry, xs):
                    inner_carry, factors = carry
                    state = _carry_state(inner_carry)
                    dts_w, n0, w = xs
                    branch = jnp.where(
                        w == 0, 0, jnp.where(w % full_every == 0, 1, 2)
                    )
                    factors = jax.lax.switch(
                        branch,
                        [
                            lambda: factors,
                            lambda: model.factorize(
                                state, control_at(n0), prop, dts_w[0], params
                            ),
                            lambda: model.refresh_factors(
                                factors, state, control_at(n0), prop,
                                dts_w[0], params,
                            ),
                        ],
                    )
                    inner_carry, out = inner(inner_carry, factors, dts_w, n0)
                    return (inner_carry, factors), out

                (fin_carry, fin_factors), (traj, infos) = jax.lax.scan(
                    outer,
                    (fin_carry, factors0),
                    (dts_main, n0s, jnp.arange(n_win)),
                )
            else:

                def outer(carry, xs):
                    dts_w, n0 = xs
                    return window(carry, dts_w, n0)

                fin_carry, (traj, infos) = jax.lax.scan(
                    outer, fin_carry, (dts_main, n0s)
                )
            # (n_win, refresh_k, ...) -> (n_steps_main, ...)
            flat = lambda a: a.reshape((-1,) + a.shape[2:])
            trajs.append(jax.tree_util.tree_map(flat, traj))
            infoss.append(jax.tree_util.tree_map(flat, infos))
        if rem:
            dts_rem = dts[n_win * refresh_k :]
            n0_rem = n_win * refresh_k
            if use_ns and fin_factors is not None:
                # window index n_win is static here: pick full vs ns refresh
                if n_win % full_every == 0:
                    fin_carry, (traj_r, infos_r) = window(
                        fin_carry, dts_rem, n0_rem
                    )
                else:
                    factors_r = model.refresh_factors(
                        fin_factors, _carry_state(fin_carry),
                        control_at(n0_rem), prop, dts_rem[0], params,
                    )
                    fin_carry, (traj_r, infos_r) = inner(
                        fin_carry, factors_r, dts_rem, n0_rem
                    )
            else:
                fin_carry, (traj_r, infos_r) = window(
                    fin_carry, dts_rem, n0_rem
                )
            trajs.append(traj_r)
            infoss.append(infos_r)
        cat = lambda *xs: xs[0] if len(xs) == 1 else jnp.concatenate(xs, 0)
        traj = jax.tree_util.tree_map(cat, *trajs)
        infos = jax.tree_util.tree_map(cat, *infoss)
        return _carry_state(fin_carry), traj, infos

    fn = jax.jit(scan_fn)
    cache[key] = fn
    return fn


def integrate_pure(
    model,
    ini_state: dict,
    controls_stacked: dict,
    prop: dict,
    times: jnp.ndarray,
    params: Optional[dict] = None,
    use_remat: bool = False,
    mode: str = "rev",
):
    """
    Pure scanned integration: returns ``(fin_state, trajectory, infos)``
    where trajectory arrays have leading time axis of length ``len(times)-1``.

    This is the function to ``jax.grad``/``jax.vmap`` over (see
    ``vf_fem_tpu.adjoint`` and ``vf_fem_tpu.parallel.sweep``).  Use
    ``mode='fwd'`` when the result will be ``jax.jvp``'d.
    """
    n_controls = jax.tree_util.tree_leaves(controls_stacked)[0].shape[0]
    fn = _get_scan_fn(model, _params_key(params), n_controls, use_remat, mode)
    return fn(ini_state, controls_stacked, prop, jnp.asarray(times))


def _integrate_windowed(
    model,
    state0: dict,
    controls_stacked: dict,
    prop: dict,
    times: np.ndarray,
    params: Optional[dict],
    window: Optional[int] = None,
    use_tqdm: bool = False,
):
    """Chunk the scanned integration into fixed-size windows.

    Each window is one jitted scan call (two compilations at most: the
    window size and the remainder); the state carries across windows and
    trajectories are concatenated on host.
    """
    n_steps = len(times) - 1
    if window is None and use_tqdm:
        window = max(1, min(50, n_steps))
    if window is None or window >= n_steps:
        return integrate_pure(
            model, state0, controls_stacked, prop, times, params
        )

    starts = list(range(0, n_steps, window))
    iterator = starts
    if use_tqdm:
        from tqdm import tqdm

        iterator = tqdm(starts, unit_scale=window, unit="step")

    trajs, infos_all = [], []
    state = state0
    for s in iterator:
        e = min(s + window, n_steps)
        # shift controls: step n of this window is global step s + n
        ctrl_win = jax.tree_util.tree_map(
            lambda a: a[min(s, a.shape[0] - 1) :], controls_stacked
        )
        state, traj, infos = integrate_pure(
            model, state, ctrl_win, prop, times[s : e + 1], params
        )
        trajs.append(jax.tree_util.tree_map(np.asarray, traj))
        infos_all.append(jax.tree_util.tree_map(np.asarray, infos))

    traj = jax.tree_util.tree_map(
        lambda *xs: np.concatenate(xs, axis=0), *trajs
    )
    infos = jax.tree_util.tree_map(
        lambda *xs: np.concatenate(xs, axis=0), *infos_all
    )
    return state, traj, infos


def validate_times(times) -> np.ndarray:
    """(reference: ``forward.py:65-72``)"""
    times = np.asarray(times)
    if times.size < 1:
        raise ValueError("There must be at least 1 time integration point.")
    if times[-1] <= times[0]:
        raise ValueError(
            "The final time point must be greater or equal to the initial one."
            f" The input initial/final times were {times[0]}/{times[-1]}"
        )
    return times


def integrate(
    model: BaseTransientModel,
    f: Optional[sf.StateFile],
    ini_state: bv.BlockVector,
    controls: list,
    prop: bv.BlockVector,
    times,
    idx_meas: Optional[np.ndarray] = None,
    newton_solver_prm: Optional[Options] = None,
    write: bool = True,
    use_tqdm: bool = False,
    window: Optional[int] = None,
):
    """
    Integrate the model over ``times`` (reference: ``forward.py:22-102``).

    ``controls`` is a list of control BlockVectors; a single entry is held
    constant over the run, otherwise the last entry is held for remaining
    steps (reference: ``forward.py:170``).

    ``window`` chunks the scan into windows of that many steps (bounding
    device trajectory memory for long runs); ``use_tqdm`` shows a per-window
    progress bar (the reference's per-step tqdm, ``forward.py:165-168``,
    adapted to the scanned loop).
    """
    if idx_meas is None:
        idx_meas = np.array([])
    times = validate_times(times)

    model.set_prop(prop)
    state0 = {k: np.asarray(v) for k, v in ini_state.sub_items()}
    controls_stacked = _stack_controls(model, controls)
    prop_d = model.prop_to_dict(prop)
    # models with a restricted supported regime (FSAI) verify the run's
    # properties up front and warn (static half of the envelope guard;
    # the runtime half is the per-step telemetry in finalize_run)
    check = getattr(model, "check_envelope", None)
    if check is not None:
        check(prop_d)

    fin_state, traj, infos = _integrate_windowed(
        model, state0, controls_stacked, prop_d, times, newton_solver_prm,
        window=window, use_tqdm=use_tqdm,
    )
    return finalize_run(
        model, f, ini_state, controls, prop, times, idx_meas,
        newton_solver_prm, fin_state, traj, infos, write,
    )


def finalize_run(
    model,
    f: Optional[sf.StateFile],
    ini_state: bv.BlockVector,
    controls: list,
    prop: bv.BlockVector,
    times: np.ndarray,
    idx_meas,
    newton_solver_prm,
    fin_state: dict,
    traj: dict,
    infos,
    write: bool = True,
):
    """Shared post-run bookkeeping for ``integrate`` and the sharded
    ``parallel.ddstep.DDIntegrator.integrate``: statefile writes,
    divergence flagging, and fixed-iteration certification."""
    if idx_meas is None:
        idx_meas = np.array([])
    controls_stacked = _stack_controls(model, controls)
    state_keys = list(ini_state.keys())
    fin_bv = bv.BlockVector(
        [np.asarray(fin_state[k]) for k in state_keys], labels=[state_keys]
    )
    n_steps = len(times) - 1
    step_info = {
        "num_iter": np.asarray(infos.num_iter),
        "abs_err": np.asarray(infos.abs_err),
        "rel_err": np.asarray(infos.rel_err),
    }

    if write and f is not None:
        f.init_layout()
        # initial state row (reference: ``forward.py:75-86``)
        f.append_state(ini_state)
        f.append_control(controls[0])
        f.append_time(times[0])
        f.append_solver_info({"num_iter": 0, "abs_err": 0, "rel_err": 0})
        f.append_prop(prop)
        if 0 in idx_meas:
            f.append_meas_index(0)

        # trajectory window
        ctrl_traj = {}
        for k, arr in controls_stacked.items():
            idx = np.minimum(np.arange(n_steps), arr.shape[0] - 1)
            ctrl_traj[k] = np.asarray(arr)[idx]
        # map pure control keys back to BlockVector labels
        ctrl_keys = list(model.control.keys())
        pure_keys = list(ctrl_traj.keys())
        named = {
            bk: ctrl_traj[pk] for bk, pk in zip(ctrl_keys, pure_keys)
        }
        f.append_window(
            {k: np.asarray(traj[k]) for k in state_keys},
            named,
            times[1:],
            step_info,
        )
        for n in idx_meas:
            if n != 0:
                f.append_meas_index(int(n))

    last_info = {
        "num_iter": int(step_info["num_iter"][-1]),
        "abs_err": float(step_info["abs_err"][-1]),
        "rel_err": float(step_info["rel_err"][-1]),
    }
    last_info["all"] = step_info
    # failure detection the reference lacks (SURVEY section 5.3): flag
    # NaN/diverged steps instead of silently writing garbage
    bad = ~np.isfinite(step_info["abs_err"])
    if bad.any():
        import warnings

        first = int(np.nonzero(bad)[0][0])
        last_info["diverged"] = True
        last_info["diverged_step"] = first
        warnings.warn(
            f"integrate: non-finite solver residual first at step {first}"
            f" of {n_steps}; simulation likely diverged",
            RuntimeWarning,
        )
    else:
        last_info["diverged"] = False
    last_info["uncertified_steps"] = certify_fixed_iterations(
        newton_solver_prm, step_info
    )
    # runtime half of the FSAI envelope guard: steps whose interactive
    # flow solve failed to bracket fell back to the one-step-LAGGED
    # exchange (marginally unstable; models/fsai.py docstring) — count
    # them and warn instead of silently degrading
    bracketed = getattr(infos, "bracketed", None)
    if bracketed is not None:
        n_lagged = int((~np.asarray(bracketed).astype(bool)).sum())
        last_info["lagged_fallback_steps"] = n_lagged
        if n_lagged:
            import warnings

            warnings.warn(
                f"integrate: {n_lagged}/{n_steps} FSAI steps could not"
                " bracket the interactive flow root and fell back to"
                " the marginally-unstable lagged exchange — the"
                " configuration is outside the supported envelope"
                " (contact plane must lie below the channel midline;"
                " models/fsai.py)",
                RuntimeWarning,
            )
    return fin_bv, last_info


def certify_fixed_iterations(params: Optional[dict], step_info) -> int:
    """Residual-certify a statically-unrolled fixed-iteration Newton run.

    ``fixed_iterations`` trades the adaptive stagnation stop for fixed
    work per step (the sweep/latency-optimal configs) — but an iteration
    count that certifies on one mesh can silently under-converge on a
    larger one (measured: ``fixed_iterations=2`` left trajectories 8x
    worse at 53k DOFs while 3 was at the noise floor).  Since the
    per-step residuals still stream back through the scan, certification
    is a host-side check: warn when steps stop at a relative residual
    above ``fixed_certify_rel_err`` (default 3e-3 in f32 — above the
    measured chord-Newton stagnation floor — and 1e-6 in f64).

    Returns the number of uncertified steps (0 when the check passes or
    does not apply).

    With ``fixed_tail_residual=False`` (the throughput lever that skips
    the trailing telemetry-only residual assembly), the streamed
    ``abs/rel_err`` report the PENULTIMATE iterate — an upper bound on
    the final one in the chord-contraction regime — so this check
    certifies a bound, not the final residual.  Gate such configs on
    trajectory error against an exact-Jacobian run as well (bench.py's
    large-mesh leg does).
    """
    params = dict(params or {})
    if not params.get("fixed_iterations"):
        return 0
    rel = np.asarray(step_info["rel_err"])
    f32 = rel.dtype == np.float32
    threshold = params.get(
        "fixed_certify_rel_err", 3e-3 if f32 else 1e-6
    )
    # steps that converged absolutely are certified regardless of the
    # relative metric (rel_err ~ 1 on no-load steps where err0 ~ 0)
    absr = np.asarray(step_info["abs_err"])
    abs_ok = absr < params.get("absolute_tolerance", 1e-8)
    bad = np.isfinite(rel) & (rel > threshold) & ~abs_ok
    n_bad = int(bad.sum())
    if n_bad:
        import warnings

        warnings.warn(
            f"integrate: {n_bad}/{rel.size} steps stopped above the"
            f" fixed-iteration certification threshold"
            f" (max rel_err {float(np.nanmax(rel)):.2e} >"
            f" {threshold:.0e}); raise 'fixed_iterations' or drop it to"
            " restore the adaptive stagnation stop",
            RuntimeWarning,
        )
    return n_bad


def integrate_extend(
    model: BaseTransientModel,
    f: sf.StateFile,
    controls: list,
    times,
    idx_meas=None,
    newton_solver_prm: Optional[Options] = None,
    write: bool = True,
):
    """Resume integration from the last state in ``f``
    (reference: ``forward.py:105-136``)."""
    prop = f.get_prop()
    N = f.size
    ini_state = f.get_state(N - 1)
    ini_time = f.get_time(N - 1)
    times = np.asarray(times) + ini_time

    model.set_prop(prop)
    state0 = {k: np.asarray(v) for k, v in ini_state.sub_items()}
    controls_stacked = _stack_controls(model, controls)
    prop_d = model.prop_to_dict(prop)

    fin_state, traj, infos = integrate_pure(
        model, state0, controls_stacked, prop_d, times, newton_solver_prm
    )
    state_keys = list(ini_state.keys())
    n_steps = len(times) - 1
    step_info = {
        "num_iter": np.asarray(infos.num_iter),
        "abs_err": np.asarray(infos.abs_err),
        "rel_err": np.asarray(infos.rel_err),
    }
    if write:
        ctrl_keys = list(model.control.keys())
        ctrl_traj = {}
        for bk, (pk, arr) in zip(ctrl_keys, controls_stacked.items()):
            idx = np.minimum(np.arange(n_steps), arr.shape[0] - 1)
            ctrl_traj[bk] = np.asarray(arr)[idx]
        f.append_window(
            {k: np.asarray(traj[k]) for k in state_keys},
            ctrl_traj,
            times[1:],
            step_info,
        )
    fin_bv = bv.BlockVector(
        [np.asarray(fin_state[k]) for k in state_keys], labels=[state_keys]
    )
    return fin_bv, step_info


def integrate_step(
    model: BaseTransientModel,
    ini_state: bv.BlockVector,
    control: bv.BlockVector,
    prop: bv.BlockVector,
    dt: float,
    set_prop: bool = False,
    options: Optional[Options] = None,
):
    """Single-step integration (reference: ``forward.py:247-268``)."""
    model.dt = dt
    model.set_ini_state(ini_state)
    model.set_control(control)
    if set_prop:
        model.set_prop(prop)
    return model.solve_state1(ini_state, options=options)


def integrate_linear(
    model,
    f: sf.StateFile,
    dini_state: bv.BlockVector,
    dcontrols: list,
    dprop: bv.BlockVector,
    dtimes,
):
    """
    Linearized (tangent) integration about a stored trajectory
    (reference: ``forward.py:189-244``), computed with one ``jax.jvp``
    through the scanned forward integrator instead of hand-chained
    ``apply_dres_*`` products.
    """
    prop = f.get_prop()
    times = f.get_times()
    ini_state = f.get_state(0)
    # The base controls: reconstruct from the file (held-last semantics okay)
    n_ctrl_rows = f.root_group["control"][list(model.control.keys())[0]].shape[0]
    controls = [f.get_control(n) for n in range(min(n_ctrl_rows, f.size))]

    state0 = {k: np.asarray(v) for k, v in ini_state.sub_items()}
    controls_stacked = _stack_controls(model, controls)
    prop_d = model.prop_to_dict(prop)
    times_j = jnp.asarray(times)

    dstate0 = {k: np.asarray(v) for k, v in dini_state.sub_items()}
    dcontrols_stacked = _stack_controls(model, dcontrols)
    # pad/truncate tangent controls to match primal stacking
    dcontrols_stacked = {
        k: jnp.broadcast_to(v, controls_stacked[k].shape)
        for k, v in dcontrols_stacked.items()
    }
    dprop_d = model.prop_to_dict(dprop)
    dtimes_j = jnp.asarray(np.asarray(dtimes))

    def run(s0, cs, p, ts):
        fin, _, _ = integrate_pure(model, s0, cs, p, ts, mode="fwd")
        return fin

    _, dfin = jax.jvp(
        run,
        (state0, controls_stacked, prop_d, times_j),
        (dstate0, dcontrols_stacked, dprop_d, dtimes_j),
    )
    keys = list(ini_state.keys())
    return bv.BlockVector([np.asarray(dfin[k]) for k in keys], labels=[keys])
