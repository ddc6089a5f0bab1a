"""
Jittable Newton and fixed-point drivers.

Replaces the external ``nonlineq`` package
(``newton_solve``/``iterative_solve``, call sites at reference
``src/femvf/models/transient.py:441-468`` and ``:1031-1033``) with
``lax.while_loop``-based solvers that run entirely on device and return the
reference's per-step solver telemetry ``{num_iter, abs_err, rel_err}``
(persisted to the statefile, reference ``src/femvf/forward.py:77-83``).

Stopping rule (matching nonlineq semantics): converged when
``abs_err < abs_tol`` or ``abs_err < rel_tol * abs_err0``.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..solverconst import DEFAULT_NEWTON_SOLVER_PRM


class SolveInfo(NamedTuple):
    num_iter: jnp.ndarray
    abs_err: jnp.ndarray
    rel_err: jnp.ndarray


def sanitize_iterate(x):
    """Zero non-finite entries of an uncommitted masked iterate.

    Masked lockstep bodies route uncommitted iterates through
    ``jnp.where``; TPU's fused-select rewrite can evaluate the select
    arithmetically (``0 * NaN = NaN`` — CLAUDE.md double-where rule), so
    a non-finite uncommitted iterate must never reach the select.  For
    finite iterates this is the identity, which preserves the
    masked-body == plain-body iterate equivalence."""
    return jnp.nan_to_num(x, nan=0.0, posinf=0.0, neginf=0.0)


def sanitize_err(err, bigval: float):
    """Map a non-finite masked error norm to a finite 'big' sentinel.

    ``nan_to_num`` (not ``jnp.where(isfinite(...), ...)``) so the NaN
    never appears in a select branch; ``bigval`` trips the stagnation
    stop on the next own-active evaluation, so a row whose iterate went
    non-finite masks itself off exactly as a NaN error norm would have
    (NaN comparisons are all-False)."""
    return jnp.nan_to_num(err, nan=bigval, posinf=bigval, neginf=bigval)


def newton_solve(
    x0: jnp.ndarray,
    assem_res: Callable[[jnp.ndarray], jnp.ndarray],
    solve_jac: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    params: dict = None,
    norm_fn: Callable = None,
    uniform_pred: Callable = None,
):
    """
    Solve ``res(x) = 0`` by Newton's method.

    ``assem_res(x)`` returns the residual vector; ``solve_jac(x, r)`` returns
    ``J(x)^{-1} r``.  Iterates ``x <- x - J^{-1} res`` until the residual
    norm meets the absolute/relative tolerance, all inside a jittable
    ``while_loop`` with a static iteration cap.

    ``norm_fn`` overrides the residual norm — the DOF-sharded integrator
    (``parallel.ddstep``) passes a ``psum``-reduced norm so every device
    takes identical Newton branches.

    ``uniform_pred`` maps this instance's continue-predicate to a
    trip-count predicate shared by all instances that must stay in
    lockstep.  When the loop body contains collectives (sharded
    assembly/solves) and several independent instances run on disjoint
    mesh-axis subgroups (DP x TP: one per dp row), EVERY instance must
    execute the same number of bodies or the collectives deadlock — the
    caller passes an any-reduction over the dp axis, converged
    instances keep iterating with their commits masked, and the
    per-instance result is unchanged.
    """
    params = {**DEFAULT_NEWTON_SOLVER_PRM, **(params or {})}
    abs_tol = params["absolute_tolerance"]
    rel_tol = params["relative_tolerance"]
    max_iter = params["maximum_iterations"]
    if norm_fn is None:
        norm_fn = jnp.linalg.norm

    # Statically unrolled fixed-iteration mode: no while_loop, no per-step
    # convergence branching — XLA fuses across iterations, which wins on
    # latency-bound (small-mesh) TPU steps and under vmap (every batch
    # element does identical work).  Convergence is still *reported*
    # (num_iter/abs_err/rel_err flow to the statefile) just not adaptive;
    # validate the iteration count against an adaptive run.
    n_fixed = params.get("fixed_iterations")
    if n_fixed:
        # fixed_iterations=1 has no penultimate iterate: a tail-free
        # fixed-1 would report the INITIAL-guess residual (rel_err 1.0),
        # tripping certify_fixed_iterations on every step — route it
        # through the certified path (the tail residual IS the only
        # meaningful telemetry at n=1)
        if int(n_fixed) >= 2 and not params.get(
            "fixed_tail_residual", True
        ):
            # Tail-free chord: only the n load-bearing residuals are
            # assembled (the first feeds the first update, each next one
            # feeds the next update) — the (n+1)-th, telemetry-only
            # residual of the certified mode is skipped.  That residual
            # is ~1/4 of the fixed-3 step at large mesh (probe: banded
            # res_u 0.36 ms vs bf16 btd_solve 0.15 ms), so this is a
            # measured throughput lever.  The honesty trade, documented
            # in ``certify_fixed_iterations``: abs/rel_err report the
            # PENULTIMATE iterate (an upper bound on the final one in
            # the chord-contraction regime), and the FINAL iterate is
            # committed unconditionally — no best-iterate select (which
            # would need the tail residual).  While the chord contracts
            # monotonically the result is bit-identical to the
            # certified mode; outside that regime it can differ — gate
            # such configs on trajectory error vs an exact-Jacobian run
            # (bench.py does).
            x = x0
            res = assem_res(x)
            err0 = norm_fn(res)
            err_pen = err0
            for i in range(int(n_fixed)):
                x = x - solve_jac(x, res)
                if i + 1 < int(n_fixed):
                    res = assem_res(x)
                    err_pen = norm_fn(res)
            info = SolveInfo(
                num_iter=jnp.asarray(int(n_fixed)),
                abs_err=err_pen,
                rel_err=err_pen / jnp.where(err0 == 0, 1.0, err0),
            )
            return x, info
        x = x0
        res = assem_res(x)
        err0 = norm_fn(res)
        x_best, err_best = x, err0
        for _ in range(int(n_fixed)):
            x = x - solve_jac(x, res)
            res = assem_res(x)
            err = norm_fn(res)
            better = err < err_best
            x_best = jnp.where(better, x, x_best)
            err_best = jnp.where(better, err, err_best)
        info = SolveInfo(
            num_iter=jnp.asarray(int(n_fixed)),
            abs_err=err_best,
            rel_err=err_best / jnp.where(err0 == 0, 1.0, err0),
        )
        return x_best, info
    # Stop when an iteration fails to reduce the residual by this factor:
    # in reduced precision the achievable residual is set by the rounding
    # noise floor of the residual evaluation itself (large on TPU f32 due
    # to the ~1/(beta dt^2) Newmark mass terms), so grinding to a fixed
    # absolute tolerance would spin at max_iter without progress.
    stagnation_ratio = params.get("stagnation_ratio", 0.9)

    res0 = assem_res(x0)
    err0 = norm_fn(res0)
    # data-derived (not a fresh constant): the while_loop carry must
    # match the operands' varying-axes type under shard_map (jax 0.9).
    # FINITE sentinel, not inf — it flows through jnp.where unselected
    # branches in the masked body, and TPU's fused select can be
    # rewritten arithmetically (0 * inf = NaN; CLAUDE.md double-where
    # rule), which would silently stop every loop after one iteration.
    bigval = float(jnp.finfo(err0.dtype).max) * 0.125
    big = 0.0 * err0 + jnp.asarray(bigval, err0.dtype)

    def own_active(carry):
        x, res, err, err_prev, x_best, err_best, k = carry
        not_conv = jnp.logical_and(err >= abs_tol, err >= rel_tol * err0)
        progressing = err < stagnation_ratio * err_prev
        return jnp.logical_and(
            jnp.logical_and(not_conv, progressing), k < max_iter
        )

    def cond(carry):
        act = own_active(carry)
        return act if uniform_pred is None else uniform_pred(act)

    def body_plain(carry):
        x, res, err, err_prev, x_best, err_best, k = carry
        dx = solve_jac(x, res)
        x = x - dx
        res = assem_res(x)
        err_new = norm_fn(res)
        # Track the best iterate: with an approximate Jacobian (stale /
        # Newton–Schulz-refreshed factors) an iteration can overshoot; the
        # returned state must be the lowest-residual one seen, not the last.
        better = err_new < err_best
        x_best = jnp.where(better, x, x_best)
        err_best = jnp.where(better, err_new, err_best)
        return (x, res, err_new, err, x_best, err_best, k + 1)

    def body_masked(carry):
        x, res, err, err_prev, x_best, err_best, k = carry
        # an instance whose own stop has fired may still be executing
        # bodies for collective lockstep (see uniform_pred): its commits
        # are masked so the returned state is its own stopping point
        act = own_active(carry)
        dx = solve_jac(x, res)
        x_raw = x - dx
        res_raw = assem_res(x_raw)
        # the error norm comes from the RAW residual: a row whose
        # iterate/residual went non-finite scores bigval (no best-commit
        # this iteration; its next own_active sees bigval and the row
        # masks itself off) — norming the entry-sanitized residual would
        # zero-fill the NaNs into a spuriously SMALL norm and commit a
        # corrupt iterate as best.  Only the CARRIED arrays are
        # entry-sanitized, because they route through the jnp.where
        # selects (TPU fused-select rewrite: 0 * NaN = NaN)
        err_new = sanitize_err(norm_fn(res_raw), bigval)
        x_new = sanitize_iterate(x_raw)
        res_new = sanitize_iterate(res_raw)
        better = jnp.logical_and(act, err_new < err_best)
        x_best = jnp.where(better, x_new, x_best)
        err_best = jnp.where(better, err_new, err_best)
        return (
            jnp.where(act, x_new, x),
            jnp.where(act, res_new, res),
            jnp.where(act, err_new, err),
            jnp.where(act, err, err_prev),
            x_best,
            err_best,
            k + act.astype(k.dtype),
        )

    # the masked body only exists for lockstep callers — plain callers
    # keep the original body (no per-iteration ndof-sized selects)
    body = body_plain if uniform_pred is None else body_masked

    k0 = (0.0 * err0).astype(jnp.int32)  # data-derived (see `big`)
    x, res, err, err_prev, x_best, err_best, k = jax.lax.while_loop(
        cond, body, (x0, res0, err0, big, x0, err0, k0)
    )
    info = SolveInfo(
        num_iter=k,
        abs_err=err_best,
        rel_err=err_best / jnp.where(err0 == 0, 1.0, err0),
    )
    return x_best, info


def iterative_solve(
    x0,
    assem_res: Callable,
    step: Callable,
    norm: Callable = None,
    params: dict = None,
):
    """
    Fixed-point (Picard) iteration: ``x <- step(x)`` until the residual norm
    converges (replaces ``nonlineq.iterative_solve``, used by the implicit
    FSI model at reference ``transient.py:1031-1033``).

    ``params['aitken'] = True`` enables Aitken dynamic under-relaxation
    (Kuettler & Wall's partitioned-FSI accelerator):
    ``x_{k+1} = x_k + w_k d_k`` with ``d_k = step(x_k) - x_k`` and
    ``w_k = -w_{k-1} <d_{k-1}, d_k - d_{k-1}> / ||d_k - d_{k-1}||^2`` —
    typically halves the iteration count for strongly coupled steps at
    the cost of one pytree saxpy.  The reference has no analog (plain
    fixed-point only).

    ``x0`` may be any pytree; ``assem_res(x)`` returns a residual pytree.
    """
    params = {**DEFAULT_NEWTON_SOLVER_PRM, **(params or {})}
    abs_tol = params["absolute_tolerance"]
    rel_tol = params["relative_tolerance"]
    max_iter = params.get("maximum_iterations", 50)
    aitken = bool(params.get("aitken", False))
    # stagnation stop, like newton_solve: in reduced precision the
    # fixed-point residual bottoms out at the evaluation noise floor —
    # without this the f32 Picard spins at max_iter every step
    stag = params.get("stagnation_ratio", 0.98)

    if norm is None:

        def norm(tree):
            leaves = jax.tree_util.tree_leaves(tree)
            return jnp.sqrt(sum(jnp.sum(jnp.square(l)) for l in leaves))

    err0 = norm(assem_res(x0))
    big = jnp.asarray(jnp.inf, dtype=err0.dtype)

    if not aitken:

        def cond(carry):
            x, err, err_prev, k = carry
            not_conv = jnp.logical_and(err >= abs_tol, err >= rel_tol * err0)
            progressing = err < stag * err_prev
            return jnp.logical_and(
                jnp.logical_and(not_conv, progressing), k < max_iter
            )

        def body(carry):
            x, err, err_prev, k = carry
            x = step(x)
            err = norm(assem_res(x))
            return (x, err, carry[1], k + 1)

        x, err, _, k = jax.lax.while_loop(cond, body, (x0, err0, big, 0))
    else:
        tmap = jax.tree_util.tree_map

        def _dot(a, b):
            return sum(
                jnp.vdot(la, lb)
                for la, lb in zip(
                    jax.tree_util.tree_leaves(a),
                    jax.tree_util.tree_leaves(b),
                )
            )

        w0 = jnp.asarray(params.get("aitken_omega0", 1.0), dtype=err0.dtype)
        d0 = tmap(jnp.zeros_like, x0)

        def cond(carry):
            x, err, err_prev, d_prev, w, k = carry
            not_conv = jnp.logical_and(err >= abs_tol, err >= rel_tol * err0)
            progressing = err < stag * err_prev
            return jnp.logical_and(
                jnp.logical_and(not_conv, progressing), k < max_iter
            )

        def body(carry):
            x, err, err_prev, d_prev, w, k = carry
            d = tmap(lambda g, xi: g - xi, step(x), x)
            dd = tmap(lambda a, b: a - b, d, d_prev)
            denom = _dot(dd, dd)
            w_new = jnp.where(
                denom > 0.0, -w * _dot(d_prev, dd) / jnp.where(
                    denom == 0.0, 1.0, denom
                ), w,
            )
            # first iteration (d_prev = 0): plain step (w = w0)
            w_new = jnp.where(k == 0, w, w_new)
            # clamp for robustness
            w_new = jnp.clip(w_new, 0.05, 2.0)
            x = tmap(lambda xi, di: xi + w_new * di, x, d)
            err = norm(assem_res(x))
            return (x, err, carry[1], d, w_new, k + 1)

        x, err, _, _, _, k = jax.lax.while_loop(
            cond, body, (x0, err0, big, d0, w0, 0)
        )
    info = SolveInfo(
        num_iter=k, abs_err=err, rel_err=err / jnp.where(err0 == 0, 1.0, err0)
    )
    return x, info
