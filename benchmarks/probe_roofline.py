"""
Same-session roofline decomposition of the CURRENT production large-mesh
step (banded assembly + btd-bf16 + refresh-96 + fixed-3 tail-free chord).

Prices every component of the step against the measured HBM streaming
bound (fold-proof slope timing, host-fetch sync — CLAUDE.md round-3) and
prints one table per mesh size:

    op | ms | calls/step | MB streamed | floor ms | x-floor

plus the full production integrate's device-slope rate so the component
sum can be checked against the real step.  The residual's banded
gather/scatter are also swept over the plan group size ``gc`` — the
per-grid-step overhead of the Pallas kernels (ngroups sequential steps)
is a latency term the gc=128 default maximizes.

Usage: python probe_roofline.py [--h 0.006] [--lo 100] [--hi 400]
"""

import argparse
import time

import numpy as np

from benchmarkutils import maybe_profile  # noqa: F401  (repo path setup)
from setup import setup_transient_args
from benchmark_large import build_model

DT = 1e-4
N_LO = 40
N_HI = 140

PROD_TOL = {
    "assembly": "banded",
    "linear_solver": "btd",
    "btd_store_dtype": "bfloat16",
    "jacobian_refresh_steps": 96,
    "fixed_iterations": 3,
    "fixed_tail_residual": False,
    "stagnation_ratio": 0.5,
}


def timeit(fn, *args, n=4):
    """Slope timing between two jitted scan lengths (see probe_assembly)."""
    import jax
    import jax.numpy as jnp

    def make(length):
        def looped(args):
            def body(carry, _):
                args_p = jax.tree_util.tree_map(
                    lambda a: a + (carry * 1e-38).astype(a.dtype)
                    if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating)
                    else a,
                    args,
                )
                out = fn(*args_p)
                # NONLINEAR consumer: a plain sum lets XLA fold
                # scatter-adds and hoist reductions (round-3 rule)
                s = sum(
                    jnp.sum(jnp.abs(leaf))
                    for leaf in jax.tree_util.tree_leaves(out)
                    if jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating)
                )
                return carry + s, None

            c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=length)
            return c

        return jax.jit(looped)

    run_lo, run_hi = make(N_LO), make(N_HI)
    np.asarray(run_lo(args))  # compile + warm
    np.asarray(run_hi(args))
    best_lo = best_hi = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(run_lo(args))
        best_lo = min(best_lo, time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(run_hi(args))
        best_hi = min(best_hi, time.perf_counter() - t0)
    return max(best_hi - best_lo, 1e-12) / (N_HI - N_LO)


def stream_bound():
    import jax
    import sys, os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from bench import measure_stream_bound

    return measure_stream_bound(jax.devices()[0])


def nbytes(tree):
    import jax

    return sum(
        np.asarray(x).dtype.itemsize * np.asarray(x).size
        for x in jax.tree_util.tree_leaves(tree)
    )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--h", type=float, default=0.006)
    parser.add_argument("--lo", type=int, default=100)
    parser.add_argument("--hi", type=int, default=400)
    parser.add_argument("--gc-sweep", action="store_true")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from vf_fem_tpu import forward
    from vf_fem_tpu.fem import banded as banded_mod
    from vf_fem_tpu.models.transient import _params_key
    from vf_fem_tpu.solvers import bsb as bsb_mod, btd as btd_mod

    model = build_model(args.h)
    solid = model.solid
    R = solid._residual
    ndof, nvert, dim = solid.ndof, solid.nvert, solid.dim
    print(
        f"device {jax.devices()[0].platform}, ndof={ndof},"
        f" nc={R.topology.n_cells}",
        flush=True,
    )

    gbs = stream_bound()
    print(f"stream bound: {gbs:.1f} GB/s", flush=True)

    state0_bv, control, prop = setup_transient_args(model)
    model.set_prop(prop)
    sprop = {
        k: jnp.asarray(np.asarray(v))
        for k, v in solid.prop.sub_items()
        if True
    }
    u = jnp.zeros(ndof)
    s0 = {"u": u, "v": u, "a": u}
    ctrl = (
        {"p1": jnp.zeros(R.coefficient_shape("control/p1"))}
        if "control/p1" in R.coefficient_spec
        else {}
    )

    rows = []

    def row(name, t_s, calls, mb):
        floor_ms = mb / 1e3 / gbs * 1e3  # MB -> ms at gbs GB/s
        rows.append((name, t_s * 1e3, calls, mb, floor_ms))
        print(
            f"{name:26s} {t_s*1e3:8.3f} ms x{calls:<4g}"
            f" {mb:8.2f} MB  floor {floor_ms:6.3f} ms"
            f"  x{t_s*1e3/max(floor_ms,1e-9):7.1f}",
            flush=True,
        )

    # ---- banded res_u decomposition ----
    plan = R.banded_plan()
    ncpad = plan.ngroups * plan.gc
    C = 0
    for key, spec in R.coefficient_spec.items():
        if spec.space == "cg1_vector":
            C += dim
        elif spec.space == "cg1_scalar":
            C += 1
    C += dim  # traced coordinates
    print(
        f"banded plan: ngroups={plan.ngroups}, gc={plan.gc}, w={plan.w},"
        f" C={C}",
        flush=True,
    )

    F = jnp.zeros((C, nvert))
    gather = jax.jit(lambda F: banded_mod.banded_gather(plan, F))
    t_gather = timeit(gather, F)
    mb_gather = (C * plan.nvert_pad + plan.nv * C * ncpad) * 4 / 1e6
    row("banded_gather", t_gather, 3, mb_gather)

    loc = jnp.zeros((plan.nv, dim, ncpad))
    scatter = jax.jit(
        lambda l: banded_mod.banded_scatter(plan, l, nvert)
    )
    t_scatter = timeit(scatter, loc)
    mb_scatter = (plan.nv * dim * ncpad + dim * plan.nvert_pad) * 4 / 1e6
    row("banded_scatter", t_scatter, 3, mb_scatter)

    res_ub = jax.jit(
        lambda uu: solid.res_u(uu, s0, ctrl, sprop, DT, banded=True)
    )
    t_res = timeit(res_ub, u)
    # streams: 4 uva arrays in, F stack, gather, locals, kernel out,
    # scatter; approximate the true HBM floor as gather+scatter+state
    mb_res = mb_gather + mb_scatter + 4 * ndof * 4 / 1e6
    row("res_u banded (total)", t_res, 3, mb_res)

    # ---- gc sweep: per-grid-step latency vs window flops ----
    if args.gc_sweep:
        cells_np = np.asarray(R.topology.cells)
        for gc_try in (128, 256, 512, 1024):
            try:
                plan_t = banded_mod.plan_banded(
                    cells_np, nvert, gc=gc_try, max_window=4096
                )
            except AssertionError as e:
                print(f"gc={gc_try}: plan failed ({e})", flush=True)
                continue
            ncpad_t = plan_t.ngroups * plan_t.gc
            g_t = jax.jit(
                lambda F, p=plan_t: banded_mod.banded_gather(p, F)
            )
            t_g = timeit(g_t, F)
            loc_t = jnp.zeros((plan_t.nv, dim, ncpad_t))
            s_t = jax.jit(
                lambda l, p=plan_t: banded_mod.banded_scatter(p, l, nvert)
            )
            t_s = timeit(s_t, loc_t)
            print(
                f"  gc={gc_try:4d}: ngroups={plan_t.ngroups:4d}"
                f" w={plan_t.w:5d} gather {t_g*1e3:7.3f} ms"
                f" scatter {t_s*1e3:7.3f} ms",
                flush=True,
            )

    # ---- solver components ----
    params = _params_key(PROD_TOL)
    jacb = jax.jit(lambda uu: solid.jac_u_blocks(uu, s0, ctrl, sprop, DT))
    t_jac = timeit(jacb, u, n=3)
    Jc, Jf = jacb(u)
    row("jac_u_blocks", t_jac, 1.0 / 96, nbytes((Jc, Jf)) / 1e6)

    bplan = solid._get_bsb_plan()
    fill = jax.jit(lambda Jc, Jf: bsb_mod.bsb_fill(bplan, [Jc, Jf]) ** 2)
    t_fill = timeit(fill, Jc, Jf, n=3)
    blocks = bsb_mod.bsb_fill(bplan, [Jc, Jf])
    row(
        "bsb_fill", t_fill, 1.0 / 96,
        (nbytes((Jc, Jf)) + nbytes(blocks)) / 1e6,
    )

    fac = jax.jit(
        lambda b: btd_mod.btd_factor(bplan, b, store_dtype="bfloat16")
    )
    t_fac = timeit(fac, blocks, n=3)
    fT = fac(blocks)
    row(
        "btd_factor(bf16)", t_fac, 1.0 / 96,
        (nbytes(blocks) + nbytes(fT)) / 1e6,
    )

    solve = jax.jit(lambda f, r: btd_mod.btd_solve(bplan, f, r))
    t_solve = timeit(solve, fT, u, n=3)
    row("btd_solve(bf16)", t_solve, 3, (nbytes(fT) + 2 * ndof * 4) / 1e6)

    # ---- fluid + exchange ----
    fl = model.fluid
    _, fl_prop = model._split_prop(model.prop_to_dict(model.prop))
    fctrl = {
        k: jnp.asarray(np.asarray(v)) for k, v in model.control.sub_items()
    }
    pdict = model.prop_to_dict(model.prop)

    def fluid_exchange(uu, p0, q0):
        area = model._area_from_u1(uu, pdict)
        fl_control = {"area": area, **{k: fctrl[k] for k in fctrl}}
        qp1 = fl.solve_pure(fl_control, fl_prop, {"q": q0, "p": p0})
        p_solid = model._pressure_to_solid(qp1["p"])
        return qp1["q"], qp1["p"], p_solid

    p0 = jnp.zeros_like(np.asarray(model.state0["p"]))
    q0 = jnp.zeros(())
    fx = jax.jit(fluid_exchange)
    t_fluid = timeit(fx, u, p0, q0)
    row("fluid+exchange", t_fluid, 1, 6 * p0.size * 4 / 1e6)

    # ---- full step (stale factors as args) ----
    factors = model.factorize(
        {**s0, "p": p0, "q": q0}, fctrl, pdict, DT, params
    )
    stepf = jax.jit(
        lambda st, f: model.step_pure_stale(st, f, st, fctrl, pdict, DT,
                                            params)[0]
    )
    st0 = {**s0, "p": p0, "q": q0}
    t_step = timeit(stepf, st0, factors)
    row("step_pure_stale (total)", t_step, 1, 0.0)

    # ---- production integrate device-slope ----
    state0 = {
        k: jnp.zeros_like(jnp.asarray(np.asarray(v)))
        for k, v in state0_bv.sub_items()
    }
    cs = forward._stack_controls(model, [control])
    times_lo = jnp.asarray(DT * np.arange(args.lo + 1))
    times_hi = jnp.asarray(DT * np.arange(args.hi + 1))

    def run(times):
        fin, traj, infos = forward.integrate_pure(
            model, state0, cs, pdict, times, PROD_TOL
        )
        np.asarray(fin["u"])
        return fin

    def best_of(times, n=3):
        best = np.inf
        for _ in range(n):
            t0 = time.perf_counter()
            run(times)
            best = min(best, time.perf_counter() - t0)
        return best

    run(times_lo)
    best_lo = best_of(times_lo)
    run(times_hi)
    best_hi = best_of(times_hi)
    tps = (args.hi - args.lo) / max(best_hi - best_lo, 1e-9)
    ms_step = 1e3 / tps
    print(
        f"\nproduction integrate: {tps:.1f} steps/s device-slope"
        f" ({ms_step:.3f} ms/step)",
        flush=True,
    )
    acc = sum(t * c for (_n, t, c, _mb, _f) in rows)
    print(
        f"component sum: {acc:.3f} ms/step"
        f" -> unexplained (scan/newmark/overhead):"
        f" {ms_step - acc:.3f} ms/step",
        flush=True,
    )


if __name__ == "__main__":
    main()
