"""
Isolate the large-mesh integrate's non-step cost and A/B the banded
plan group size, same session.

Round-5 roofline at 23.7k dofs: production integrate 2.072 ms/step,
step_pure_stale body 1.407 ms, amortized refresh 0.252 ms -> 0.41
ms/step unexplained.  This probe times:

  A. production integrate (refresh 96)              [baseline]
  B. integrate, single factorization (no refresh)   [removes refresh]
  C. hand-rolled lax.scan around step_pure_stale    [scan floor]
  D. A with BANDED_GC=256                            [plan group size]

plus the trajectory-error gate for D vs an exact-Jacobian run.

Usage: python probe_stepover.py [--h 0.006] [--lo 100] [--hi 400]
"""

import argparse
import time

import numpy as np

from benchmarkutils import maybe_profile  # noqa: F401  (repo path setup)
from setup import setup_transient_args
from benchmark_large import build_model

DT = 1e-4

PROD_TOL = {
    "assembly": "banded",
    "linear_solver": "btd",
    "btd_store_dtype": "bfloat16",
    "jacobian_refresh_steps": 96,
    "fixed_iterations": 3,
    "fixed_tail_residual": False,
    "stagnation_ratio": 0.5,
}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--h", type=float, default=0.006)
    parser.add_argument("--lo", type=int, default=100)
    parser.add_argument("--hi", type=int, default=400)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from vf_fem_tpu import config, forward
    from vf_fem_tpu.models.transient import _params_key

    def build(gc):
        config.BANDED_GC = gc
        m = build_model(args.h)
        state0_bv, control, prop = setup_transient_args(m)
        m.set_prop(prop)
        state0 = {
            k: jnp.zeros_like(jnp.asarray(np.asarray(v)))
            for k, v in state0_bv.sub_items()
        }
        cs = forward._stack_controls(m, [control])
        pd = m.prop_to_dict(prop)
        return m, state0, cs, pd

    def slope(fn, lens, n=3):
        best = {}
        for L in lens:
            fn(L)  # compile/warm
            b = np.inf
            for _ in range(n):
                t0 = time.perf_counter()
                fn(L)
                b = min(b, time.perf_counter() - t0)
            best[L] = b
        lo, hi = lens
        return (hi - lo) / max(best[hi] - best[lo], 1e-9)

    def integ_runner(m, state0, cs, pd, tol):
        def go(L):
            times = jnp.asarray(DT * np.arange(L + 1))
            fin, traj, infos = forward.integrate_pure(
                m, state0, cs, pd, times, tol
            )
            np.asarray(fin["u"])
            return fin

        return go

    lens = (args.lo, args.hi)

    # ---- A: production (gc=128 plan) ----
    m, state0, cs, pd = build(128)
    tps_a = slope(integ_runner(m, state0, cs, pd, PROD_TOL), lens)
    print(f"A prod gc=128:            {tps_a:7.1f} steps/s"
          f" ({1e3/tps_a:6.3f} ms/step)", flush=True)

    # ---- B: no refresh (factor once in the remainder path) ----
    tol_b = dict(PROD_TOL)
    tol_b["jacobian_refresh_steps"] = 10**6
    tps_b = slope(integ_runner(m, state0, cs, pd, tol_b), lens)
    print(f"B no-refresh gc=128:      {tps_b:7.1f} steps/s"
          f" ({1e3/tps_b:6.3f} ms/step)", flush=True)

    # ---- C: hand scan around step_pure_stale ----
    params = _params_key(PROD_TOL)
    fctrl = {k: jnp.asarray(v[0]) for k, v in cs.items()}
    factors = m.factorize(state0, fctrl, pd, DT, params)

    def hand(L):
        @jax.jit
        def run(state0, factors):
            def body(st, _):
                st1, info = m.step_pure_stale(
                    st, factors, st, fctrl, pd, DT, params
                )
                return st1, (st1["u"], info.num_iter)

            fin, out = jax.lax.scan(body, state0, None, length=L)
            return fin

        fin = run(state0, factors)
        np.asarray(fin["u"])

    tps_c = slope(hand, lens)
    print(f"C hand scan gc=128:       {tps_c:7.1f} steps/s"
          f" ({1e3/tps_c:6.3f} ms/step)", flush=True)

    # ---- D: production with gc=256 plan ----
    m2, state0_2, cs2, pd2 = build(256)
    tps_d = slope(integ_runner(m2, state0_2, cs2, pd2, PROD_TOL), lens)
    print(f"D prod gc=256:            {tps_d:7.1f} steps/s"
          f" ({1e3/tps_d:6.3f} ms/step)", flush=True)

    # trajectory gate: gc=256 vs exact-Jacobian (refresh-1, f32 factors)
    tol_x = dict(PROD_TOL)
    tol_x.pop("btd_store_dtype")
    tol_x["jacobian_refresh_steps"] = 1
    times_g = jnp.asarray(DT * np.arange(args.lo + 1))
    fin_d, _, _ = forward.integrate_pure(
        m2, state0_2, cs2, pd2, times_g, PROD_TOL
    )
    fin_x, _, _ = forward.integrate_pure(
        m2, state0_2, cs2, pd2, times_g, tol_x
    )
    err = float(
        np.abs(np.asarray(fin_d["u"]) - np.asarray(fin_x["u"])).max()
        / max(np.abs(np.asarray(fin_x["u"])).max(), 1e-30)
    )
    print(f"gc=256 traj err vs exact-Jacobian: {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
