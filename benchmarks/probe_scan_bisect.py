"""
Bisect the gap between the bare stale step and the production integrate.

Round-5 stepover probe (same session, 23.7k dofs): production integrate
2.086 ms/step (gc=128), no-refresh variant 1.861, step_pure_stale body
~1.4 ms -- so the scan machinery costs ~0.45 ms/step.  This probe times
properly-cached jitted scans (one jit per length, reused across repeats)
of increasing structure to find where it goes:

  S0: scan(step), carry only, no per-step outputs
  S1: + emit full trajectory (u,v,a,q,p) + infos
  S2: + control_at dynamic indexing per step
  S3: + nested window scan (scan-of-scans, reshape/flatten) = integrate
      without refresh
  SPIKE16/32: S0 with linear_solver='spike'

Usage: python probe_scan_bisect.py [--h 0.006] [--lo 100] [--hi 400]
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

    from vf_fem_tpu import forward
    from vf_fem_tpu.models.transient import _params_key

    m = build_model(args.h)
    state0_bv, control, prop = setup_transient_args(m)
    m.set_prop(prop)
    state0 = {
        k: jnp.zeros_like(jnp.asarray(np.asarray(v)))
        for k, v in state0_bv.sub_items()
    }
    cs = forward._stack_controls(m, [control])
    pd = m.prop_to_dict(prop)
    params = _params_key(PROD_TOL)
    fctrl = {k: jnp.asarray(v[0]) for k, v in cs.items()}
    lens = (args.lo, args.hi)
    print(f"device {jax.devices()[0].platform}, ndof={m.solid.ndof}",
          flush=True)

    def slope(make_run, tag, n=3, params_=params):
        runs = {L: make_run(L, params_) for L in lens}
        best = {}
        for L in lens:
            np.asarray(runs[L](state0)["u"])  # compile+warm
            b = np.inf
            for _ in range(n):
                t0 = time.perf_counter()
                np.asarray(runs[L](state0)["u"])
                b = min(b, time.perf_counter() - t0)
            best[L] = b
        lo, hi = lens
        tps = (hi - lo) / max(best[hi] - best[lo], 1e-9)
        print(f"{tag:26s} {tps:7.1f} steps/s ({1e3/tps:6.3f} ms/step)",
              flush=True)
        return tps

    def mk_s0(L, prm):
        factors = m.factorize(state0, fctrl, pd, DT, prm)

        @jax.jit
        def run(st0):
            def body(st, _):
                st1, info = m.step_pure_stale(
                    st, factors, st, fctrl, pd, DT, prm
                )
                return st1, None

            fin, _ = jax.lax.scan(body, st0, None, length=L)
            return fin

        return run

    def mk_s1(L, prm):
        factors = m.factorize(state0, fctrl, pd, DT, prm)

        @jax.jit
        def run(st0):
            def body(st, _):
                st1, info = m.step_pure_stale(
                    st, factors, st, fctrl, pd, DT, prm
                )
                return st1, (st1, info)

            fin, (traj, infos) = jax.lax.scan(body, st0, None, length=L)
            return fin

        return run

    def mk_s2(L, prm):
        factors = m.factorize(state0, fctrl, pd, DT, prm)

        cs_j = jax.tree_util.tree_map(jnp.asarray, cs)

        @jax.jit
        def run(st0):
            def body(st, n):
                c = jax.tree_util.tree_map(
                    lambda a: a[jnp.minimum(n, a.shape[0] - 1)], cs_j
                )
                st1, info = m.step_pure_stale(
                    st, factors, st, c, pd, DT, prm
                )
                return st1, (st1, info)

            fin, out = jax.lax.scan(body, st0, jnp.arange(L))
            return fin

        return run

    def mk_s3(L, prm):
        tol = dict(PROD_TOL)
        tol["jacobian_refresh_steps"] = 10**6

        def run(st0):
            times = jnp.asarray(DT * np.arange(L + 1))
            fin, traj, infos = forward.integrate_pure(
                m, st0, cs, pd, times, tol
            )
            return fin

        return run

    slope(mk_s0, "S0 bare scan")
    slope(mk_s1, "S1 +traj emit")
    slope(mk_s2, "S2 +control gather")
    slope(mk_s3, "S3 integrate no-refresh")

    for S in (16, 32):
        tol_s = dict(PROD_TOL)
        tol_s["linear_solver"] = "spike"
        tol_s["spike_partitions"] = S
        try:
            slope(mk_s0, f"S0 spike{S}", params_=_params_key(tol_s))
        except Exception as e:
            print(f"spike{S} failed: {e!r}", flush=True)


if __name__ == "__main__":
    main()
