"""
Same-session large-mesh config sweep: device-slope stepping rates at
23.7k dofs for the btd-bf16 stack under {refresh window} x {chord
iterations}, each gated by trajectory error against an exact-Jacobian
run on the same device.

Round-4 context: the fold-proof probe (probe_assembly.py) re-measured
the step's cost structure with slope timing — banded res_u 0.36 ms,
bf16 btd_solve 0.15 ms, fill+factor 24.1 ms/window — so the amortized
refresh (0.75 ms/step at window 32) and the 3 chord iterations are the
remaining levers, NOT the solve scan (the round-3 "btd_solve ~0.5 ms"
premise was dispatch-distorted).

Usage: python probe_large_config.py [--h 0.006] [--lo 100] [--hi 400]
"""

import argparse
import time

import numpy as np

from benchmarkutils import maybe_profile  # noqa: F401  (repo path setup)
from setup import setup_transient_args
from benchmark_large import build_model

DT = 1e-4


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--h", type=float, default=0.006)
    parser.add_argument("--lo", type=int, default=100)
    parser.add_argument("--hi", type=int, default=400)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from vf_fem_tpu import forward

    model = build_model(args.h)
    print(f"device {jax.devices()[0].platform}, ndof={model.solid.ndof}",
          flush=True)

    state0_bv, control, prop = setup_transient_args(model)
    model.set_prop(prop)
    state0 = {
        k: jnp.zeros_like(jnp.asarray(np.asarray(v)))
        for k, v in state0_bv.sub_items()
    }
    cs = forward._stack_controls(model, [control])
    prop_d = model.prop_to_dict(prop)
    times_lo = jnp.asarray(DT * np.arange(args.lo + 1))
    times_hi = jnp.asarray(DT * np.arange(args.hi + 1))

    def run(tol, times):
        fin, traj, infos = forward.integrate_pure(
            model, state0, cs, prop_d, times, tol
        )
        np.asarray(fin["u"])  # host fetch = reliable sync (CLAUDE.md r3)
        return fin

    def best_of(tol, times, n=3):
        best = np.inf
        for _ in range(n):
            t0 = time.perf_counter()
            run(tol, times)
            best = min(best, time.perf_counter() - t0)
        return best

    def rate(tol, label):
        t0 = time.perf_counter()
        fin = run(tol, times_lo)
        ct = time.perf_counter() - t0
        best_lo = best_of(tol, times_lo)
        run(tol, times_hi)  # compile hi
        best_hi = best_of(tol, times_hi)
        tps = (args.hi - args.lo) / max(best_hi - best_lo, 1e-9)
        print(
            f"{label}: {tps:8.1f} steps/s device-slope"
            f"  (lo {best_lo*1e3:7.1f} ms, hi {best_hi*1e3:7.1f} ms,"
            f" compile {ct:.0f}s)",
            flush=True,
        )
        return tps, fin

    # exact-Jacobian accuracy reference (refresh 1, adaptive Newton)
    exact_tol = {
        "assembly": "banded",
        "linear_solver": "btd",
        "jacobian_refresh_steps": 1,
        "stagnation_ratio": 0.5,
    }
    fin_ref = run(exact_tol, times_lo)
    u_ref = np.asarray(fin_ref["u"])
    scale = np.abs(u_ref).max()
    print(f"exact-Jacobian reference ready (|u|max {scale:.3e})", flush=True)

    base = {
        "assembly": "banded",
        "linear_solver": "btd",
        "btd_store_dtype": "bfloat16",
        "stagnation_ratio": 0.5,
    }
    configs = [
        ("r32 f3 (baseline)", dict(base, jacobian_refresh_steps=32,
                                   fixed_iterations=3)),
        ("r64 f3          ", dict(base, jacobian_refresh_steps=64,
                                  fixed_iterations=3)),
        ("r96 f3          ", dict(base, jacobian_refresh_steps=96,
                                  fixed_iterations=3)),
        ("r64 f2          ", dict(base, jacobian_refresh_steps=64,
                                  fixed_iterations=2)),
        ("r64 f3 tail-free", dict(base, jacobian_refresh_steps=64,
                                  fixed_iterations=3,
                                  fixed_tail_residual=False)),
        ("r96 f3 tail-free", dict(base, jacobian_refresh_steps=96,
                                  fixed_iterations=3,
                                  fixed_tail_residual=False)),
        ("r128 f3 tail-free", dict(base, jacobian_refresh_steps=128,
                                   fixed_iterations=3,
                                   fixed_tail_residual=False)),
        # Correction-memory predictor (forward._get_scan_fn): measured on
        # TPU at 23.7k dofs it is a wash at r96 (479.4 vs 473.3 steps/s,
        # err 2.9e-7 vs 2.3e-7) and buys r160 at the round-3 error level
        # (508.3 steps/s, 4.64e-7); kept out of the production config —
        # the +6% is not worth doubling the trajectory error.
        ("r96 f3 tf extrap", dict(base, jacobian_refresh_steps=96,
                                  fixed_iterations=3,
                                  fixed_tail_residual=False,
                                  initial_guess="extrapolated")),
        ("r160 f3 tf extrap", dict(base, jacobian_refresh_steps=160,
                                   fixed_iterations=3,
                                   fixed_tail_residual=False,
                                   initial_guess="extrapolated")),
    ]
    for label, tol in configs:
        tps, fin = rate(tol, label)
        err = np.abs(np.asarray(fin["u"]) - u_ref).max() / scale
        print(f"{label}: traj rel err vs exact = {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
