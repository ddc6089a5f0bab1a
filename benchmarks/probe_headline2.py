"""
Same-session headline (M5 CAD, 960-dof) config probe with SLOPE timing
(rate = steps between a 100- and a 400-step run; cancels the remote
tunnel's fixed round-trip, which dominates 100-step wall timings —
CLAUDE.md round-3).

Round-4 focus: the ``fixed_tail_residual=False`` lever — the headline's
fixed-2 chord assembles 3 residuals per step but only 2 feed updates;
dropping the telemetry tail saves 1/3 of the residual work with
bit-identical iterates.  Accuracy is gated against the adaptive
(stagnation-stop) run on the same device.
"""

import sys
import time
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

LO, HI = 100, 400
DT = 1e-4


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    import bench
    from vf_fem_tpu import forward

    f64 = jax.devices()[0].platform == "cpu"
    model = bench.build(f64)
    print(f"device {jax.devices()[0]}, ndof={model.solid.ndof}", flush=True)

    state0 = {
        k: jnp.zeros_like(jnp.asarray(np.asarray(v)))
        for k, v in model.state0.sub_items()
    }
    cs = forward._stack_controls(model, [model.control])
    prop = model.prop_to_dict(model.prop)
    times_lo = jnp.asarray(DT * np.arange(LO + 1))
    times_hi = jnp.asarray(DT * np.arange(HI + 1))

    def run(tol, times):
        fin, traj, infos = forward.integrate_pure(
            model, state0, cs, prop, times, tol
        )
        np.asarray(fin["u"])  # host fetch = reliable sync
        return fin

    def best_of(tol, times, n=4):
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
        run(tol, times_hi)
        best_hi = best_of(tol, times_hi)
        tps = (HI - LO) / max(best_hi - best_lo, 1e-9)
        print(
            f"{label}: {tps:8.1f} steps/s device-slope"
            f"  (lo {best_lo*1e3:6.1f} ms, hi {best_hi*1e3:6.1f} ms,"
            f" compile {ct:.0f}s)",
            flush=True,
        )
        return tps, fin

    base = {
        "jacobian_update": "once_per_step",
        "stagnation_ratio": 0.5,
        "jacobian_refresh_steps": 25,
        "jacobian_refresh_mode": "ns",
        "jacobian_full_refresh_windows": 4,
        "assembly": "banded",
    }

    # adaptive run = accuracy reference
    fin_ref = run(base, times_lo)
    u_ref = np.asarray(fin_ref["u"])
    scale = np.abs(u_ref).max()
    print(f"adaptive reference ready (|u|max {scale:.3e})", flush=True)

    configs = [
        ("f2 certified (headline)", dict(base, fixed_iterations=2)),
        ("f2 tail-free           ", dict(base, fixed_iterations=2,
                                         fixed_tail_residual=False)),
        ("f3 tail-free           ", dict(base, fixed_iterations=3,
                                         fixed_tail_residual=False)),
    ]
    for label, tol in configs:
        tps, fin = rate(tol, label)
        err = np.abs(np.asarray(fin["u"]) - u_ref).max() / scale
        print(f"{label}: traj rel err vs adaptive = {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
