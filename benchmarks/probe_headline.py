"""
Probe: decompose the headline (M5-scale) step cost by solver config.

The adjoint benchmark's jitted scalar loss ran the same 100-step workload
~3x faster than bench.py's headline config; this probe separates the
candidate causes: assembly mode, fixed vs adaptive Newton, and
trajectory/telemetry outputs.
"""

import sys
import time
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    import bench
    from vf_fem_tpu import forward

    f64 = jax.devices()[0].platform == "cpu"
    model = bench.build(f64)
    print(f"device {jax.devices()[0]}, ndof={model.solid.ndof}")

    state0 = {
        k: jnp.zeros_like(jnp.asarray(np.asarray(v)))
        for k, v in model.state0.sub_items()
    }
    cs = forward._stack_controls(model, [model.control])
    prop = model.prop_to_dict(model.prop)
    N = 100
    times = jnp.asarray(1e-4 * np.arange(N + 1))

    base = {
        "jacobian_update": "once_per_step",
        "stagnation_ratio": 0.5,
        "jacobian_refresh_steps": 25,
        "jacobian_refresh_mode": "ns",
        "jacobian_full_refresh_windows": 4,
    }

    def timeit(fn, label):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn())
        ct = time.perf_counter() - t0
        best = np.inf
        for _ in range(5):
            t0 = time.perf_counter()
            out = jax.block_until_ready(fn())
            best = min(best, time.perf_counter() - t0)
        print(f"{label}: {N / best:.1f} steps/s (compile {ct:.0f}s)")
        return out

    configs = {
        "fixed2+plain (bench headline)": dict(
            base, fixed_iterations=2, assembly="plain"
        ),
        "fixed2+banded": dict(base, fixed_iterations=2, assembly="banded"),
        "adaptive+plain": dict(base, assembly="plain"),
        "adaptive+banded": dict(base, assembly="banded"),
    }
    for label, tol in configs.items():
        fn = lambda tol=tol: forward.integrate_pure(
            model, state0, cs, prop, times, tol
        )[0]
        timeit(fn, label + " [full outputs]")

    # fin-only (trajectory + telemetry dead-coded away)
    for label in ("fixed2+plain (bench headline)", "adaptive+banded"):
        tol = configs[label]

        @jax.jit
        def fin_only(s0, cs_, p, ts, tol=tol):
            fin, traj, infos = forward.integrate_pure(
                model, s0, cs_, p, ts, tol
            )
            return fin["u"].sum() + fin["q"].sum()

        timeit(lambda: fin_only(state0, cs, prop, times),
               label + " [fin-only]")


if __name__ == "__main__":
    main()
