"""
Benchmark forward time integration
(reference: ``benchmarks/benchmark_forward.py``): 100 steps at dt=1e-4 of
the coupled M5-scale phonation model.
"""

import numpy as np

from benchmarkutils import benchmark, setup_argument_parser
from setup import setup_model, setup_transient_args

from vf_fem_tpu import forward


def main():
    parser = setup_argument_parser()
    args = parser.parse_args()

    import jax

    model = setup_model()
    state0, control, prop = setup_transient_args(model)
    model.set_prop(prop)
    times = 1e-4 * np.arange(100)

    # the measured-best solver configuration per backend (see bench.py):
    # stale-factor Newton with Newton-Schulz refresh on accelerators
    if jax.devices()[0].platform == "cpu":
        solver_prm = {"stagnation_ratio": 0.5}
    else:
        solver_prm = {
            "stagnation_ratio": 0.5,
            "jacobian_update": "once_per_step",
            "jacobian_refresh_steps": 25,
            "jacobian_refresh_mode": "ns",
            "jacobian_full_refresh_windows": 4,
            "fixed_iterations": 2,
        }

    def run():
        fin, info = forward.integrate(
            model, None, state0, [control], prop, times, write=False,
            newton_solver_prm=solver_prm,
        )
        return fin

    best = benchmark(run, profile=args.profile, trace_dir=args.trace_dir)
    print(f"timesteps/sec: {(len(times) - 1) / best:.1f}")


if __name__ == "__main__":
    main()
