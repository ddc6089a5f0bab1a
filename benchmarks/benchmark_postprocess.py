"""
Benchmark post-processing throughput
(reference: ``benchmarks/benchmark_postprocess.py``): a von Mises stress
TimeSeries over a 100-state file.
"""

import numpy as np

from benchmarkutils import benchmark, setup_argument_parser
from setup import setup_model, setup_transient_args

from vf_fem_tpu import forward, statefile as sf
from vf_fem_tpu.postprocess import TimeSeries
from vf_fem_tpu.postprocess.solid import StressVonMisesField


def main():
    parser = setup_argument_parser()
    args = parser.parse_args()

    model = setup_model()
    state0, control, prop = setup_transient_args(model)
    times = 1e-4 * np.arange(100)

    path = "/tmp/bench_postprocess.h5"
    with sf.StateFile(model, path, mode="w") as f:
        forward.integrate(model, f, state0, [control], prop, times)

    series = TimeSeries(StressVonMisesField(model))

    with sf.StateFile(model, path, mode="r") as f:
        def run():
            return series(f)

        benchmark(run, profile=args.profile, trace_dir=args.trace_dir)


if __name__ == "__main__":
    main()
