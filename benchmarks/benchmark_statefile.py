"""
Benchmark statefile read throughput vs chunk size
(reference: ``benchmarks/benchmark_statefile.py``).
"""

import time

import numpy as np

from benchmarkutils import setup_argument_parser
from setup import setup_model, setup_transient_args

from vf_fem_tpu import forward, statefile as sf


def main():
    parser = setup_argument_parser()
    parser.parse_args()

    model = setup_model()
    state0, control, prop = setup_transient_args(model)
    times = 1e-4 * np.arange(100)

    for nchunk in (1, 10, 50, 100):
        path = f"/tmp/bench_statefile_{nchunk}.h5"
        with sf.StateFile(model, path, mode="w", NCHUNK=nchunk) as f:
            forward.integrate(model, f, state0, [control], prop, times)

        with sf.StateFile(model, path, mode="r") as f:
            t0 = time.perf_counter()
            # forward reads
            for n in range(f.size):
                f.get_state(n)
            t_fwd = time.perf_counter() - t0
            t0 = time.perf_counter()
            # reverse reads (the adjoint access pattern)
            for n in reversed(range(f.size)):
                f.get_state(n)
            t_rev = time.perf_counter() - t0
        print(
            f"NCHUNK={nchunk:3d}: forward {t_fwd * 1e3:7.1f} ms,"
            f" reverse {t_rev * 1e3:7.1f} ms"
        )


if __name__ == "__main__":
    main()
