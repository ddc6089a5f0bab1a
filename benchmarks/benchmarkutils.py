"""
Benchmark utilities (reference: ``benchmarks/benchmarkutils.py``).

``--profile`` captures a ``jax.profiler`` trace (viewable with
TensorBoard/Perfetto) instead of the reference's cProfile dumps — the
TPU-native tracing subsystem (SURVEY section 5.1).
"""

import argparse
import time
from contextlib import contextmanager

import jax


def setup_argument_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--profile", action="store_true")
    parser.add_argument("--trace-dir", default="/tmp/vf_fem_tpu_trace")
    return parser


@contextmanager
def maybe_profile(enabled: bool, trace_dir: str):
    if enabled:
        with jax.profiler.trace(trace_dir):
            yield
        print(f"profiler trace written to {trace_dir}")
    else:
        yield


def benchmark(fn, profile: bool = False, trace_dir: str = "/tmp/vf_fem_tpu_trace",
              repeats: int = 3):
    """Time ``fn()`` (after one warmup) and optionally capture a trace."""
    fn()  # warmup/compile
    best = float("inf")
    with maybe_profile(profile, trace_dir):
        for _ in range(repeats):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
    print(f"Runtime: {best:.2e} s")
    return best
