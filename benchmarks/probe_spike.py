"""
Focused probe: block-Thomas (btd) vs SPIKE-partitioned factor/solve at
large mesh — the single-chip lever on the latency-bound factorization.

Usage: python probe_spike.py [--h 0.006] [--parts 8]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from probe_assembly import timeit  # noqa: E402
from benchmark_large import build_model  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--h", type=float, default=0.006)
    parser.add_argument("--parts", type=int, default=8)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    from vf_fem_tpu.solvers import bsb as bsb_mod, btd as btd_mod
    from vf_fem_tpu.solvers import spike as spike_mod

    model = build_model(args.h)
    solid = model.solid
    ndof = solid.ndof
    print(f"device {jax.devices()[0].platform}, ndof={ndof}")
    sprop = {k: jnp.asarray(np.asarray(v))
             for k, v in solid.prop.sub_items()}
    u = jnp.zeros(ndof)
    state0 = {"u": u, "v": u, "a": u}
    ctrl = {"p1": jnp.zeros(solid.nvert)}
    op = solid.jac_u_ebe(u, state0, ctrl, sprop, 1e-4)
    plan = solid._get_bsb_plan()
    blocks = bsb_mod.bsb_fill(plan, [op.J_cells, op.J_facets])
    print(f"nblk={plan.nblk}, h={plan.h},"
          f" n_sup={-(-plan.nblk // plan.h)}")

    fac_b = jax.jit(lambda b: btd_mod.btd_factor(plan, b))
    t = timeit(fac_b, blocks, n=3)
    print(f"btd_factor:          {t*1e3:8.3f} ms")
    fb = fac_b(blocks)
    sol_b = jax.jit(lambda r: btd_mod.btd_solve(plan, fb, r))
    t = timeit(sol_b, u, n=3)
    print(f"btd_solve:           {t*1e3:8.3f} ms")

    S = args.parts
    fac_s = jax.jit(
        lambda b: spike_mod.spike_factor(plan, b, n_parts=S)
    )
    t = timeit(fac_s, blocks, n=3)
    print(f"spike_factor (S={S}): {t*1e3:8.3f} ms")
    fs = fac_s(blocks)
    sol_s = jax.jit(lambda r: spike_mod.spike_solve(plan, fs, r))
    t = timeit(sol_s, u, n=3)
    print(f"spike_solve  (S={S}): {t*1e3:8.3f} ms")

    # correctness cross-check
    rng = np.random.default_rng(0)
    r = jnp.asarray(rng.standard_normal(ndof), dtype=u.dtype)
    xb = np.asarray(sol_b(r))
    xs = np.asarray(sol_s(r))
    print(f"|spike - btd| rel: "
          f"{np.abs(xs - xb).max() / max(np.abs(xb).max(), 1e-30):.2e}")


if __name__ == "__main__":
    main()
