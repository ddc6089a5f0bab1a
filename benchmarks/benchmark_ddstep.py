"""
Benchmark the DOF-sharded end-to-end integrator (``parallel.ddstep``)
on a virtual device mesh.

Real multi-chip hardware is not available in this environment, so the
numbers here are *scaling-shape* measurements on ``--devices`` virtual
CPU devices (XLA host-platform partitioning): they validate that the
sharded program runs, that per-device work shrinks with S, and what the
collective overhead structure looks like.  Wall-clock supremacy is not
the claim — a single real chip beats S virtual CPU slices of one core.

Usage: python benchmark_ddstep.py [--devices 8] [--steps 100] [--nx 72]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--devices", type=int, default=8)
    parser.add_argument("--steps", type=int, default=100)
    parser.add_argument("--nx", type=int, default=72)
    parser.add_argument("--ny", type=int, default=36)
    parser.add_argument("--refresh", type=int, default=10)
    args = parser.parse_args()

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags
            + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from vf_fem_tpu import forward
    from vf_fem_tpu.load import load_fsi_model
    from vf_fem_tpu.mesh import vocal_fold_mesh
    from vf_fem_tpu.mesh.reorder import rcm_mesh
    from vf_fem_tpu.residuals import fluid as flr, solid as slr
    from vf_fem_tpu.parallel.ddstep import DDIntegrator

    mesh = rcm_mesh(vocal_fold_mesh(args.nx, args.ny))
    ymax = mesh.coords[:, 1].max()
    model = load_fsi_model(
        mesh, slr.KelvinVoigt, flr.BernoulliSmoothMinSep,
        coupling="explicit",
    )
    prop = model.prop
    prop["emod"][:] = 5e4
    prop["rho"][:] = 1.0
    prop["eta"][:] = 3.0
    prop["nu"][:] = 0.45
    prop["ycontact"][:] = ymax + 0.05
    prop["kcontact"][:] = 1e8
    prop["rho_air"][:] = 1.1225e-3
    prop["zeta_min"][:] = 1e-3
    prop["zeta_sep"][:] = 1e-3
    prop["ymid"][:] = ymax + 0.01
    model.set_prop(prop)
    model.control["psub"][:] = 8000.0
    model.set_control(model.control)
    print(f"ndof = {model.solid.ndof}, devices = {args.devices}")

    state0 = {k: np.zeros_like(np.asarray(v))
              for k, v in model.state0.sub_items()}
    cs = forward._stack_controls(model, [model.control])
    pd = model.prop_to_dict(model.prop)
    times = np.asarray(5e-5 * np.arange(args.steps + 1))

    def timeit(fn, label):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn())
        ct = time.perf_counter() - t0
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            out = jax.block_until_ready(fn())
            best = min(best, time.perf_counter() - t0)
        print(f"{label}: {args.steps / best:8.1f} steps/s"
              f" (compile {ct:.0f}s)")
        return out

    prm = {"jacobian_refresh_steps": args.refresh, "linear_solver": "spike",
           "spike_partitions": args.devices}
    ref = timeit(
        lambda: forward.integrate_pure(
            model, state0, cs, pd, times, prm
        )[0]["u"],
        "single-device (spike)",
    )

    dmesh = Mesh(np.asarray(jax.devices("cpu")[: args.devices]), ("shard",))
    dd = DDIntegrator(
        model, dmesh, params={"jacobian_refresh_steps": args.refresh}
    )
    out = timeit(
        lambda: dd.integrate_pure(state0, cs, pd, times)[0]["u"],
        f"sharded x{args.devices}",
    )
    err = float(
        np.abs(np.asarray(out) - np.asarray(ref)).max()
        / max(np.abs(np.asarray(ref)).max(), 1e-30)
    )
    print(f"trajectory rel err vs single-device: {err:.2e}")


if __name__ == "__main__":
    main()
