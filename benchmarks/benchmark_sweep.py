"""
Benchmark the batched parameter sweep — BASELINE config 5: "256 vmapped M5
geometry/stiffness variants across TPU cores" (the reference is strictly
serial, reference ``models/fsi.py:38-39``).

Reports variant-timesteps/sec: (n_variants * n_steps) / wall_time.
"""

import time

import numpy as np

from benchmarkutils import setup_argument_parser
from setup import setup_model, setup_transient_args


def main():
    parser = setup_argument_parser()
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument("--steps", type=int, default=100)
    parser.add_argument(
        "--no-geometry", action="store_true",
        help="sweep stiffness only (round-2 behavior); default sweeps"
        " per-variant geometry (umesh shape displacement) AND stiffness",
    )
    parser.add_argument(
        "--tail-free", action="store_true",
        help="skip the trailing telemetry-only residual of the fixed-"
        "iteration chord (fixed_tail_residual=False) — saves one vmapped"
        " residual assembly per step; bit-identical to the certified"
        " mode while the chord contracts (no best-iterate select)",
    )
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from vf_fem_tpu import forward

    geometry = not args.no_geometry
    model = setup_model(shape=geometry)
    state0_bv, control, prop = setup_transient_args(model)
    model.set_prop(prop)

    state0 = {
        k: jnp.zeros_like(jnp.asarray(np.asarray(v)))
        for k, v in state0_bv.sub_items()
    }
    cs = forward._stack_controls(model, [control])
    prop_d = model.prop_to_dict(prop)
    times = jnp.asarray(1e-4 * np.arange(args.steps + 1))

    batch = args.batch
    prop_batch = {
        k: jnp.broadcast_to(jnp.asarray(v), (batch,) + np.asarray(v).shape)
        for k, v in prop_d.items()
    }
    emods = jnp.linspace(4e4, 6e4, batch)[:, None]
    prop_batch = dict(prop_batch)
    prop_batch["emod"] = jnp.broadcast_to(
        emods, (batch,) + np.asarray(prop_d["emod"]).shape
    ).astype(jnp.asarray(prop_d["emod"]).dtype)
    if geometry:
        # per-variant geometry: scaled smooth y-bump of the fold via the
        # umesh shape parameter (KelvinVoigtWShape; BASELINE config 5's
        # "geometry/stiffness variants" as written)
        X = np.asarray(model.solid._Xref)
        bump = np.zeros_like(X)
        xr = np.ptp(X[:, 0]) or 1.0
        yr = np.ptp(X[:, 1]) or 1.0
        bump[:, 1] = (
            0.02
            * np.sin(np.pi * (X[:, 0] - X[:, 0].min()) / xr)
            * (X[:, 1] - X[:, 1].min()) / yr
        )
        scales = np.linspace(-1.0, 1.0, batch)
        prop_batch["umesh"] = jnp.asarray(
            scales[:, None] * bump.reshape(-1)[None, :],
            dtype=jnp.asarray(prop_d["emod"]).dtype,
        )

    # Stale-factor quasi-Newton with Newton–Schulz inverse refresh: the
    # per-window Jacobian update is two batched matmuls (MXU) instead of a
    # batched LU, and the nested-scan integrator hoists all refreshes out
    # of the per-step body — that combination is what makes the sweep
    # scale under vmap (one LU per variant per full-refresh window only).
    tol = {
        "jacobian_refresh_steps": 8,
        "jacobian_refresh_mode": "ns",
        "jacobian_full_refresh_windows": 8,
        "stagnation_ratio": 0.5,
        # statically unrolled Newton: identical work per variant under
        # vmap (no batch-max while_loop); +7% measured, f32-noise match
        "fixed_iterations": 2,
        # single-pass bf16 MXU for the Newton-Schulz refresh GEMMs (the
        # sweep's dominant cost): +32% measured, f32-noise match (the
        # inverse is a preconditioner; Newton quality is set by the
        # residual, computed at full working precision)
        "jacobian_refresh_precision": "default",
        # indexed assembly wins in the vmapped regime (15882 vs 10189
        # variant-steps/s): the batch axis amortizes the shared gather
        # indices, while the banded Pallas kernels serialize over an
        # extra batch grid dimension
        "assembly": "plain",
    }
    if args.tail_free:
        tol["fixed_tail_residual"] = False

    def run_one(p):
        fin, traj, infos = forward.integrate_pure(
            model, state0, cs, p, times, tol
        )
        return fin

    run_batch = jax.jit(jax.vmap(run_one))

    t0 = time.perf_counter()
    fin = run_batch(prop_batch)
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), fin)
    compile_time = time.perf_counter() - t0

    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        fin = run_batch(prop_batch)
        jax.tree_util.tree_map(lambda a: a.block_until_ready(), fin)
        best = min(best, time.perf_counter() - t0)

    vps = batch * args.steps / best
    print(
        f"sweep: {batch} variants x {args.steps} steps in {best:.2f} s"
        f" -> {vps:.0f} variant-steps/s (compile {compile_time:.1f} s)"
    )
    u = np.asarray(fin["u"])
    assert np.all(np.isfinite(u))
    print(f"variant u_max range: [{np.abs(u).max(axis=1).min():.3e},"
          f" {np.abs(u).max(axis=1).max():.3e}]")


if __name__ == "__main__":
    main()
