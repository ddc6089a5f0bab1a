"""
Large-mesh benchmark: dense-LU vs matrix-free EBE+PCG forward stepping.

The reference hands large sparse systems to PETSc LU/KSP (reference
``src/femvf/models/transient.py:470-491``); the TPU-native answer is the
element-by-element operator (batched small matmuls on the MXU, Pallas
kernel on TPU) under block-Jacobi PCG, with the operator frozen per
refresh window.  Dense LU wins at M5 scale (~1k dofs); this benchmark
measures where the matrix-free path takes over.

Usage: python benchmark_large.py [--h 0.006] [--steps 20]
"""

import argparse
import os
import time

import numpy as np

from benchmarkutils import maybe_profile  # noqa: F401  (repo path setup)
from setup import setup_transient_args


def build_model(h, nz=0, zlen=1.5):
    """2D M5-3layers FSI model at element size ``h``; ``nz >= 2`` extrudes
    to a 3D tet mesh with ``nz`` z-planes (one 1D fluid channel per plane,
    the reference's extruded-3D workflow, reference ``load.py:264-275``)."""
    from vf_fem_tpu.load import load_fsi_model
    from vf_fem_tpu.mesh import m5_mesh
    from vf_fem_tpu.mesh.writers import write_gmsh
    from vf_fem_tpu.mesh.gmsh_io import load_gmsh
    from vf_fem_tpu.residuals import fluid as flr, solid as slr

    from vf_fem_tpu.mesh.reorder import rcm_mesh

    tag = f"h{h:g}" + (f"_nz{nz}" if nz else "") + "_rcm"
    cache = os.path.join(os.path.dirname(__file__), f".m5_3layers_{tag}.msh")
    zs = np.linspace(0.0, zlen, nz) if nz else None
    if os.path.exists(cache):
        mesh = load_gmsh(cache)
    else:
        t0 = time.perf_counter()
        mesh = m5_mesh("M5_3layers", h=h, smooth_iters=10)
        if nz:
            from vf_fem_tpu.mesh.extrude import extrude_mesh

            mesh = extrude_mesh(mesh, zs)
        mesh = rcm_mesh(mesh)
        print(f"meshed {tag}: {mesh.num_vertices} verts"
              f" ({time.perf_counter()-t0:.0f}s)")
        write_gmsh(mesh, cache)
    return load_fsi_model(
        mesh,
        slr.KelvinVoigtWEpithelium,
        flr.BernoulliAreaRatioSep,
        coupling="explicit",
        zs=zs,
    )


def run(model, tol, steps, label):
    import jax
    import jax.numpy as jnp

    from vf_fem_tpu import forward

    state0_bv, control, prop = setup_transient_args(model)
    model.set_prop(prop)
    state0 = {
        k: jnp.zeros_like(jnp.asarray(np.asarray(v)))
        for k, v in state0_bv.sub_items()
    }
    cs = forward._stack_controls(model, [control])
    prop_d = model.prop_to_dict(prop)
    times = jnp.asarray(1e-4 * np.arange(steps + 1))

    def once():
        fin, traj, infos = forward.integrate_pure(
            model, state0, cs, prop_d, times, tol
        )
        jax.block_until_ready(fin)
        return fin, infos

    t0 = time.perf_counter()
    fin, infos = once()
    ct = time.perf_counter() - t0
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        fin, infos = once()
        best = min(best, time.perf_counter() - t0)
    tps = steps / best
    print(
        f"{label}: {tps:.2f} steps/s (compile {ct:.0f}s,"
        f" mean_iters {np.asarray(infos.num_iter).mean():.2f},"
        f" max rel_err {np.asarray(infos.rel_err).max():.2e},"
        f" max abs_err {np.asarray(infos.abs_err).max():.2e})"
    )
    assert np.isfinite(np.asarray(fin["u"])).all()
    return tps, fin


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--h", type=float, default=0.006)
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument("--dense-limit", type=int, default=20000)
    parser.add_argument("--extrude", type=int, default=0, metavar="NZ",
                        help="extrude to 3D tets with NZ z-planes")
    args = parser.parse_args()

    import jax

    model = build_model(args.h, nz=args.extrude)
    ndof = model.solid.ndof
    print(f"device {jax.devices()[0].platform}, solid ndof = {ndof}")

    cg_tol = {
        "assembly": "banded",
        "linear_solver": "bsb",
        "krylov_tolerance": 1e-4,
        "krylov_max_iter": 200,
        "jacobian_refresh_steps": 8,
        "stagnation_ratio": 0.5,
    }
    tps_cg, fin_cg = run(
        model, cg_tol, args.steps, "bsb+bicgstab (stale, block-Jacobi)"
    )

    btd_tol = {
        "assembly": "banded",
        "linear_solver": "btd",
        # direct solves make refreshes the cost center: longer windows +
        # fixed 3-iteration chord Newton (rel_err stays at the f32 floor;
        # fixed-2 degrades it 8x - rejected)
        "jacobian_refresh_steps": 16,
        "fixed_iterations": 3,
        "stagnation_ratio": 0.5,
    }
    tps_btd, fin_btd = run(
        model, btd_tol, args.steps, "btd direct (stale block-Thomas)"
    )
    du = np.abs(np.asarray(fin_btd["u"]) - np.asarray(fin_cg["u"])).max()
    print(f"btd-vs-bsb trajectory max|du| = {du:.3e};"
          f" speedup {tps_btd / tps_cg:.2f}x")

    # bf16-stored factors + longer refresh: halves the (bandwidth-bound)
    # solve streaming and the (latency-bound) refactor amortization
    btd16_tol = dict(
        btd_tol, btd_store_dtype="bfloat16", jacobian_refresh_steps=32
    )
    tps_b16, fin_b16 = run(
        model, btd16_tol, args.steps, "btd bf16 factors (refresh 32)"
    )
    du = np.abs(np.asarray(fin_b16["u"]) - np.asarray(fin_btd["u"])).max()
    print(f"bf16-vs-f32 trajectory max|du| = {du:.3e};"
          f" speedup {tps_b16 / tps_btd:.2f}x")

    # round-4 config (btd form): longer refresh window + tail-free
    # fixed-3 chord (fixed_tail_residual=False skips the trailing
    # telemetry-only residual, ~1/4 of the step) — measured 480.8 vs
    # 349.4 steps/s device-slope at 23.7k dofs with BETTER trajectory
    # error (2.3e-7 vs 4.6e-7; probe_large_config.py)
    prod_tol = dict(
        btd16_tol, jacobian_refresh_steps=96, fixed_tail_residual=False
    )
    tps_pr, fin_pr = run(
        model, prod_tol, args.steps,
        "btd bf16 r96 tail-free (production)"
    )
    du = np.abs(np.asarray(fin_pr["u"]) - np.asarray(fin_b16["u"])).max()
    print(f"prod-vs-btd16 trajectory max|du| = {du:.3e};"
          f" speedup {tps_pr / tps_b16:.2f}x")

    # SPIKE-partitioned solves: the block-Thomas chain is latency-bound
    # (n_sup sequential block rows); 8 slabs cut the depth to ~n_sup/8
    # + a batched reduced system.  Was the round-5 production config
    # (567.4 vs 509.6 same-session at 23.7k) until product-form factors
    # (1 matvec/serial row) put plain btd back on top: 594.8 vs 589.7
    # (probe_spike_prod.py, trajectory-gated vs exact Jacobian)
    spike_tol = dict(
        prod_tol, linear_solver="spike", spike_partitions=8
    )
    tps_sp, fin_sp = run(
        model, spike_tol, args.steps,
        "spike8 bf16 r96 tail-free"
    )
    du = np.abs(np.asarray(fin_sp["u"]) - np.asarray(fin_b16["u"])).max()
    print(f"spike-vs-btd16 trajectory max|du| = {du:.3e};"
          f" speedup {tps_sp / tps_pr:.2f}x")

    # PCR: log-depth solve — ~2 log2(n_sup) batched MXU matmuls instead
    # of the 2 n_sup-step serial Thomas scans.  Measured round-4 (slope
    # timing): LOSES to btd at 23.7k dofs (solve 0.57 vs 0.15 ms bf16,
    # factor 117.6 vs 15.7 ms) — kept here so the record stays honest.
    pcr_tol = dict(btd16_tol, linear_solver="pcr")
    tps_pcr, fin_pcr = run(
        model, pcr_tol, args.steps, "pcr direct (log-depth, bf16)"
    )
    du = np.abs(np.asarray(fin_pcr["u"]) - np.asarray(fin_b16["u"])).max()
    print(f"pcr-vs-btd trajectory max|du| = {du:.3e};"
          f" speedup {tps_pcr / tps_b16:.2f}x")

    if ndof <= args.dense_limit:
        dense_tol = {"jacobian_refresh_steps": 8, "stagnation_ratio": 0.5}
        tps_d, fin_d = run(model, dense_tol, args.steps, "dense LU (stale)")
        du = np.abs(
            np.asarray(fin_cg["u"]) - np.asarray(fin_d["u"])
        ).max()
        print(f"dense-vs-cg trajectory max|du| = {du:.3e}")
        print(f"speedup (cg/dense) = {tps_cg / tps_d:.2f}x")
    else:
        print("dense path skipped (ndof beyond dense-LU memory scale)")


if __name__ == "__main__":
    main()
