"""
Benchmark: forward coupled-FSI timesteps/sec on the M5-scale vocal-fold mesh.

Workload mirrors the reference benchmark harness
(reference: ``benchmarks/benchmark_forward.py:24-39`` + ``setup.py:12-49``):
100 steps at dt=1e-4 of an explicit KelvinVoigtWEpithelium solid +
BernoulliAreaRatioSep fluid at psub = 8000 Ba, emod = 5e4, eta = 3,
kcontact = 1e8 — but run as one jitted ``lax.scan`` on the accelerator.

``vs_baseline`` is the speedup over the same workload executed on this
host's CPU backend (the available stand-in for the reference's
FEniCS+PETSc-CPU stack, which is not installed here — the reference
publishes no numbers, see BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

N_STEPS = 100
DT = 1e-4
REPEATS = 5


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def build(backend_f64: bool, mesh_file: str = "M5_3layers.msh"):
    # TPU has no f64 LU; run f32 there with matched Newton tolerances.
    # (vf_fem_tpu.config reads VF_FEM_TPU_X64 at first import, so set it
    # before importing and pin the jax flag after.)
    import os

    os.environ["VF_FEM_TPU_X64"] = "1" if backend_f64 else "0"
    jax.config.update("jax_enable_x64", backend_f64)
    import vf_fem_tpu  # noqa: F401

    jax.config.update("jax_enable_x64", backend_f64)
    from vf_fem_tpu.load import load_fsi_model
    from vf_fem_tpu.mesh import load_gmsh, m5_mesh
    from vf_fem_tpu.residuals import fluid as flr, solid as slr

    # The reference benchmark geometry: the M5-3layers CAD profile
    # (reference ``benchmarks/benchmark_forward.py:28`` meshes
    # ``meshes/M5-3layers.msh``); loaded from the committed asset.
    msh = os.path.join(os.path.dirname(__file__), "meshes", mesh_file)
    mesh = load_gmsh(msh) if os.path.exists(msh) else m5_mesh("M5_3layers")
    ymax = mesh.coords[:, 1].max()
    model = load_fsi_model(
        mesh,
        slr.KelvinVoigtWEpithelium,
        flr.BernoulliAreaRatioSep,
        coupling="explicit",
    )
    prop = model.prop
    prop["emod"][:] = 5e4
    prop["rho"][:] = 1.0
    prop["eta"][:] = 3.0
    prop["nu"][:] = 0.45
    prop["emod_membrane"][:] = 0.0
    prop["nu_membrane"][:] = 0.3
    prop["th_membrane"][:] = 0.0
    prop["ycontact"][:] = ymax + 0.05
    prop["kcontact"][:] = 1e8
    prop["rho_air"][:] = 1.1225e-3
    prop["r_sep"][:] = 1.0
    prop["area_lb"][:] = 1e-4
    prop["ymid"][:] = ymax + 0.01
    model.set_prop(prop)
    control = model.control
    control["psub"][:] = 8000.0
    control["psup"][:] = 0.0
    model.set_control(control)
    return model


def run_device(model, device, tolerances):
    import jax.numpy as jnp

    from vf_fem_tpu import forward

    state0 = {
        k: jax.device_put(jnp.zeros_like(jnp.asarray(v)), device)
        for k, v in model.state0.sub_items()
    }
    controls = forward._stack_controls(model, [model.control])
    controls = jax.device_put(controls, device)
    prop = jax.device_put(model.prop_to_dict(model.prop), device)
    times = jax.device_put(jnp.asarray(DT * np.arange(N_STEPS + 1)), device)

    def once():
        fin, traj, infos = forward.integrate_pure(
            model, state0, controls, prop, times, tolerances
        )
        jax.tree_util.tree_map(lambda a: a.block_until_ready(), fin)
        return fin, infos

    # warmup/compile
    t0 = time.perf_counter()
    fin, infos = once()
    compile_time = time.perf_counter() - t0

    best = np.inf
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        fin, infos = once()
        best = min(best, time.perf_counter() - t0)
    tps = N_STEPS / best

    # Achieved-FLOP/s estimate from XLA's static cost analysis of the
    # compiled scan program (flops per full run / best wall time).
    flops = None
    try:
        from vf_fem_tpu.models.transient import _params_key
        from vf_fem_tpu.forward import _get_scan_fn

        fn = _get_scan_fn(model, _params_key(tolerances), 1)
        cost = fn.lower(state0, controls, prop, times).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0)) / best
    except Exception as e:  # cost analysis is best-effort
        log(f"cost_analysis unavailable: {e}")
    return tps, compile_time, fin, infos, flops


def main():
    default = jax.devices()[0]
    on_accel = default.platform not in ("cpu",)
    f64 = not on_accel
    # Each backend runs its best solver configuration (measured):
    # - TPU: frozen-Jacobian Newton (refactor = latency-bound) + stop when
    #   an iteration fails to halve the residual.  In f32 this lands within
    #   3.3e-8 of the f64 golden trajectory at ~2 iterations/step.
    # - CPU: full Newton (LU-per-iteration beats explicit inverses there)
    #   with the same stopping rule.
    tol_dev = {
        "jacobian_update": "once_per_step",
        "stagnation_ratio": 0.5,
        # Stale-factor quasi-Newton with Newton–Schulz (matmul-only)
        # inverse refresh every 25 steps + full LU every 100: fastest
        # measured config (568.9 vs 535.0 steps/s at refresh-8/LU);
        # iterations/step rise only 2.40 -> 2.58 and the trajectory stays
        # within the f32 noise floor of the exact-Jacobian run.
        "jacobian_refresh_steps": 25,
        "jacobian_refresh_mode": "ns",
        "jacobian_full_refresh_windows": 4,
        # statically unrolled 2-iteration Newton: removes the while_loop's
        # latency overhead on this small (960-dof) step; 624.8 vs 568.9
        # steps/s measured, trajectory within f32 noise of the adaptive
        # run (and cross-checked against the CPU f64 leg below)
        "fixed_iterations": 2,
        # gather-free banded assembly (fem/banded.py): fastest measured
        # config on the committed (bandwidth-ordered) M5 mesh —
        # 2331 vs 1790 steps/s for the indexed path
        # (benchmarks/probe_headline.py); NOTE the remote-TPU round-trip
        # shows large run-to-run variance (same binary 557-2331 steps/s
        # across sessions), so cross-session deltas < ~2x are noise.
        "assembly": "banded",
    }
    # 'assembly': 'plain' is required on the CPU leg: it executes on the
    # non-default device of a TPU-default process, where 'auto' would pick
    # the TPU Pallas banded path and fail to lower for CPU.
    tol_cpu = {"stagnation_ratio": 0.5, "assembly": "plain"}
    if not on_accel:
        tol_dev = tol_cpu

    model = build(f64)
    log(f"device: {default}, ndof={model.solid.ndof}, f64={f64}")

    tps_dev, ct_dev, fin_dev, infos_dev, flops_dev = run_device(
        model, default, tol_dev
    )
    log(
        f"{default.platform}: {tps_dev:.1f} steps/s"
        f" (compile {ct_dev:.1f}s, max_iter"
        f" {int(np.asarray(infos_dev.num_iter).max())})"
    )

    # CPU baseline (PETSc-CPU stand-in) at its own best configuration.
    # The persistent compilation cache may hold CPU AOT results compiled on
    # a different machine (the remote TPU toolchain's host), which loads
    # with machine-feature mismatch warnings and unrepresentative code —
    # compile the CPU leg fresh.
    vs_baseline = 1.0
    if on_accel:
        jax.config.update("jax_enable_compilation_cache", False)
        cpu = jax.devices("cpu")[0]
        tps_cpu, ct_cpu, fin_cpu, _, _ = run_device(model, cpu, tol_cpu)
        jax.config.update("jax_enable_compilation_cache", True)
        log(f"cpu: {tps_cpu:.1f} steps/s (compile {ct_cpu:.1f}s)")
        vs_baseline = tps_dev / tps_cpu
        # sanity: device and CPU trajectories agree
        du = np.abs(
            np.asarray(fin_dev["u"]) - np.asarray(fin_cpu["u"])
        ).max()
        log(f"max |u_dev - u_cpu| = {du:.3e}")

    out = {
        "metric": "forward FSI timesteps/sec, M5-3layers CAD mesh "
        "(KelvinVoigtWEpithelium + BernoulliAreaRatioSep, explicit)",
        "value": round(tps_dev, 2),
        "unit": "steps/s",
        "vs_baseline": round(vs_baseline, 3),
    }
    if flops_dev:
        # v5e bf16 peak = 197 Tflop/s/chip; f32 (3-pass bf16) ~ 1/4 of it
        out["flops_est"] = round(flops_dev / 1e9, 2)
        out["mfu_est"] = round(flops_dev / (197e12 / 4), 6)

    # Large-mesh leg (13.4k dofs, committed RCM asset): block-banded
    # assembly + block-tridiagonal direct solves — the formats that work
    # on a gather-less TPU (dense LU stops compiling past ~10k dofs).
    # Remote-TPU compile times are volatile, so the leg is wall-clock
    # guarded: on any failure/timeout the headline JSON still prints.
    if on_accel:
        import signal

        def _alarm(signum, frame):
            raise TimeoutError("large-mesh leg exceeded its budget")

        signal.signal(signal.SIGALRM, _alarm)
        signal.alarm(1500)
        try:
            model_l = build(f64, mesh_file="M5_3layers_rcm_h006.msh")
            # guard against build()'s default-mesh fallback silently
            # substituting the ~1k-dof mesh if the asset goes missing
            assert model_l.solid.ndof > 10_000, (
                "large-mesh RCM asset missing; leg skipped"
            )
            tol_l = {
                "assembly": "banded",
                "linear_solver": "btd",
                "btd_store_dtype": "bfloat16",
                "jacobian_refresh_steps": 32,
                "fixed_iterations": 3,
                "stagnation_ratio": 0.5,
            }
            tps_l, ct_l, fin_l, infos_l, flops_l = run_device(
                model_l, default, tol_l
            )
            assert np.isfinite(np.asarray(fin_l["u"])).all()
            log(
                f"large mesh ({model_l.solid.ndof} dofs):"
                f" {tps_l:.1f} steps/s (compile {ct_l:.0f}s, max rel_err"
                f" {np.asarray(infos_l.rel_err).max():.2e})"
            )
            out["large_mesh"] = {
                "ndof": int(model_l.solid.ndof),
                "steps_s": round(tps_l, 2),
                "solver": "banded-assembly + btd direct (bf16 factors)",
            }
            if flops_l:
                out["large_mesh"]["mfu_est"] = round(
                    flops_l / (197e12 / 4), 6
                )
        except Exception as e:
            log(f"large-mesh leg skipped: {e!r}")
        finally:
            signal.alarm(0)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
