"""
Probe: FSAI (two-way source-tract) step throughput on the default
device vs the bracketed root solve's iteration budget.

The interactive flow solve (`models/fsai.solve_flow_root`) evaluates the
1D fluid ~1 + 2*n_expand + n_bisect + 3 times per step, sequentially —
at M5 scale the step is latency-bound, so the scalar fixed-point chain
can be a real fraction of the step.  This probe measures steps/s for
the default (12, 34) budget against trimmed ones IN THE SAME SESSION
(slope between two scan lengths, host-fetch sync — CLAUDE.md round-3)
and reports the trajectory deviation each trim introduces.

Usage: python benchmarks/probe_fsai.py [--n-tube 44]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("VF_FEM_TPU_X64", "0")

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

N_LO, N_HI = 40, 140


def build(n_tube):
    from vf_fem_tpu.load import load_fsai_model
    from vf_fem_tpu.mesh import load_gmsh
    from vf_fem_tpu.residuals import fluid as flr, solid as slr

    mesh = load_gmsh(
        os.path.join(
            os.path.dirname(__file__), "..", "meshes", "M5_CB_GA3.msh"
        )
    )
    model = load_fsai_model(
        mesh, slr.KelvinVoigt, flr.BernoulliAreaRatioSep, num_tube=n_tube
    )
    ymax = mesh.coords[:, 1].max()
    prop = model.prop
    prop["emod"][:] = 3e4
    prop["rho"][:] = 1.0
    prop["eta"][:] = 2.0
    prop["nu"][:] = 0.45
    prop["ycontact"][:] = ymax + 0.01
    prop["kcontact"][:] = 1e8
    prop["rho_air"][:] = 1.1225e-3
    prop["r_sep"][:] = 1.0
    prop["area_lb"][:] = 1e-4
    prop["ymid"][:] = ymax + 0.01
    area = np.full(n_tube, 1.3)
    area[n_tube // 2 :] = 6.0
    prop["area"][:] = area
    prop["proploss"][:] = 1.0
    model.set_prop(prop)
    model.control["psub"][:] = 8000.0
    model.set_control(model.control)
    return model


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n-tube", type=int, default=44)
    parser.add_argument("--reps", type=int, default=3)
    args = parser.parse_args()

    from vf_fem_tpu import forward

    model = build(args.n_tube)
    dt = model.dt
    print(f"backend: {jax.default_backend()}, dt = {dt*1e6:.1f} us",
          flush=True)

    state0 = {k: np.zeros_like(np.asarray(v))
              for k, v in model.state0.sub_items()}
    cs = forward._stack_controls(model, [model.control])
    pd = model.prop_to_dict(model.prop)
    base_tol = {
        "jacobian_update": "once_per_step",
        "stagnation_ratio": 0.5,
        "jacobian_refresh_steps": 25,
        "jacobian_refresh_mode": "ns",
        "jacobian_full_refresh_windows": 4,
        "fixed_iterations": 2,
    }

    budgets = [(12, 34), (6, 26), (6, 20), (4, 20), (2, 14)]
    q_ref = None
    for ne, nb in budgets:
        tol = dict(
            base_tol,
            fsai_expand_iterations=ne,
            fsai_bisect_iterations=nb,
        )
        best = {}
        traj_q = None
        for n in (N_LO, N_HI):
            times = dt * np.arange(n + 1)
            fin, traj, _ = forward.integrate_pure(
                model, state0, cs, pd, times, tol
            )
            np.asarray(fin["u"])  # compile + warm (host-fetch sync)
            b = np.inf
            for _ in range(args.reps):
                t0 = time.perf_counter()
                fin, traj, _ = forward.integrate_pure(
                    model, state0, cs, pd, times, tol
                )
                np.asarray(fin["u"])
                b = min(b, time.perf_counter() - t0)
            best[n] = b
            if n == N_HI:
                traj_q = np.asarray(traj["q"]).ravel()
        rate = (N_HI - N_LO) / max(best[N_HI] - best[N_LO], 1e-9)
        if q_ref is None:
            q_ref = traj_q
            dev = 0.0
        else:
            dev = float(
                np.abs(traj_q - q_ref).max()
                / max(np.abs(q_ref).max(), 1e-30)
            )
        print(
            f"expand={ne:2d} bisect={nb:2d}: {rate:8.1f} steps/s"
            f" (lo {best[N_LO]*1e3:.1f} ms, hi {best[N_HI]*1e3:.1f} ms),"
            f" q dev vs default {dev:.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
