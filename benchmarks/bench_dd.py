"""
DD (DOF-sharded stepping) bench leg — VIRTUAL 8-CPU mesh.

Real multi-chip hardware is unavailable in this environment, so this leg
measures what CAN be measured without it and makes the communication
volume explicit so round-over-round regressions in the sharded path are
visible:

- wall per coupled step of the whole sharded loop (8 virtual CPU
  devices on one core — NOT a parallel-speedup number, a
  compile+execute health number),
- per-variant accuracy vs the single-device trajectory,
- static comm-volume accounting from the plan: ppermute halo bytes,
  SPIKE interface all_gather bytes per solve, fluid psum bytes, and
  per-step collective counts derived from the measured mean Newton
  iterations.

Run standalone (prints ONE JSON line) or via bench.py, which shells out
to this script because the parent process is pinned to the TPU backend
and virtual host devices must be configured before backend init.
"""

import json
import os
import sys
import time

os.environ["VF_FEM_TPU_X64"] = "1"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import numpy as np
from jax.sharding import Mesh

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vf_fem_tpu import forward
from vf_fem_tpu.load import load_fsi_model
from vf_fem_tpu.mesh import vocal_fold_mesh
from vf_fem_tpu.mesh.reorder import rcm_mesh
from vf_fem_tpu.parallel.ddstep import DDIntegrator
from vf_fem_tpu.residuals import fluid as flr, solid as slr


def main():
    n_dev = 8
    n_steps = 40
    mesh2d = rcm_mesh(vocal_fold_mesh(40, 20))
    ymax = mesh2d.coords[:, 1].max()
    model = load_fsi_model(
        mesh2d, slr.KelvinVoigt, flr.BernoulliSmoothMinSep,
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
    model.control["psup"][:] = 0.0
    model.set_control(model.control)

    state0 = {k: np.zeros_like(np.asarray(v))
              for k, v in model.state0.sub_items()}
    cs = forward._stack_controls(model, [model.control])
    pd = model.prop_to_dict(model.prop)
    times = np.asarray(5e-5 * np.arange(n_steps + 1))

    refresh = 8
    dd = DDIntegrator(
        model,
        Mesh(np.asarray(jax.devices("cpu")[:n_dev]), ("shard",)),
        params={"jacobian_refresh_steps": refresh},
    )

    fin_ref, traj_ref, _ = forward.integrate_pure(
        model, state0, cs, pd, times, {"jacobian_refresh_steps": 1}
    )

    t0 = time.perf_counter()
    fin, traj, infos = dd.integrate_pure(state0, cs, pd, times)
    jax.block_until_ready(fin)
    compile_s = time.perf_counter() - t0
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        fin, traj, infos = dd.integrate_pure(state0, cs, pd, times)
        jax.block_until_ready(fin)
        best = min(best, time.perf_counter() - t0)

    u_ref = np.asarray(traj_ref["u"])
    err = float(
        np.abs(np.asarray(traj["u"]) - u_ref).max()
        / max(np.abs(u_ref).max(), 1e-30)
    )
    mean_iters = float(np.asarray(infos.num_iter).mean())

    # ---- static comm-volume accounting from the plan ------------------
    p = dd.plan
    itemsize = 8  # f64 on the CPU virtual mesh
    halo_bytes = p.Bt * itemsize  # one ppermute: Bt dofs to the neighbor
    # SPIKE solve: one all_gather of the 2*Bt interface values per slab
    allgather_bytes_per_solve = 2 * p.Bt * p.S * itemsize
    # fluid exchange: one psum of the (n_fl+?) area contributions
    psum_fluid_bytes = p.n_fl * itemsize
    # per step: 3 state halos (ext0) + per Newton residual (1 halo + 1
    # spill) x (iters + 1 initial residual), one all_gather per solve,
    # one fluid psum, and (iters + 1) scalar norm psums
    n_res = mean_iters + 1.0
    ppermute_per_step = 3 + 2 * n_res
    allgather_per_step = mean_iters
    # amortized per refresh window: band fill spill (h block-rows) +
    # the SPIKE reduced-system interface gather
    fill_spill_bytes = p.h * (2 * p.h + 1) * p.b * p.b * itemsize
    comm = {
        "ppermute_halo_bytes": halo_bytes,
        "ppermute_per_step": round(ppermute_per_step, 2),
        "allgather_bytes_per_solve": allgather_bytes_per_solve,
        "allgather_per_step": round(allgather_per_step, 2),
        "psum_fluid_bytes": psum_fluid_bytes,
        "fill_spill_bytes_per_refresh": fill_spill_bytes,
        "bytes_per_step_total": round(
            ppermute_per_step * halo_bytes
            + allgather_per_step * allgather_bytes_per_solve
            + psum_fluid_bytes
            + fill_spill_bytes / refresh,
        ),
    }

    out = {
        "label": "DD end-to-end stepping, VIRTUAL 8-CPU mesh"
                 " (compile/execute health + comm volume; not a"
                 " parallel-speedup number)",
        "n_devices": n_dev,
        "ndof": int(model.solid.ndof),
        "S": int(p.S),
        "Bt": int(p.Bt),
        "slab_dofs": int(p.ndof_loc),
        "steps_s_wall": round(n_steps / best, 2),
        "compile_s": round(compile_s, 1),
        "mean_iters": round(mean_iters, 2),
        "traj_rel_err_vs_single_device": err,
        "comm": comm,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
