"""
3D self-sustained phonation on the extruded M5 CAD geometry.

Extrudes the Scherer M5 profile (CB_GA3) along the anterior-posterior
axis into a clamped-ends 3D tet fold with one 1D Bernoulli channel per
z-plane (the reference's extruded-3D workflow, reference
``load.py:264-275``), and integrates the coupled model through the
large-mesh solver stack (RCM + banded assembly + block-tridiagonal
direct solves with bf16-stored factors).

The reference's FEniCS/PETSc stack makes 3D runs of this size
impractical interactively; here ~17k dofs step at ~100+ steps/s on one
TPU chip, so a 0.15 s phonation run is about a minute.

Usage: python phonation_3d.py [--h 0.02] [--nz 8] [--psub 8000]
                              [--steps 3000]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
if jax.devices()[0].platform != "cpu":
    os.environ["VF_FEM_TPU_X64"] = "0"
    jax.config.update("jax_enable_x64", False)

import numpy as np

from vf_fem_tpu import forward
from vf_fem_tpu.load import load_fsi_model
from vf_fem_tpu.mesh import m5_mesh
from vf_fem_tpu.mesh.extrude import extrude_mesh
from vf_fem_tpu.mesh.reorder import rcm_mesh
from vf_fem_tpu.misc.signal import fundamental_mode_from_rfft
from vf_fem_tpu.residuals import fluid as flr, solid as slr


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--h", type=float, default=0.02)
    parser.add_argument("--nz", type=int, default=8)
    parser.add_argument("--zlen", type=float, default=1.5)
    parser.add_argument("--psub", type=float, default=8000.0)
    parser.add_argument("--emod", type=float, default=3e4)
    parser.add_argument("--eta", type=float, default=2.0)
    parser.add_argument("--steps", type=int, default=3000)
    parser.add_argument("--dt", type=float, default=5e-5)
    args = parser.parse_args()

    zs = np.linspace(0.0, args.zlen, args.nz)
    mesh = rcm_mesh(
        extrude_mesh(m5_mesh("M5_CB_GA3", h=args.h, smooth_iters=10), zs)
    )
    model = load_fsi_model(
        mesh,
        slr.KelvinVoigt,
        flr.BernoulliAreaRatioSep,
        coupling="explicit",
        zs=zs,
    )
    ndof = model.solid.ndof
    print(f"3D mesh: {mesh.num_vertices} verts, {ndof} dofs,"
          f" {args.nz} fluid channels; device"
          f" {jax.devices()[0].platform}")

    ymax = mesh.coords[:, 1].max()
    prop = model.prop
    prop["emod"][:] = args.emod
    prop["rho"][:] = 1.0
    prop["eta"][:] = args.eta
    prop["nu"][:] = 0.45
    prop["ycontact"][:] = ymax + 0.01
    prop["kcontact"][:] = 1e8
    prop["rho_air"][:] = 1.1225e-3
    prop["r_sep"][:] = 1.0
    prop["area_lb"][:] = 1e-4
    prop["ymid"][:] = ymax + 0.01
    model.set_prop(prop)
    model.control["psub"][:] = args.psub
    model.control["psup"][:] = 0.0
    model.set_control(model.control)

    tol = {
        "assembly": "banded",
        "linear_solver": "btd",
        "btd_store_dtype": "bfloat16",
        "jacobian_refresh_steps": 16,
        "fixed_iterations": 3,
        "stagnation_ratio": 0.5,
    }
    state0 = {k: np.zeros_like(np.asarray(v))
              for k, v in model.state0.sub_items()}
    cs = forward._stack_controls(model, [model.control])
    pd = model.prop_to_dict(model.prop)
    times = args.dt * np.arange(args.steps + 1)

    # windowed scan: one 500-step program compiles once and is reused for
    # any --steps (remote-TPU compiles are expensive; the ~27 ms/window
    # dispatch is negligible)
    t0 = time.perf_counter()
    fin, traj, infos = forward._integrate_windowed(
        model, state0, cs, pd, times, tol, window=500
    )
    jax.block_until_ready(fin)
    wall = time.perf_counter() - t0
    print(f"{args.steps} steps in {wall:.1f} s"
          f" ({args.steps / wall:.1f} steps/s incl. compile);"
          f" max rel_err {np.asarray(infos.rel_err).max():.2e}")

    # glottal width per z-plane from the solid interface dofs
    u = np.asarray(traj["u"]).reshape(args.steps, -1, 3)
    sdofs = np.asarray(model._solid_dofs)
    ymid = float(np.asarray(prop["ymid"])[0])
    y_srf = mesh.coords[None, sdofs, 1] + u[:, sdofs, 1]
    gw = 2.0 * (ymid - y_srf.max(axis=1))  # minimum gap over the fold
    q = np.asarray(traj["q"])

    steady = gw[args.steps // 3:]
    f0, amp = fundamental_mode_from_rfft(steady, args.dt)
    closed = float(np.mean(steady <= 0.0))
    print(f"f0 = {f0:.1f} Hz, gw amplitude {amp:.3e} cm,"
          f" closed fraction {closed:.0%},"
          f" q range [{q.min():.2f}, {q.max():.2f}] cm^3/s")


if __name__ == "__main__":
    main()
