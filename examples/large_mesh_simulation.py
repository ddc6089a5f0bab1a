"""
Large-mesh phonation with the block-tridiagonal direct solver.

Demonstrates the scaling path beyond dense-LU territory (~10k dofs):
refine the M5-3layers CAD profile, RCM-renumber it, and integrate with
``linear_solver='btd'`` (block-Thomas factorization over the RCM band,
refreshed every 16 steps; see ``vf_fem_tpu/solvers/btd.py``).

On one TPU v5e chip this configuration steps a 53k-dof fold at ~27
steps/s; dense LU cannot compile at this size and gather-based sparse
formats run ~20x slower.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

# f32 on accelerators (TPU has no f64 LU); f64 on CPU
if jax.devices()[0].platform != "cpu":
    os.environ["VF_FEM_TPU_X64"] = "0"
    jax.config.update("jax_enable_x64", False)

import numpy as np

from vf_fem_tpu import forward
from vf_fem_tpu.load import load_fsi_model
from vf_fem_tpu.mesh import m5_mesh
from vf_fem_tpu.mesh.reorder import rcm_mesh
from vf_fem_tpu.residuals import fluid as flr, solid as slr


def main(h=0.01, n_steps=50):
    mesh = rcm_mesh(m5_mesh("M5_3layers", h=h, smooth_iters=10))
    print(f"mesh: {mesh.num_vertices} vertices ({2 * mesh.num_vertices} dofs)")

    model = load_fsi_model(
        mesh,
        slr.KelvinVoigtWEpithelium,
        flr.BernoulliAreaRatioSep,
        coupling="explicit",
    )
    ymax = mesh.coords[:, 1].max()
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
    model.control["psub"][:] = 8000.0
    model.control["psup"][:] = 0.0
    model.set_control(model.control)

    solver = {
        "linear_solver": "btd",
        "jacobian_refresh_steps": 16,
        "fixed_iterations": 3,
        "stagnation_ratio": 0.5,
    }

    state0 = {
        k: np.zeros_like(np.asarray(v)) for k, v in model.state0.sub_items()
    }
    cs = forward._stack_controls(model, [model.control])
    prop_d = model.prop_to_dict(model.prop)
    times = 1e-4 * np.arange(n_steps + 1)

    import time

    t0 = time.perf_counter()
    fin, traj, infos = forward.integrate_pure(
        model, state0, cs, prop_d, times, solver
    )
    jax.block_until_ready(fin)
    wall = time.perf_counter() - t0
    u = np.asarray(traj["u"])
    print(
        f"{n_steps} steps in {wall:.1f} s (incl. compile);"
        f" max |u| = {np.abs(u).max():.4f} cm,"
        f" max Newton rel_err = {np.asarray(infos.rel_err).max():.2e}"
    )


if __name__ == "__main__":
    main()
