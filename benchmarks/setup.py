"""
Common benchmark model setup (reference: ``benchmarks/setup.py``).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# accelerator benchmarks run f32 (TPU has no f64 LU); set before the
# package import pins precision
if jax.devices()[0].platform != "cpu":
    os.environ["VF_FEM_TPU_X64"] = "0"
    jax.config.update("jax_enable_x64", False)

import numpy as np

from vf_fem_tpu.load import load_fsi_model
from vf_fem_tpu.mesh import load_gmsh, vocal_fold_mesh
from vf_fem_tpu.residuals import fluid as flr, solid as slr


def setup_model(mesh_path=None, shape=False):
    """The reference benchmark model: KelvinVoigtWEpithelium +
    BernoulliAreaRatioSep, explicit coupling, on the M5-3layers mesh
    (reference: ``benchmarks/setup.py:12-27`` +
    ``benchmark_forward.py:28`` which meshes ``meshes/M5-3layers.msh``).

    ``shape=True`` swaps in ``KelvinVoigtWShape`` so per-variant geometry
    (the ``umesh`` mesh-displacement parameter) can be swept."""
    if mesh_path is None:
        mesh_path = os.path.join(
            os.path.dirname(__file__), "..", "meshes", "M5_3layers.msh"
        )
    if mesh_path is not None and os.path.exists(mesh_path):
        mesh = load_gmsh(mesh_path)
    else:
        mesh = vocal_fold_mesh(24, 12)
    return load_fsi_model(
        mesh,
        slr.KelvinVoigtWShape if shape else slr.KelvinVoigtWEpithelium,
        flr.BernoulliAreaRatioSep,
        coupling="explicit",
    )


def setup_transient_args(model):
    """(reference: ``benchmarks/setup.py:30-49``)"""
    state0 = model.state0.copy()
    state0[:] = 0.0

    control = model.control.copy()
    control[:] = 0.0
    control["psub"][:] = 8e3

    prop = model.prop
    mesh = model.solid.residual.mesh()
    ymax = mesh.coords[:, 1].max()
    prop["emod"][:] = 5e4
    prop["rho"][:] = 1.0
    prop["eta"][:] = 3.0
    prop["nu"][:] = 0.45
    if "emod_membrane" in prop:
        prop["emod_membrane"][:] = 0.0
        prop["th_membrane"][:] = 0.0
        prop["nu_membrane"][:] = 0.3
    prop["ycontact"][:] = ymax + 0.05
    prop["kcontact"][:] = 1e8
    prop["rho_air"][:] = 1.1225e-3
    prop["r_sep"][:] = 1.0
    prop["area_lb"][:] = 1e-4
    prop["ymid"][:] = ymax + 0.01
    return state0, control, prop
