"""
Run a short phonation simulation and export it for ParaView
(reference: ``examples/paraview_visualization.py`` — legacy API; this is
the working equivalent).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from vf_fem_tpu import forward, statefile as sf
from vf_fem_tpu.load import load_fsi_model
from vf_fem_tpu.mesh import load_gmsh, vocal_fold_mesh
from vf_fem_tpu.residuals import fluid as flr, solid as slr
from vf_fem_tpu.vis.xdmfutils import write_xdmf


def main():
    msh = os.path.join(
        os.path.dirname(__file__), "..", "meshes", "M5_CB_GA3.msh"
    )
    mesh = load_gmsh(msh) if os.path.exists(msh) else vocal_fold_mesh(16, 8)
    ymax = mesh.coords[:, 1].max()
    model = load_fsi_model(
        mesh, slr.KelvinVoigt, flr.BernoulliAreaRatioSep, coupling="explicit"
    )
    model.prop["emod"][:] = 5e4
    model.prop["eta"][:] = 3.0
    model.prop["ycontact"][:] = ymax + 0.05
    model.prop["kcontact"][:] = 1e8
    model.prop["rho_air"][:] = 1.1225e-3
    model.prop["r_sep"][:] = 1.0
    model.prop["area_lb"][:] = 1e-5
    model.prop["ymid"][:] = ymax + 0.01
    model.set_prop(model.prop)
    control = model.control.copy()
    control["psub"][:] = 8000.0
    model.set_control(control)

    times = 2e-5 * np.arange(200)
    ini = model.state0.copy()
    ini[:] = 0.0
    with sf.StateFile(model, "phonation.h5", mode="w") as f:
        forward.integrate(model, f, ini, [control], model.prop, times)
        xdmf = write_xdmf(f)
    print(f"wrote phonation.h5 + {xdmf}; open the XDMF in ParaView")


if __name__ == "__main__":
    main()
