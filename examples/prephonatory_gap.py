"""
Static prephonatory-gap configuration with contact
(reference: ``examples/prephonatory_gap.py`` — which uses a legacy API and
no longer runs; this is the working equivalent).

Solves the static coupled configuration of an M5-like vocal fold pressed
toward the contact plane by subglottal pressure.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from vf_fem_tpu import static
from vf_fem_tpu.load import load_fsi_model, load_solid_model
from vf_fem_tpu.mesh import vocal_fold_mesh
from vf_fem_tpu.residuals import fluid as flr, solid as slr


def main():
    mesh = vocal_fold_mesh(16, 8)
    ymax = mesh.coords[:, 1].max()

    # -- static solid under uniform surface pressure --------------------
    solid = load_solid_model(mesh, slr.KelvinVoigt)
    solid.prop["emod"][:] = 5e4
    solid.prop["nu"][:] = 0.45
    solid.prop["ycontact"][:] = ymax + 0.002  # contact plane just above
    solid.prop["kcontact"][:] = 1e11
    solid.set_prop(solid.prop)
    control = solid.control.copy()
    control["p"][:] = 8000.0  # 800 Pa in CGS
    state, info = static.static_solid_configuration(
        solid, control, solid.prop
    )
    u = np.asarray(state["u"]).reshape(-1, 2)
    print(
        f"static solid: {info['num_iter']} Newton iters,"
        f" max |u| = {np.abs(u).max():.4e} cm (fold compresses under load)"
    )
    gap = ymax + 0.002 - (mesh.coords[:, 1] + u[:, 1]).max()
    print(f"prephonatory gap at contact plane: {gap:.3e} cm")

    # -- static coupled configuration (Picard) ---------------------------
    model = load_fsi_model(
        mesh, slr.KelvinVoigt, flr.BernoulliSmoothMinSep, coupling="explicit"
    )
    model.prop["emod"][:] = 5e4
    model.prop["ycontact"][:] = ymax + 0.05
    model.prop["kcontact"][:] = 1e8
    model.prop["rho_air"][:] = 1.1225e-3
    model.prop["zeta_min"][:] = 1e-3
    model.prop["zeta_sep"][:] = 1e-3
    model.prop["ymid"][:] = ymax + 0.01
    model.set_prop(model.prop)
    control = model.control.copy()
    control["psub"][:] = 8000.0
    control["psup"][:] = 0.0
    state, info = static.static_coupled_configuration_picard(
        model, control, model.prop
    )
    print(
        f"static coupled: {info['num_iter']} Picard iters,"
        f" q = {float(state['q'][0]):.2f} cm^3/s"
    )


if __name__ == "__main__":
    main()
