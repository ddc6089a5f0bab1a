"""
Phonation-onset study across the M5 medial-angle family.

The reference ships the Scherer M5 CAD profiles at four medial
(convergence) angles precisely for studies like this (reference
``meshes/genmesh_M5_CB.py:10-66``); its stack leaves the eigenanalysis to
external consumers.  Here the whole study is in-repo: for each committed
CAD mesh, bisect the subglottal pressure for the Hopf point (growth rate
of the least-damped coupled mode crossing zero) and report onset pressure
and onset frequency.

Usage: python medial_angle_study.py [--emod 30000] [--tol 250]

Measured (emod 3e4 Ba, eta 2 Ba.s, KelvinVoigt + BernoulliSmoothMinSep):
GA0 onset ~2834 Ba, GA1/GA2 <= 373 Ba, GA3 ~619 Ba; onset mode 113-116 Hz
for every angle — the medial angle moves the onset pressure by ~8x while
barely touching the onset frequency.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# host-side dense eigenanalysis: run CPU f64
jax.config.update("jax_platforms", "cpu")

import numpy as np

from vf_fem_tpu.load import load_fsi_model
from vf_fem_tpu.mesh import load_gmsh
from vf_fem_tpu.misc.hopf import growth_rate_and_frequency, linear_stability
from vf_fem_tpu.residuals import fluid as flr, solid as slr

MESH_DIR = os.path.join(os.path.dirname(__file__), "..", "meshes")
PROFILES = ["M5_CB_GA0", "M5_CB_GA1", "M5_CB_GA2", "M5_CB_GA3"]


def make_models(mesh, emod, eta):
    ymax = mesh.coords[:, 1].max()

    def make(model_type):
        m = load_fsi_model(
            mesh, slr.KelvinVoigt, flr.BernoulliSmoothMinSep,
            model_type=model_type,
        )
        p = m.prop
        p["emod"][:] = emod
        p["rho"][:] = 1.0
        p["eta"][:] = eta
        p["nu"][:] = 0.45
        p["ycontact"][:] = ymax + 0.05
        p["kcontact"][:] = 1e8
        p["rho_air"][:] = 1.1225e-3
        p["zeta_min"][:] = 1e-3
        p["zeta_sep"][:] = 1e-3
        p["ymid"][:] = ymax + 0.01
        m.set_prop(p)
        return m

    return make("transient"), make("dynamical")


def growth_at(tm, dm, psub):
    c = tm.control.copy()
    c["psub"][:] = psub
    c["psup"][:] = 0.0
    eigs, _ = linear_stability(tm, dm, c, tm.prop)
    return growth_rate_and_frequency(eigs)


def onset_bisect(tm, dm, lo, hi, tol):
    """Bisect psub for sigma(psub) = 0; returns (p_onset, f_onset)."""
    sig_lo, _ = growth_at(tm, dm, lo)
    sig_hi, f_hi = growth_at(tm, dm, hi)
    if sig_lo > 0:
        return lo, None  # already unstable at the lower bracket
    if sig_hi < 0:
        return None, None  # no onset in the bracket
    f = f_hi
    while hi - lo > tol:
        mid = 0.5 * (lo + hi)
        sig, fm = growth_at(tm, dm, mid)
        if sig > 0:
            hi, f = mid, fm
        else:
            lo = mid
    return 0.5 * (lo + hi), f


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--emod", type=float, default=3e4)
    parser.add_argument("--eta", type=float, default=2.0)
    parser.add_argument("--lo", type=float, default=250.0)
    parser.add_argument("--hi", type=float, default=16000.0)
    parser.add_argument("--tol", type=float, default=250.0)
    parser.add_argument("--only", default=None,
                        help="single profile (run profiles in separate"
                        " processes to bound jit-cache memory on small"
                        " hosts)")
    args = parser.parse_args()
    profiles = [args.only] if args.only else PROFILES

    print(f"emod = {args.emod:g} Ba, eta = {args.eta:g} Ba.s;"
          f" onset bracket [{args.lo:g}, {args.hi:g}] Ba")
    for name in profiles:
        mesh = load_gmsh(os.path.join(MESH_DIR, f"{name}.msh"))
        tm, dm = make_models(mesh, args.emod, args.eta)
        p_on, f_on = onset_bisect(tm, dm, args.lo, args.hi, args.tol)
        if p_on is None:
            print(f"{name}: no onset below {args.hi:g} Ba")
        else:
            f_str = f", onset mode {f_on:.0f} Hz" if f_on else ""
            print(f"{name}: onset psub ~= {p_on:.0f} Ba"
                  f" ({p_on / 1e4:.2f} kPa){f_str}")


if __name__ == "__main__":
    main()
