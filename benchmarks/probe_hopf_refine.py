"""
Probe: does deeper host-f64 refinement improve the 23.7k-dof TPU Hopf
eigenpair certificate, or is 4.7e-6 (refine=2) the Arnoldi floor there
too?

On the SMALL test pencil refine=3 gains nothing over refine=2 (certs
2.4e-9 best / 4.6e-7 max — Arnoldi-convergence-limited).  At 23.7k dofs
the round-5 bench leg records 4.7e-6 at the default refine=2; whether
that is the refinement contraction (one more pass would gain ~1.4e-4x)
or Ritz convergence (more passes gain nothing; only arnoldi_m would)
was not measured.  This probe runs refine=2/3 (+ optionally a larger
arnoldi_m) in ONE session — the refinement loop is host-side, so every
leg reuses the same compiled device executables.

MEASURED (round 5, TPU, 23.7k dofs, psub 500): the 4.7e-6 level is a
genuine floor of the large pencil, pinned by NEITHER knob —

    arnoldi_m  70 refine 2: cert max 4.75e-06 / best 2.66e-06 (13/24)
    arnoldi_m  70 refine 3: cert max 4.73e-06 / best 2.66e-06 (20/24)
    arnoldi_m  70 refine 4: cert max 4.73e-06 / best 2.66e-06 (20/24)
    arnoldi_m 100 refine 2: cert max 4.75e-06 / best 2.66e-06 (13/38)

growth -20.632/-20.633 1/s and f 114.16 Hz identical throughout.
Extra refinement passes only rescue borderline Ritz pairs past the
1e-5 gate (parenthesized counts); neither deeper refinement nor a
larger Krylov basis moves the returned modes' certificates.  The
identical algorithm reaches 4.6e-7/2.4e-9 on the small test pencil,
so the remaining level scales with the pencil's conditioning, not
with any exposed knob — the refine=2 default and cert_tol=1e-5 gate
are set at this measured floor (docs/HOPF.md).

Reference analog: the eigen-consumer contract the reference exposes via
PETSc block Jacobians (src/femvf/models/dynamical.py:239-298).

Run: python benchmarks/probe_hopf_refine.py [--psub 500] [--arnoldi-m 70]
     [--refines 2 3] [--device tpu]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_DEVICE = "tpu"
if "--device" in sys.argv:
    _DEVICE = sys.argv[sys.argv.index("--device") + 1]
if _DEVICE == "cpu":
    os.environ.setdefault("VF_FEM_TPU_X64", "1")
else:
    os.environ["VF_FEM_TPU_X64"] = "0"

import jax

if _DEVICE == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from vf_fem_tpu.load import load_fsi_model
from vf_fem_tpu.mesh.gmsh_io import load_gmsh
from vf_fem_tpu.misc.hopf import growth_rate_and_frequency, linear_stability
from vf_fem_tpu.residuals import fluid as flr, solid as slr

MESH = os.path.join(
    os.path.dirname(__file__), "..", "meshes", "M5_3layers_rcm_h006.msh"
)


def make_models(mesh):
    ymax = mesh.coords[:, 1].max()
    out = []
    for mt in ("transient", "dynamical"):
        m = load_fsi_model(
            mesh, slr.KelvinVoigt, flr.BernoulliSmoothMinSep,
            model_type=mt,
        )
        p = m.prop
        p["emod"][:] = 5e4
        p["rho"][:] = 1.0
        p["eta"][:] = 3.0
        p["nu"][:] = 0.45
        p["ycontact"][:] = ymax + 0.05
        p["kcontact"][:] = 1e8
        p["rho_air"][:] = 1.1225e-3
        p["zeta_min"][:] = 1e-3
        p["zeta_sep"][:] = 1e-3
        p["ymid"][:] = ymax + 0.01
        m.set_prop(p)
        out.append(m)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--psub", type=float, default=500.0)
    ap.add_argument("--f-guess", type=float, default=120.0)
    ap.add_argument("--arnoldi-m", type=int, nargs="+", default=[70])
    ap.add_argument("--refines", type=int, nargs="+", default=[2, 3])
    ap.add_argument("--device", type=str, default="tpu",
                    choices=("cpu", "tpu"))
    args = ap.parse_args()

    mesh = load_gmsh(MESH)
    tm, dm = make_models(mesh)
    print(f"mesh: {mesh.num_vertices} verts, {tm.solid.ndof} dofs")

    c = tm.control.copy()
    c["psub"][:] = args.psub
    c["psup"][:] = 0.0
    static_opts = {"linear_solver": "btd"}

    for m_arn in args.arnoldi_m:
        for refine in args.refines:
            t0 = time.perf_counter()
            eigs, eq, info = linear_stability(
                tm, dm, c, tm.prop, solver="banded",
                sigma=1j * 2 * np.pi * args.f_guess,
                arnoldi_m=m_arn, static_options=static_opts,
                device=args.device, refine=refine, return_info=True,
            )
            sig, f = growth_rate_and_frequency(eigs)
            dt_s = time.perf_counter() - t0
            rr = info["res_rel"]
            print(
                f"arnoldi_m {m_arn:3d} refine {refine}: growth"
                f" {sig:+9.3f} 1/s, f {f:7.2f} Hz, cert max"
                f" {rr.max():.2e} / best {rr.min():.2e},"
                f" n_conv {info['n_conv']}"
                f" dropped {info['n_cert_dropped']}  ({dt_s:.0f} s)",
                flush=True,
            )


if __name__ == "__main__":
    main()
