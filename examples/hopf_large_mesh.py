"""
Large-mesh phonation-onset (Hopf) study — the analysis the dense path
cannot do (dense Jacobians are ndof^2; dense LU stops compiling above
~10k dofs on TPU).

Runs linear stability on the committed 23.7k-dof RCM M5 CAD mesh with
the banded machinery end-to-end: btd-based static Picard equilibrium,
banded first-order pencil blocks, complex block-Thomas shift-invert
Arnoldi (``misc.hopf.linear_stability_banded``).  Sweeps psub and
brackets the onset pressure where Re(lambda) crosses zero.

Reference analog: the sparse PETSc block Jacobians the reference builds
for external Hopf consumers (``src/femvf/models/dynamical.py:239-298``).

Round 4: ``--device tpu`` runs the complex banded factorization and
every fused shift-invert action on the accelerator (f32 factors — the
TPU has no f64 LU); the returned eigenpairs carry a host-side residual
certificate so the f32 run is self-validating.  CPU-minutes per onset
point become device-seconds.

Run: python examples/hopf_large_mesh.py [--h 0.06] [--psub 400 800 1600]
     [--device tpu]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# device selection must precede the jax import chain: f64 is only
# meaningful on CPU (the TPU path runs the package's f32 config)
_DEVICE = "cpu"
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


def make_models(mesh, zs=None):
    ymax = mesh.coords[:, 1].max()
    out = []
    for mt in ("transient", "dynamical"):
        m = load_fsi_model(
            mesh, slr.KelvinVoigt, flr.BernoulliSmoothMinSep,
            model_type=mt, zs=zs,
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
    ap.add_argument("--psub", type=float, nargs="+",
                    default=[250.0, 500.0, 1000.0, 2000.0])
    ap.add_argument("--f-guess", type=float, default=120.0)
    ap.add_argument("--arnoldi-m", type=int, default=70)
    ap.add_argument("--extrude", type=int, default=0, metavar="NZ",
                    help="3D: extrude the M5_CB_GA3 fold with NZ z-planes")
    ap.add_argument("--h", type=float, default=0.1,
                    help="element size for the 3D fold")
    ap.add_argument("--device", type=str, default="cpu",
                    choices=("cpu", "tpu"),
                    help="where the factorization + shift-invert"
                         " actions run (tpu: f32 factors + certificate)")
    ap.add_argument("--h2d", type=float, default=None,
                    help="generate the 2D M5-3layers profile at this"
                         " element size instead of the committed"
                         " 23.7k-dof asset (0.003 -> ~94.8k dofs);"
                         " cached beside this script")
    args = ap.parse_args()

    if args.extrude:
        from vf_fem_tpu.mesh import m5_mesh
        from vf_fem_tpu.mesh.extrude import extrude_mesh
        from vf_fem_tpu.mesh.reorder import rcm_mesh

        zs = np.linspace(0.0, 1.5, args.extrude)
        mesh = rcm_mesh(
            extrude_mesh(m5_mesh("M5_CB_GA3", h=args.h, smooth_iters=5), zs)
        )
        tm, dm = make_models(mesh, zs=zs)
    elif args.h2d:
        from vf_fem_tpu.mesh import m5_mesh
        from vf_fem_tpu.mesh.reorder import rcm_mesh
        from vf_fem_tpu.mesh.writers import write_gmsh

        cache = os.path.join(
            os.path.dirname(__file__), f".m5_3layers_h{args.h2d:g}_rcm.msh"
        )
        if os.path.exists(cache):
            mesh = load_gmsh(cache)
        else:
            t0 = time.perf_counter()
            mesh = rcm_mesh(
                m5_mesh("M5_3layers", h=args.h2d, smooth_iters=10)
            )
            print(f"meshed h={args.h2d:g}: {mesh.num_vertices} verts"
                  f" ({time.perf_counter() - t0:.0f}s)")
            write_gmsh(mesh, cache)
        tm, dm = make_models(mesh)
    else:
        mesh = load_gmsh(MESH)
        tm, dm = make_models(mesh)
    print(f"mesh: {mesh.num_vertices} verts, {tm.solid.ndof} dofs")

    static_opts = {"linear_solver": "btd"}
    results = {}
    for psub in args.psub:
        c = tm.control.copy()
        c["psub"][:] = psub
        c["psup"][:] = 0.0
        t0 = time.perf_counter()
        eigs, eq, info = linear_stability(
            tm, dm, c, tm.prop, solver="banded",
            sigma=1j * 2 * np.pi * args.f_guess,
            arnoldi_m=args.arnoldi_m, static_options=static_opts,
            device=args.device, return_info=True,
        )
        sig, f = growth_rate_and_frequency(eigs)
        dt_s = time.perf_counter() - t0
        results[psub] = (sig, f)
        print(
            f"psub {psub:8.1f} Ba: growth {sig:+10.3f} 1/s,"
            f" f {f:7.2f} Hz   ({dt_s:.0f} s,"
            f" cert {info['res_rel'].max():.1e},"
            f" {info['factor_dtype']})"
        )

    ps = sorted(results)
    sgn = [results[p][0] > 0 for p in ps]
    if any(sgn) and not all(sgn):
        i = sgn.index(True)
        if i == 0:
            # the lowest swept pressure is already unstable — there is
            # no bracket inside the range (ps[i-1] would wrap around)
            print(
                f"\nphonation onset below {ps[0]:.0f} Ba"
                f" (mode ~{results[ps[0]][1]:.1f} Hz) — extend the"
                " sweep downward"
            )
        else:
            print(
                f"\nphonation onset between {ps[i-1]:.0f} and"
                f" {ps[i]:.0f} Ba (mode ~{results[ps[i]][1]:.1f} Hz)"
            )
    else:
        print("\nno onset crossing in the sweep range")


if __name__ == "__main__":
    main()
