"""
Generate the M5 vocal-fold meshes as committed ``.msh`` assets
(the TPU-native replacement for the reference's gmsh/STEP pipeline,
reference ``meshes/genmesh_M5_CB.py:10-66``): the four medial-angle
body/cover profiles, their split-cover variants, and the 3-layer profile,
all triangulated from the extracted CAD control data.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vf_fem_tpu.mesh.m5 import m5_mesh, m5_profile_names
from vf_fem_tpu.mesh.writers import write_gmsh


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--h", type=float, default=0.03,
                        help="target element size (cm)")
    parser.add_argument("--outdir", default=os.path.dirname(__file__) or ".")
    parser.add_argument("--only", default=None,
                        help="single profile name (default: all)")
    parser.add_argument("--smooth-iters", type=int, default=None,
                        help="Laplacian smoothing passes (mesher default)")
    parser.add_argument("--rcm", action="store_true",
                        help="RCM-renumber (required by bsb/btd solvers)")
    parser.add_argument("--suffix", default="",
                        help="output filename suffix, e.g. _rcm_h006")
    args = parser.parse_args()

    names = [args.only] if args.only else m5_profile_names()
    for name in names:
        kw = {}
        if args.smooth_iters is not None:
            kw["smooth_iters"] = args.smooth_iters
        mesh = m5_mesh(name, h=args.h, **kw)
        if args.rcm:
            from vf_fem_tpu.mesh.reorder import rcm_mesh

            mesh = rcm_mesh(mesh)
        path = write_gmsh(
            mesh, os.path.join(args.outdir, f"{name}{args.suffix}.msh")
        )
        print(
            f"wrote {path}: {mesh.num_vertices} vertices,"
            f" {mesh.num_cells} cells,"
            f" cells {dict(mesh.subdomains[2])},"
            f" facets {dict(mesh.subdomains[1])},"
            f" points {dict(mesh.subdomains[0])}"
        )


if __name__ == "__main__":
    main()
