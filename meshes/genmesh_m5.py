"""
Generate the M5-like vocal-fold meshes as ``.msh`` files
(the TPU-native replacement for the reference's gmsh/STEP pipeline,
reference ``meshes/genmesh_M5_CB.py``).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vf_fem_tpu.mesh import vocal_fold_mesh
from vf_fem_tpu.mesh.writers import write_gmsh


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--nx", type=int, default=24)
    parser.add_argument("--ny", type=int, default=12)
    parser.add_argument("--out", default="M5-like.msh")
    args = parser.parse_args()

    mesh = vocal_fold_mesh(args.nx, args.ny)
    path = write_gmsh(mesh, args.out)
    print(
        f"wrote {path}: {mesh.num_vertices} vertices, {mesh.num_cells} cells,"
        f" subdomains {dict(mesh.subdomains[1])}"
    )


if __name__ == "__main__":
    main()
