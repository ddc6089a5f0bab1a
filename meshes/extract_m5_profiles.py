"""
One-time extraction of the M5 (Scherer) vocal-fold profile control data.

Reads the reference's STEP CAD exports (reference ``meshes/stp/*.STEP`` and
``meshes/geometries/M5-3layers-cm.STEP``) with
:mod:`vf_fem_tpu.mesh.step_io` and writes the B-rep control points (line
endpoints, arc centers/radii/senses, face loops) into
``vf_fem_tpu/mesh/_m5_data.py`` so the framework carries the published M5
profile geometry as plain data with no CAD dependency.

Run from the repo root with the reference checkout available:

    python meshes/extract_m5_profiles.py /path/to/reference/meshes
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from vf_fem_tpu.mesh.step_io import read_step_profile

HEADER = '''"""
M5 (Scherer) vocal-fold profile control data (generated file).

B-rep control points extracted from the reference CAD exports by
``meshes/extract_m5_profiles.py`` (reference ``meshes/stp/M5_CB_GA{0..3}
[_split].STEP``, ``meshes/geometries/M5-3layers-cm.STEP``; meshed by the
reference with gmsh in ``meshes/genmesh_M5_CB.py:10-66``).  Units are CGS
centimeters.  Each profile is a planar B-rep: ``edges`` maps edge id ->
(kind, p0, p1[, center, radius, ccw]); ``faces`` lists closed loops of
``(edge_id, flipped)`` pairs, one loop per material region, innermost
(body) first.
"""

'''


def fmt(x):
    return repr(float(np.round(x, 12)))


def encode(faces):
    edges = {}
    loops = []
    for f in faces:
        loop = []
        for e, flipped in f.loop:
            if e.eid not in edges:
                if e.kind == "line":
                    edges[e.eid] = (
                        f"('line', ({fmt(e.p0[0])}, {fmt(e.p0[1])}),"
                        f" ({fmt(e.p1[0])}, {fmt(e.p1[1])}))"
                    )
                else:
                    edges[e.eid] = (
                        f"('circle', ({fmt(e.p0[0])}, {fmt(e.p0[1])}),"
                        f" ({fmt(e.p1[0])}, {fmt(e.p1[1])}),"
                        f" ({fmt(e.center[0])}, {fmt(e.center[1])}),"
                        f" {fmt(e.radius)}, {e.ccw})"
                    )
            loop.append((e.eid, bool(flipped)))
        loops.append(loop)
    return edges, loops


def main():
    ref_meshes = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/meshes"
    profiles = {}
    for ga in range(4):
        for split in (False, True):
            name = f"M5_CB_GA{ga}" + ("_split" if split else "")
            path = os.path.join(ref_meshes, "stp", f"{name}.STEP")
            profiles[name] = read_step_profile(path)
    profiles["M5_3layers"] = read_step_profile(
        os.path.join(ref_meshes, "geometries", "M5-3layers-cm.STEP")
    )

    out = [HEADER, "M5_PROFILES = {"]
    for name, faces in profiles.items():
        edges, loops = encode(faces)
        out.append(f"    {name!r}: {{")
        out.append("        'edges': {")
        for eid, s in sorted(edges.items()):
            out.append(f"            {eid}: {s},")
        out.append("        },")
        out.append("        'faces': [")
        for loop in loops:
            out.append(f"            {loop!r},")
        out.append("        ],")
        out.append("    },")
    out.append("}")

    dst = os.path.join(
        os.path.dirname(__file__), "..", "vf_fem_tpu", "mesh", "_m5_data.py"
    )
    with open(dst, "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote {dst}: {len(profiles)} profiles")


if __name__ == "__main__":
    main()
