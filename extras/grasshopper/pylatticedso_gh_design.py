"""GHPython consumer for pylatticedso-tpu Grasshopper exports.

Paste into a GHPython component (Rhino 7/8 with the Dendro plugin).
Component inputs:
  * ``lattice_name`` (str)  — stem of the JSON written by
    ``pylatticedso_tpu.io.export.save_json_to_grasshopper``
  * ``search_dirs``  (list of str) — directories to look for the JSON in
  * ``smooth_cut``   (bool, optional) — boolean-subtract ``cut_breps``
  * ``cut_breps``    (list of Brep, optional)
Outputs: ``mesh`` (volumized lattice), ``volume`` (float).

The export schema (io/export.py:save_json_to_grasshopper, mirroring the
reference's utils.py:364-425) stores one beam per consecutive coordinate
PAIR: nodesX[2k], nodesX[2k+1] are the endpoints of beam k, radii[k] its
radius.

This script only runs inside Rhino (Rhino.Geometry / ghpythonlib are
Rhino-provided); it is shipped for parity with the reference's
extras/grasshopper workflow.
"""

import json
import os

import Rhino.Geometry as rg                     # noqa: F401 (Rhino-only)
import ghpythonlib.components as ghcomp


def load_lattice_json(name, dirs):
    for d in dirs:
        p = os.path.join(d, name + ".json")
        if os.path.exists(p):
            with open(p, "r") as f:
                return json.load(f)
    raise IOError("lattice JSON %r not found in %r" % (name, dirs))


def beams_to_lines(data):
    xs, ys, zs = data["nodesX"], data["nodesY"], data["nodesZ"]
    lines = []
    for k in range(len(xs) // 2):
        a = rg.Point3d(xs[2 * k], ys[2 * k], zs[2 * k])
        b = rg.Point3d(xs[2 * k + 1], ys[2 * k + 1], zs[2 * k + 1])
        lines.append(rg.Line(a, b))
    return lines


def volumize(lines, radii):
    """Dendro SDF volumization: voxel/iso scales follow the thinnest beam
    so small-radius struts survive meshing."""
    r_min = min(radii) if radii else 0.01
    settings = ghcomp.DendroGH.CreateSettings(
        max(r_min / 2.0, 0.002), 1, 0, max(r_min / 3.0, 0.0005))
    vol = ghcomp.DendroGH.CurveToVolume(lines, radii, settings)
    return ghcomp.DendroGH.VolumetoMesh(vol, settings)


data = load_lattice_json(lattice_name, search_dirs)          # noqa: F821
mesh = volumize(beams_to_lines(data), data["radii"])
if globals().get("smooth_cut") and globals().get("cut_breps"):
    cutter = rg.Mesh()
    for brep in cut_breps:                                   # noqa: F821
        for m in rg.Mesh.CreateFromBrep(brep, rg.MeshingParameters.Default):
            cutter.Append(m)
    mesh = rg.Mesh.CreateBooleanDifference([mesh], [cutter])[0]
volume = rg.Mesh.Volume(mesh)
