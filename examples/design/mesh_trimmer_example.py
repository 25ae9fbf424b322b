"""Trim a lattice to an arbitrary closed surface with MeshTrimmer.

Mirrors examples/design/mesh_trimmer_example.py of the reference (which
trims a BCC block to a bone STL via trimesh+pyembree).  The trimmer here is
dependency-free (ray-parity inside tests + Moller-Trumbore clipping); the
target surface is a procedurally generated capsule STL so the example is
self-contained.
"""

import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[2]))  # repo root


from pathlib import Path

import numpy as np

from pylatticedso_tpu import build_lattice
from pylatticedso_tpu.design.mesh_trimmer import MeshTrimmer
from pylatticedso_tpu.plotting import visualize_lattice

out = Path("data/outputs/examples")
out.mkdir(parents=True, exist_ok=True)


def icosphere_triangles(center, radius, n=12):
    """UV-sphere triangulation [T,3,3] (enough for a closed test surface)."""
    th = np.linspace(0, np.pi, n)
    ph = np.linspace(0, 2 * np.pi, 2 * n)
    tris = []
    for i in range(len(th) - 1):
        for j in range(len(ph) - 1):
            p = lambda a, b: center + radius * np.array(
                [np.sin(th[a]) * np.cos(ph[b]),
                 np.sin(th[a]) * np.sin(ph[b]), np.cos(th[a])])
            tris.append([p(i, j), p(i + 1, j), p(i + 1, j + 1)])
            tris.append([p(i, j), p(i + 1, j + 1), p(i, j + 1)])
    return np.asarray(tris)


# closed surface: a sphere of radius 2.2 centered in a 5^3 lattice block
mesh = MeshTrimmer(icosphere_triangles(np.array([2.5, 2.5, 2.5]), 2.2))

# cells whose corners fall outside the surface are dropped at build time
lattice = build_lattice({
    "geometry": {"cell_size": {"x": 1, "y": 1, "z": 1},
                 "number_of_cells": {"x": 5, "y": 5, "z": 5},
                 "radii": [0.08], "geom_types": ["BCC"]}},
    mesh_trimmer=mesh)
print(f"kept {lattice.num_cells}/125 cells, {lattice.num_edges} beams")

# clip the remaining beams exactly at the surface (in place)
mesh.trim_lattice(lattice)
print(f"after clipping: {lattice.num_edges} beams, {lattice.num_nodes} nodes")
visualize_lattice(lattice, beam_color_type="radii",
                  save_path=out / "trimmed_lattice.png")
print(f"wrote {out / 'trimmed_lattice.png'}")
