"""Conforming solid mesh: volume convergence + watertightness.

Mirrors the reference's gmsh CAD meshing capability
(lattice.py:1694-1963) with an SDF + marching-tetrahedra pipeline.
"""

import numpy as np
import pytest

from pylatticedso_tpu import build_lattice
from pylatticedso_tpu.io.solid_mesh import (export_solid_mesh,
                                            get_relative_density_mesh,
                                            get_volume_mesh,
                                            lattice_sdf_grid,
                                            marching_tetrahedra, mesh_volume)


class _Capsule:
    nodes = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    edges = np.array([[0, 1]])
    radius = np.array([0.1])
    num_edges = 1

    def get_lattice_boundary_box(self):
        return [-0.1, 0.1, -0.1, 0.1, -0.1, 1.1]


def test_capsule_volume_converges():
    sdf, o, h = lattice_sdf_grid(_Capsule(), resolution=80)
    tris = marching_tetrahedra(sdf, o, h)
    v = mesh_volume(tris)
    exact = np.pi * 0.1**2 * 1.0 + 4.0 / 3.0 * np.pi * 0.1**3
    assert abs(v - exact) / exact < 0.02


def test_mesh_is_watertight():
    sdf, o, h = lattice_sdf_grid(_Capsule(), resolution=40)
    tris = marching_tetrahedra(sdf, o, h)
    verts, inv = np.unique(tris.reshape(-1, 3).round(6), axis=0,
                           return_inverse=True)
    f = inv.reshape(-1, 3)
    e = np.sort(np.stack([f[:, [0, 1]], f[:, [1, 2]],
                          f[:, [2, 0]]]).reshape(-1, 2), axis=1)
    _, counts = np.unique(e, axis=0, return_counts=True)
    assert (counts == 2).all()          # closed 2-manifold


def test_lattice_relative_density_mesh():
    lat = build_lattice({
        "geometry": {"cell_size": {"x": 1, "y": 1, "z": 1},
                     "number_of_cells": {"x": 1, "y": 1, "z": 1},
                     "radii": [0.08], "geom_types": ["BCC"]}})
    rho_mesh = get_relative_density_mesh(lat, resolution=72)
    rho_sum = lat.get_relative_density()       # sum of cylinder volumes
    # the mesh density accounts for strut overlap at the center node, so it
    # must be positive, below the overlap-ignoring sum, and within ~20%
    assert 0 < rho_mesh < rho_sum
    assert abs(rho_mesh - rho_sum) / rho_sum < 0.25


def test_export_solid_mesh(tmp_path):
    lat = build_lattice({
        "geometry": {"cell_size": {"x": 1, "y": 1, "z": 1},
                     "number_of_cells": {"x": 1, "y": 1, "z": 1},
                     "radii": [0.08], "geom_types": ["BCC"]}})
    tris = export_solid_mesh(tmp_path / "solid.stl", lat, resolution=48)
    raw = (tmp_path / "solid.stl").read_bytes()
    assert len(raw) == 84 + 50 * len(tris)
    export_solid_mesh(tmp_path / "solid.msh", lat, resolution=48)
    assert "$MeshFormat" in (tmp_path / "solid.msh").read_text()[:40]
