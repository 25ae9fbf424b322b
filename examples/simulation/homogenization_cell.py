"""Homogenize a unit cell and plot its directional stiffness surface."""

import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[2]))  # repo root


from pathlib import Path

import numpy as np

from pylatticedso_tpu import build_lattice
from pylatticedso_tpu.sim.utils_simulation import get_homogenized_properties
from pylatticedso_tpu.plotting import visualize_homogenization_surface

out = Path("data/outputs/examples")
out.mkdir(parents=True, exist_ok=True)

for geom in ("BCC", "Octet", "Kelvin"):
    cell = build_lattice({
        "geometry": {"cell_size": {"x": 1, "y": 1, "z": 1},
                     "number_of_cells": {"x": 1, "y": 1, "z": 1},
                     "radii": [0.05], "geom_types": [geom]},
        "simulation_parameters": {"enable": True, "material": "VeroClear",
                                  "periodicity": True}})
    res = get_homogenized_properties(cell)
    o = res.orthotropic
    print(f"{geom:8s} Ex={o['Ex']:8.3f}  Gxy={o['Gxy']:8.3f}  "
          f"nu_xy={o['nu_xy']:.3f}  symmetry error {res.symmetry_error:.2e}")
    visualize_homogenization_surface(res.C, save_path=out / f"E_surface_{geom}.png")
