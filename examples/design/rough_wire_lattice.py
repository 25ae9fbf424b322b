"""Rough-surface lattice STL — the reference's Pyrough workflow.

Mirrors examples/Pyrough/BCC_rough.py: a single 200-unit BCC cell with
radius-20 beams exported as self-affine rough wires (Pyrough parameters
eta=0.8, axial cutoff N, angular cutoff M; reference
lattice.py:1966-2143).  Here the statistical surface model is synthesized
dependency-free (random-phase spectral method) by
``io.export.write_stl_rough_wires``.
"""

import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[2]))  # repo root

import struct

from pylatticedso_tpu import build_lattice
from pylatticedso_tpu.io.export import write_stl_cylinders, write_stl_rough_wires

lattice = build_lattice({
    "geometry": {"cell_size": {"x": 200, "y": 200, "z": 200},
                 "number_of_cells": {"x": 1, "y": 1, "z": 1},
                 "radii": [20.0], "geom_types": ["BCC"]}})

out = Path("data/outputs/examples")
out.mkdir(parents=True, exist_ok=True)

write_stl_rough_wires(out / "BCC_rough.stl", lattice,
                      eta=0.8, rms=0.06, n_cut=30, m_cut=8,
                      n_sides=32, n_axial=60, seed=0)
write_stl_cylinders(out / "BCC_smooth.stl", lattice, n_sides=32)

for name in ("BCC_rough.stl", "BCC_smooth.stl"):
    data = (out / name).read_bytes()
    ntri = struct.unpack("<I", data[80:84])[0]
    print(f"{name}: {ntri} triangles, {len(data)} bytes")
