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
from pylatticedso_tpu.config import load_config
from pylatticedso_tpu.io.export import (write_stl_cylinders,
                                        write_stl_rough_wires_pyrough)

# the reference's Pyrough preset pair: the lattice config and the Pyrough
# parameter file (data/inputs/preset_lattice/Pyrough/{BCC_cell,
# lattice_wire}.json)
lattice = build_lattice(load_config("Pyrough/BCC_cell.json"))

out = Path("data/outputs/examples")
out.mkdir(parents=True, exist_ok=True)

kw = write_stl_rough_wires_pyrough(
    out / "BCC_rough.stl", lattice,
    "data/inputs/preset_lattice/Pyrough/lattice_wire.json",
    seed=0,
    # full Pyrough fidelity (N=300 axial modes on 40 rings) needs finer
    # sampling than the demo budget; cap the surface mesh here
    n_axial=60, n_sides=32, n_cut=30, m_cut=8)
print("resolved Pyrough params:", kw)
write_stl_cylinders(out / "BCC_smooth.stl", lattice, n_sides=32)

for name in ("BCC_rough.stl", "BCC_smooth.stl"):
    data = (out / name).read_bytes()
    ntri = struct.unpack("<I", data[80:84])[0]
    print(f"{name}: {ntri} triangles, {len(data)} bytes")
