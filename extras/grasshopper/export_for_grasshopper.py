"""Export a lattice design for the Grasshopper/Dendro pipeline.

Writes <out>/<name>.json consumed by pylatticedso_gh_design.py (parity
with the reference's extras/grasshopper/grasshopper_export_example.py).
"""

import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from pylatticedso_tpu import build_lattice
from pylatticedso_tpu.io.export import save_json_to_grasshopper

lat = build_lattice({
    "geometry": {"cell_size": {"x": 1, "y": 1, "z": 1},
                 "number_of_cells": {"x": 3, "y": 3, "z": 3},
                 "radii": [0.05], "geom_types": ["BCC"]}})
written = save_json_to_grasshopper(
    lat, Path("data/outputs/examples/simple_BCC_gh.json"))
print("wrote", *written)
