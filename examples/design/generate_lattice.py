"""Build a lattice from a preset config, print stats, export viz + interop files."""

import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[2]))  # repo root


from pathlib import Path

from pylatticedso_tpu import build_lattice
from pylatticedso_tpu.io.export import (export_simulation_vtu,
                                        save_json_to_grasshopper,
                                        write_stl_cylinders)
from pylatticedso_tpu.plotting import plot_radius_distribution, visualize_lattice
from pylatticedso_tpu.utils.timing import timing

out = Path("data/outputs/examples")
out.mkdir(parents=True, exist_ok=True)

with timing.phase("build", category="design"):
    lattice = build_lattice({
        "geometry": {"cell_size": {"x": 1, "y": 1, "z": 1},
                     "number_of_cells": {"x": 4, "y": 4, "z": 4},
                     "radii": [0.06, 0.05], "geom_types": ["BCC", "Hybrid1"]},
        "gradient": {"radii": {"rule": "linear", "direction_z": True,
                               "parameter_z": 0.15}}})

lattice.print_statistics_lattice()
print(f"relative density: {lattice.get_relative_density():.4f}")

with timing.phase("export", category="io"):
    export_simulation_vtu(out / "lattice.vtu", lattice)
    save_json_to_grasshopper(lattice, out / "lattice_gh.json")
    write_stl_cylinders(out / "lattice.stl", lattice)
    visualize_lattice(lattice, beam_color_type="radii", save_path=out / "lattice.png")
    plot_radius_distribution(lattice, save_path=out / "radii.png")

timing.summary()
print(f"outputs in {out}/")
