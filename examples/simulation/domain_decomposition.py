"""Domain-decomposition solve on the three-point-bending preset.

Mirrors examples/simulation/domain_decomposition_example.py of the
reference: build LatticeSim from a preset, solve_DDM, visualize the deformed
lattice with boundary conditions.  Here: build_lattice + solve_ddm (per-cell
Schur condensation -> batched interface PCG) + visualize_lattice.

Set DDM_EXAMPLE_SMALL=0 to run the full 10x5x5 preset (minutes on a slow
host; the default shrinks to 4x2x2 for a quick smoke run).
"""

import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[2]))  # repo root


import json
import os
import time
from pathlib import Path

from pylatticedso_tpu import build_lattice
from pylatticedso_tpu.ddm.solver import solve_ddm
from pylatticedso_tpu.fem.bc import apply_boundary_conditions
from pylatticedso_tpu.plotting import visualize_lattice

out = Path("data/outputs/examples")
out.mkdir(parents=True, exist_ok=True)

cfg = json.loads(Path("data/inputs/preset_lattice/simulation/"
                      "Three_point_bending.json").read_text())
if os.environ.get("DDM_EXAMPLE_SMALL", "1") == "1":
    cfg["geometry"]["number_of_cells"] = {"x": 4, "y": 2, "z": 2}
# exact Schur for the online solve (the preset's nearest_neighbor surrogate
# needs a committed dataset; see domain_decomposition_surrogate.py)
cfg["simulation_parameters"]["DDM"]["schur_complement_computation"] = {
    "type": "exact"}

lattice = build_lattice(cfg)
print(f"{lattice.num_cells} cells, {lattice.num_edges} beams, "
      f"{lattice.num_dof} DOF")

t0 = time.time()
res = solve_ddm(lattice, tol=1e-10)
print(f"DDM solve: {time.time() - t0:.2f} s, {res.iterations} interface CG "
      f"iterations, residual {res.residual:.3e}")
print(f"compliance {res.compliance:.6e}")

bc = apply_boundary_conditions(lattice)
visualize_lattice(lattice, beam_color_type="radii", deformed_form=True,
                  result=res, enable_boundary_conditions=True, bc=bc,
                  save_path=out / "ddm_three_point_bending.png")
print(f"wrote {out / 'ddm_three_point_bending.png'}")
