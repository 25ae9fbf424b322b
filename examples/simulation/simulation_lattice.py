"""Full-scale FEM simulation of a beam in flexion, with Paraview export.

Mirrors examples/simulation/simulation_lattice.py of the reference:
LatticeSim on the beam-flexion preset -> solve_FEM_FenicsX -> matplotlib
deformed view -> VTU export.  Here the same preset drives the matrix-free
JAX FEM path (solve_fem) and the host-side VTU writer.
"""

import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[2]))  # repo root


import time
from pathlib import Path

import numpy as np

from pylatticedso_tpu import build_lattice
from pylatticedso_tpu.fem.bc import apply_boundary_conditions
from pylatticedso_tpu.fem.statics import solve_fem
from pylatticedso_tpu.io.export import export_simulation_vtu
from pylatticedso_tpu.plotting import visualize_lattice

out = Path("data/outputs/examples")
out.mkdir(parents=True, exist_ok=True)

lattice = build_lattice("simulation/beam_flexion")
print(f"{lattice.num_cells} cells, {lattice.num_edges} beams, "
      f"{lattice.num_dof} DOF")

t0 = time.time()
res = solve_fem(lattice)
print(f"FEM solve: {time.time() - t0:.2f} s, compliance {res.compliance:.6e}")
umax = np.abs(np.asarray(res.u)[:, :3]).max()
print(f"max |displacement| = {umax:.6e}")

bc = apply_boundary_conditions(lattice)
visualize_lattice(lattice, beam_color_type="radii", deformed_form=True,
                  result=res, enable_boundary_conditions=True, bc=bc,
                  save_path=out / "beam_flexion_deformed.png")
export_simulation_vtu(out / "beam_flexion.vtu", lattice, result=res)
print(f"wrote {out / 'beam_flexion_deformed.png'} and "
      f"{out / 'beam_flexion.vtu'}")
