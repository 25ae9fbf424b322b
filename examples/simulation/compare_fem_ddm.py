"""Full-FEM vs DDM cross-check on a cantilever (the reference's accuracy
oracle: examples/simulation/compare_FEM_DDM.py)."""

import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[2]))  # repo root


import time

import numpy as np

from pylatticedso_tpu import build_lattice
from pylatticedso_tpu.ddm.solver import build_ddm_system, solve_ddm
from pylatticedso_tpu.fem import solve_fem

lattice = build_lattice("cantilever_ddm")

t0 = time.time()
fem = solve_fem(lattice, subdivide_h=0.05, penalization=True, tol=1e-12)
print(f"FEM solve: {time.time() - t0:.2f} s, {fem.iterations} CG iterations, "
      f"compliance {fem.compliance:.6e}")

t0 = time.time()
system = build_ddm_system(lattice)
ddm = solve_ddm(lattice, system=system, tol=1e-11)
print(f"DDM solve: {time.time() - t0:.2f} s, {ddm.iterations} CG iterations "
      f"on {int(system.free.sum())} interface DOFs, "
      f"compliance {ddm.compliance:.6e}")

iface = system.interface_nodes
err = np.linalg.norm(ddm.u[iface] - fem.u[iface]) / np.linalg.norm(fem.u[iface])
print(f"Relative error between FEM and DDM: {err:.3e}")
