"""Surrogate-DDM solve: reduced-basis Schur reconstruction inside the
interface CG.

Mirrors examples/simulation/domain_decomposition_surrogate_example.py of the
reference (simulation_DDM_surrogate preset, RBF Schur): offline greedy RB
over a radius grid, online solve where every cell's Schur matrix comes from
the surrogate, compared against the exact condensation.
"""

import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[2]))  # repo root


import json
import os
import time
from itertools import product
from pathlib import Path

import numpy as np

from pylatticedso_tpu import MatProperties, build_lattice
from pylatticedso_tpu.ddm.schur import discretize_cell, schur_batch
from pylatticedso_tpu.ddm.solver import build_ddm_system, solve_ddm
from pylatticedso_tpu.ddm.surrogate import (SchurSurrogate,
                                            reduce_basis_greedy)

cfg = json.loads(Path("data/inputs/preset_lattice/simulation/"
                      "simulation_DDM_surrogate.json").read_text())
if os.environ.get("DDM_EXAMPLE_SMALL", "1") == "1":
    cfg["geometry"]["number_of_cells"] = {"x": 4, "y": 1, "z": 1}
    cfg["geometry"]["radii"] = [0.086, 0.065]           # 2 geometries
    cfg["geometry"]["geom_types"] = ["BCC", "Hybrid1"]

lattice = build_lattice(cfg)
mat = MatProperties(lattice.config.material_name())
print(f"{lattice.num_cells} cells, {lattice.num_edges} beams")

# ---------------------------------------------------------------- offline
t0 = time.time()
disc = discretize_cell(lattice, cell_index=0, penalization=False,
                       periodicity=True)
grid = np.round(np.arange(0.02, 0.11, 0.02), 3)
combos = np.array(list(product(grid, repeat=lattice.config.n_geom)))
S_all = np.asarray(schur_batch(disc, combos, mat.young_modulus,
                               mat.poisson_ratio))
schur_dict = {tuple(c): S for c, S in zip(combos, S_all)}
basis, alpha, elements = reduce_basis_greedy(schur_dict, tol=1e-6)
surrogate = SchurSurrogate(basis=basis, alpha=alpha,
                           samples=np.asarray(elements), kind="RBF")
print(f"offline: {len(combos)} Schur samples -> RB size {basis.shape[1]} "
      f"({time.time() - t0:.1f} s)")

# ---------------------------------------------------------------- online
t0 = time.time()
sys_sur = build_ddm_system(lattice, mat, penalization=False,
                           schur_provider=surrogate.reconstruct)
res_sur = solve_ddm(lattice, mat, system=sys_sur, tol=1e-10)
print(f"surrogate DDM: {time.time() - t0:.2f} s, {res_sur.iterations} CG "
      f"iterations, compliance {res_sur.compliance:.6e}")

res_exact = solve_ddm(lattice, mat, penalization=False, tol=1e-10)
err = (np.linalg.norm(res_sur.u - res_exact.u)
       / np.linalg.norm(res_exact.u))
print(f"exact DDM:     compliance {res_exact.compliance:.6e}")
print(f"relative displacement error surrogate vs exact: {err:.3e}")
