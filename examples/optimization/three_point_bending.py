"""Three-point bending optimization — the reference's second benchmark pair.

Reference records (data/outputs/optimization_data_files/):
* ``Three_point_bending_constant_expe.json`` — 1 parameter (constant
  radius), 8 iterations, 31.9 s, compliance 4.229e-3 at rho 0.150.
* ``Three_point_bending_optimized_expe.json`` — 250 cells x 3 geometries
  = 750 parameters, 100 iterations (cap), **6418 s**, compliance
  1.107e-3 at rho 0.150.

Both start from radii 0.05 (x0 = 0.4444 normalized) with the 10x5x5
BCC/Hybrid1/Hybrid4 hybrid lattice.  The offline Schur surrogate is the
same penalized 3-geometry grid as the Cantilever L-beam (cached on
disk), so this script's cost is the online stage only.

Measured (2026-08-16, this repo, CPU x64 online stage):
* initial compliance 2.8829e-3 vs their normalization_reference 2.8956e-3
  (0.4%); our exact model at their final parameters: 4.210e-3 (constant)
  and 1.1035e-3 (750p) vs their 4.229e-3 / 1.1066e-3 — 0.3-0.5% parity.
* constant: 4.808e-3 at rho 0.150 (their solution prices at rho 0.1588
  under our voxel-exact density — the same ~4% density-model offset as
  the L-beam).
* 750p: 1.1181e-3 at rho 0.1500 after a 100-iteration continuation
  (2065 s total vs their 6418 s); equal-material control at rho 0.1556:
  1.0430e-3 — 5.8% BETTER than the reference record.
"""

import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[2]))  # repo root

# f64 semantics: native x64 on CPU, mixed-precision refined solve on TPU
# (see cantilever_L_beam.py).  PLDSO_PLATFORM=cpu pins to the host.
import os as _os
import jax
if _os.environ.get("PLDSO_PLATFORM"):
    jax.config.update("jax_platforms", _os.environ["PLDSO_PLATFORM"])
jax.config.update("jax_enable_x64", True)

import json
import os
import time

import numpy as np

from pylatticedso_tpu import build_lattice
from pylatticedso_tpu.opti.ddm_optimizer import DDMOptimizationProblem

MODE = os.environ.get("TPB_MODE", "unit_cell")      # "constant" | "unit_cell"
MAXIT = int(os.environ.get("TPB_MAXIT", "100"))

lattice = build_lattice({
    "geometry": {"cell_size": {"x": 1, "y": 1, "z": 1},
                 "number_of_cells": {"x": 10, "y": 5, "z": 5},
                 "radii": [0.05, 0.05, 0.05],
                 "geom_types": ["BCC", "Hybrid1", "Hybrid4"]},
    "simulation_parameters": {"enable": True, "material": "VeroClear",
                              "periodicity": True},
    "boundary_conditions": {
        "Displacement": {
            "Fixed": {"Surface": ["Xmax"], "DOF": ["X"], "Value": [0]},
            "SimpleSupport": {"Surface": ["Xmin", "Zmin"],
                              "DOF": ["Y", "Z"], "Value": [0, 0],
                              "SurfaceCells": ["Xmax", "Zmin"]}},
        "Force": {"Load": {"Surface": ["Xmax", "Zmax"], "DOF": ["Z"],
                           "Value": [-0.1]}}}})
print(f"three-point bending: {lattice.num_cells} cells, "
      f"{lattice.num_edges} beams, {lattice.num_nodes} nodes")

t0 = time.time()
problem = DDMOptimizationProblem(
    lattice,
    opt_params=({"type": "constant"} if MODE == "constant"
                else {"type": "unit_cell"}),
    constraints={"relative_density": {"value": 0.15, "mode": "upper"}},
    cg_tol=1e-9, cg_maxiter=2000, grid_step=0.01, penalization=True)
t_offline = time.time() - t0
print(f"offline (cached surrogate + DDM assembly): {t_offline:.1f} s; "
      f"{problem.param.n_params} parameters")

# reference x0: radii 0.05 -> theta 0.4444
problem.param.x0 = np.full(problem.param.n_params, (0.05 - 0.01) / 0.09)
v0 = float(problem._value_and_grad(np.asarray(problem.param.x0))[0])
print(f"initial compliance {v0:.6e} (reference normalization_reference "
      f"2.8956e-3), initial rho {problem.density(problem.param.x0):.4f} "
      f"(reference 0.18839)")

t0 = time.time()
if MODE == "constant":
    result = problem.optimize_slsqp(max_iterations=MAXIT, ftol=1e-6,
                                    feasible_start=True)
else:
    result = problem.optimize_slsqp(max_iterations=MAXIT, ftol=1e-7,
                                    feasible_start=True, move_limit=0.1)
    from pylatticedso_tpu.opti import slsqp_polish
    result = slsqp_polish(
        problem, result, ftol=1e-6,
        max_iterations=int(os.environ.get("TPB_POLISH", "50")),
        max_restarts=int(os.environ.get("TPB_RESTARTS", "4")))
t_online = time.time() - t0
print(f"online SLSQP: {t_online:.1f} s, {result.iterations} iterations "
      f"(success {result.success})")
print(f"compliance {result.objective:.6e}, density {result.density:.4f}")
ref = ("4.229e-3 / 31.9 s" if MODE == "constant" else "1.107e-3 / 6418 s")
print(f"TOTAL {t_offline + t_online:.1f} s (reference {MODE} record: {ref})")

out = Path("data/outputs/optimization_data_files")
out.mkdir(parents=True, exist_ok=True)
name = ("Three_point_bending_constant.json" if MODE == "constant"
        else "Three_point_bending_optimized.json")
problem.save_optimization_json(out / name, result)
