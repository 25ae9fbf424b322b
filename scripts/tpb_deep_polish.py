"""Three-point-bending deep polish with per-restart checkpointing.

VERDICT r2 item 4: the committed Three_point_bending_optimized.json
(1.118e-3) was produced by old code; HEAD's move-limited phase-1
converges to a worse local optimum (1.2747e-3) whose free polish was
still descending after 100 iterations.  This driver runs the prescribed
deep polish (phase-1 100 move-limited iters, then up to TPB_RESTARTS
free 100-iter polishes) but SAVES the best feasible record after phase 1
and after EVERY polish restart, so a wall-clock kill still leaves the
best-so-far on disk.  CPU-x64 job (the DDM surrogate chain is
CPU-pinned — see CLAUDE.md); do not co-run with other CPU work.

Usage:  PLDSO_PLATFORM=cpu python scripts/tpb_deep_polish.py
Env:    TPB_MAXIT (100), TPB_POLISH (100), TPB_RESTARTS (12)
"""

import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import os as _os
import jax
jax.config.update("jax_platforms", _os.environ.get("PLDSO_PLATFORM", "cpu"))
jax.config.update("jax_enable_x64", True)

import os
import time

import numpy as np

from pylatticedso_tpu import build_lattice
from pylatticedso_tpu.opti import _better_result
from pylatticedso_tpu.opti.ddm_optimizer import DDMOptimizationProblem

MAXIT = int(os.environ.get("TPB_MAXIT", "100"))
POLISH = int(os.environ.get("TPB_POLISH", "100"))
RESTARTS = int(os.environ.get("TPB_RESTARTS", "12"))
OUT = Path("data/outputs/optimization_data_files")
OUT.mkdir(parents=True, exist_ok=True)
RECORD = OUT / "Three_point_bending_optimized.json"

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
      f"{lattice.num_edges} beams, {lattice.num_nodes} nodes", flush=True)

t0 = time.time()
problem = DDMOptimizationProblem(
    lattice, opt_params={"type": "unit_cell"},
    constraints={"relative_density": {"value": 0.15, "mode": "upper"}},
    cg_tol=1e-9, cg_maxiter=2000, grid_step=0.01, penalization=True)
print(f"offline: {time.time() - t0:.1f} s; {problem.param.n_params} params",
      flush=True)

problem.param.x0 = np.full(problem.param.n_params, (0.05 - 0.01) / 0.09)

t0 = time.time()
best = problem.optimize_slsqp(max_iterations=MAXIT, ftol=1e-7,
                              feasible_start=True, move_limit=0.1)
print(f"[{time.time() - t0:7.1f}s] phase-1: {best.objective:.6e} "
      f"rho {best.density:.4f} iters {best.iterations}", flush=True)
problem.save_optimization_json(RECORD, best)

saved_x0 = problem.param.x0
try:
    for k in range(RESTARTS):
        problem.param.x0 = np.asarray(best.theta)
        nxt = problem.optimize_slsqp(max_iterations=POLISH, ftol=1e-6)
        cand = _better_result(best, nxt, problem.constraints or {})
        improved = (cand is nxt) and (
            best.objective - nxt.objective
            > 10.0 * 1e-6 * max(abs(best.objective), 1e-30))
        best = cand
        problem.save_optimization_json(RECORD, best)
        print(f"[{time.time() - t0:7.1f}s] polish {k + 1}/{RESTARTS}: "
              f"{nxt.objective:.6e} rho {nxt.density:.4f} "
              f"-> best {best.objective:.6e} (improved={improved})",
              flush=True)
        if not improved:
            break
finally:
    problem.param.x0 = saved_x0

print(f"DONE total {time.time() - t0:.1f} s; best {best.objective:.6e} "
      f"rho {best.density:.4f} (reference 1.107e-3 / 6418 s)", flush=True)
