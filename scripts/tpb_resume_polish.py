"""Resume the three-point-bending deep polish from the committed record.

Unlike scripts/tpb_deep_polish.py (which re-runs the move-limited phase-1
and transiently overwrites the record with its — worse — result), this
driver loads the committed Three_point_bending_optimized.json, seeds the
polish from its theta, and runs free 100-iter SLSQP polishes until one
fails to improve.  The record on disk is only ever REPLACED by a strictly
better feasible result, so a wall-clock kill is always safe.

CPU-x64 job (the DDM surrogate chain is CPU-pinned — see CLAUDE.md);
do not co-run with other heavy CPU work.

Usage:  python scripts/tpb_resume_polish.py
Env:    TPB_POLISH (100), TPB_RESTARTS (12)
"""

import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import os as _os
import jax
jax.config.update("jax_platforms", _os.environ.get("PLDSO_PLATFORM", "cpu"))
jax.config.update("jax_enable_x64", True)

import json
import os
import time

import numpy as np

from pylatticedso_tpu import build_lattice
from pylatticedso_tpu.opti import _better_result
from pylatticedso_tpu.opti.ddm_optimizer import DDMOptimizationProblem
from pylatticedso_tpu.opti.optimizer import OptimizationResult

POLISH = int(os.environ.get("TPB_POLISH", "100"))
RESTARTS = int(os.environ.get("TPB_RESTARTS", "12"))
OUT = Path("data/outputs/optimization_data_files")
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

rec = json.loads(RECORD.read_text())
sol = rec["solution"]
theta0 = np.asarray(sol["parameters"], dtype=float)
assert theta0.shape == (problem.param.n_params,), theta0.shape
best = OptimizationResult(
    theta=theta0, radii=np.asarray(problem.param.cell_radii(theta0)),
    objective=float(sol["objective"]), density=float(sol["relative_density"]),
    iterations=int(sol["iterations"]), success=bool(sol["success"]),
    history=rec.get("history", []))
print(f"resuming from record: {best.objective:.6e} rho {best.density:.4f}",
      flush=True)

saved_x0 = problem.param.x0
t0 = time.time()
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
