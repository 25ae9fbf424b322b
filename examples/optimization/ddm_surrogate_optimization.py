"""Flagship workflow: per-cell compliance optimization on the surrogate DDM.

Offline: exact Schur dataset over the radius grid -> greedy reduced basis ->
TPS-RBF alpha(mu).  Online: every SLSQP iteration is one differentiable jnp
program (RBF -> batched S reconstruction -> interface CG -> adjoint),
replacing the reference's 26-minute hand-gradient loop."""

import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[2]))  # repo root


import time
from pathlib import Path

from pylatticedso_tpu import build_lattice
from pylatticedso_tpu.opti.ddm_optimizer import DDMOptimizationProblem
from pylatticedso_tpu.plotting import plot_convergence

out = Path("data/outputs/optimization_data_files")
out.mkdir(parents=True, exist_ok=True)

lattice = build_lattice({
    "geometry": {"cell_size": {"x": 1, "y": 1, "z": 1},
                 "number_of_cells": {"x": 3, "y": 3, "z": 1},
                 "radii": [0.05], "geom_types": ["BCC"]},
    "simulation_parameters": {"enable": True, "material": "VeroClear"},
    "boundary_conditions": {
        "Displacement": {"Fixed": {"Surface": ["Xmin"],
                                   "DOF": ["X", "Y", "Z", "RX", "RY", "RZ"],
                                   "Value": [0, 0, 0, 0, 0, 0]}},
        "Force": {"Load": {"Surface": ["Xmax"], "DOF": ["Z"],
                           "Value": [-0.3]}}}})

t0 = time.time()
problem = DDMOptimizationProblem(
    lattice,
    opt_params={"type": "unit_cell"},
    constraints={"relative_density": {"value": 0.06, "mode": "upper"}},
    cg_tol=1e-10, cg_maxiter=3000,
)
print(f"offline stage (Schur dataset + RB + RBF): {time.time() - t0:.1f} s; "
      f"basis size {problem._surrogate.basis.shape[1]}")

t0 = time.time()
result = problem.optimize_slsqp(max_iterations=25)
print(f"online optimization: {time.time() - t0:.1f} s, "
      f"{result.iterations} SLSQP iterations")
print(f"compliance {result.objective:.6e}, density {result.density:.4f}")

problem.save_optimization_json(out / "ddm_surrogate_opt.json", result)
plot_convergence(result.history, save_path=out / "ddm_surrogate_convergence.png")
