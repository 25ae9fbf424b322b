"""Inverse-mechanism design: maximize -(u_out * u_in) (displacement_ratio).

Mirrors the reference's Inversion_mechanism experiment: a loaded input
surface and an output surface whose displacement should oppose it; the
objective -(u_out . u_in) is differentiated through the solve via the
adjoint that `lax.custom_linear_solve` provides automatically (the
reference builds q = dJ/du and solves S lambda = q by hand,
lattice_opti.py:1487-1648).
"""

import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[2]))  # repo root

from pylatticedso_tpu import build_lattice
from pylatticedso_tpu.opti.optimizer import OptimizationProblem

lattice = build_lattice({
    "geometry": {"cell_size": {"x": 1, "y": 1, "z": 1},
                 "number_of_cells": {"x": 3, "y": 1, "z": 3},
                 "radii": [0.05], "geom_types": ["BCC"]},
    "simulation_parameters": {"enable": True, "material": "VeroClear"},
    "boundary_conditions": {
        "Displacement": {"Fixed": {"Surface": ["Zmin"],
                                   "DOF": ["X", "Y", "Z", "RX", "RY", "RZ"],
                                   "Value": [0, 0, 0, 0, 0, 0]}},
        "Force": {"Load": {"Surface": ["Xmin", "Zmax"], "DOF": ["X"],
                           "Value": [0.05]}}}})

problem = OptimizationProblem(
    lattice,
    objective_type="displacement_ratio", objective_function="min",
    objective_data={"Surface": ["Xmax", "Zmax"], "DOF": ["X"]},
    opt_params={"type": "unit_cell"},
    # equality keeps the material budget fixed — an upper bound degenerates
    # to the all-thin maximum-flexibility design
    constraints={"relative_density": {"value": 0.05, "mode": "eq"}},
    cg_tol=1e-11, cg_maxiter=4000,
)
print(f"{problem.param.n_params} parameters; initial objective "
      f"{problem.objective(problem.param.x0):.4e}")
result = problem.optimize_slsqp(max_iterations=20)
print(f"final objective {result.objective:.4e}, density {result.density:.4f}, "
      f"{result.iterations} iterations")
print("radii field:\n", result.radii.reshape(-1).round(4))
