"""Inversion-mechanism optimization — reproduce the reference's committed
experiment records.

Despite the name, the reference's `Inversion_mechanism` experiment
(data/inputs/preset_lattice/optimization/Inversion_mechanism.json) is a
COMPLIANCE minimization: a 10x1x5 hybrid grid (BCC + Hybrid1 + Hybrid4,
150 unit_cell parameters), an X-direction load on the Xmax/Zmax edge, a
Z-symmetry plane at Zmax, full encastre on the Xmin edge of the Xmin cell
column, and an EQUALITY density constraint at 0.30 — solved with
DDM + RBF-surrogate Schur and SLSQP (its records:
data/outputs/optimization_data_files/Inversion_mechanism_{constant,
optimized}_expe.json; reference optimized run: 50 iterations [limit hit,
success=False], 800 s, final compliance 5.537e-4 at rho 0.300006;
constant run: 8 iterations, 2.527e-3).

Offline stage shares the L-beam's cached 3-geometry Schur grid / reduced
basis / RBF artifacts.  `INVMECH_MODE=constant` runs the 1-parameter
variant.

Measured (2026-08-17, this repo, CPU x64 online stage):
* physics parity: our exact model evaluates their committed 150-parameter
  solution at 5.5415e-4 (their record: 5.5371e-4, 0.08%) and their
  constant solution at 2.5263e-3 (their record: 2.5270e-3, 0.03%) — but
  our voxel-exact union density prices those solutions at rho 0.3041 and
  0.3195 respectively, not 0.300 (the same density-model discrepancy
  documented for the L-beam and three-point bending; see
  io/reference_density.py).
* this script (voxel-exact eq constraint at 0.3000): 5.5604e-4 in 98 s
  (success=True; reference: 5.537e-4 under THEIR density, 800 s,
  iteration limit).
* equal-material control (`INVMECH_RHO=0.304082`, the material their
  solution actually uses under our model): **5.5259e-4 — better than
  both their record and their solution re-evaluated under our model**,
  in 213 s (success=True).
* constant mode: with an equality density constraint and one parameter
  the feasible set is a single radius; 2.9199e-3 at voxel-exact
  rho 0.3000 (their 2.527e-3 constant solution uses rho 0.3195 of
  material under our model).
"""

import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[2]))  # repo root

import os
import jax
if os.environ.get("PLDSO_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["PLDSO_PLATFORM"])
jax.config.update("jax_enable_x64", True)

import time

import numpy as np

from pylatticedso_tpu import build_lattice
from pylatticedso_tpu.opti import slsqp_polish
from pylatticedso_tpu.opti.ddm_optimizer import DDMOptimizationProblem

MODE = os.environ.get("INVMECH_MODE", "unit_cell")  # "unit_cell" | "constant"
GRID_STEP = float(os.environ.get("INVMECH_GRID_STEP", "0.01"))
MAXIT = int(os.environ.get("INVMECH_MAXIT", "300"))
# INVMECH_RHO != 0.3 runs an equal-material CONTROL (e.g. 0.304082, the
# material the reference's committed solution actually uses under our
# voxel-exact density) and does not overwrite the standard record.
RHO = float(os.environ.get("INVMECH_RHO", "0.3"))

lattice = build_lattice({
    "geometry": {"cell_size": {"x": 1, "y": 1, "z": 1},
                 "number_of_cells": {"x": 10, "y": 1, "z": 5},
                 "radii": [0.1, 0.1, 0.1],
                 "geom_types": ["BCC", "Hybrid1", "Hybrid4"]},
    "simulation_parameters": {"enable": True, "material": "VeroClear",
                              "periodicity": True},
    "boundary_conditions": {
        "Displacement": {
            "Fixed": {"Surface": ["Xmin", "Zmin"],
                      "DOF": ["X", "Y", "Z", "RX", "RY", "RZ"],
                      "Value": [0, 0, 0, 0, 0, 0],
                      "SurfaceCells": ["Xmin"]},
            "Sym": {"Surface": ["Zmax"], "DOF": ["Z"], "Value": [0]}},
        "Force": {"Load": {"Surface": ["Xmax", "Zmax"], "DOF": ["X"],
                           "Value": [-0.1]}}}})
print(f"inversion mechanism: {lattice.num_cells} cells, "
      f"{lattice.num_edges} beams, {lattice.num_nodes} nodes")

t0 = time.time()
problem = DDMOptimizationProblem(
    lattice,
    opt_params={"type": MODE if MODE == "constant" else "unit_cell"},
    constraints={"relative_density": {"value": RHO, "mode": "eq"}},
    cg_tol=1e-9, cg_maxiter=2000,
    grid_step=GRID_STEP,
    penalization=True,
)
t_offline = time.time() - t0
print(f"offline (Schur grid + RB + RBF): {t_offline:.1f} s; "
      f"{problem.param.n_params} parameters")

t0 = time.time()
if MODE == "constant":
    result = problem.optimize_slsqp(max_iterations=50, ftol=1e-6,
                                    feasible_start=True)
else:
    result = problem.optimize_slsqp(max_iterations=MAXIT, ftol=1e-7,
                                    feasible_start=True, move_limit=0.1)
    result = slsqp_polish(
        problem, result, ftol=1e-6,
        max_iterations=int(os.environ.get("INVMECH_POLISH", "50")),
        max_restarts=int(os.environ.get("INVMECH_RESTARTS", "6")))
t_online = time.time() - t0
print(f"online SLSQP: {t_online:.1f} s, {result.iterations} iterations "
      f"(success {result.success})")
print(f"compliance {result.objective:.6e}, density {result.density:.4f}")
ref = ("2.527e-3 (8 it)" if MODE == "constant"
       else "5.537e-4 at rho 0.3000, 800 s, 50 it (limit)")
print(f"TOTAL {t_offline + t_online:.1f} s (reference {MODE} record: {ref})")

out = Path("data/outputs/optimization_data_files")
out.mkdir(parents=True, exist_ok=True)
if RHO == 0.3:
    name = ("Inversion_mechanism_constant.json" if MODE == "constant"
            else "Inversion_mechanism_optimized.json")
    problem.save_optimization_json(out / name, result)
else:
    print(f"equal-material control (rho {RHO}): record not saved")
