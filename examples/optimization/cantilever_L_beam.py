"""Cantilever L-beam optimization — the reference's headline experiment.

Reference record (data/outputs/optimization_data_files/
Cantilever_L_beam_optimized_expe.json): 27-cell hybrid L-beam, per-cell
radii, DDM + RBF surrogate + SLSQP, 35 iterations in 325 s wall, final
compliance 4.4029e-3 at rho 0.300.  Here the offline stage is batched
exact condensation + greedy RB + RBF, and every online iteration is one
differentiable jnp program.

Measured (2026-08-17, this repo, online stage ON THE TPU — mixed-precision
refined interface CG, f64 interface data):
* this script: success=True, compliance 4.5345e-3 at rho 0.3000, 287 s
  total (19 s offline from cache; 268 s online on the tunneled v5e).
* CPU-x64 control with the same drive: 4.5417e-3, 251 s — the TPU run
  matches the physics to ~1e-11 per evaluation and here finds the
  slightly better KKT point.
* our exact model evaluates the reference's final parameters at 4.405e-3
  but our voxel-exact union density assigns them rho 0.3061 (their
  runtime density model is not reproducible from their committed
  artifacts; its committed 3-geometry dataset disagrees with its own
  record's density log).  At the equal material budget (constraint
  0.3061) this pipeline reaches 4.383e-3 — BETTER than the record.
"""

import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[2]))  # repo root

# The penalized tol-1e-9 interface CG needs f64 SEMANTICS (a plain f32 CG
# stalls at the roundoff floor and SLSQP sees noise).  On CPU that is
# native x64, like the reference's PETSc.  On TPU the online stage runs
# the mixed-precision refined solve — f32 CG iterations + emulated-f64
# residual refinement (fem.solve.linear_solve_refined), auto-enabled by
# DDMOptimizationProblem — matching the CPU-x64 objective/gradient to
# ~1e-12 relative; the offline stage always runs on the CPU backend.
# PLDSO_PLATFORM=cpu pins everything to the host.
import os
import jax
if os.environ.get("PLDSO_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["PLDSO_PLATFORM"])
jax.config.update("jax_enable_x64", True)

import json
import time

import numpy as np

from pylatticedso_tpu import build_lattice
from pylatticedso_tpu.opti.ddm_optimizer import DDMOptimizationProblem

GRID_STEP = float(os.environ.get("LBEAM_GRID_STEP", "0.01"))
# reference expe: 3 geometries, 27 cells -> 81 parameters
N_GEOM = int(os.environ.get("LBEAM_N_GEOM", "3"))
GEOMS = ["BCC", "Hybrid1", "Hybrid4"][:N_GEOM]

lattice = build_lattice({
    "geometry": {"cell_size": {"x": 1, "y": 1, "z": 1},
                 "number_of_cells": {"x": 6, "y": 1, "z": 6},
                 "radii": [0.1] * N_GEOM, "geom_types": GEOMS},
    "supplementary": {"erased_blocks": {"block_0": {
        "start_point": {"x": 3.0, "y": 0.0, "z": 3.0},
        "dimensions_block": {"x": 3.0, "y": 1.0, "z": 3.0}}}},
    "simulation_parameters": {"enable": True, "material": "VeroClear",
                              "periodicity": True},
    "boundary_conditions": {
        "Force": {"Load": {"Surface": ["Xmax", "Zmin"], "DOF": ["Z"],
                           "Value": [-0.1]}},
        "Displacement": {"Encastre": {"Surface": ["Zmax"],
                                      "DOF": ["X", "Y", "Z", "RX", "RY", "RZ"],
                                      "Value": [0, 0, 0, 0, 0, 0]}}}})
print(f"L-beam: {lattice.num_cells} cells, {lattice.num_edges} beams, "
      f"{lattice.num_nodes} nodes")

t0 = time.time()
problem = DDMOptimizationProblem(
    lattice,
    opt_params={"type": "unit_cell"},
    constraints={"relative_density": {"value": 0.3, "mode": "upper"}},
    cg_tol=1e-9, cg_maxiter=2000,
    grid_step=GRID_STEP,
    # the reference's datasets re-penalize the cell per radius sample
    # (reset_cell_with_new_radii -> set_penalized_beams), so its records
    # include joint stiffening; match that model.
    penalization=True,
)
t_offline = time.time() - t0
print(f"offline (Schur grid + RB + RBF): {t_offline:.1f} s; "
      f"{problem.param.n_params} parameters, "
      f"RB size {problem._surrogate.basis.shape[1]}")

t0 = time.time()
# reference expe optimizer settings: SLSQP, ftol 1e-6.  Two phases:
# feasible_start projects x0 onto the density surface and move_limit
# trust-bounds each step (scipy >= 1.16's C SLSQP otherwise accepts an
# unbounded first QP step from the reference's infeasible start and
# wanders through surrogate-invalid corners — see optimize_slsqp); a free
# SLSQP polish from the move-limited optimum then converges to KKT.
# run the move-limited phase to CONVERGENCE (not an iteration cap): a cap
# hands the free polish a mid-line-search state where platform roundoff
# (1e-9-level TPU vs CPU differences) forks the basin choice; a converged
# phase-1 point is a stable hand-off.
MAXIT = int(os.environ.get("LBEAM_MAXIT", "300"))
result = problem.optimize_slsqp(max_iterations=MAXIT, ftol=1e-7,
                                feasible_start=True, move_limit=0.1)
# restart-until-stationary polish: a single free SLSQP run can declare
# success ~1% early at a roundoff-level line-search fork (observed on
# TPU); restarts from a true KKT point cost one extra iteration.
from pylatticedso_tpu.opti import slsqp_polish
result = slsqp_polish(problem, result, max_iterations=50, ftol=1e-6)
t_online = time.time() - t0
print(f"online SLSQP: {t_online:.1f} s, {result.iterations} iterations "
      f"(success {result.success})")
print(f"compliance {result.objective:.6e}, density {result.density:.4f}")
print(f"TOTAL {t_offline + t_online:.1f} s (reference record: 325 s, "
      f"35 iterations, compliance 4.403e-3, rho 0.300)")

out = Path("data/outputs/optimization_data_files")
out.mkdir(parents=True, exist_ok=True)
problem.save_optimization_json(out / "Cantilever_L_beam_optimized.json", result)
