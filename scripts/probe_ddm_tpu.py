"""Probe: warm per-eval cost of the dense mixed-precision DDM interface
solve on the real TPU (VERDICT item 1 timing evidence).

Builds the L-beam DDM problem (offline surrogate from cache, CPU backend),
then times jitted value+grad evals of the online stage on the TPU.
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

from pylatticedso_tpu import build_lattice
from pylatticedso_tpu.opti.ddm_optimizer import DDMOptimizationProblem

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

print("backend:", jax.default_backend(), flush=True)
t0 = time.time()
prob = DDMOptimizationProblem(
    lattice, opt_params={"type": "unit_cell"},
    constraints={"relative_density": {"value": 0.3, "mode": "upper"}},
    cg_tol=1e-9, cg_maxiter=2000, penalization=True)
print(f"problem built (offline cached): {time.time()-t0:.1f} s, "
      f"refined={prob.refined}", flush=True)

x0 = prob.param.x0
t0 = time.time()
v = prob.objective(x0)
print(f"cold eval (compile): {time.time()-t0:.1f} s, obj={v:.6e}", flush=True)

for i in range(3):
    x = np.asarray(x0) * (1.0 - 0.05 * (i + 1))
    t0 = time.time()
    v = prob.objective(x)
    g = prob.gradient(x)
    print(f"warm eval {i}: {time.time()-t0:.3f} s, obj={v:.6e}, "
          f"|g|={np.linalg.norm(g):.3e}", flush=True)
