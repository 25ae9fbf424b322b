"""L-beam SLSQP from a feasible uniform start + reference density dataset."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pickle
import numpy as np
import jax.numpy as jnp

from pylatticedso_tpu import build_lattice
from pylatticedso_tpu.opti.ddm_optimizer import DDMOptimizationProblem
from pylatticedso_tpu.opti.density import KrigingDensity

# reference-committed density dataset (interop surface)
ref_ds = pickle.load(open("/root/reference/data/outputs/relative_densities/"
                          "data/RelativeDensities_BCC_Hybrid1_Hybrid4.pkl", "rb"))
keys = np.array(list(ref_ds.keys()))
vals = np.array(list(ref_ds.values()))
print("ref dataset:", keys.shape, "radii range", keys.min(), keys.max())

lattice = build_lattice({
    "geometry": {"cell_size": {"x": 1, "y": 1, "z": 1},
                 "number_of_cells": {"x": 6, "y": 1, "z": 6},
                 "radii": [0.1, 0.1, 0.1],
                 "geom_types": ["BCC", "Hybrid1", "Hybrid4"]},
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

dm = KrigingDensity.fit(ref_ds)
problem = DDMOptimizationProblem(
    lattice, opt_params={"type": "unit_cell"},
    constraints={"relative_density": {"value": 0.3, "mode": "upper"}},
    cg_tol=1e-9, cg_maxiter=2000, grid_step=0.01, penalization=True,
    density_model=dm)

# compare density models at reference trajectory points
import json
ref = json.load(open("/root/reference/data/outputs/optimization_data_files/"
                     "Cantilever_L_beam_optimized_expe.json"))
hist = ref["history"]
for i in [0, 5, 20, 35]:
    x = np.asarray(hist["parameters"][i])
    print(f"it{i}: ref_rho {hist['relative_density'][i]:.4f} "
          f"our_rho(ref-ds) {problem.density(x):.4f}")

# feasible uniform start: rho(u*ones) = 0.3
from scipy.optimize import brentq
f = lambda s: problem.density(np.full(81, s)) - 0.3
s0 = brentq(f, 0.0, 1.0, xtol=1e-6)
print(f"feasible uniform start theta={s0:.4f}")
problem.param.x0 = np.full(81, s0)

t0 = time.time()
result = problem.optimize_slsqp(max_iterations=50, ftol=1e-6)
print(f"online: {time.time()-t0:.1f} s, nit {result.iterations}, "
      f"success {result.success}, msg {result.message}")
print(f"compliance {result.objective:.6e} (ref 4.403e-3), "
      f"rho {result.density:.4f}")
out = Path("data/outputs/optimization_data_files")
problem.save_optimization_json(out / "Cantilever_L_beam_feasible_start.json",
                               result)
