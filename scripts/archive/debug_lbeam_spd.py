"""Check SPD-ness and accuracy of the RBF Schur surrogate at the L-beam
run's unstable iterates."""
import sys, json
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

from pylatticedso_tpu import build_lattice
from pylatticedso_tpu.opti.ddm_optimizer import DDMOptimizationProblem
from pylatticedso_tpu.ddm.schur import schur_penalized_batch

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
problem = DDMOptimizationProblem(
    lattice, opt_params={"type": "unit_cell"},
    constraints={"relative_density": {"value": 0.3, "mode": "upper"}},
    cg_tol=1e-9, cg_maxiter=2000, grid_step=0.01, penalization=True)

rec = json.load(open("data/outputs/optimization_data_files/"
                     "Cantilever_L_beam_optimized.json"))
mat = problem.material
for it in [1, 3, 11, 12]:
    h = rec["history"][it]
    x = jnp.asarray(h["parameters"])
    cr = np.asarray(problem.param.cell_radii(x))          # [C,G]
    S_sur = np.asarray(problem._cell_schur_batch(jnp.asarray(cr)))
    lam_sur = np.array([np.linalg.eigvalsh(S) for S in S_sur])
    # exact penalized S at the 27 triples
    S_ex = schur_penalized_batch(lattice, cr, mat.young_modulus,
                                 mat.poisson_ratio)
    lam_ex = np.array([np.linalg.eigvalsh(S) for S in S_ex])
    rel = np.linalg.norm(S_sur - S_ex) / np.linalg.norm(S_ex)
    print(f"it{it}: obj {h['objective']:+.3e}  "
          f"min eig surrogate {lam_sur.min():+.3e}  exact {lam_ex.min():+.3e}"
          f"  relerr {rel:.2e}  r(min,max)=({cr.min():.4f},{cr.max():.4f})")
    v = float(problem._value_and_grad(x)[0])
    print(f"      surrogate objective re-eval {v:+.6e}")
