"""Debug the L-beam 3-geom SLSQP divergence: evaluate our penalized
surrogate-DDM model along the reference's recorded trajectory and check
gradients at x0."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import json
import numpy as np
import jax.numpy as jnp

from pylatticedso_tpu import build_lattice
from pylatticedso_tpu.opti.ddm_optimizer import DDMOptimizationProblem

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

t0 = time.time()
problem = DDMOptimizationProblem(
    lattice, opt_params={"type": "unit_cell"},
    constraints={"relative_density": {"value": 0.3, "mode": "upper"}},
    cg_tol=1e-9, cg_maxiter=2000, grid_step=0.01, penalization=True)
print(f"offline: {time.time()-t0:.1f} s, RB size {problem._surrogate.basis.shape[1]}")

ref = json.load(open("/root/reference/data/outputs/optimization_data_files/"
                     "Cantilever_L_beam_optimized_expe.json"))
hist = ref["history"]
params = np.asarray(hist["parameters"])      # [36, 81]
ref_obj = np.asarray(hist["objective"])      # [36]
ref_rho = np.asarray(hist["relative_density"])

print("\n it  ref_obj      our_obj      ratio   ref_rho  our_rho")
for i in range(0, len(params), 5):
    x = jnp.asarray(params[i])
    v = float(problem._value_and_grad(x)[0])
    rho = problem.density(params[i])
    ro = ref_obj[i]
    print(f" {i:3d}  {ro:.6e}  {v:.6e}  {v/ro if ro==ro else float('nan'):7.4f}"
          f"  {ref_rho[i]:.4f}  {rho:.4f}")
# final point
xf = jnp.asarray(ref["solution"]["final_parameters"])
v = float(problem._value_and_grad(xf)[0])
print(f"final ref {ref['solution']['final_objective']:.6e} ours {v:.6e}")

# gradient check at x0 (all ones) and at a midpoint
for name, x in [("x0(ones)", np.ones(81)), ("mid(0.5)", 0.5 * np.ones(81)),
                ("it1", params[1])]:
    x = jnp.asarray(x)
    v, g = problem._value_and_grad(x)
    g = np.asarray(g)
    # FD check on 3 random coords
    rng = np.random.default_rng(0)
    idx = rng.choice(81, 3, replace=False)
    errs = []
    for i in idx:
        e = np.zeros(81); e[i] = 1e-5
        vp = float(problem._value_and_grad(jnp.asarray(np.asarray(x)+e))[0])
        vm = float(problem._value_and_grad(jnp.asarray(np.asarray(x)-e))[0])
        fd = (vp - vm) / 2e-5
        errs.append((i, g[i], fd))
    print(f"\n{name}: obj {float(v):.6e} |g| {np.linalg.norm(g):.3e}")
    for i, gi, fd in errs:
        print(f"   g[{i}] = {gi:.6e}  fd = {fd:.6e}  rel {abs(gi-fd)/max(abs(fd),1e-30):.2e}")
    dv, dg = problem._density_vg(x)
    dg = np.asarray(dg)
    print(f"   rho {float(dv):.4f} |drho| {np.linalg.norm(dg):.3e} "
          f"drho[0:4] {dg[:4]}")
