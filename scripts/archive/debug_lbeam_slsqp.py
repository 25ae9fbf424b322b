"""Trace every scipy SLSQP callback/eval on the L-beam problem to find
where the committed run's zigzag came from."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

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
print(f"offline (cached): {time.time()-t0:.1f} s")

from scipy.optimize import Bounds, NonlinearConstraint, minimize
import scipy
print("scipy", scipy.__version__, " x0[0]=", problem.param.x0[0])

vg = problem._value_and_grad
dvg = problem._density_vg
c0 = {}
ncall = [0]

def fun(x):
    v, g = vg(jnp.asarray(x))
    v, g = float(v), np.asarray(g, float)
    if "v" not in c0:
        c0["v"] = abs(v)
    ncall[0] += 1
    print(f"  eval#{ncall[0]:3d} obj {v:.6e} norm {v/c0['v']:.4f} "
          f"x[min,max,mean]=({x.min():.3f},{x.max():.3f},{x.mean():.3f})")
    return v / c0["v"], g / c0["v"]

def cfun(x):
    val = float(dvg(jnp.asarray(x))[0]) - 0.3
    print(f"    cons {val:+.4f}")
    return val

def cjac(x):
    return np.asarray(dvg(jnp.asarray(x))[1], float)

it = [0]
def cb(x):
    it[0] += 1
    print(f"== iter {it[0]} x[min,max,mean]=({x.min():.3f},{x.max():.3f},{x.mean():.3f})")

res = minimize(fun, np.asarray(problem.param.x0, float), jac=True,
               method="SLSQP",
               bounds=Bounds(problem.param.lower, problem.param.upper),
               constraints=[NonlinearConstraint(cfun, -np.inf, 0.0, jac=cjac)],
               callback=cb, options={"maxiter": 50, "ftol": 1e-6})
print(res.status, res.message, "nit", res.nit, "obj", res.fun * c0["v"])
print("final rho", float(dvg(jnp.asarray(res.x))[0]))
