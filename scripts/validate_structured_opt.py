"""Validate StructuredOptimizationProblem vs OptimizationProblem (CPU)."""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

from pylatticedso_tpu import build_lattice
from pylatticedso_tpu.opti.optimizer import OptimizationProblem
from pylatticedso_tpu.opti.structured_optimizer import StructuredOptimizationProblem

cfg = {
    "geometry": {"cell_size": {"x": 1, "y": 1, "z": 1},
                 "number_of_cells": {"x": 3, "y": 2, "z": 2},
                 "radii": [0.05], "geom_types": ["Octet"]},
    "boundary_conditions": {
        "Displacement": {"Fixed": {"Surface": ["Xmin"],
                                   "DOF": ["X", "Y", "Z", "RX", "RY", "RZ"],
                                   "Value": [0, 0, 0, 0, 0, 0]}},
        "Force": {"Load": {"Surface": ["Xmax"], "DOF": ["Z"],
                           "Value": [-0.1]}}},
}
lat = build_lattice(cfg)
opt_params = {"type": "unit_cell"}
constraints = {"relative_density": {"value": 0.10, "mode": "upper"}}

up = OptimizationProblem(lat, opt_params=opt_params, constraints=constraints)
sp = StructuredOptimizationProblem(lat, opt_params=opt_params,
                                   constraints=constraints)

x0 = np.asarray(sp.param.x0) * 0.9 + 0.03
vs, gs = sp._value_and_grad(jnp.asarray(x0))
vu, gu = up._value_and_grad(jnp.asarray(x0))
vs, gs, vu, gu = float(vs), np.asarray(gs), float(vu), np.asarray(gu)
print(f"structured obj: {vs:.12e}  unstructured: {vu:.12e}  "
      f"rel {abs(vs - vu) / abs(vu):.3e}")
gerr = np.linalg.norm(gs - gu) / np.linalg.norm(gu)
print(f"grad rel err: {gerr:.3e}")

res = sp.optimize_slsqp(max_iterations=6)
print("slsqp on structured path: obj", res.objective, "density", res.density,
      "iters", res.iterations)
assert abs(vs - vu) / abs(vu) < 1e-7 and gerr < 1e-5
print("OK")
