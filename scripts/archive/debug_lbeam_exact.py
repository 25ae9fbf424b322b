"""Exact (chained-condensation DDM) vs surrogate compliance along the last
L-beam run's iterates."""
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
from pylatticedso_tpu.fem.solve import pcg

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
mat = problem.material


def exact_compliance(cr):
    """Interface solve with EXACT penalized Schur blocks."""
    S = jnp.asarray(schur_penalized_batch(lattice, cr, mat.young_modulus,
                                          mat.poisson_ratio))
    free, fap, u_imp = problem._iface_free, problem._iface_f, problem._iface_u_imp
    bn, N, m = problem._cell_bnodes, problem._n_nodes, problem._m

    def K(u):
        Ub = u[bn].reshape(-1, m)
        R = jnp.einsum("cij,cj->ci", S, Ub)
        return jax.ops.segment_sum(R.reshape(-1, 6), bn.reshape(-1),
                                   num_segments=N)

    def A(u):
        return free * K(free * u) + (1.0 - free) * u

    diag_blocks = jnp.einsum("cii->ci", S).reshape(-1, problem._nb, 6)
    diag = jax.ops.segment_sum(diag_blocks.reshape(-1, 6), bn.reshape(-1),
                               num_segments=N)
    diag = free * diag + (1.0 - free)
    diag = jnp.where(diag == 0, 1.0, diag)
    b = free * (fap - K(u_imp)) + (1.0 - free) * u_imp
    out = pcg(A, b, M=lambda r: r / diag, maxiter=4000, tol=1e-10)
    u = free * out.x + (1.0 - free) * u_imp
    return float(jnp.sum(fap * u)), int(out.iterations), bool(out.converged)


rec = json.load(open("data/outputs/optimization_data_files/"
                     "Cantilever_L_beam_optimized.json"))
for h in rec["history"]:
    x = jnp.asarray(h["parameters"])
    cr = np.asarray(problem.param.cell_radii(x))
    v_sur = float(problem._value_and_grad(x)[0])
    v_ex, iters, conv = exact_compliance(cr)
    print(f"it{h['iteration']:3d} recorded {h['objective']:+.4e} "
          f"surrogate {v_sur:+.4e} exact {v_ex:+.4e} "
          f"(cg {iters}{'' if conv else ' NOCONV'}) "
          f"r(min,max)=({cr.min():.4f},{cr.max():.4f})")
