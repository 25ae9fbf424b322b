"""Hybrid (multi-geometry) compliance optimization on the structured path.

Hybrid lattices superpose several geometries per cell, each with its own
per-cell radius (the reference's multi-``geom_types`` build —
data/inputs/preset_lattice/optimization/*hybrid* presets).  The reference
solves these through its general sparse FEM path; here FEM_AUTO routes
them onto the structured stencil operator (union class/edge template with
collision splitting, parallel/structured.py) — the same dense-stencil
kernel that makes the 50^3 single-geometry bench ~1000x faster per CG
iteration than the general gather/scatter graph at scale.

Run: python examples/optimization/hybrid_structured_optimization.py
(CPU x64; a few minutes on the throttled host)
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
from pylatticedso_tpu.opti import optimize_lattice

N = int(os.environ.get("HYB_N", "4"))

lattice = build_lattice({
    "geometry": {"cell_size": {"x": 1, "y": 1, "z": 1},
                 "number_of_cells": {"x": N, "y": N, "z": N},
                 "radii": [0.05, 0.04], "geom_types": ["BCC", "Hybrid1"]},
    "boundary_conditions": {
        "Displacement": {"Fixed": {"Surface": ["Zmin"],
                                   "DOF": ["X", "Y", "Z", "RX", "RY", "RZ"],
                                   "Value": [0, 0, 0, 0, 0, 0]}},
        "Force": {"Load": {"Surface": ["Zmax"], "DOF": ["Z"],
                           "Value": [-0.1]}}},
    "optimization_informations": {
        "simulation_type": "FEM_AUTO",
        "objective_type": "compliance", "objective_function": "min",
        "optimization_parameters": {"type": "unit_cell"},
        "constraints": {"relative_density": {"value": 0.10,
                                             "mode": "upper"}},
        "max_iterations": 12}})
print(f"hybrid {N}^3 BCC+Hybrid1: {lattice.num_cells} cells, "
      f"{lattice.num_edges} beams, {lattice.num_nodes} nodes, "
      f"{2 * lattice.num_cells} design parameters")

t0 = time.time()
problem, result = optimize_lattice(lattice)
dt = time.time() - t0
kind = type(problem).__name__
print(f"routed to {kind}; optimized in {dt:.1f} s, "
      f"{result.iterations} iterations (success {result.success})")
print(f"compliance {result.objective:.6e} at density {result.density:.4f} "
      f"(initial {problem.history[0]['objective']:.6e})" if problem.history
      else f"compliance {result.objective:.6e}")
assert kind == "StructuredOptimizationProblem", kind
