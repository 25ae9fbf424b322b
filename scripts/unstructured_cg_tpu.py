"""Time the unstructured matrix-free CG iteration on the real TPU.

VERDICT item: the general-graph path (hybrids/graded/trimmed lattices,
reference lattice_sim.py:1180-1252 per-cell loop) was ~90 ms/CG-iter at
3M edges, bottlenecked on the two column scatter-adds.  The ELL
(fixed-degree) gather-sum assembly (parallel/sharding.py:assemble_out)
replaces them with dmax column gathers.  This script measures both forms
at bench scale.

Usage: N=50 CHUNK=256 python scripts/unstructured_cg_tpu.py [ell|scatter]
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

FORM = (sys.argv[1] if len(sys.argv) > 1 else "ell").lower()
if FORM == "scatter":
    os.environ["PLDSO_UNSTRUCTURED_SCATTER"] = "1"
N = int(os.environ.get("N", "50"))
CHUNK = int(os.environ.get("CHUNK", "256"))

import numpy as np
import jax
import jax.numpy as jnp

from pylatticedso_tpu import build_lattice
from pylatticedso_tpu.fem.bc import apply_boundary_conditions
from pylatticedso_tpu.parallel.sharding import (
    ShardedLattice, make_compliance_step, make_mesh, pad_edges)

lat = build_lattice({
    "geometry": {"cell_size": {"x": 1, "y": 1, "z": 1},
                 "number_of_cells": {"x": N, "y": N, "z": N},
                 "radii": [0.05], "geom_types": ["Octet"]},
    "boundary_conditions": {
        "Displacement": {"Fixed": {"Surface": ["Zmin"],
                                   "DOF": ["X", "Y", "Z", "RX", "RY", "RZ"],
                                   "Value": [0, 0, 0, 0, 0, 0]}},
        "Force": {"Load": {"Surface": ["Zmax"], "DOF": ["Z"],
                           "Value": [-1.0]}}}})
bc = apply_boundary_conditions(lat)
mesh = make_mesh(n_shard=1, n_dp=1)
shl = ShardedLattice(mesh, lat.nodes, lat.edges, 1013.0, 0.3,
                     dtype=jnp.float32)
step = make_compliance_step(shl, ~bc.fixed, bc.f_applied)
E = lat.num_edges
print(f"{FORM}: N={N}, {E} edges, {6 * shl.n_nodes} DOF "
      f"on {jax.devices()[0].platform}", flush=True)

radius = shl.radius_padded(np.full(E, 0.05, np.float32))

# one warm-up chunk (compile + converge-state setup), then timed chunks.
# This is a per-iteration timing probe, not a converged solve — accept the
# unconverged field (on_fail="warn") instead of the default raise.
t0 = time.time()
c, g, u, iters = step.chunked(radius, chunk=CHUNK, max_chunks=1,
                              on_fail="warn")
print(f"warmup (compile + {CHUNK} iters): {time.time() - t0:.1f} s",
      flush=True)

t0 = time.time()
c, g, u, iters = step.chunked(radius, u0=u, chunk=CHUNK, max_chunks=2,
                              on_fail="warn")
dt = time.time() - t0
print(f"{iters} warm CG iters in {dt:.2f} s -> "
      f"{1e3 * dt / iters:.2f} ms/iter (target <= 30 ms at 3M edges)")
print(f"compliance {float(c):.6e}")
