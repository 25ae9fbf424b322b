"""Measure unstructured matvec scatter variants on TPU.

The hot cost of the general-graph path is segment_sum over UNSORTED node
ids (XLA lowers to serialized scatter-add).  Variant: statically pre-sort
the 12E contribution slots by destination DOF id, gather contributions
through the permutation, and call segment_sum with sorted ids.
"""
import os, sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import numpy as np
import jax
import jax.numpy as jnp

N = int(os.environ.get("N", "30"))

from pylatticedso_tpu import build_lattice
from pylatticedso_tpu.fem.bc import apply_boundary_conditions
from pylatticedso_tpu.parallel.sharding import ShardedLattice, make_mesh

lat = build_lattice({
    "geometry": {"cell_size": {"x": 1, "y": 1, "z": 1},
                 "number_of_cells": {"x": N, "y": N, "z": N},
                 "radii": [0.05], "geom_types": ["Octet"]},
    "boundary_conditions": {
        "Displacement": {"Fixed": {"Surface": ["Zmin"],
                                   "DOF": ["X", "Y", "Z", "RX", "RY", "RZ"],
                                   "Value": [0, 0, 0, 0, 0, 0]}},
        "Force": {"Load": {"Surface": ["Zmax"], "DOF": ["Z"], "Value": [-1.0]}}}})
mesh = make_mesh(n_shard=1, n_dp=1)
shl = ShardedLattice(mesh, lat.nodes, lat.edges, 1013.0, 0.3,
                     dtype=jnp.float32)
E = int(shl.L.shape[0])
n_dof = 6 * shl.n_nodes
print(f"N={N}: {E} edges (padded), {n_dof} DOF")

e_np = np.asarray(shl.edges)
gather_np = np.concatenate([
    (e_np[0][None, :] * 6 + np.arange(3)[:, None]),
    (e_np[0][None, :] * 6 + np.arange(3, 6)[:, None]),
    (e_np[1][None, :] * 6 + np.arange(3)[:, None]),
    (e_np[1][None, :] * 6 + np.arange(3, 6)[:, None]),
]).astype(np.int32).reshape(-1)
ids = jnp.asarray(gather_np)
perm_np = np.argsort(gather_np, kind="stable").astype(np.int32)
perm = jnp.asarray(perm_np)
ids_sorted = jnp.asarray(gather_np[perm_np])

rng = np.random.default_rng(0)
contrib = jnp.asarray(rng.standard_normal(12 * E), jnp.float32)


def timeit(label, fn, *args):
    g = jax.jit(fn)
    jax.block_until_ready(g(*args))
    t0 = time.time()
    for _ in range(3):
        out = g(*args)
    jax.block_until_ready(out)
    print(f"  {label:<28s} {(time.time()-t0)/3*1e3:9.3f} ms")
    return out


def chain(body, k=20):
    def f(c):
        def step(c, _):
            out = body(c)
            # feed a slice back so the loop can't be collapsed
            return c * 0.999 + out[ids].astype(c.dtype) * 1e-9, None
        return jax.lax.scan(step, c, None, length=k)[0]
    return f

y0 = timeit("unsorted segment_sum", chain(
    lambda c: jax.ops.segment_sum(c, ids, num_segments=n_dof)), contrib)
y1 = timeit("sorted (perm + segment_sum)", chain(
    lambda c: jax.ops.segment_sum(c[perm], ids_sorted, num_segments=n_dof,
                                  indices_are_sorted=True)), contrib)
a = jax.ops.segment_sum(contrib, ids, num_segments=n_dof)
b = jax.ops.segment_sum(contrib[perm], ids_sorted, num_segments=n_dof,
                        indices_are_sorted=True)
print("  parity:", float(jnp.max(jnp.abs(a - b))))
