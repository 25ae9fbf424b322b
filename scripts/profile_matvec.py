"""Profile matvec scatter strategies on the current default device.

Strategies:
  A. flat segment_sum with unsorted per-DOF indices (current)
  B. flat segment_sum with a build-time sort permutation + indices_are_sorted
  C. padded adjacency gather (no scatter: per-node sum over incident edges)

Run:  python scripts/profile_matvec.py [N]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from pylatticedso_tpu import build_lattice
from pylatticedso_tpu.fem.elements import (EdgeGeometry, edge_forces,
                                           edge_strains, section_stiffness)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10
lat = build_lattice({"geometry": {"cell_size": {"x": 1, "y": 1, "z": 1},
                                  "number_of_cells": {"x": N, "y": N, "z": N},
                                  "radii": [0.05], "geom_types": ["Octet"]}})
E = lat.num_edges
n_nodes = lat.num_nodes
print(f"N={N}: {E} edges, {n_nodes} nodes")

nodes = jnp.asarray(lat.nodes, dtype=jnp.float32)
edges_np = lat.edges.astype(np.int32)
edges = jnp.asarray(edges_np)
d = nodes[edges[:, 1]] - nodes[edges[:, 0]]
L = jnp.linalg.norm(d, axis=1)
t = d / L[:, None]
ez = jnp.array([0., 0., 1.], jnp.float32); ex = jnp.array([1., 0., 0.], jnp.float32)
ref = jnp.where((jnp.abs(t @ ez) > 0.99)[:, None], ex, ez)
a1 = jnp.cross(ref, t); a1 = a1 / jnp.linalg.norm(a1, axis=1)[:, None]
a2 = jnp.cross(t, a1)
geom = EdgeGeometry(t=t, a1=a1, a2=a2, L=L)
D = section_stiffness(jnp.asarray(lat.radius, jnp.float32), 1013.0, 0.3).D

n1, n2 = edges[:, 0], edges[:, 1]
dof1 = (edges_np[:, 0][:, None] * 6 + np.arange(6)).reshape(-1)
dof2 = (edges_np[:, 1][:, None] * 6 + np.arange(6)).reshape(-1)
dof_idx_np = np.concatenate([dof1, dof2])
dof_idx = jnp.asarray(dof_idx_np)

perm_np = np.argsort(dof_idx_np, kind="stable")
perm = jnp.asarray(perm_np.astype(np.int32))
dof_sorted = jnp.asarray(dof_idx_np[perm_np])

# adjacency: for each node-DOF, the positions in the flat contrib vector
counts = np.bincount(dof_idx_np, minlength=6 * n_nodes)
max_deg = int(counts.max())
adj = np.zeros((6 * n_nodes, max_deg), dtype=np.int64)
mask = np.zeros((6 * n_nodes, max_deg), dtype=np.float32)
fill = np.zeros(6 * n_nodes, dtype=np.int64)
for pos, dd in enumerate(dof_idx_np):
    adj[dd, fill[dd]] = pos
    mask[dd, fill[dd]] = 1.0
    fill[dd] += 1
adj_j = jnp.asarray(adj.astype(np.int32))
mask_j = jnp.asarray(mask)
print(f"max node-DOF degree: {max_deg}")


def contrib_of(u):
    eps = edge_strains(u[n1, :3], u[n1, 3:], u[n2, :3], u[n2, 3:], geom)
    sig = D * eps
    f_u1, f_m1, f_u2, f_m2 = edge_forces(sig, geom)
    return jnp.concatenate([
        jnp.concatenate([f_u1, f_m1], axis=1).reshape(-1),
        jnp.concatenate([f_u2, f_m2], axis=1).reshape(-1)])


@jax.jit
def mv_segsum(u):
    c = contrib_of(u)
    return jax.ops.segment_sum(c, dof_idx, num_segments=6 * n_nodes)


@jax.jit
def mv_sorted(u):
    c = contrib_of(u)[perm]
    return jax.ops.segment_sum(c, dof_sorted, num_segments=6 * n_nodes,
                               indices_are_sorted=True)


@jax.jit
def mv_gather(u):
    c = contrib_of(u)
    return jnp.sum(c[adj_j] * mask_j, axis=1)


u0 = jnp.asarray(np.random.default_rng(0).normal(size=(n_nodes, 6)),
                 dtype=jnp.float32)
ref_out = None
for name, fn in [("segsum", mv_segsum), ("sorted", mv_sorted),
                 ("gather", mv_gather)]:
    out = fn(u0)
    out.block_until_ready()
    if ref_out is None:
        ref_out = np.asarray(out)
    else:
        err = np.abs(np.asarray(out) - ref_out).max() / np.abs(ref_out).max()
        print(f"  {name} agrees: rel {err:.1e}")
    # chained timing: 30 applications, each dependent on the last
    @jax.jit
    def chain(u, fn=fn):
        def body(_, uu):
            return fn(uu).reshape(n_nodes, 6) * (1.0 - 1e-7)
        return jax.lax.fori_loop(0, 30, body, u)
    c1 = chain(u0); c1.block_until_ready()
    t0 = time.perf_counter()
    c2 = chain(u0 * 1.0001); c2.block_until_ready()
    dt = (time.perf_counter() - t0) / 30
    gbps = (E * (17 * 4 + 12 * 4 + 12 * 4)) / dt / 1e9  # rough traffic estimate
    print(f"{name}: {dt * 1000:.3f} ms per matvec (~{gbps:.1f} GB/s effective)")
