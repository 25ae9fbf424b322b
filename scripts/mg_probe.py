"""Compare PCG iteration counts: Jacobi vs geometric MG preconditioner."""
import os
import sys
import time

import jax
if os.environ.get("MG_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from pylatticedso_tpu.parallel.structured import StructuredLattice
from pylatticedso_tpu.parallel.multigrid import (build_mg_hierarchy,
                                                 mg_preconditioner)
from pylatticedso_tpu.fem.solve import pcg

n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
tol = float(os.environ.get("MG_TOL", "1e-6"))
dt = jnp.float32
sl = StructuredLattice("Octet", (n, n, n), (1.0, 1.0, 1.0), 1013.0, 0.3,
                       dtype=dt)
zmax = float(n)
fixed = sl.select_nodes(lambda x, y, z: z == 0.0)
top = sl.select_nodes(lambda x, y, z: z == zmax)
free_n = sl.node_valid & ~fixed
free = jnp.asarray(np.broadcast_to(free_n[:, None], (sl.nc, 6) + sl.grid), dt)
f = np.zeros((sl.nc, 6) + sl.grid, dtype=np.float32)
n_top = int(top.sum())
for c in range(sl.nc):
    f[c, 2][top[c]] = -1.0 / n_top
f = jnp.asarray(f, dt)

matvec, diag_fn = sl.make_matvec()
r0 = jnp.full(sl.num_cells, 0.05, dtype=dt)


def A(u):
    return free * matvec(free * u, r0) + (1.0 - free) * u


b = free * f
dg = free * diag_fn(r0) + (1.0 - free)
dg = jnp.where(dg == 0, 1.0, dg)

t0 = time.time()
res_j = pcg(A, b, M=lambda r: r / dg, maxiter=4000, tol=tol)
jax.block_until_ready(res_j.x)
tj = time.time() - t0
print(f"jacobi: iters={int(res_j.iterations)} res={float(res_j.residual_norm):.3e} "
      f"conv={bool(res_j.converged)} wall={tj:.2f}s")

h = build_mg_hierarchy(sl, free_n)
print("levels:", [lv.slat.num_cells for lv in h["levels"]])
nu = int(os.environ.get("MG_NU", "2"))
cd = int(os.environ.get("MG_COARSE", "24"))
frac = float(os.environ.get("MG_FRAC", "0.25"))
M = mg_preconditioner(h, r0, nu=nu, coarse_degree=cd, smooth_frac=frac)

t0 = time.time()
res_m = pcg(A, b, M=M, maxiter=1000, tol=tol)
jax.block_until_ready(res_m.x)
tm = time.time() - t0
print(f"mg(nu={nu},cd={cd},frac={frac}): iters={int(res_m.iterations)} "
      f"res={float(res_m.residual_norm):.3e} conv={bool(res_m.converged)} "
      f"wall={tm:.2f}s")
err = jnp.linalg.norm((res_m.x - res_j.x).ravel()) / jnp.linalg.norm(res_j.x.ravel())
print(f"solution rel diff: {float(err):.3e}")
