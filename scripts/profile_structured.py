"""Profile the structured stencil path on the current default device.

Reports: per-matvec wall time, V-cycle wall time, CG iterations to tol for
jacobi vs mg preconditioning.  Run:  python scripts/profile_structured.py [N]
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from pylatticedso_tpu.parallel.structured import StructuredLattice
from pylatticedso_tpu.parallel.multigrid import (build_mg_hierarchy,
                                                 mg_preconditioner)
from pylatticedso_tpu.fem.solve import pcg

N = int(sys.argv[1]) if len(sys.argv) > 1 else 50
TOL = float(os.environ.get("PROF_TOL", "1e-6"))
dt = jnp.float32
sl = StructuredLattice("Octet", (N, N, N), (1.0, 1.0, 1.0), 1013.0, 0.3,
                       dtype=dt)
print(f"N={N}: {sl.n_nodes} nodes ({6 * sl.n_nodes} DOF), {sl.n_edges} beams, "
      f"{sl.nc} node classes, {len(sl.edges)} template edges, "
      f"device {jax.devices()[0].platform}")

fixed = sl.select_nodes(lambda x, y, z: z == 0.0)
top = sl.select_nodes(lambda x, y, z: z == float(N))
free_n = sl.node_valid & ~fixed
free = jnp.asarray(np.broadcast_to(free_n[:, None], (sl.nc, 6) + sl.grid), dt)
f = np.zeros((sl.nc, 6) + sl.grid, dtype=np.float32)
for c in range(sl.nc):
    f[c, 2][np.asarray(top[c])] = -1.0 / max(int(top.sum()), 1)
f = jnp.asarray(f)

matvec, diag_fn = sl.make_matvec()
r0 = jnp.full(sl.num_cells, 0.05, dtype=dt)


def A(u):
    return free * matvec(free * u, r0) + (1.0 - free) * u


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps


mv_j = jax.jit(lambda u: A(u))
u_test = jnp.asarray(np.random.default_rng(0).standard_normal(f.shape),
                     dtype=dt)
# chain matvecs so the ~1 s tunnel round-trip amortizes
chain = jax.jit(lambda u: jax.lax.fori_loop(0, 20, lambda _, x: A(x) / 100.0, u))
t_chain = timeit(chain, u_test, reps=3)
print(f"matvec: {t_chain / 20 * 1000:.2f} ms (20-chain)")

dg = free * diag_fn(r0) + (1.0 - free)
dg = jnp.where(dg == 0, 1.0, dg)
b = free * f

t0 = time.time()
res_j = pcg(A, b, M=lambda r: r / dg, maxiter=4000, tol=TOL)
jax.block_until_ready(res_j.x)
print(f"jacobi PCG: {int(res_j.iterations)} iters, {time.time() - t0:.2f} s "
      f"(incl. compile), res {float(res_j.residual_norm):.2e}")

h = build_mg_hierarchy(sl, free_n)
print("mg levels:", [lv.slat.num_cells for lv in h["levels"]])
nu = int(os.environ.get("PROF_NU", "2"))
cd = int(os.environ.get("PROF_COARSE", "24"))
fr = float(os.environ.get("PROF_FRAC", "0.25"))
pw = int(os.environ.get("PROF_POWER", "5"))
M = mg_preconditioner(h, r0, nu=nu, coarse_degree=cd, smooth_frac=fr,
                      power_iters=pw)
vchain = jax.jit(lambda u: jax.lax.fori_loop(0, 5, lambda _, x: M(x) / 10.0, u))
t_v = timeit(vchain, u_test, reps=3)
print(f"V-cycle(nu={nu},cd={cd}): {t_v / 5 * 1000:.2f} ms (5-chain)")

t0 = time.time()
res_m = pcg(A, b, M=M, maxiter=400, tol=TOL)
jax.block_until_ready(res_m.x)
print(f"mg PCG: {int(res_m.iterations)} iters, {time.time() - t0:.2f} s "
      f"(incl. compile), res {float(res_m.residual_norm):.2e}")
err = jnp.linalg.norm((res_m.x - res_j.x).ravel()) / jnp.linalg.norm(res_j.x.ravel())
print(f"solution rel diff jacobi vs mg: {float(err):.2e}")
