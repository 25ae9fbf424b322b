"""Sweep MG V-cycle variants on the real TPU for the bench hot loop.

The committed profile (data/outputs/tpu_queue/profile_step.log) puts the
50^3 CG iteration at 11.5 ms: matvec 1.13 + V-cycle 9.89.  The V-cycle
is ~6 fine-level matvecs (2 pre + residual + 3 post at nu=2) plus
coarse-level work, so the levers are the per-level smoothing schedule
(``nu`` may now be a per-level tuple — multigrid.mg_apply), the bf16-I/O
smoother kernel, and the coarse Chebyshev degree.  This script times a
full PCG solve (tol 1e-6, from zero) for each variant: wall time AND
iteration count, so schedule-vs-convergence trades are visible.

Usage: N=50 python scripts/mg_sweep_tpu.py
Output: one line per variant "name: <s> s, <iters> iters, <ms>/iter".
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
os.environ.setdefault("PLDSO_MATVEC", "pallas")

import numpy as np
import jax
import jax.numpy as jnp

from pylatticedso_tpu.parallel.structured import StructuredLattice
from pylatticedso_tpu.parallel import multigrid as mg
from pylatticedso_tpu.fem.solve import pcg

N = int(os.environ.get("N", "50"))
GEOM = os.environ.get("GEOM", "Octet")
TOL = float(os.environ.get("TOL", "1e-6"))

slat = StructuredLattice(GEOM, (N, N, N), (1.0, 1.0, 1.0), 1013.0, 0.3,
                         dtype=jnp.float32)
fixed = slat.select_nodes(lambda x, y, z: z == 0.0)
top = slat.select_nodes(lambda x, y, z: z == float(N))
free_n = slat.node_valid & ~fixed
f = np.zeros((slat.nc, 6) + slat.grid, np.float32)
n_top = int(top.sum())
for c in range(slat.nc):
    f[c, 2][top[c]] = -1.0 / n_top

free = jnp.asarray(np.broadcast_to(free_n[:, None], f.shape), jnp.float32)
fj = jnp.asarray(f)
matvec, _ = slat.make_matvec()
r = jnp.full((N, N, N), 0.05, jnp.float32)
h = mg.build_mg_hierarchy(slat, free_n)
print(f"{GEOM} {N}^3, {6 * slat.n_nodes} DOF, tol {TOL}; levels "
      f"{[l.slat.grid for l in h['levels']]}", flush=True)

aux = matvec.prepare(r)
A = lambda u: free * matvec.apply(free * u, aux) + (1.0 - free) * u
b = free * fj
state = mg.mg_precond_state(h, r, power_iters=5)


def run(name, **kw):
    try:
        M = mg.mg_apply(h, state, **kw)
        sol = jax.jit(lambda bb: pcg(A, bb, M=M, maxiter=400, tol=TOL))
        res = sol(b)
        jax.block_until_ready(res.x)            # compile + warm
        t0 = time.time()
        res = sol(b * 1.0000001)                # distinct dispatch
        jax.block_until_ready(res.x)
        dt = time.time() - t0
        it = int(res.iterations)
        print(f"{name}: {dt:.3f} s, {it} iters, "
              f"{1e3 * dt / max(it, 1):.2f} ms/iter, "
              f"converged={bool(res.converged)}", flush=True)
    except Exception as e:  # noqa: BLE001 - sweep survives compile failures
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:500]}",
              flush=True)


run("nu=2 deg24 (bench default)", nu=2, coarse_degree=24, smooth_frac=0.25)
run("nu=(1,2) deg24", nu=(1, 2), coarse_degree=24, smooth_frac=0.25)
run("nu=(1,3) deg24", nu=(1, 3), coarse_degree=24, smooth_frac=0.25)
run("nu=(1,2,3) deg24", nu=(1, 2, 3), coarse_degree=24, smooth_frac=0.25)
run("nu=(2,3) deg24", nu=(2, 3), coarse_degree=24, smooth_frac=0.25)
run("nu=(1,2) deg32", nu=(1, 2), coarse_degree=32, smooth_frac=0.25)
run("nu=(1,2) deg16", nu=(1, 2), coarse_degree=16, smooth_frac=0.25)
run("nu=(1,2) frac0.15", nu=(1, 2), coarse_degree=24, smooth_frac=0.15)
run("nu=(1,2) frac0.35", nu=(1, 2), coarse_degree=24, smooth_frac=0.35)
run("nu=2 bf16 smoother", nu=2, coarse_degree=24, smooth_frac=0.25,
    lo_smoother=True)
run("nu=(1,2) bf16 smoother", nu=(1, 2), coarse_degree=24,
    smooth_frac=0.25, lo_smoother=True)
print("MG SWEEP DONE", flush=True)
