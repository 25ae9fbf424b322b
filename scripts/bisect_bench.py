"""Bisect the bench regression: time the 50^3 descent step with
(a) selfadjoint fast path vs generic value_and_grad, (b) pallas vs gather."""
import os, sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import numpy as np
import jax
import jax.numpy as jnp

N = int(os.environ.get("N", "50"))
os.environ.setdefault("PLDSO_MATVEC", os.environ.get("MV", "pallas"))

from pylatticedso_tpu.parallel.structured import (StructuredLattice,
                                                  make_structured_compliance_step)

sl = StructuredLattice("Octet", (N, N, N), (1.0, 1.0, 1.0), 1013.0, 0.3,
                       dtype=jnp.float32)
fixed = sl.select_nodes(lambda x, y, z: z == 0.0)
top = sl.select_nodes(lambda x, y, z: z == float(N))
free = sl.node_valid & ~fixed
f = np.zeros((sl.nc, 6) + sl.grid, dtype=np.float32)
for c in range(sl.nc):
    f[c, 2][top[c]] = -1.0 / int(top.sum())

mg_opts = {"nu": 2, "coarse_degree": 24, "smooth_frac": 0.25, "power_iters": 5}

def time_step(objective, label):
    step = make_structured_compliance_step(sl, free, f, tol=1e-6,
                                           maxiter=6000, precond="mg",
                                           mg_opts=mg_opts,
                                           objective=objective)
    r0 = jnp.full(sl.num_cells, 0.05, dtype=jnp.float32)
    c, g, u = step(r0)
    jax.block_until_ready((c, g, u))
    t0 = time.time()
    rr = r0 * 1.001
    uu = u
    for _ in range(6):
        c2, g2, uu = step(rr, uu)
        rr = jnp.clip(rr - 1e-4 * g2, 0.01, 0.1)
    jax.block_until_ready((c2, rr))
    dt = (time.time() - t0) / 6
    print(f"{label} [{os.environ['PLDSO_MATVEC']}]: {dt:.3f} s/step "
          f"(c={float(c2):.6e})")
    return dt

time_step(None, "selfadjoint")
time_step(lambda u, f_: jnp.sum(f_ * u), "value_and_grad")
