"""Coarse-heavy MG schedules under the fused-smoother V-cycle.

Follow-up to mg_fused_sweep_tpu.py: with the fused kernel, each extra
smoothing pass on a COARSE level is one near-free Pallas launch, so a
coarse-heavy schedule (nu=(1,2,3), deeper coarse Chebyshev) might buy CG
iterations at ~zero wall cost.  Fine-level cost is untouched (nu[0]=1).

Usage: N=50 python scripts/mg_fused_sweep2_tpu.py
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
os.environ.setdefault("PLDSO_MATVEC", "pallas")
os.environ["PLDSO_MG_FUSED"] = "force"
os.environ.setdefault("PLDSO_MG_FUSED_DTYPE", "bf16")

import numpy as np
import jax
import jax.numpy as jnp

from pylatticedso_tpu.parallel.structured import (
    StructuredLattice, make_structured_compliance_step)

N = int(os.environ.get("N", "50"))
GEOM = os.environ.get("GEOM", "Octet")
TOL = float(os.environ.get("TOL", "1e-6"))
K_STEPS = int(os.environ.get("K", "8"))
REPEATS = int(os.environ.get("R", "3"))

slat = StructuredLattice(GEOM, (N, N, N), (1.0, 1.0, 1.0), 1013.0, 0.3,
                         dtype=jnp.float32)
fixed = slat.select_nodes(lambda x, y, z: z == 0.0)
top = slat.select_nodes(lambda x, y, z: z == float(N))
free = slat.node_valid & ~fixed
f = np.zeros((slat.nc, 6) + slat.grid, np.float32)
n_top = int(top.sum())
for c in range(slat.nc):
    f[c, 2][top[c]] = -1.0 / n_top
r0 = jnp.full((N, N, N), 0.05, jnp.float32)
print(f"{GEOM} {N}^3, {6 * slat.n_nodes} DOF, tol {TOL}, FUSED bf16; "
      f"best of {REPEATS} windows x {K_STEPS} steps", flush=True)


def run(name, mg_opts):
    try:
        step = make_structured_compliance_step(
            slat, free, f, tol=TOL, maxiter=2000, precond="mg",
            mg_opts=mg_opts)
        t0 = time.time()
        pstate = step.precond_state(r0)
        c, g, u = step(r0, None, pstate)
        jax.block_until_ready((c, g))
        print(f"  [{name}] compile+cold {time.time() - t0:.1f} s",
              flush=True)
        lr = 1e-4
        windows = []
        for rep in range(REPEATS):
            rr = r0 * (1.0 + 1e-3 * (rep + 1))
            uu = u
            t1 = time.time()
            for _ in range(K_STEPS):
                cc, gg, uu = step(rr, uu, pstate)
                rr = jnp.clip(rr - lr * gg, 0.01, 0.1)
            jax.block_until_ready((cc, rr))
            windows.append(time.time() - t1)
        sec = min(windows) / K_STEPS
        print(f"{name}: {sec:.4f} s/step  (windows "
              f"{[round(w, 2) for w in windows]})", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:1200]}",
              flush=True)


BASE = {"nu": (1, 2), "coarse_degree": 24, "smooth_frac": 0.35,
        "power_iters": 5}
run("ref nu=(1,2) deg24 frac.35", dict(BASE))
run("nu=(1,2,3)", dict(BASE, nu=(1, 2, 3)))
run("nu=(1,3)", dict(BASE, nu=(1, 3)))
run("deg48", dict(BASE, coarse_degree=48))
run("nu=(1,2,3) deg48", dict(BASE, nu=(1, 2, 3), coarse_degree=48))
run("ref repeat", dict(BASE))

# 2026-08-21 attempt (data/outputs/tpu_queue/mg_fused_sweep2_coarseheavy.attempt.log):
# the sweep process MISSED the persistent compile cache (ref config
# compile+cold 501.9 s despite bench.py having just run the identical
# program), and the first warm-start step(rr, uu, pstate) call triggered a
# SECOND long compile (warm-start None vs array are different programs) —
# >12 min for one config; cut for time.  Lesson: pay ONE cold call with the
# warm-start signature (step(r0, u0, pstate)) before timing, and expect the
# tunnel cache to re-key sweeps.
