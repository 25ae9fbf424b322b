"""Second MG sweep: bf16-smoother COMBINED with the other winning knobs.

mg_sweep_tpu.py (data/outputs/tpu_queue/mg_sweep.log) varied one knob at
a time against an f32 smoother baseline; the two independent winners were
the per-level schedule nu=(1,2) (0.0686 vs 0.0846) and the bf16-I/O
smoother kernel (0.0611 with nu=(1,2)).  This sweep holds PLDSO_MG_BF16=1
and explores the remaining neighborhood: shallower fine smoothing
(nu=(1,1), flat nu=1), smooth_frac 0.35 (won marginally in f32), coarse
degree 16, and a deg32 control.

Usage: N=50 python scripts/mg_sweep2_tpu.py
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
os.environ.setdefault("PLDSO_MATVEC", "pallas")
os.environ["PLDSO_MG_BF16"] = "1"

import numpy as np
import jax
import jax.numpy as jnp

from pylatticedso_tpu.parallel.structured import (
    StructuredLattice, make_structured_compliance_step)

N = int(os.environ.get("N", "50"))
GEOM = os.environ.get("GEOM", "Octet")
TOL = float(os.environ.get("TOL", "1e-6"))
K_STEPS = int(os.environ.get("K", "8"))
REPEATS = int(os.environ.get("R", "2"))

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
print(f"{GEOM} {N}^3, {6 * slat.n_nodes} DOF, tol {TOL}, bf16 smoother; "
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
    except Exception as e:  # noqa: BLE001 - sweep survives compile failures
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:500]}",
              flush=True)


BASE = {"coarse_degree": 24, "smooth_frac": 0.25, "power_iters": 5}
run("bf16 nu=(1,2) (current default)", dict(BASE, nu=(1, 2)))
run("bf16 nu=(1,1)", dict(BASE, nu=(1, 1)))
run("bf16 nu=1", dict(BASE, nu=1))
run("bf16 nu=(1,2) frac0.35", dict(BASE, nu=(1, 2), smooth_frac=0.35))
run("bf16 nu=(1,2) deg16", dict(BASE, nu=(1, 2), coarse_degree=16))
run("bf16 nu=(1,2) deg32", dict(BASE, nu=(1, 2), coarse_degree=32))
run("bf16 nu=(1,1) frac0.35", dict(BASE, nu=(1, 1), smooth_frac=0.35))
print("MG SWEEP2 DONE", flush=True)
