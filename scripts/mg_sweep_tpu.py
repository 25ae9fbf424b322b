"""Sweep MG V-cycle variants on the real TPU for the bench hot loop.

The committed profile (data/outputs/tpu_queue/profile_step.log) puts the
50^3 CG iteration at 11.5 ms: matvec 1.13 + V-cycle 9.89.  The V-cycle
is ~6 fine-level matvecs (2 pre + residual + 3 post at nu=2) plus
coarse-level work, so the levers are the per-level smoothing schedule
(``nu`` may be a per-level tuple — multigrid.mg_apply), the bf16-I/O
smoother kernel, and the coarse Chebyshev degree.

Measures the BENCH quantity itself: a warm-started solve+adjoint descent
step (make_structured_compliance_step, frozen precond state), K steps
per window, best of R windows — exactly bench.py's protocol on the exact
bench problem, one line per variant.  (An earlier draft drove pcg
directly with an eagerly-built precond state; eager per-op dispatch
through the tunnel hung — use the jitted step harness.)

Usage: N=50 python scripts/mg_sweep_tpu.py
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
print(f"{GEOM} {N}^3, {6 * slat.n_nodes} DOF, tol {TOL}; "
      f"bench protocol: best of {REPEATS} windows x {K_STEPS} steps",
      flush=True)


def run(name, mg_opts, env=None):
    env = env or {}
    old = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
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
    finally:
        for k, v in old.items():
            (os.environ.pop(k, None) if v is None
             else os.environ.__setitem__(k, v))


BASE = {"coarse_degree": 24, "smooth_frac": 0.25, "power_iters": 5}
run("nu=2 deg24 (bench default)", dict(BASE, nu=2))
run("nu=(1,2) deg24", dict(BASE, nu=(1, 2)))
run("nu=(1,3) deg24", dict(BASE, nu=(1, 3)))
run("nu=(1,2,3) deg24", dict(BASE, nu=(1, 2, 3)))
run("nu=(2,3) deg24", dict(BASE, nu=(2, 3)))
run("nu=(1,2) deg32", dict(BASE, nu=(1, 2), coarse_degree=32))
run("nu=(1,2) deg16", dict(BASE, nu=(1, 2), coarse_degree=16))
run("nu=(1,2) frac0.15", dict(BASE, nu=(1, 2), smooth_frac=0.15))
run("nu=(1,2) frac0.35", dict(BASE, nu=(1, 2), smooth_frac=0.35))
run("nu=2 bf16 smoother", dict(BASE, nu=2), env={"PLDSO_MG_BF16": "1"})
run("nu=(1,2) bf16 smoother", dict(BASE, nu=(1, 2)),
    env={"PLDSO_MG_BF16": "1"})
print("MG SWEEP DONE", flush=True)
