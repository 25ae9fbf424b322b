"""Round 2 of the fused-smoother A/B: in-kernel bfloat16 arithmetic.

The fused kernels are VPU-bound; if the v5e VPU packs 2x bf16 lanes,
PLDSO_MG_FUSED_COMPUTE=bf16 halves the smoother's dominant cost.  The
preconditioner is any fixed operator, so bf16-grade M only matters via
CG iteration counts — the converged compliance must agree to solver tol.

Usage: N=50 python scripts/mg_fused_ab2_tpu.py
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
print(f"{GEOM} {N}^3, {6 * slat.n_nodes} DOF, tol {TOL}, fused bf16-IO; "
      f"best of {REPEATS} windows x {K_STEPS} steps", flush=True)

MG = {"nu": (1, 1), "coarse_degree": 24, "smooth_frac": 0.25,
      "power_iters": 5}
c_ref = None


def run(name, env, mg=None):
    global c_ref
    for k, v in env.items():
        os.environ[k] = v
    try:
        step = make_structured_compliance_step(
            slat, free, f, tol=TOL, maxiter=2000, precond="mg",
            mg_opts=dict(mg or MG))
        t0 = time.time()
        pstate = step.precond_state(r0)
        c, g, u = step(r0, None, pstate)
        jax.block_until_ready((c, g))
        print(f"  [{name}] compile+cold {time.time() - t0:.1f} s, "
              f"compliance {float(c):.9e}", flush=True)
        if c_ref is None:
            c_ref = float(c)
        else:
            print(f"  [{name}] vs first config rel "
                  f"{abs(float(c) - c_ref) / abs(c_ref):.2e}", flush=True)
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
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:1500]}",
              flush=True)
    finally:
        for k in env:
            os.environ.pop(k, None)


run("fused f32-compute (ref)", {})
run("fused bf16-compute", {"PLDSO_MG_FUSED_COMPUTE": "bf16"})
run("fused bf16-compute frac.35",
    {"PLDSO_MG_FUSED_COMPUTE": "bf16"}, dict(MG, smooth_frac=0.35))
run("fused f32-compute (repeat)", {})
print("MG FUSED AB2 DONE", flush=True)
