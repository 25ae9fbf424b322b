"""A/B the fused-smoother V-cycle (PLDSO_MG_FUSED=force) against the default
MG path on the real TPU at bench scale.

The fused path (stencil_pallas.py apply.fused + multigrid._mg_apply_fused)
replaces every Chebyshev body step with ONE kernel launch, the mid-cycle
residual with one launch, and runs coarse single-program levels' entire
smoother (incl. the degree-24 coarsest sweep, previously ~24 launches +
~50 XLA fusions) in one launch.  Two storage dtypes for the inter-launch
smoother vectors: bf16 (half traffic, extra rounding inside M) and f32.

Usage: N=50 python scripts/mg_fused_ab_tpu.py
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
os.environ.setdefault("PLDSO_MATVEC", "pallas")
os.environ.setdefault("PLDSO_MG_BF16", "1")

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
      f"best of {REPEATS} windows x {K_STEPS} steps", flush=True)

MG = {"nu": (1, 1), "coarse_degree": 24, "smooth_frac": 0.25,
      "power_iters": 5}
c_ref = None


def run(name, env):
    global c_ref
    for k, v in env.items():
        os.environ[k] = v
    try:
        step = make_structured_compliance_step(
            slat, free, f, tol=TOL, maxiter=2000, precond="mg",
            mg_opts=dict(MG))
        t0 = time.time()
        pstate = step.precond_state(r0)
        c, g, u = step(r0, None, pstate)
        jax.block_until_ready((c, g))
        print(f"  [{name}] compile+cold {time.time() - t0:.1f} s, "
              f"compliance {float(c):.9e}", flush=True)
        if c_ref is None:
            c_ref = float(c)
        else:
            rel = abs(float(c) - c_ref) / abs(c_ref)
            print(f"  [{name}] vs first config rel {rel:.2e} "
                  f"(must be ~solver tol)", flush=True)
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
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:1500]}",
              flush=True)
    finally:
        for k in env:
            os.environ.pop(k, None)


run("unfused bf16 nu=(1,1) (default)", {})
run("fused bf16", {"PLDSO_MG_FUSED": "force", "PLDSO_MG_FUSED_DTYPE": "bf16"})
run("fused f32", {"PLDSO_MG_FUSED": "force", "PLDSO_MG_FUSED_DTYPE": "f32"})
print("MG FUSED AB DONE", flush=True)
