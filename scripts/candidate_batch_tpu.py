"""BASELINE eval config 5: vmapped batch of design candidates on TPU.

Runs step.batch (vmap of value_and_grad over candidate radius fields)
through the structured path — with PLDSO_MATVEC=pallas this exercises
vmap-through-pallas_call on real hardware.

Usage: N=20 B=64 python scripts/candidate_batch_tpu.py
"""
import os, sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import numpy as np
import jax
import jax.numpy as jnp

N = int(os.environ.get("N", "20"))
B = int(os.environ.get("B", "64"))
os.environ.setdefault("PLDSO_MATVEC", "pallas")

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

step = make_structured_compliance_step(sl, free, f, tol=1e-6, maxiter=2000,
                                       precond="jacobi")
rng = np.random.default_rng(0)
batch = jnp.asarray(0.03 + 0.05 * rng.random((B, N, N, N)), jnp.float32)

t0 = time.time()
c, g = step.batch(batch)
jax.block_until_ready((c, g))
t_cold = time.time() - t0
t0 = time.time()
c, g = step.batch(batch * 1.001)
jax.block_until_ready((c, g))
t_warm = time.time() - t0
print(f"{B} candidates, {N}^3 [{os.environ['PLDSO_MATVEC']}]: "
      f"cold {t_cold:.1f} s, warm {t_warm:.2f} s "
      f"({t_warm/B*1e3:.1f} ms/candidate)")

# single-candidate cross-check
c0, _, _ = step(batch[0] * 1.001)
err = abs(float(c[0]) - float(c0)) / abs(float(c0))
print(f"batch[0] vs single: rel {err:.2e}")
assert err < 1e-5
print("OK")
