"""GSPMD smoke test on REAL TPU hardware (VERDICT r4 #7).

The sharded MG step has only ever executed on virtual CPU devices
(tests/test_sharding.py, dryrun_multichip).  This runs
``shard_structured_step`` over a 1-device mesh on the real chip to prove
the GSPMD-partitioned program (slab sharding + halo collectives + the
sharded V-cycle) lowers and executes through the real TPU compiler, and
that its compliance matches the unsharded step.

One physical chip only, so n_shard=1: the partitioner still runs, emits
the (degenerate) collectives, and constrains layouts — this is the "does
the GSPMD program lower on TPU at all" question, not a scaling
measurement (blocked on hardware).

Usage: N=16 python scripts/gspmd_tpu_smoke.py
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
os.environ.setdefault("PLDSO_MATVEC", "pallas")
os.environ.setdefault("PLDSO_MG_BF16", "1")

import jax
import jax.numpy as jnp
import numpy as np

from pylatticedso_tpu.parallel.sharding import make_mesh
from pylatticedso_tpu.parallel.structured import (
    StructuredLattice, make_structured_compliance_step,
    shard_structured_step)

N = int(os.environ.get("N", "16"))
GEOM = os.environ.get("GEOM", "Octet")
print(f"{GEOM} {N}^3 on {jax.devices()}", flush=True)

slat = StructuredLattice(GEOM, (N, N, N), (1.0, 1.0, 1.0), 1013.0, 0.3,
                         dtype=jnp.float32)
zmax = N * 1.0
fixed = slat.select_nodes(lambda x, y, z: z == 0.0)
top = slat.select_nodes(lambda x, y, z: z == zmax)
free = slat.node_valid & ~fixed
f = np.zeros((slat.nc, 6) + slat.grid, np.float32)
n_top = int(top.sum())
for c in range(slat.nc):
    f[c, 2][top[c]] = -1.0 / n_top

mg_opts = {"nu": (1, 1), "coarse_degree": 24, "smooth_frac": 0.25,
           "power_iters": 5}
step = make_structured_compliance_step(slat, free, f, tol=1e-6,
                                       maxiter=2000, precond="mg",
                                       mg_opts=mg_opts)
r0 = jnp.full(slat.num_cells, 0.05, jnp.float32)
ps = step.precond_state(r0)
t0 = time.time()
c0, g0, u0 = step(r0, None, ps)
jax.block_until_ready((c0, g0))
print(f"unsharded: compliance {float(c0):.9e}  ({time.time()-t0:.1f} s "
      "incl compile)", flush=True)

mesh = make_mesh(n_shard=jax.device_count())
sstep = shard_structured_step(step, mesh)
t0 = time.time()
c1, g1, u1 = sstep(r0, None, ps)
jax.block_until_ready((c1, g1))
print(f"sharded (mesh {mesh.shape}): compliance {float(c1):.9e}  "
      f"({time.time()-t0:.1f} s incl GSPMD compile)", flush=True)
print(f"u sharding: {u1.sharding}", flush=True)
rel = abs(float(c1) - float(c0)) / abs(float(c0))
print(f"rel diff {rel:.3e}", flush=True)
assert rel < 1e-5, "sharded compliance diverges from unsharded"

# a short descent chain through the sharded step (exercises repeated
# sharded dispatch + donated warm starts)
rr, uu = r0, u1
t0 = time.time()
for k in range(4):
    cc, gg, uu = sstep(rr, uu, ps)
    rr = jnp.clip(rr - 1e-4 * gg, 0.01, 0.1)
jax.block_until_ready((cc, rr))
print(f"4-step sharded descent: {(time.time()-t0)/4*1e3:.1f} ms/step, "
      f"final compliance {float(cc):.9e}", flush=True)
print("GSPMD SMOKE DONE", flush=True)
