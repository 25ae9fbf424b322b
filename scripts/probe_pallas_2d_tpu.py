"""Bisect the 2-D Pallas tiling's Mosaic remote-compile crash (HTTP 500,
no message — data/outputs/tpu_queue/sweep2d_fixed.log).

Every 50^3 config failed identically; so did two NON-2D variants (plain
once, plain dense), which at that size are known scoped-VMEM OOMs.  This
probe compiles the 2-D kernel at a ladder of sizes/configs to separate
"lowering bug at any size" from "resource blowup at bench size".

Usage: python scripts/probe_pallas_2d_tpu.py
"""
import os
import sys
import time
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

os.environ["PLDSO_PALLAS_2D"] = "1"

import numpy as np
import jax
import jax.numpy as jnp

from pylatticedso_tpu.parallel.structured import StructuredLattice
from pylatticedso_tpu.parallel import stencil_pallas

CONFIGS = [
    # (N, BX, CT)
    (8, 4, 128),
    (16, 4, 128),
    (16, 8, 256),
    (24, 8, 256),
    (32, 8, 512),
    (50, 8, 512),
    (50, 8, 1024),
]

for N, BX, CT in CONFIGS:
    os.environ["PLDSO_PALLAS_2D_BX"] = str(BX)
    os.environ["PLDSO_PALLAS_2D_CT"] = str(CT)
    tag = f"N={N} bx={BX} ct={CT}"
    try:
        sl = StructuredLattice("Octet", (N, N, N), (1.0, 1.0, 1.0),
                               1013.0, 0.3, dtype=jnp.float32)
        mv, _ = sl.make_matvec()
        prep, apply = stencil_pallas.make_pallas_matvec_2d(
            sl, mv.prepare, mv.apply, bx=BX, ct=CT)
        rng = np.random.default_rng(0)
        r = jnp.asarray(0.04 + 0.02 * rng.random((N, N, N)), jnp.float32)
        u = jnp.asarray(rng.standard_normal((sl.nc, 6) + sl.grid),
                        jnp.float32)
        t0 = time.time()
        out = jax.block_until_ready(apply(u, prep(r)))
        ref = mv.apply(u, mv.prepare(r))
        err = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
        print(f"{tag}: OK compile+run {time.time() - t0:.1f} s "
              f"err={err:.2e}", flush=True)
    except Exception as e:
        msg = str(e).replace(chr(10), " ")[:600]
        print(f"{tag}: FAIL {type(e).__name__}: {msg}", flush=True)
        if N <= 16:
            traceback.print_exc()
print("done")
