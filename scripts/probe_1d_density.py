"""Measure VPU utilization of 1-D (T,) vs 2-D (8, T) elementwise chains.

Hypothesis: Mosaic lays a (T,) array out as (1, T) — one sublane of 8 —
so the stencil kernel's per-record strain chains (dozens of (T,)-shaped
ops) run at 1/8 VPU density.  If chain_2d (8x the elements) costs the
same wall time as chain_1d, the hypothesis holds and the kernel's
arithmetic should be restructured to (8k, T) blocks.

Usage: python scripts/probe_1d_density.py   (on the TPU)
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T = 3072
K = 200          # chain length (dependent FMAs)
REPS = 100       # kernel grid: repeat to dominate launch overhead


def make(kind):
    def kernel(x_ref, o_ref):
        if kind == "1d":
            v = x_ref[0, :]
            for _ in range(K):
                v = v * 1.0001 + 0.5
            o_ref[:] = jnp.broadcast_to(v, (8, T))
        else:
            v = x_ref[:, :]
            for _ in range(K):
                v = v * 1.0001 + 0.5
            o_ref[:] = v

    return pl.pallas_call(
        kernel,
        grid=(REPS,),
        in_specs=[pl.BlockSpec((8, T), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, T), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, T), jnp.float32),
    )


x = jnp.asarray(np.random.default_rng(0).standard_normal((8, T)),
                jnp.float32)
for kind in ("1d", "2d"):
    f = jax.jit(make(kind))
    f(x).block_until_ready()
    t0 = time.time()
    for _ in range(10):
        y = f(x)
    y.block_until_ready()
    dt = (time.time() - t0) / 10
    flops = K * T * 2 * REPS * (1 if kind == "1d" else 8)
    print(f"{kind}: {dt*1e3:.3f} ms  ({flops/dt/1e9:.1f} GFLOP/s)")
