"""Sweep Pallas stencil-kernel variants on the real TPU in one process.

Variants: {baseline, align8, dense, once (compute-per-edge-once, implies
dense)} x tile sizes, plus the XLA gather form and the bf16-I/O smoother
variant of the winner.  One 50^3 lattice is built once; each variant's
matvec is timed with a 50-apply lax.scan chain (immune to the ~1 s
tunnel dispatch overhead).

Usage: N=50 python scripts/kernel_sweep_tpu.py
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from pylatticedso_tpu.parallel.structured import StructuredLattice
from pylatticedso_tpu.parallel.stencil_pallas import make_pallas_matvec

N = int(os.environ.get("N", "50"))
GEOM = os.environ.get("GEOM", "Octet")
TILES = [int(t) for t in os.environ.get("TILES", "3072,4096").split(",")]

slat = StructuredLattice(GEOM, (N, N, N), (1.0, 1.0, 1.0), 1013.0, 0.3)
print(f"{GEOM} {N}^3 on {jax.devices()[0].platform}; "
      f"nc={slat.nc} edges={len(slat.edges)}", flush=True)

mv_g, _ = slat.make_matvec()          # gather form (oracle + baseline)
rng = np.random.default_rng(0)
u = jnp.asarray(rng.standard_normal((slat.nc, 6) + slat.grid), jnp.float32)
r = jnp.asarray(0.05 + 0.04 * rng.random((N, N, N)), jnp.float32)
aux_g = jax.jit(mv_g.prepare)(r)
y_ref = jax.jit(mv_g.apply)(u, aux_g).block_until_ready()


def timeit(apply_fn, aux, k=50):
    def chain(u0, aux_):
        def body(x, _):
            return apply_fn(x, aux_), None
        return jax.lax.scan(body, u0, None, length=k)[0]

    f = jax.jit(chain)
    f(u, aux).block_until_ready()
    t0 = time.time()
    f(u, aux).block_until_ready()
    return (time.time() - t0) / k


print(f"gather: {timeit(mv_g.apply, aux_g)*1e3:.3f} ms", flush=True)

results = {}
for tile in TILES:
    for variant in ("", "dense", "once", "dense once"):
        for al in (False, True):
            os.environ["PLDSO_PALLAS_DENSE"] = \
                "1" if "dense" in variant else "0"
            os.environ["PLDSO_PALLAS_ONCE"] = \
                "1" if "once" in variant else "0"
            if variant == "dense once":   # once implies dense; skip dup
                continue
            name = (f"tile={tile}"
                    + (f" {variant}" if variant else "")
                    + (" align8" if al else ""))
            try:
                prep, app = make_pallas_matvec(
                    slat, mv_g.prepare, mv_g.apply, tile=tile, align8=al)
                aux_p = jax.jit(prep)(r)
                y = jax.jit(app)(u, aux_p).block_until_ready()
                err = float(jnp.max(jnp.abs(y - y_ref))
                            / jnp.max(jnp.abs(y_ref)))
                dt = timeit(app, aux_p)
                results[name] = dt
                print(f"{name}: {dt*1e3:.3f} ms  (err {err:.1e})",
                      flush=True)
            except Exception as e:  # noqa: BLE001 - sweep survives OOMs
                print(f"{name}: FAILED {type(e).__name__}: "
                      f"{str(e)[:2000]}", flush=True)
os.environ["PLDSO_PALLAS_DENSE"] = "0"
os.environ["PLDSO_PALLAS_ONCE"] = "0"

if results:
    best = min(results, key=results.get)
    print(f"BEST: {best} at {results[best]*1e3:.3f} ms")
