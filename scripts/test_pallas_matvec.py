"""Validate + time the Pallas stencil matvec against the XLA gather form
on the real TPU."""
import os, sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import numpy as np
import jax
import jax.numpy as jnp

N = int(os.environ.get("N", "30"))
GEOM = os.environ.get("GEOM", "Octet")

from pylatticedso_tpu.parallel.structured import StructuredLattice

slat = StructuredLattice(GEOM, (N, N, N), (1.0, 1.0, 1.0), 1013.0, 0.3)
print(f"{GEOM} {N}^3: nc={slat.nc} template_edges={len(slat.edges)} "
      f"grid={slat.grid}")

mv_g, diag = slat.make_matvec()          # gather (default env)
os.environ["PLDSO_MATVEC"] = "pallas"
mv_p, _ = slat.make_matvec()
assert hasattr(mv_p, "prepare") and mv_p is not mv_g

rng = np.random.default_rng(0)
u = jnp.asarray(rng.standard_normal((slat.nc, 6) + slat.grid), jnp.float32)
r = jnp.asarray(0.05 + 0.04 * rng.random((N, N, N)), jnp.float32)

aux_g = jax.jit(mv_g.prepare)(r)
aux_p = jax.jit(mv_p.prepare)(r)
f_g = jax.jit(mv_g.apply)
f_p = jax.jit(mv_p.apply)
yg = f_g(u, aux_g).block_until_ready()
yp = f_p(u, aux_p).block_until_ready()
err = float(jnp.max(jnp.abs(yg - yp)) / (jnp.max(jnp.abs(yg)) + 1e-30))
print(f"max rel err pallas vs gather: {err:.3e}")
assert err < 1e-5, err

# timing: chain applies inside one jit to avoid ~1 s dispatch round-trips
def chain(f, aux, k=50):
    def body(u, _):
        return f(u, aux), None
    return jax.lax.scan(body, u, None, length=k)[0]

for name, f, aux in [("gather", f_g, aux_g), ("pallas", f_p, aux_p)]:
    g = jax.jit(lambda u, aux: chain(f, aux))
    g(u, aux).block_until_ready()
    t0 = time.time()
    g(u, aux).block_until_ready()
    dt = (time.time() - t0) / 50
    print(f"{name}: {dt*1e3:.3f} ms per matvec")

# gradient path check (custom vjp): d/dr sum(K u) via both forms
def loss(form, r_):
    aux = form.prepare(r_)
    return jnp.sum(form.apply(u, aux) ** 2)

gg = jax.jit(jax.grad(lambda r_: loss(mv_g, r_)))(r)
gp = jax.jit(jax.grad(lambda r_: loss(mv_p, r_)))(r)
gerr = float(jnp.max(jnp.abs(gg - gp)) / (jnp.max(jnp.abs(gg)) + 1e-30))
print(f"grad max rel err: {gerr:.3e}")
assert gerr < 1e-4, gerr
print("OK")
