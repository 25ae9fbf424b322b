"""Decompose the bench descent step's 0.24 s/iter on the real TPU.

Times each ingredient of make_structured_compliance_step's hot loop
separately (all scan-chained to amortize the ~1 s tunnel dispatch
overhead):
  1. fused Pallas stencil matvec             (x50 chain)
  2. one MG V-cycle preconditioner apply     (x20 chain)
  3. warm-started primal PCG solve           (iteration count + wall)
  4. radius-gradient VJP (prepare+apply cotangent)
and reconstructs the expected step time:
  step ~= 2 solves (primal + adjoint, both warm) + VJP.

Usage: N=50 python scripts/profile_step_tpu.py
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
os.environ.setdefault("PLDSO_MATVEC", "pallas")

import jax
import jax.numpy as jnp
import numpy as np

from pylatticedso_tpu.parallel.structured import StructuredLattice
from pylatticedso_tpu.parallel.multigrid import (build_mg_hierarchy,
                                                 mg_precond_state, mg_apply)
from pylatticedso_tpu.fem.solve import pcg

N = int(os.environ.get("N", "50"))
GEOM = os.environ.get("GEOM", "Octet")
TOL = float(os.environ.get("TOL", "1e-6"))

slat = StructuredLattice(GEOM, (N, N, N), (1.0, 1.0, 1.0), 1013.0, 0.3,
                         dtype=jnp.float32)
print(f"{GEOM} {N}^3 on {jax.devices()[0].platform}; "
      f"{6 * slat.n_nodes} DOF", flush=True)

zmax = N * 1.0
fixed = slat.select_nodes(lambda x, y, z: z == 0.0)
top = slat.select_nodes(lambda x, y, z: z == zmax)
free_np = np.broadcast_to(
    (slat.node_valid & ~fixed)[:, None], (slat.nc, 6) + slat.grid)
f_np = np.zeros((slat.nc, 6) + slat.grid, np.float32)
n_top = int(top.sum())
for c in range(slat.nc):
    f_np[c, 2][top[c]] = -1.0 / n_top

matvec, _ = slat.make_matvec()
free = jnp.asarray(free_np, jnp.float32)
f = jnp.asarray(f_np, jnp.float32)
b = free * f
r0 = jnp.full(slat.num_cells, 0.05, jnp.float32)

mg_hier = build_mg_hierarchy(slat, free_np)
pstate = jax.jit(lambda r: mg_precond_state(mg_hier, r, power_iters=5))(r0)
jax.block_until_ready(pstate)
M = mg_apply(mg_hier, pstate, nu=2, coarse_degree=24, smooth_frac=0.25)

aux = jax.jit(matvec.prepare)(r0)
jax.block_until_ready(aux)


def chain(fn, x, k):
    def run(x0):
        return jax.lax.scan(lambda s, _: (fn(s), None), x0, None,
                            length=k)[0]
    g = jax.jit(run)
    g(x).block_until_ready()
    t0 = time.time()
    g(x).block_until_ready()
    return (time.time() - t0) / k


u_rand = jnp.asarray(np.random.default_rng(0).standard_normal(
    (slat.nc, 6) + slat.grid), jnp.float32)

t_mv = chain(lambda u: matvec.apply(u, aux), u_rand, 50)
print(f"matvec:          {t_mv*1e3:7.3f} ms", flush=True)
t_M = chain(M, u_rand, 20)
print(f"MG V-cycle:      {t_M*1e3:7.3f} ms", flush=True)

A = lambda u: free * matvec.apply(free * u, aux) + (1 - free) * u


@jax.jit
def solve(b_, x0):
    return pcg(A, b_, M=M, x0=x0, maxiter=6000, tol=TOL)

out = solve(b, jnp.zeros_like(b))
u_cold = out.x.block_until_ready()
t0 = time.time()
out = solve(b, jnp.zeros_like(b))
out.x.block_until_ready()
t_cold = time.time() - t0
it_cold = int(out.iterations)
print(f"cold solve:      {t_cold*1e3:7.1f} ms  ({it_cold} iters, "
      f"{t_cold/max(it_cold,1)*1e3:.2f} ms/iter)", flush=True)

# warm solve after a bench-like design step (r *= 1.001, lr*g descent)
r1 = r0 * 1.001
aux1 = jax.jit(matvec.prepare)(r1)
A1 = lambda u: free * matvec.apply(free * u, aux1) + (1 - free) * u


@jax.jit
def solve1(b_, x0):
    return pcg(A1, b_, M=M, x0=x0, maxiter=6000, tol=TOL)

out1 = solve1(b, u_cold)
out1.x.block_until_ready()
t0 = time.time()
out1 = solve1(b, u_cold)
out1.x.block_until_ready()
t_warm = time.time() - t0
it_warm = int(out1.iterations)
print(f"warm solve:      {t_warm*1e3:7.1f} ms  ({it_warm} iters, "
      f"{t_warm/max(it_warm,1)*1e3:.2f} ms/iter)", flush=True)

# radius-gradient VJP: the -u.(dA/dr).u term every step pays once
uf = free * u_cold


@jax.jit
def grad_r(r_):
    return jax.grad(
        lambda rr: jnp.sum(uf * matvec.apply(uf, matvec.prepare(rr))))(r_)

grad_r(r0).block_until_ready()
t0 = time.time()
grad_r(r0).block_until_ready()
t_vjp = time.time() - t0
print(f"radius VJP:      {t_vjp*1e3:7.1f} ms", flush=True)


# analytic energy-derivative gradient (the default step path since r4):
# closed-form dq/dr2 forward pass + the scalar-field VJP of _sections
@jax.jit
def grad_analytic(r_, uf_):
    rsg = jax.lax.stop_gradient(r_)
    dq = [jax.lax.stop_gradient(x)
          for x in matvec.energy_dr2(uf_, matvec.sections(rsg))]

    def inner(rf):
        tot = None
        for d_, r2 in zip(dq, matvec.sections(rf)):
            s = jnp.sum(d_ * r2)
            tot = s if tot is None else tot + s
        return tot

    return -jax.grad(inner)(r_)


grad_analytic(r0, uf).block_until_ready()
t0 = time.time()
grad_analytic(r0, uf).block_until_ready()
t_an = time.time() - t0
print(f"analytic grad:   {t_an*1e3:7.1f} ms", flush=True)

# prepare (radius -> aux) cost, paid twice per step (primal + VJP path)
t0 = time.time()
jax.block_until_ready(jax.jit(matvec.prepare)(r1))
t_prep = time.time() - t0
print(f"prepare:         {t_prep*1e3:7.1f} ms (dispatch-dominated, "
      "one-off)", flush=True)

expected = 2 * t_warm + t_vjp
print(f"expected step (implicit diff) ~= 2*warm + VJP = "
      f"{expected*1e3:.1f} ms", flush=True)
print(f"expected step (analytic SA)   ~= warm + analytic = "
      f"{(t_warm + t_an)*1e3:.1f} ms", flush=True)
print(f"per-CG-iter budget: matvec {t_mv*1e3:.2f} + V-cycle {t_M*1e3:.2f} "
      f"+ vector ops => measured {t_warm/max(it_warm,1)*1e3:.2f} ms/iter",
      flush=True)
print("PROFILE DONE", flush=True)
