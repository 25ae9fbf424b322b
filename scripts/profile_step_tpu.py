"""Decompose the bench descent step (current defaults) on the real TPU.

Every ingredient is timed as a scan-CHAIN (the only dispatch regime whose
numbers add up through the ~1 s-round-trip tunnel: the r4 profiler timed
single dispatches and reported an 810 ms "expected step" against a 240 ms
bench — the gap was per-dispatch round-trip latency plus memoization of
repeated identical executions, not compute).  Config mirrors bench.py:
bf16-I/O smoother, per-level nu (default 1,1), frozen MG state, analytic
self-adjoint gradient.

Rows reported (all ms):
  matvec f32 / bf16, V-cycle, fine Chebyshev smooth, level-0 transfers,
  coarse remainder (V-cycle of the level>=1 sub-hierarchy),
  warm PCG solve chain (ms/solve, iters, ms/iter),
  prepare, analytic gradient, full bench step chain,
and the reconciliations:
  solve ~= iters * (V-cycle + f32 matvec + vec-ops)
  step  ~= solve + prepare + analytic grad (+ refresh amortization)

Usage: N=50 python scripts/profile_step_tpu.py
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
os.environ.setdefault("PLDSO_MATVEC", "pallas")
os.environ.setdefault("PLDSO_MG_BF16", "1")
os.environ.setdefault("PLDSO_MG_FUSED", "1")   # bench default since r5

import jax
import jax.numpy as jnp
import numpy as np

from pylatticedso_tpu.parallel.structured import (
    StructuredLattice, make_structured_compliance_step)
from pylatticedso_tpu.parallel.multigrid import (build_mg_hierarchy,
                                                 mg_precond_state, mg_apply,
                                                 _chebyshev)
from pylatticedso_tpu.fem.solve import pcg

N = int(os.environ.get("N", "50"))
GEOM = os.environ.get("GEOM", "Octet")
TOL = float(os.environ.get("TOL", "1e-6"))
_nu = os.environ.get("MG_NU", "1,2")
NU = tuple(int(v) for v in _nu.split(",")) if "," in _nu else int(_nu)
FRAC = float(os.environ.get("MG_FRAC", "0.35"))
DEG = int(os.environ.get("MG_COARSE", "24"))
POWER = int(os.environ.get("MG_POWER", "5"))
MG_OPTS = {"nu": NU, "coarse_degree": DEG, "smooth_frac": FRAC,
           "power_iters": POWER}

slat = StructuredLattice(GEOM, (N, N, N), (1.0, 1.0, 1.0), 1013.0, 0.3,
                         dtype=jnp.float32)
print(f"{GEOM} {N}^3 on {jax.devices()[0].platform}; "
      f"{6 * slat.n_nodes} DOF; nu={NU} frac={FRAC} deg={DEG} bf16=1",
      flush=True)

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
_pstate_jit = jax.jit(lambda r: mg_precond_state(mg_hier, r,
                                                 power_iters=POWER))
pstate = _pstate_jit(r0)
jax.block_until_ready(pstate)
t0 = time.time()
# SAME jitted callable (a fresh lambda would recompile: the r4 run
# reported 13.7 s here, which was compile time, not execution)
jax.block_until_ready(_pstate_jit(r0 * 1.001))
t_pstate = time.time() - t0
M = mg_apply(mg_hier, pstate, nu=NU, coarse_degree=DEG, smooth_frac=FRAC)

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
print(f"matvec f32:      {t_mv*1e3:7.3f} ms", flush=True)
lvl0 = mg_hier["levels"][0]
aux_lo = lvl0.prepare_lo(pstate["auxs"][0])
if aux_lo is not None:
    t_mv_lo = chain(lambda u: lvl0.A_aux_lo(u, aux_lo), u_rand, 50)
    print(f"matvec bf16:     {t_mv_lo*1e3:7.3f} ms", flush=True)
t_M = chain(M, u_rand, 20)
print(f"MG V-cycle:      {t_M*1e3:7.3f} ms", flush=True)

# fine-level pieces
D0, lmax0 = pstate["Ds"][0], pstate["lmaxs"][0]
Af_lo = (lambda u: lvl0.A_aux_lo(u, aux_lo)) if aux_lo is not None else \
    (lambda u: lvl0.A_aux(u, r0, pstate["auxs"][0]))
nu_fine = NU[0] if isinstance(NU, tuple) else NU
t_cheb = chain(lambda u: _chebyshev(Af_lo, D0, u, None, lmax0, FRAC,
                                    nu_fine), u_rand, 20)
print(f"fine cheb(nu={nu_fine}): {t_cheb*1e3:7.3f} ms "
      f"({nu_fine} matvec + start)", flush=True)
t_resid = chain(lambda u: u - Af_lo(u), u_rand, 20)
print(f"fine residual:   {t_resid*1e3:7.3f} ms", flush=True)

restrict0, prolong0 = mg_hier["restrict"][0], mg_hier["prolong"][0]
free1 = mg_hier["levels"][1].free
rc0 = jax.jit(lambda u: free1 * restrict0(u))(u_rand)


def transfer_pair(u):
    rc = free1 * restrict0(u)
    return lvl0.free * prolong0(rc)


t_tr = chain(transfer_pair, u_rand, 20)
print(f"lvl0 restrict+prolong: {t_tr*1e3:5.3f} ms", flush=True)

# coarse remainder: V-cycle over the level>=1 sub-hierarchy
sub_h = {k: v[1:] for k, v in mg_hier.items()}
sub_state = {k: v[1:] for k, v in pstate.items()}
subnu = NU[1:] if isinstance(NU, tuple) and len(NU) > 1 else NU
M1 = mg_apply(sub_h, sub_state, nu=subnu, coarse_degree=DEG,
              smooth_frac=FRAC)
t_M1 = chain(M1, rc0, 20)
print(f"coarse sub-V-cycle (lvl>=1): {t_M1*1e3:5.3f} ms", flush=True)
fine_part = 2 * t_cheb + t_resid + t_tr
print(f"  V-cycle decomposition: 2*cheb + resid + transfers "
      f"{fine_part*1e3:.3f} + coarse {t_M1*1e3:.3f} = "
      f"{(fine_part + t_M1)*1e3:.3f} vs measured {t_M*1e3:.3f}",
      flush=True)

# ---- warm PCG solve chain (bench-like: 8 solves, slightly moving radii)
K_STEPS = int(os.environ.get("STEPS", "8"))


PERT = float(os.environ.get("PERT", "1e-5"))
# bench-like magnitude: a descent step moves r by ~lr*|g| ~ 3e-6
# relative; the r4 profile used 1e-4 and measured 41-iter warm solves vs
# the bench's ~7 — the warm-start quality is THAT sensitive


@jax.jit
def solve_chain(r_, u0):
    def body(carry, k):
        r, u = carry
        rk = r * (1.0 + PERT * (k + 1).astype(jnp.float32))
        auxk = matvec.prepare(rk)
        A = lambda v: free * matvec.apply(free * v, auxk) + (1 - free) * v
        out = pcg(A, b, M=M, x0=u * free, maxiter=6000, tol=TOL)
        return (rk, out.x), out.iterations

    (rT, uT), iters = jax.lax.scan(body, (r_, u0), jnp.arange(K_STEPS))
    return uT, iters


out0 = solve_chain(r0, jnp.zeros_like(b))
u_warm = out0[0].block_until_ready()
t0 = time.time()
uT, iters = solve_chain(r0, u_warm)
jax.block_until_ready(uT)
t_solve = (time.time() - t0) / K_STEPS
iters = np.asarray(iters)
it_mean = float(iters.mean())
print(f"warm solve chain: {t_solve*1e3:7.2f} ms/solve  "
      f"(iters {iters.tolist()}, {t_solve/max(it_mean,1)*1e3:.2f} ms/iter)",
      flush=True)

# ---- prepare + analytic gradient chains
t_prep = chain(
    lambda r_: r_ + 0.0 * jnp.sum(matvec.prepare(r_ * 1.0001)), r0, 8)
print(f"prepare chain:   {t_prep*1e3:7.2f} ms", flush=True)

uf = free * u_warm


@jax.jit
def grad_chain(r_):
    def body(r, k):
        rk = r * (1.0 + 1e-4 * (k + 1).astype(jnp.float32))
        rsg = jax.lax.stop_gradient(rk)
        dq = [jax.lax.stop_gradient(x)
              for x in matvec.energy_dr2(uf, matvec.sections(rsg))]

        def inner(rf):
            tot = None
            for d_, r2 in zip(dq, matvec.sections(rf)):
                s = jnp.sum(d_ * r2)
                tot = s if tot is None else tot + s
            return tot

        g = -jax.grad(inner)(rk)
        return rk, g

    return jax.lax.scan(body, r_, jnp.arange(8))[1]


grad_chain(r0).block_until_ready()
t0 = time.time()
grad_chain(r0).block_until_ready()
t_an = (time.time() - t0) / 8
print(f"analytic grad:   {t_an*1e3:7.2f} ms", flush=True)
print(f"precond_state rebuild: {t_pstate*1e3:7.1f} ms "
      f"(amortized /8: {t_pstate/8*1e3:.2f})", flush=True)

# ---- full bench step replica (python loop, frozen M, refresh 8)
step = make_structured_compliance_step(slat, free_np, f_np, tol=TOL,
                                       maxiter=6000, precond="mg",
                                       mg_opts=MG_OPTS)
ps = step.precond_state(r0)
c, g, u = step(r0, None, ps)
jax.block_until_ready((c, g, u))
lr = 1e-4
for rep in range(2):
    rr = r0 * (1.0 + 1e-3 * (rep + 1))
    uu = u
    t1 = time.time()
    for k in range(K_STEPS):
        cc, gg, uu = step(rr, uu, ps)
        rr = jnp.clip(rr - lr * gg, 0.01, 0.1)
    jax.block_until_ready((cc, rr))
    t_step = (time.time() - t1) / K_STEPS
    print(f"bench step chain (window {rep}): {t_step*1e3:7.2f} ms/step",
          flush=True)

per_iter = t_M + t_mv
print(f"reconcile solve: iters*(V-cycle+matvec) = "
      f"{it_mean:.1f}*{per_iter*1e3:.2f} = {it_mean*per_iter*1e3:.2f} "
      f"vs measured {t_solve*1e3:.2f} ms "
      f"(gap = vector ops/dots)", flush=True)
exp_step = t_solve + t_prep + t_an + t_pstate / 8
print(f"reconcile step: solve + prepare + grad + pstate/8 = "
      f"{exp_step*1e3:.2f} ms vs bench window {t_step*1e3:.2f} ms",
      flush=True)
print("PROFILE DONE", flush=True)
