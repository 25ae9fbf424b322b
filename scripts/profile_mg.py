"""Break down the 50^3 multigrid V-cycle cost on the TPU: matvecs per
level, transfers, smoothers, lmax estimation, full V-cycle, PCG iteration."""
import os, sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import numpy as np
import jax
import jax.numpy as jnp

N = int(os.environ.get("N", "50"))
GEOM = os.environ.get("GEOM", "Octet")
REPS = int(os.environ.get("REPS", "20"))

from pylatticedso_tpu.parallel.structured import StructuredLattice
from pylatticedso_tpu.parallel import multigrid as mg

slat = StructuredLattice(GEOM, (N, N, N), (1.0, 1.0, 1.0), 1013.0, 0.3)
free = np.ones((slat.nc, 6) + slat.grid, bool)
free &= slat.node_valid[:, None]
zmin = slat.select_nodes(lambda x, y, z: z < 1e-9)
free &= ~zmin[:, None]

h = mg.build_mg_hierarchy(slat, free)
levels = h["levels"]
print(f"{GEOM} {N}^3 [{os.environ.get('PLDSO_MATVEC','gather')}]: "
      f"{len(levels)} levels, grids "
      f"{[l.slat.grid for l in levels]}")

rng = np.random.default_rng(0)
r = jnp.asarray(0.05 + 0.03 * rng.random((N, N, N)), jnp.float32)
radii = [r]
for rr in h["restrict_radius"]:
    radii.append(rr(radii[-1]))

def timeit(name, fn, *args):
    g = jax.jit(fn)
    out = g(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(REPS):
        out = g(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / REPS
    print(f"  {name:<30s} {dt*1e3:8.3f} ms")
    return out

us = []
for li, (lvl, rad) in enumerate(zip(levels, radii)):
    u = jnp.asarray(rng.standard_normal((lvl.slat.nc, 6) + lvl.slat.grid),
                    jnp.float32)
    us.append(u)
    aux = lvl.prepare(rad)
    def chain_mv(u, rad, aux, _l=lvl):
        def body(u, _):
            return _l.A_aux(u, rad, aux), None
        return jax.lax.scan(body, u, None, length=10)[0]
    g = jax.jit(chain_mv)
    jax.block_until_ready(g(u, rad, aux))
    t0 = time.time()
    jax.block_until_ready(g(u, rad, aux))
    print(f"  L{li} matvec {str(lvl.slat.grid):<18s} {(time.time()-t0)/10*1e3:8.3f} ms")

for li in range(len(levels) - 1):
    timeit(f"L{li}->L{li+1} restrict", h["restrict"][li], us[li])
    timeit(f"L{li+1}->L{li} prolong", h["prolong"][li], us[li + 1])

timeit("prepare (r2 fields) L0", levels[0].prepare, radii[0])
timeit("diag L0", levels[0].D, radii[0])

# full preconditioner construction + one application
def precond_apply(r_field, b):
    M = mg.mg_preconditioner(h, r_field, nu=2, coarse_degree=24,
                             smooth_frac=0.25, power_iters=5)
    return M(b)

b = us[0]
timeit("build M + one V-cycle", precond_apply, r, b)

# V-cycle alone (constants hoisted) approximated by applying M twice and
# subtracting the build: chain 5 V-cycles in one jit
def precond_chain(r_field, b):
    M = mg.mg_preconditioner(h, r_field, nu=2, coarse_degree=24,
                             smooth_frac=0.25, power_iters=5)
    def body(x, _):
        return M(x), None
    return jax.lax.scan(body, b, None, length=5)[0]

out = timeit("build M + 5 V-cycles", precond_chain, r, b)
