"""AOT executable serialization probe (VERDICT r4 #6 fallback).

The persistent compile cache is only partially effective through the
tunnel (cache_probe.log: 346 -> 222 s second-process).  This probes the
stronger mechanism: serialize the COMPILED bench-step executable
(jax.experimental.serialize_executable) and load it in a fresh process,
skipping XLA/Mosaic entirely.

Phase "save": build + compile the bench step at N, serialize to
data/outputs/aot/step_N.bin.  Phase "load" (fresh subprocess): measure
process wall to a first executed step from the serialized artifact.

Usage: N=50 python scripts/aot_probe_tpu.py
"""
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
N = os.environ.get("N", "50")

CHILD = r'''
import os, sys, time
t_proc = time.time()
import pickle
import jax
import jax.numpy as jnp
import numpy as np
sys.path.insert(0, os.environ["AOT_REPO"])
os.environ.setdefault("PLDSO_MATVEC", "pallas")
os.environ.setdefault("PLDSO_MG_BF16", "1")
os.environ.setdefault("PLDSO_MG_FUSED", "1")
from pylatticedso_tpu.utils.aot import save_executables, load_executables
from pylatticedso_tpu.parallel.structured import (
    StructuredLattice, make_structured_compliance_step)

N = int(os.environ["AOT_N"])
mode = os.environ["AOT_MODE"]
path = os.environ["AOT_PATH"]
slat = StructuredLattice("Octet", (N, N, N), (1.0, 1.0, 1.0), 1013.0, 0.3,
                         dtype=jnp.float32)
fixed = slat.select_nodes(lambda x, y, z: z == 0.0)
top = slat.select_nodes(lambda x, y, z: z == float(N))
free = slat.node_valid & ~fixed
f = np.zeros((slat.nc, 6) + slat.grid, np.float32)
for c in range(slat.nc):
    f[c, 2][top[c]] = -1.0 / int(top.sum())
step = make_structured_compliance_step(
    slat, free, f, tol=1e-6, maxiter=6000, precond="mg",
    mg_opts={"nu": (1, 2), "coarse_degree": 24, "smooth_frac": 0.35,
             "power_iters": 5})
r0 = jnp.full(slat.num_cells, 0.05, jnp.float32)

# the jitted frozen-state step function + its operands
free_o, f_o = step._operands
u0 = jnp.zeros_like(f_o)
fn = (step._sa_frozen if getattr(step, "_sa_frozen", None) is not None
      else step._jitted_frozen)
if mode == "save":
    t0 = time.time()
    c_ps = step.precond_state.lower(r0).compile()
    ps = c_ps(r0)
    compiled = fn.lower(r0, free_o, f_o, u0, ps).compile()
    t_compile = time.time() - t0
    nbytes = save_executables(path, {"step": compiled, "pstate": c_ps})
    out = compiled(r0, free_o, f_o, u0, ps)
    jax.block_until_ready(out)
    print(f"AOT_SAVE ok compile={t_compile:.1f}s bytes={nbytes}",
          flush=True)
else:
    t0 = time.time()
    cs = load_executables(path)
    loaded, loaded_ps = cs["step"], cs["pstate"]
    t_load = time.time() - t0
    ps = loaded_ps(r0)
    t1 = time.time()
    out = loaded(r0, free_o, f_o, u0, ps)
    jax.block_until_ready(out)
    print(f"AOT_LOAD ok load={t_load:.1f}s first_exec={time.time()-t1:.2f}s "
          f"process_total={time.time()-t_proc:.1f}s", flush=True)
'''


def run(mode):
    env = dict(os.environ, AOT_MODE=mode, AOT_N=N, AOT_REPO=str(REPO),
               AOT_PATH=str(REPO / "data/outputs/aot" / f"step_{N}.bin"))
    (REPO / "data/outputs/aot").mkdir(parents=True, exist_ok=True)
    t0 = time.time()
    p = subprocess.run([sys.executable, "-u", "-c", CHILD], env=env,
                       capture_output=True, text=True, timeout=2400,
                       cwd=REPO)
    wall = time.time() - t0
    ok = f"AOT_{mode.upper()} ok" in p.stdout
    for line in p.stdout.splitlines():
        if line.startswith("AOT_"):
            print(f"{mode}: {line}  (subprocess wall {wall:.1f}s)",
                  flush=True)
    if not ok:
        print(f"{mode} FAILED rc={p.returncode}:\n" + p.stderr[-2500:],
              flush=True)
    return ok


if __name__ == "__main__":
    if run("save"):
        run("load")
    print("AOT PROBE DONE", flush=True)
