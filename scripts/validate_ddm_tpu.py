"""TPU-vs-CPU-x64 validation of the surrogate-DDM optimization chain.

VERDICT r2 item 5: the flagship DDM chain must run ON TPU (refined
mixed-precision interface solve, fem/solve.py) and agree with the CPU-x64
oracle to <= 1e-6 relative on objective AND gradient at several designs.

Each backend runs in a subprocess (the axon plugin ignores JAX_PLATFORMS;
only a fresh process can pick its platform).  Run from the repo root:

    python scripts/validate_ddm_tpu.py            # L-beam chain (cached RB)
    VDDM_POINTS=5 python scripts/validate_ddm_tpu.py
"""
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

CHILD = r'''
import json, os, sys
import jax
if os.environ["VDDM_BACKEND"] == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
sys.path.insert(0, os.environ["VDDM_REPO"])
import numpy as np
from pylatticedso_tpu import build_lattice
from pylatticedso_tpu.opti.ddm_optimizer import DDMOptimizationProblem

lattice = build_lattice({
    "geometry": {"cell_size": {"x": 1, "y": 1, "z": 1},
                 "number_of_cells": {"x": 6, "y": 1, "z": 6},
                 "radii": [0.1, 0.1, 0.1],
                 "geom_types": ["BCC", "Hybrid1", "Hybrid4"]},
    "supplementary": {"erased_blocks": {"block_0": {
        "start_point": {"x": 3.0, "y": 0.0, "z": 3.0},
        "dimensions_block": {"x": 3.0, "y": 1.0, "z": 3.0}}}},
    "simulation_parameters": {"enable": True, "material": "VeroClear",
                              "periodicity": True},
    "boundary_conditions": {
        "Force": {"Load": {"Surface": ["Xmax", "Zmin"], "DOF": ["Z"],
                           "Value": [-0.1]}},
        "Displacement": {"Encastre": {"Surface": ["Zmax"],
                                      "DOF": ["X", "Y", "Z", "RX", "RY", "RZ"],
                                      "Value": [0, 0, 0, 0, 0, 0]}}}})
prob = DDMOptimizationProblem(
    lattice, opt_params={"type": "unit_cell"},
    constraints={"relative_density": {"value": 0.3, "mode": "upper"}},
    cg_tol=1e-9, cg_maxiter=2000, penalization=True)
npts = int(os.environ.get("VDDM_POINTS", "3"))
rng = np.random.default_rng(7)
out = {"backend": jax.default_backend(), "refined": prob.refined,
       "points": []}
x0 = np.asarray(prob.param.x0)
for i in range(npts):
    x = np.clip(x0 + rng.uniform(-0.15, 0.15, x0.shape), 0.05, 0.95)
    v = prob.objective(x)
    g = prob.gradient(x)
    out["points"].append({"obj": float(v), "grad": np.asarray(g).tolist()})
print("VDDM_JSON " + json.dumps(out))
'''


def run_backend(backend: str) -> dict:
    env = dict(os.environ, VDDM_BACKEND=backend, VDDM_REPO=str(REPO))
    p = subprocess.run([sys.executable, "-u", "-c", CHILD], env=env,
                       capture_output=True, text=True,
                       timeout=int(os.environ.get("VDDM_TIMEOUT", "1800")),
                       cwd=REPO)
    for line in p.stdout.splitlines():
        if line.startswith("VDDM_JSON "):
            return json.loads(line[len("VDDM_JSON "):])
    raise RuntimeError(f"{backend} child failed rc={p.returncode}:\n"
                       + p.stderr[-2000:])


def main():
    import numpy as np
    cpu = run_backend("cpu")
    print(f"cpu oracle: backend={cpu['backend']} refined={cpu['refined']}")
    tpu = run_backend("tpu")
    print(f"device run: backend={tpu['backend']} refined={tpu['refined']}")
    if tpu["backend"] == "cpu":
        print("WARNING: no accelerator visible; this validated cpu-vs-cpu")
    worst_v = worst_g = 0.0
    for k, (a, b) in enumerate(zip(cpu["points"], tpu["points"])):
        rv = abs(a["obj"] - b["obj"]) / max(abs(a["obj"]), 1e-300)
        ga, gb = np.asarray(a["grad"]), np.asarray(b["grad"])
        rg = float(np.linalg.norm(ga - gb) / max(np.linalg.norm(ga), 1e-300))
        worst_v, worst_g = max(worst_v, rv), max(worst_g, rg)
        print(f"point {k}: obj rel {rv:.3e}, grad rel L2 {rg:.3e}")
    ok = worst_v <= 1e-6 and worst_g <= 1e-5
    print(json.dumps({"worst_obj_rel": worst_v, "worst_grad_rel": worst_g,
                      "ok": ok}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
