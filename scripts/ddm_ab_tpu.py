"""DDM surrogate chain: TPU (refined interface solve) vs CPU-x64 A/B
(VERDICT r4 #3).

The flagship optimization records run the DDM chain on the host CPU
(examples pin jax_platforms=cpu: a plain f32 interface CG at tol 1e-9
stalls at the f32 floor).  The refined mixed-precision solve is
TPU-validated to 2.6e-10 (scripts/validate_ddm_tpu.py) — this measures
whether it also WINS on wall-clock for the two record problems:

  lbeam: 27-cell 3-geom L-beam (dense refined interface solve)
  tpb:   250-cell 3-geom three-point bending (matrix-free refined CG)

Per backend, per problem: build the problem (offline condensation+RB is
always host CPU), warm up one eval, then time EVALS online
objective+gradient evaluations at perturbed designs.  Prints a table and
the flip/keep verdict.  Each backend runs in a subprocess (the axon
plugin ignores JAX_PLATFORMS; only a fresh process picks its platform).

Usage: python scripts/ddm_ab_tpu.py          [EVALS=6 PROBLEMS=lbeam,tpb]
"""
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

CHILD = r'''
import json, os, sys, time
import jax
if os.environ["AB_BACKEND"] == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
sys.path.insert(0, os.environ["AB_REPO"])
import numpy as np
from pylatticedso_tpu import build_lattice
from pylatticedso_tpu.opti.ddm_optimizer import DDMOptimizationProblem

GEOM3 = ["BCC", "Hybrid1", "Hybrid4"]
SIM = {"enable": True, "material": "VeroClear", "periodicity": True}
CONFIGS = {
    "lbeam": {
        "geometry": {"cell_size": {"x": 1, "y": 1, "z": 1},
                     "number_of_cells": {"x": 6, "y": 1, "z": 6},
                     "radii": [0.1] * 3, "geom_types": GEOM3},
        "supplementary": {"erased_blocks": {"block_0": {
            "start_point": {"x": 3.0, "y": 0.0, "z": 3.0},
            "dimensions_block": {"x": 3.0, "y": 1.0, "z": 3.0}}}},
        "simulation_parameters": SIM,
        "boundary_conditions": {
            "Force": {"Load": {"Surface": ["Xmax", "Zmin"], "DOF": ["Z"],
                               "Value": [-0.1]}},
            "Displacement": {"Encastre": {
                "Surface": ["Zmax"],
                "DOF": ["X", "Y", "Z", "RX", "RY", "RZ"],
                "Value": [0, 0, 0, 0, 0, 0]}}}},
    "tpb": {
        "geometry": {"cell_size": {"x": 1, "y": 1, "z": 1},
                     "number_of_cells": {"x": 10, "y": 5, "z": 5},
                     "radii": [0.05] * 3, "geom_types": GEOM3},
        "simulation_parameters": SIM,
        "boundary_conditions": {
            "Displacement": {
                "Fixed": {"Surface": ["Xmax"], "DOF": ["X"], "Value": [0]},
                "SimpleSupport": {"Surface": ["Xmin", "Zmin"],
                                  "DOF": ["Y", "Z"], "Value": [0, 0],
                                  "SurfaceCells": ["Xmax", "Zmin"]}},
            "Force": {"Load": {"Surface": ["Xmax", "Zmax"], "DOF": ["Z"],
                               "Value": [-0.1]}}}},
}

name = os.environ["AB_PROBLEM"]
evals = int(os.environ.get("EVALS", "6"))
lattice = build_lattice(CONFIGS[name])
t0 = time.time()
prob = DDMOptimizationProblem(
    lattice, opt_params={"type": "unit_cell"},
    constraints={"relative_density": {"value": 0.3, "mode": "upper"}},
    cg_tol=1e-9, cg_maxiter=2000, penalization=(name == "lbeam"))
t_off = time.time() - t0
x0 = np.asarray(prob.param.x0)
rng = np.random.default_rng(11)
pts = [np.clip(x0 + rng.uniform(-0.1, 0.1, x0.shape), 0.05, 0.95)
       for _ in range(evals + 1)]
v = prob.objective(pts[0]); g = prob.gradient(pts[0])   # warmup/compile
times, objs = [], []
for x in pts[1:]:
    t1 = time.time()
    v = float(prob.objective(x))
    g = np.asarray(prob.gradient(x))
    times.append(time.time() - t1)
    objs.append(v)
print("AB_JSON " + json.dumps({
    "backend": jax.default_backend(), "refined": bool(prob.refined),
    "problem": name, "offline_s": round(t_off, 1),
    "eval_s": [round(t, 3) for t in times],
    "median_eval_s": round(sorted(times)[len(times) // 2], 3),
    "objs": objs}))
'''


def run(backend, problem):
    env = dict(os.environ, AB_BACKEND=backend, AB_PROBLEM=problem,
               AB_REPO=str(REPO))
    p = subprocess.run([sys.executable, "-u", "-c", CHILD], env=env,
                       capture_output=True, text=True,
                       timeout=int(os.environ.get("AB_TIMEOUT", "5400")),
                       cwd=REPO)
    for line in p.stdout.splitlines():
        if line.startswith("AB_JSON "):
            return json.loads(line[8:])
    raise RuntimeError(f"{backend}/{problem} failed rc={p.returncode}:\n"
                       + p.stderr[-2000:])


def main():
    problems = os.environ.get("PROBLEMS", "lbeam,tpb").split(",")
    rows = []
    for prob in problems:
        cpu = run("cpu", prob)
        print(f"{prob:6s} cpu: median {cpu['median_eval_s']} s/eval "
              f"(offline {cpu['offline_s']} s)", flush=True)
        tpu = run("tpu", prob)
        print(f"{prob:6s} {tpu['backend']}: median {tpu['median_eval_s']} "
              f"s/eval (offline {tpu['offline_s']} s, "
              f"refined={tpu['refined']})", flush=True)
        worst = max(abs(a - b) / max(abs(a), 1e-300)
                    for a, b in zip(cpu["objs"], tpu["objs"]))
        speed = cpu["median_eval_s"] / max(tpu["median_eval_s"], 1e-9)
        rows.append({"problem": prob, "cpu_s": cpu["median_eval_s"],
                     "dev_s": tpu["median_eval_s"],
                     "dev_backend": tpu["backend"],
                     "speedup": round(speed, 2),
                     "worst_obj_rel": worst,
                     "tpu_wins": speed > 1.0 and worst < 1e-6})
        print(f"{prob:6s} agree {worst:.2e}  speedup x{speed:.2f}  "
              f"-> {'TPU WINS' if rows[-1]['tpu_wins'] else 'CPU stays'}",
              flush=True)
    print("AB_TABLE " + json.dumps(rows))
    print("DDM AB DONE", flush=True)


if __name__ == "__main__":
    main()
