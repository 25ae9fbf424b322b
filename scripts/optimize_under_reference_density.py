"""Re-run the three record optimizations under the REFERENCE'S OWN
density model — the apples-to-apples experiment of VERDICT r3 item 1.

Density model: the reference's runtime Kriging, reconstructed from its
committed artifacts (scripts/reference_kriging_replica.py +
reference_kriging_variants.py): its exact training pipeline
(surrogate_model_relative_densities.py:524-660) on its committed
volumes_lattice.csv reproduces ALL SIX committed records' logged
densities to max 7.6e-4 (the committed 3-geom pkl dataset is ~0.08 off
everywhere — a stale artifact).  Loaded from
data/outputs/relative_densities/replica/kriging_replica_csv.npz.

Problems are the exact example setups (examples/optimization/
{cantilever_L_beam,inversion_mechanism_record,three_point_bending}.py)
with ``density_model=`` swapped; records are written as
``<Name>_refdensity[_constant].json`` so the standard (voxel-exact
density) records remain separate.

Each final solution is also cross-priced under this repo's voxel-exact
density model (both-ways table in the summary).

CPU-x64 job (DDM chain is CPU-pinned).  Select problems via
  REFDENS_PROBLEMS=tpb_const,inversion_const,lbeam_const,inversion,lbeam,tpb
(default: that order — cheap first).  Summary JSON appended per problem:
data/outputs/optimization_data_files/refdensity_summary.json
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import os

import jax

jax.config.update("jax_platforms", os.environ.get("PLDSO_PLATFORM", "cpu"))
jax.config.update("jax_enable_x64", True)

import json
import time

import numpy as np
import jax.numpy as jnp

from pylatticedso_tpu import build_lattice
from pylatticedso_tpu.opti import slsqp_polish
from pylatticedso_tpu.opti.ddm_optimizer import DDMOptimizationProblem
from pylatticedso_tpu.opti.density import KrigingDensity

REPLICA = "data/outputs/relative_densities/replica/kriging_replica_csv.npz"
VOXEL = "data/outputs/density_datasets/BCC_Hybrid1_Hybrid4_0.01_0.1_10.gpr.npz"
OUT = Path("data/outputs/optimization_data_files")
SUMMARY = OUT / "refdensity_summary.json"

GEOM3 = ["BCC", "Hybrid1", "Hybrid4"]
SIM = {"enable": True, "material": "VeroClear", "periodicity": True}

CONFIGS = {
    "lbeam": dict(
        config={
            "geometry": {"cell_size": {"x": 1, "y": 1, "z": 1},
                         "number_of_cells": {"x": 6, "y": 1, "z": 6},
                         "radii": [0.1] * 3, "geom_types": GEOM3},
            "supplementary": {"erased_blocks": {"block_0": {
                "start_point": {"x": 3.0, "y": 0.0, "z": 3.0},
                "dimensions_block": {"x": 3.0, "y": 1.0, "z": 3.0}}}},
            "simulation_parameters": SIM,
            "boundary_conditions": {
                "Force": {"Load": {"Surface": ["Xmax", "Zmin"],
                                   "DOF": ["Z"], "Value": [-0.1]}},
                "Displacement": {"Encastre": {
                    "Surface": ["Zmax"],
                    "DOF": ["X", "Y", "Z", "RX", "RY", "RZ"],
                    "Value": [0, 0, 0, 0, 0, 0]}}}},
        constraint={"value": 0.3, "mode": "upper"},
        record="Cantilever_L_beam", ref_obj=4.4029e-3, ref_const=1.1453e-2),
    "inversion": dict(
        config={
            "geometry": {"cell_size": {"x": 1, "y": 1, "z": 1},
                         "number_of_cells": {"x": 10, "y": 1, "z": 5},
                         "radii": [0.1] * 3, "geom_types": GEOM3},
            "simulation_parameters": SIM,
            "boundary_conditions": {
                "Displacement": {
                    "Fixed": {"Surface": ["Xmin", "Zmin"],
                              "DOF": ["X", "Y", "Z", "RX", "RY", "RZ"],
                              "Value": [0, 0, 0, 0, 0, 0],
                              "SurfaceCells": ["Xmin"]},
                    "Sym": {"Surface": ["Zmax"], "DOF": ["Z"], "Value": [0]}},
                "Force": {"Load": {"Surface": ["Xmax", "Zmax"],
                                   "DOF": ["X"], "Value": [-0.1]}}}},
        constraint={"value": 0.3, "mode": "eq"},
        record="Inversion_mechanism", ref_obj=5.5371e-4, ref_const=2.5270e-3),
    "tpb": dict(
        config={
            "geometry": {"cell_size": {"x": 1, "y": 1, "z": 1},
                         "number_of_cells": {"x": 10, "y": 5, "z": 5},
                         "radii": [0.05] * 3, "geom_types": GEOM3},
            "simulation_parameters": SIM,
            "boundary_conditions": {
                "Displacement": {
                    "Fixed": {"Surface": ["Xmax"], "DOF": ["X"],
                              "Value": [0]},
                    "SimpleSupport": {"Surface": ["Xmin", "Zmin"],
                                      "DOF": ["Y", "Z"], "Value": [0, 0],
                                      "SurfaceCells": ["Xmax", "Zmin"]}},
                "Force": {"Load": {"Surface": ["Xmax", "Zmax"],
                                   "DOF": ["Z"], "Value": [-0.1]}}}},
        constraint={"value": 0.15, "mode": "upper"},
        record="Three_point_bending", ref_obj=1.1066e-3, ref_const=4.2292e-3),
}


def mean_density(kd, radii_flat):
    cells = np.asarray(radii_flat, float).reshape(-1, 3)
    f = jax.jit(jax.vmap(kd.mean))
    return float(np.mean(np.asarray(f(jnp.asarray(cells)))))


REF_RECORDS = Path("/root/reference/data/outputs/optimization_data_files")


def run(name: str, replica: KrigingDensity, voxel: KrigingDensity):
    parts = name.split("_")
    base = parts[0]
    constant = "const" in parts[1:]
    # "_ws" variants warm-start from the REFERENCE's own committed final
    # parameters: its inversion and TPB records both terminated on
    # "Iteration limit reached" (solution.success == false), so under the
    # same density model a converged continuation from their last iterate
    # is the apples-to-apples upper bound on their record.
    warmstart = "ws" in parts[1:] or "wsb" in parts[1:]
    # "_wsb": warm-start AND match the reference's ACHIEVED material
    # budget — its committed inversion/TPB points are (slightly)
    # density-INFEASIBLE under its own model (e.g. 0.30063 vs eq 0.3),
    # so re-optimizing with constraint value = their params' replica
    # density is the only fully like-for-like comparison: same
    # evaluator, same density model, same material allowance.
    match_budget = "wsb" in parts[1:]
    spec = CONFIGS[base]
    lattice = build_lattice(spec["config"])
    t0 = time.time()
    problem = DDMOptimizationProblem(
        lattice,
        opt_params={"type": "constant" if constant else "unit_cell"},
        constraints={"relative_density": dict(spec["constraint"])},
        cg_tol=1e-9, cg_maxiter=2000, grid_step=0.01, penalization=True,
        density_model=replica)
    t_off = time.time() - t0
    print(f"[{name}] offline {t_off:.1f} s; {problem.param.n_params} params",
          flush=True)

    if warmstart:
        ref_rec = json.loads(
            (REF_RECORDS / f"{spec['record']}_optimized_expe.json")
            .read_text())
        theta_ref = np.asarray(ref_rec["solution"]["final_parameters"],
                               float)
        assert theta_ref.size == problem.param.n_params, \
            (theta_ref.size, problem.param.n_params)
        problem.param.x0 = np.clip(theta_ref, problem.param.lower,
                                   problem.param.upper)
        # the number that settles the record dispute SAME-EVALUATOR: the
        # reference's own final parameters priced by OUR simulation under
        # ITS density model.  Their logged final_objective came from their
        # evaluator; comparing our optimum to their params under one
        # evaluator removes the remaining simulation-detail delta.
        ref_obj_ours = float(problem.objective(problem.param.x0))
        # their point restored to feasibility by the same uniform-shift
        # projection our own results get (opti.optimizer.project_density):
        # at the inversion's eq-0.3 constraint the restoration removes
        # their 6.3e-4 density excess; the objective it prices THEN is
        # the reference record on a feasible footing.
        x_rest = problem.project_density(problem.param.x0)
        ref_obj_restored = float(problem.objective(x_rest))
        d_ref = float(problem.density(problem.param.x0))
        if match_budget:
            problem.constraints["relative_density"]["value"] = d_ref

    t0 = time.time()
    if warmstart:
        # already (near-)feasible and near-stationary: free SLSQP + polish,
        # no move-limited phase
        result = problem.optimize_slsqp(
            max_iterations=int(os.environ.get("REFDENS_MAXIT", "200")),
            ftol=1e-9, feasible_start=True)
        result = slsqp_polish(
            problem, result, ftol=1e-7,
            max_iterations=int(os.environ.get("REFDENS_POLISH", "100")),
            max_restarts=int(os.environ.get("REFDENS_RESTARTS", "8")))
    elif constant:
        result = problem.optimize_slsqp(max_iterations=50, ftol=1e-6,
                                        feasible_start=True)
    else:
        maxit = int(os.environ.get("REFDENS_MAXIT", "100" if base == "tpb"
                                   else "300"))
        result = problem.optimize_slsqp(max_iterations=maxit, ftol=1e-7,
                                        feasible_start=True, move_limit=0.1)
        result = slsqp_polish(
            problem, result, ftol=1e-6,
            max_iterations=int(os.environ.get("REFDENS_POLISH", "100")),
            max_restarts=int(os.environ.get("REFDENS_RESTARTS", "6")))
    t_on = time.time() - t0

    radii = np.asarray(problem.param.cell_radii(result.theta), float)
    if radii.size == 1:
        radii = np.repeat(radii, 3)
    row = {
        "problem": name,
        "objective": float(result.objective),
        "rho_reference_model": float(result.density),
        "rho_voxel_model": mean_density(voxel, radii),
        "reference_record_objective": (spec["ref_const"] if constant
                                       else spec["ref_obj"]),
        "success": bool(result.success),
        "iterations": int(result.iterations),
        "online_s": round(t_on, 1),
        "offline_s": round(t_off, 1),
    }
    row["beats_reference"] = row["objective"] <= row["reference_record_objective"]
    if warmstart:
        row["reference_params_objective_our_evaluator"] = ref_obj_ours
        row["beats_reference_same_evaluator"] = (
            row["objective"] <= ref_obj_ours)
        row["reference_params_restored_objective"] = ref_obj_restored
        row["beats_reference_restored"] = (
            row["objective"] <= ref_obj_restored)
        row["reference_params_density_replica_preclip"] = d_ref
        if match_budget:
            row["matched_budget"] = d_ref
        rad_ref = np.asarray(problem.param.cell_radii(problem.param.x0),
                             float)
        # their own record logs final_relative_density 0.3000057 for the
        # inversion (eq target 0.3, tolerance 0.0, success false): the
        # committed reference records are (slightly) INFEASIBLE last
        # iterates, ours are converged feasible points.
        row["reference_params_density_replica"] = mean_density(
            replica, rad_ref)
        row["reference_logged_final_density"] = ref_rec["solution"].get(
            "final_relative_density")
    rec = (spec["record"] + "_refdensity"
           + ("_constant" if constant else "")
           + ("_wsb" if match_budget else "_ws" if warmstart else ""))
    problem.save_optimization_json(OUT / f"{rec}.json", result)

    summary = (json.loads(SUMMARY.read_text()) if SUMMARY.exists() else {})
    summary[name] = row
    SUMMARY.write_text(json.dumps(summary, indent=1))
    print(f"[{name}] DONE {json.dumps(row)}", flush=True)


def main():
    replica = KrigingDensity.load(REPLICA)
    voxel = KrigingDensity.load(VOXEL)
    problems = os.environ.get(
        "REFDENS_PROBLEMS",
        "tpb_const,inversion_const,lbeam_const,inversion,lbeam,tpb")
    # cheap constant (1-param) runs first: they alone settle the
    # density-model dispute at the reference's own fixed points
    for name in [p.strip() for p in problems.split(",") if p.strip()]:
        run(name, replica, voxel)


if __name__ == "__main__":
    main()
