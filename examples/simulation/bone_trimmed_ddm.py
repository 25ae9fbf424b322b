"""Bone-shaped hybrid lattice solved by the heterogeneous DDM path.

The reference ships the Bone_cuted_hybrid preset
(data/inputs/preset_lattice/optimization/Bone_cuted_hybrid.json) and the
CutedBone.stl trim surface (data/inputs/mesh_file/): a 3-geometry hybrid
lattice clipped to a bone segment, whose surface cells lose beams and end
up with DIFFERENT boundary-node counts per cell.  The DDM solver groups
cells by their exact local subgraph and batches the interface operator per
group (ddm/solver.py), so mixed topologies cost one extra GEMM per group —
the TPU equivalent of the reference's per-cell Schur loop
(lattice_sim.py:1227-1252).

BONE_N=x,y,z overrides the grid (default 5x5x8 so the full-FEM
cross-check stays minutes-scale on a throttled host; the committed
preset is 10x10x16).  BONE_FEM=0 skips the FEM oracle.
"""
import os
import sys
import time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
# host-sized problem (70 surface cells, ~2k interface DOFs): the trim and
# the per-group condensations are host-bound, so default to CPU x64;
# PLDSO_PLATFORM=tpu runs the interface solve on the accelerator instead
# (f32 device operator + refined residuals, ddm/solver.py).
jax.config.update("jax_platforms", os.environ.get("PLDSO_PLATFORM", "cpu"))
jax.config.update("jax_enable_x64", True)

import numpy as np

from pylatticedso_tpu import build_lattice
from pylatticedso_tpu.design.mesh_trimmer import MeshTrimmer
from pylatticedso_tpu.ddm.solver import build_ddm_system, solve_ddm

nx, ny, nz = (int(v) for v in os.environ.get("BONE_N", "5,5,8").split(","))

lat = build_lattice({
    "geometry": {"cell_size": {"x": 1, "y": 1, "z": 1},
                 "number_of_cells": {"x": nx, "y": ny, "z": nz},
                 "radii": [0.05, 0.03, 0.02],
                 "geom_types": ["BCC", "Hybrid1", "Hybrid4"]},
    "simulation_parameters": {"enable": True, "material": "VeroClear",
                              "periodicity": False},
    "boundary_conditions": {
        "Displacement": {"Fixed": {"Surface": ["Zmin"],
                                   "DOF": ["X", "Y", "Z", "RX", "RY", "RZ"],
                                   "Value": [0, 0, 0, 0, 0, 0]}},
        "Force": {"Load": {"Surface": ["Zmax"], "DOF": ["Z"],
                           "Value": [-0.1]}}}})
print(f"hybrid lattice: {lat.num_cells} cells, {lat.num_edges} beams")

tm = MeshTrimmer(Path("data/inputs/mesh_file/CutedBone.stl"))
tm.move_mesh_to_origin()
# fit the bone's long axis to the lattice height — slightly OVERSIZED in z
# so the bone's flat cut faces sit outside the lattice (nodes exactly on
# the z=0 / z=nz planes must be strictly INSIDE the mesh to keep their
# Zmin/Zmax tags for the boundary conditions) — and centre it in x/y
bb = tm.triangles.reshape(-1, 3)
tm.scale_mesh((nz + 0.2) / bb[:, 2].max())
bb = tm.triangles.reshape(-1, 3)
tm.translate_mesh([nx / 2 - bb[:, 0].mean(), ny / 2 - bb[:, 1].mean(), -0.1])

t0 = time.time()
tm.trim_lattice(lat)
print(f"trimmed in {time.time()-t0:.1f} s: {lat.num_cells} cells, "
      f"{lat.num_edges} beams, {lat.num_nodes} nodes")

t0 = time.time()
# penalization=False: matches the FEM oracle below and routes every group
# through the chained condensation (~1000x cheaper than dense per group)
sys_ = build_ddm_system(lat, penalization=False)
nbs = sorted({int(b.shape[1]) for b in sys_.bn_groups})
print(f"DDM system: {len(sys_.S)} Schur groups, boundary-node counts {nbs}, "
      f"built in {time.time()-t0:.1f} s")

t0 = time.time()
ddm = solve_ddm(lat, system=sys_, tol=1e-10)
print(f"DDM solve: {ddm.iterations} CG iterations, {time.time()-t0:.1f} s, "
      f"compliance {ddm.compliance:.6e}")

if os.environ.get("BONE_FEM", "1") != "0":
    from pylatticedso_tpu.fem import solve_fem
    t0 = time.time()
    fem = solve_fem(lat, subdivide_h=0.05, penalization=False, tol=1e-12)
    iface = sys_.interface_nodes
    rel = np.linalg.norm(ddm.u[iface] - fem.u[iface]) \
        / np.linalg.norm(fem.u[iface])
    print(f"FEM solve: {fem.iterations} CG iterations, {time.time()-t0:.1f} s, "
          f"compliance {fem.compliance:.6e}")
    print(f"FEM-vs-DDM interface rel L2: {rel:.3e}")

if os.environ.get("BONE_OPT", "1") != "0":
    # per-topology-group surrogate optimization: every unique trimmed-cell
    # subgraph gets its own greedy-RB + RBF surrogate S_g(r), and the
    # interface operator batches per group (opti/ddm_optimizer.py) — the
    # reference's MeshTrimmer + DDM workflow (mesh_trimmer.py:130,
    # lattice_sim.py:1227-1252) taken all the way to design optimization.
    from pylatticedso_tpu.opti.ddm_optimizer import DDMOptimizationProblem

    t0 = time.time()
    prob = DDMOptimizationProblem(
        lat, opt_params={"type": "unit_cell"},
        constraints={"relative_density": {"value": 0.10, "mode": "upper"}},
        objective_type="compliance", min_radius=0.02,
        # 5 samples/axis (0.02): coarser grids leave the 3-D RBF too sparse
        # — SLSQP then walks into surrogate-indefinite corners and every
        # trial gets rejected (compliance guard in ddm_optimizer._eval)
        grid_step=float(os.environ.get("BONE_GRID_STEP", "0.02")),
        target_h=float(os.environ.get("BONE_TARGET_H", "0.2")),
        cg_tol=1e-9, cg_maxiter=4000)
    print(f"offline per-group surrogates: {len(prob._groups)} topology "
          f"groups in {time.time()-t0:.1f} s")
    v0 = prob.objective(prob.param.x0)
    t0 = time.time()
    res = prob.optimize_slsqp(
        max_iterations=int(os.environ.get("BONE_OPT_ITERS", "15")),
        feasible_start=True, move_limit=0.1)
    print(f"optimized: compliance {v0:.6e} -> {res.objective:.6e} "
          f"(density {res.density:.4f}) in {time.time()-t0:.1f} s, "
          f"{res.iterations} iterations, success={res.success}")
