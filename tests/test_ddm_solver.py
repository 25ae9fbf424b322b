"""DDM interface solver: FEM-vs-DDM cross-check (compare_FEM_DDM.py oracle)."""

import numpy as np
import pytest

from pylatticedso_tpu import build_lattice
from pylatticedso_tpu.ddm.solver import build_ddm_system, solve_ddm
from pylatticedso_tpu.fem import solve_fem


def make_lattice(geom="BCC", n=(2, 2, 2), r=0.08, force=False):
    bc = {
        "Displacement": {
            "Fixed": {"Surface": ["Zmin"], "DOF": ["X", "Y", "Z", "RX", "RY", "RZ"],
                      "Value": [0, 0, 0, 0, 0, 0]},
        }
    }
    if force:
        bc["Force"] = {"Load": {"Surface": ["Zmax"], "DOF": ["Z"], "Value": [-0.5]}}
    else:
        bc["Displacement"]["Push"] = {"Surface": ["Zmax"], "DOF": ["Z"], "Value": [-0.01]}
    return build_lattice({
        "geometry": {"cell_size": {"x": 1, "y": 1, "z": 1},
                     "number_of_cells": {"x": n[0], "y": n[1], "z": n[2]},
                     "radii": [r], "geom_types": [geom]},
        "simulation_parameters": {"enable": True, "material": "VeroClear",
                                  "periodicity": False,
                                  "DDM": {"enable_preconditioner": True,
                                          "preconditioner_type": "mean",
                                          "max_iterations": 2000,
                                          "schur_complement_computation": {"type": "exact"}}},
        "boundary_conditions": bc})


@pytest.mark.parametrize("force", [False, True])
def test_ddm_matches_full_fem(force):
    """Interface displacements from DDM equal full-FEM nodal values.

    Both use the identical per-cell discretization (penalization +
    subdivision h=0.05), so agreement is algebraic: rel L2 < 1e-8, the
    reference's own oracle (examples/simulation/compare_FEM_DDM.py:36-37).
    """
    lat = make_lattice(force=force)
    ddm = solve_ddm(lat, tol=1e-12)
    fem = solve_fem(lat, subdivide_h=0.05, penalization=True, tol=1e-13)
    mask = np.zeros(lat.num_nodes, dtype=bool)
    sys_nodes = ddm.u.any(axis=1) | (np.abs(ddm.reaction).sum(1) > 0)
    # compare on interface nodes
    from pylatticedso_tpu.ddm.solver import build_ddm_system
    sys_ = build_ddm_system(lat)
    iface = sys_.interface_nodes
    du = ddm.u[iface] - fem.u[iface]
    rel = np.linalg.norm(du) / np.linalg.norm(fem.u[iface])
    assert rel < 1e-8, f"FEM-vs-DDM rel L2 error {rel:.2e}"
    # compliance agrees
    np.testing.assert_allclose(ddm.compliance, fem.compliance, rtol=1e-8)


def test_ddm_preconditioners_agree():
    lat = make_lattice(n=(2, 2, 1))
    sys_ = build_ddm_system(lat)
    u_none = solve_ddm(lat, system=sys_, preconditioner="none", tol=1e-12)
    u_jac = solve_ddm(lat, system=sys_, preconditioner="jacobi", tol=1e-12)
    u_blk = solve_ddm(lat, system=sys_, preconditioner="block_jacobi", tol=1e-12)
    np.testing.assert_allclose(u_jac.u, u_none.u, atol=1e-8)
    np.testing.assert_allclose(u_blk.u, u_none.u, atol=1e-8)
    # block-Jacobi should not be slower than unpreconditioned
    assert u_blk.iterations <= u_none.iterations + 5


def test_ddm_groups_by_radius():
    """Graded radii create multiple Schur groups but one per unique value."""
    lat = build_lattice({
        "geometry": {"cell_size": {"x": 1, "y": 1, "z": 1},
                     "number_of_cells": {"x": 3, "y": 1, "z": 1},
                     "radii": [0.06], "geom_types": ["BCC"]},
        "gradient": {"radii": {"rule": "linear", "direction_x": True,
                               "parameter_x": 0.3}},
        "simulation_parameters": {"enable": True, "material": "VeroClear"},
        "boundary_conditions": {
            "Displacement": {
                "Fixed": {"Surface": ["Xmin"], "DOF": ["X", "Y", "Z", "RX", "RY", "RZ"],
                          "Value": [0, 0, 0, 0, 0, 0]},
                "Push": {"Surface": ["Xmax"], "DOF": ["X"], "Value": [0.01]}}}})
    sys_ = build_ddm_system(lat)
    assert len(sys_.S) == 3  # three distinct radii
    res = solve_ddm(lat, system=sys_, tol=1e-12)
    fem = solve_fem(lat, subdivide_h=0.05, penalization=True, tol=1e-13)
    iface = sys_.interface_nodes
    rel = np.linalg.norm(res.u[iface] - fem.u[iface]) / np.linalg.norm(fem.u[iface])
    assert rel < 1e-8


def test_refined_f32_ddm_reaches_f64_accuracy():
    """An f32-assembled interface system + refined solve (auto-enabled at
    tol below the f32 floor) matches the f64 DDM solution — the TPU route
    to the reference's PETSc-f64 tol-1e-9 semantics (lattice_sim.py:1111)."""
    import jax.numpy as jnp
    lat = make_lattice(n=(2, 2, 1), force=True)
    r64 = solve_ddm(lat, tol=1e-12)
    sys32 = build_ddm_system(lat, dtype=jnp.float32)
    assert sys32.S[0].dtype == jnp.float32
    r32 = solve_ddm(lat, system=sys32, tol=1e-10)      # auto refined=True
    rel = np.linalg.norm(r32.u - r64.u) / np.linalg.norm(r64.u)
    assert rel < 1e-8, f"refined f32 DDM vs f64 rel err {rel:.2e}"
    np.testing.assert_allclose(r32.compliance, r64.compliance, rtol=5e-8)
    # and WITHOUT refinement the same f32 system cannot get there
    plain = solve_ddm(lat, system=sys32, tol=1e-10, refined=False)
    rel_plain = np.linalg.norm(plain.u - r64.u) / np.linalg.norm(r64.u)
    assert rel_plain > rel * 10


def test_heterogeneous_trimmed_ddm_matches_fem():
    """Mixed-topology DDM: a mesh-trimmed lattice (per-cell boundary-node
    counts 4/6/8) grouped per unique local subgraph solves to the FEM
    solution — the reference's per-cell heterogeneous loop
    (lattice_sim.py:1227-1252) done as batched per-group GEMMs."""
    from pylatticedso_tpu.design.mesh_trimmer import MeshTrimmer

    def octahedron(center, R):
        c = np.asarray(center, float)
        vx = [c + R * np.asarray(v) for v in
              [(1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0), (0, 0, 1), (0, 0, -1)]]
        faces = [(0, 2, 4), (2, 1, 4), (1, 3, 4), (3, 0, 4),
                 (2, 0, 5), (1, 2, 5), (3, 1, 5), (0, 3, 5)]
        return np.asarray([[vx[i], vx[j], vx[k]] for i, j, k in faces])

    lat = make_lattice(n=(3, 3, 3), force=True)
    MeshTrimmer(octahedron((1.5, 1.5, 1.5), 3.2)).trim_lattice(lat)
    sys_ = build_ddm_system(lat)
    assert not sys_.homogeneous
    assert len({bn.shape[1] for bn in sys_.bn_groups}) >= 2
    ddm = solve_ddm(lat, system=sys_, tol=1e-12)
    fem = solve_fem(lat, subdivide_h=0.05, penalization=True, tol=1e-13)
    iface = sys_.interface_nodes
    rel = np.linalg.norm(ddm.u[iface] - fem.u[iface]) / np.linalg.norm(fem.u[iface])
    assert rel < 1e-8, f"heterogeneous FEM-vs-DDM rel err {rel:.2e}"
    np.testing.assert_allclose(ddm.compliance, fem.compliance, rtol=1e-8)
