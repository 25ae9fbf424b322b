"""System-level FEM oracles: analytic beams, dense cross-checks, config BCs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pylatticedso_tpu import build_lattice
from pylatticedso_tpu.fem import (apply_boundary_conditions, assemble_dense,
                                  build_operator, pcg, linear_solve, solve_fem,
                                  subdivide_edges, KAPPA)
from pylatticedso_tpu.fem.statics import StaticProblem
from pylatticedso_tpu.fem.bc import BCArrays

E_MOD, NU = 1013.0, 0.3
G_MOD = E_MOD / (2 * (1 + NU))


def straight_beam_problem(n_elem, L=1.0, r=0.05, tip_force=0.01):
    """Cantilever along x, tip load in z."""
    nodes = np.zeros((n_elem + 1, 3))
    nodes[:, 0] = np.linspace(0, L, n_elem + 1)
    edges = np.stack([np.arange(n_elem), np.arange(1, n_elem + 1)], axis=1).astype(np.int32)
    radius = np.full(n_elem, r)
    N = n_elem + 1
    fixed = np.zeros((N, 6), dtype=bool); fixed[0] = True
    f = np.zeros((N, 6)); f[-1, 2] = tip_force
    bc = BCArrays(fixed=fixed, u_imposed=np.zeros((N, 6)), f_applied=f)
    return StaticProblem(nodes, edges, radius, E_MOD, NU, bc, N)


def test_cantilever_converges_to_analytic_timoshenko():
    L, r, P = 1.0, 0.05, 0.01
    S = np.pi * r**2; I = np.pi * r**4 / 4
    analytic = P * L**3 / (3 * E_MOD * I) + P * L / (KAPPA * G_MOD * S)
    errs = []
    for n in (4, 16, 64):
        prob = straight_beam_problem(n, L, r, P)
        u, it, res = prob.solve(tol=1e-14)
        errs.append(abs(float(u[-1, 2]) - analytic) / analytic)
    # linear element with reduced shear: O(h^2) convergence
    assert errs[-1] < 1e-3
    assert errs[0] / errs[1] > 10 and errs[1] / errs[2] > 10


def test_axial_bar_exact_with_one_element():
    """Axial response is exact for linear elements at any discretization."""
    L, r, P = 2.0, 0.03, 0.5
    prob = straight_beam_problem(1, L, r, 0.0)
    f = np.zeros((2, 6)); f[-1, 0] = P
    prob.f_applied = jnp.asarray(f)
    u, _, _ = prob.solve(tol=1e-14)
    S = np.pi * r**2
    np.testing.assert_allclose(float(u[-1, 0]), P * L / (E_MOD * S), rtol=1e-10)


def test_pcg_matches_dense_solve_on_lattice():
    lat = build_lattice({"geometry": {"cell_size": {"x": 1, "y": 1, "z": 1},
                                      "number_of_cells": {"x": 2, "y": 2, "z": 2},
                                      "radii": [0.08], "geom_types": ["BCC"]}})
    N = lat.num_nodes
    fixed = np.zeros((N, 6), dtype=bool)
    fixed[lat.nodes[:, 2] == 0.0] = True
    f = np.zeros((N, 6)); f[lat.nodes[:, 2] == 2.0, 2] = -0.01
    bc = BCArrays(fixed=fixed, u_imposed=np.zeros((N, 6)), f_applied=f)
    prob = StaticProblem(lat.nodes, lat.edges, lat.radius, E_MOD, NU, bc, N)
    u, it, res = prob.solve(tol=1e-13)
    # dense reference on free dofs
    K = np.asarray(assemble_dense(lat.nodes, lat.edges, lat.radius, E_MOD, NU))
    free = (~fixed).reshape(-1)
    Kff = K[np.ix_(free, free)]
    u_ref = np.zeros(6 * N)
    u_ref[free] = np.linalg.solve(Kff, f.reshape(-1)[free])
    np.testing.assert_allclose(np.asarray(u).reshape(-1), u_ref, rtol=1e-8, atol=1e-12)


def test_solve_fem_from_config_bcs():
    lat = build_lattice({
        "geometry": {"cell_size": {"x": 1, "y": 1, "z": 1},
                     "number_of_cells": {"x": 2, "y": 1, "z": 1},
                     "radii": [0.08], "geom_types": ["BCC"]},
        "simulation_parameters": {"enable": True, "material": "VeroClear"},
        "boundary_conditions": {
            "Displacement": {
                "Fixed": {"Surface": ["Xmin"], "DOF": ["X", "Y", "Z", "RX", "RY", "RZ"],
                          "Value": [0, 0, 0, 0, 0, 0]},
                "Push": {"Surface": ["Xmax"], "DOF": ["X"], "Value": [-0.01]}}}})
    res = solve_fem(lat, tol=1e-13)
    # imposed displacement respected
    xmax = lat.nodes[:, 0] == 2.0
    np.testing.assert_allclose(res.u[xmax, 0], -0.01, atol=1e-12)
    xmin = lat.nodes[:, 0] == 0.0
    np.testing.assert_allclose(res.u[xmin], 0.0, atol=1e-12)
    # global equilibrium: reactions balance (no applied force here)
    np.testing.assert_allclose(res.reaction.sum(axis=0)[:3], 0.0, atol=1e-9)
    assert res.compliance > 0
    # energy equals compliance/2 for pure Dirichlet problems
    np.testing.assert_allclose(res.energy, res.compliance / 2, rtol=1e-8)


def test_force_split_over_surface_nodes():
    lat = build_lattice({
        "geometry": {"cell_size": {"x": 1, "y": 1, "z": 1},
                     "number_of_cells": {"x": 2, "y": 2, "z": 2},
                     "radii": [0.08], "geom_types": ["BCC"]},
        "boundary_conditions": {
            "Displacement": {"Fixed": {"Surface": ["Zmin"],
                                       "DOF": ["X", "Y", "Z", "RX", "RY", "RZ"],
                                       "Value": [0, 0, 0, 0, 0, 0]}},
            "Force": {"Load": {"Surface": ["Zmax"], "DOF": ["Z"], "Value": [-0.9]}}}})
    bc = apply_boundary_conditions(lat)
    zmax_nodes = np.nonzero(lat.nodes[:, 2] == 2.0)[0]
    np.testing.assert_allclose(bc.f_applied[:, 2].sum(), -0.9, atol=1e-12)
    per = bc.f_applied[zmax_nodes, 2]
    assert np.allclose(per, per[0]) and abs(per[0] * len(zmax_nodes) + 0.9) < 1e-12


def test_subdivision_preserves_solution():
    """Refining an axially loaded bar must not change nodal results."""
    L, r, P = 1.0, 0.05, 0.01
    for n in (1, 5):
        prob = straight_beam_problem(n, L, r, 0.0)
        f = np.zeros((n + 1, 6)); f[-1, 0] = P
        prob.f_applied = jnp.asarray(f)
        u, _, _ = prob.solve(tol=1e-14)
        S = np.pi * r**2
        np.testing.assert_allclose(float(u[-1, 0]), P * L / (E_MOD * S), rtol=1e-10)


def test_subdivide_edges_structure():
    nodes = np.array([[0., 0., 0.], [1., 0., 0.], [1., 1., 0.]])
    edges = np.array([[0, 1], [1, 2]], dtype=np.int32)
    rad = np.array([0.1, 0.2])
    nn, ne, parent, nr = subdivide_edges(nodes, edges, n_segments=np.array([3, 1]),
                                         edge_data=(rad,))
    assert len(nn) == 5 and len(ne) == 4
    np.testing.assert_array_equal(parent, [0, 0, 0, 1])
    np.testing.assert_allclose(nr, [0.1, 0.1, 0.1, 0.2])
    # chain connectivity preserved
    np.testing.assert_allclose(nn[3], [1 / 3, 0, 0])


def test_linear_solve_is_differentiable():
    """d(compliance)/d(radius) via implicit diff matches finite differences."""
    lat = build_lattice({"geometry": {"cell_size": {"x": 1, "y": 1, "z": 1},
                                      "number_of_cells": {"x": 1, "y": 1, "z": 1},
                                      "radii": [0.08], "geom_types": ["BCC"]}})
    N = lat.num_nodes
    fixed = np.zeros((N, 6), dtype=bool); fixed[lat.nodes[:, 2] == 0.0] = True
    f_np = np.zeros((N, 6)); f_np[lat.nodes[:, 2] == 1.0, 2] = -0.01
    free = jnp.asarray(~fixed, dtype=jnp.float64)
    f = jnp.asarray(f_np)
    nodes = jnp.asarray(lat.nodes); edges = jnp.asarray(lat.edges, dtype=jnp.int32)

    def compliance(r):
        op = build_operator(nodes, edges, r, E_MOD, NU)
        A = lambda u: free * op.matvec(free * u) + (1 - free) * u
        u = linear_solve(A, free * f, maxiter=500, tol=1e-14)
        return jnp.sum(f * u)

    r0 = jnp.full(lat.num_edges, 0.08)
    g = jax.grad(compliance)(r0)
    h = 1e-6
    for k in (0, 3):
        e = jnp.zeros_like(r0).at[k].set(h)
        fd = (compliance(r0 + e) - compliance(r0 - e)) / (2 * h)
        np.testing.assert_allclose(g[k], fd, rtol=1e-5)
