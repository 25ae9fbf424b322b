"""Symmetry, cleanup transforms, FE2 inner solve, force-displacement curve."""

import numpy as np
import pytest

from pylatticedso_tpu import build_lattice
from pylatticedso_tpu.design.cleanup import (delete_beams_under_radius_threshold,
                                             delete_unconnected_beams,
                                             merge_degree2_nodes)
from pylatticedso_tpu.fem.bc import apply_boundary_conditions
from pylatticedso_tpu.fem import solve_fem
from pylatticedso_tpu.sim.utils_simulation import (force_displacement_curve,
                                                   get_homogenized_properties,
                                                   solve_fem_cell)


def test_symmetry_mirrors_cells():
    lat = build_lattice({
        "geometry": {"cell_size": {"x": 1, "y": 1, "z": 1},
                     "number_of_cells": {"x": 2, "y": 1, "z": 1},
                     "radii": [0.05], "geom_types": ["BCC"]},
        "supplementary": {"symmetries": {"plane": "YZ",
                                         "reference_point": {"x": 0.0, "y": 0.0,
                                                             "z": 0.0}}}})
    assert lat.num_cells == 4
    b = lat.get_lattice_boundary_box()
    assert b[0] == -2.0 and b[1] == 2.0
    # mirror symmetry of the node cloud about x=0
    pts = set(map(tuple, np.round(lat.nodes, 9)))
    for x, y, z in list(pts)[:50]:
        assert (np.round(-x, 9) + 0.0, y, z) in pts


def test_symmetry_invalid_plane():
    with pytest.raises(ValueError):
        build_lattice({
            "geometry": {"cell_size": {"x": 1, "y": 1, "z": 1},
                         "number_of_cells": {"x": 1, "y": 1, "z": 1},
                         "radii": [0.05], "geom_types": ["BCC"]},
            "supplementary": {"symmetries": {"plane": "QQ",
                                             "reference_point": {"x": 0}}}})


def test_merge_degree2_nodes():
    lat = build_lattice({"geometry": {"cell_size": {"x": 1, "y": 1, "z": 1},
                                      "number_of_cells": {"x": 1, "y": 1, "z": 1},
                                      "radii": [0.05], "geom_types": ["BCCZ"]}})
    # BCCZ has a degree-2 chain: bottom-face center - body center - top center
    n0 = lat.num_edges
    merged = merge_degree2_nodes(lat)
    # body center has degree 10 (8 diagonals + 2 z struts): nothing collinear
    # except the z chain through it? center has degree 10 -> not merged.
    # face centers (0.5,0.5,0) have degree 1 -> untouched. So merged == 0.
    assert merged == 0 and lat.num_edges == n0
    # construct an explicit chain instead
    lat.edges = np.array([[0, 1], [1, 2]], dtype=np.int32)
    lat.nodes = np.array([[0., 0., 0.], [0.5, 0., 0.], [1., 0., 0.]])
    lat.node_tag = np.zeros(3, dtype=np.int32)
    lat.radius = np.array([0.05, 0.05])
    lat.edge_type = np.zeros(2, dtype=np.int32)
    lat.edge_mat = np.zeros(2, dtype=np.int32)
    lat.edge_cell = np.zeros(2, dtype=np.int32)
    merged = merge_degree2_nodes(lat)
    assert merged == 1
    assert lat.num_edges == 1 and lat.num_nodes == 2
    np.testing.assert_allclose(lat.nodes, [[0, 0, 0], [1, 0, 0]])


def test_delete_unconnected_beams():
    lat = build_lattice({"geometry": {"cell_size": {"x": 1, "y": 1, "z": 1},
                                      "number_of_cells": {"x": 1, "y": 1, "z": 1},
                                      "radii": [0.05], "geom_types": ["BCCZ"]}})
    # the two z half-struts end at face centers with degree 1 -> pruned,
    # then the whole BCC star survives (corners have degree 1 but after
    # removing z struts the diagonals become leaves too...)
    removed, nodes_removed = delete_unconnected_beams(lat)
    # everything is a tree from the center: all beams are eventually leaves
    assert removed == 10
    assert lat.num_edges == 0


def test_delete_under_radius():
    lat = build_lattice({"geometry": {"cell_size": {"x": 1, "y": 1, "z": 1},
                                      "number_of_cells": {"x": 2, "y": 1, "z": 1},
                                      "radii": [0.05], "geom_types": ["BCC"]}})
    lat.radius[:4] = 0.001
    n = delete_beams_under_radius_threshold(lat, threshold=0.01)
    assert n == 4 and lat.num_edges == 12


def test_solve_fem_cell_matches_schur_product():
    """FE^2 inner solve reproduces S @ u for the same cell discretization."""
    import jax.numpy as jnp
    from pylatticedso_tpu.ddm.schur import discretize_cell, schur_complement

    lat = build_lattice({
        "geometry": {"cell_size": {"x": 1, "y": 1, "z": 1},
                     "number_of_cells": {"x": 1, "y": 1, "z": 1},
                     "radii": [0.06], "geom_types": ["BCC"]},
        "simulation_parameters": {"enable": True, "material": "VeroClear"}})
    disc = discretize_cell(lat, penalization=False, target_h=0.05)
    S = np.asarray(schur_complement(disc, np.array([0.06]), 1013.0, 0.3))
    rng = np.random.default_rng(0)
    nb = disc.n_boundary_nodes
    u_b = rng.normal(size=(nb, 6)) * 1e-3
    res = solve_fem_cell(lat, 0, u_b, target_h=0.05, tol=1e-14)
    # reactions at boundary nodes == S @ u_b
    from pylatticedso_tpu.sim.boundary_order import boundary_node_order
    b_local = boundary_node_order(lat.nodes, [0, 1, 0, 1, 0, 1])
    r = res.reaction[b_local].reshape(-1)
    np.testing.assert_allclose(r, S @ u_b.reshape(-1), rtol=1e-6, atol=1e-10)


def test_force_displacement_curve():
    lat = build_lattice({
        "geometry": {"cell_size": {"x": 1, "y": 1, "z": 1},
                     "number_of_cells": {"x": 1, "y": 1, "z": 2},
                     "radii": [0.08], "geom_types": ["BCC"]},
        "simulation_parameters": {"enable": True, "material": "VeroClear"},
        "boundary_conditions": {
            "Displacement": {"Fixed": {"Surface": ["Zmin"],
                                       "DOF": ["X", "Y", "Z", "RX", "RY", "RZ"],
                                       "Value": [0, 0, 0, 0, 0, 0]},
                             "Crush": {"Surface": ["Zmax"], "DOF": ["Z"],
                                       "Value": [-0.02]}}}})
    bc = apply_boundary_conditions(lat)
    res = solve_fem(lat, tol=1e-12)
    disp, force = force_displacement_curve(lat, res, bc, dof=2)
    assert force > 0
    assert np.isclose(disp.min(), -0.02)
    # linearity: doubled displacement doubles the total reaction
    lat2 = build_lattice({
        "geometry": {"cell_size": {"x": 1, "y": 1, "z": 1},
                     "number_of_cells": {"x": 1, "y": 1, "z": 2},
                     "radii": [0.08], "geom_types": ["BCC"]},
        "simulation_parameters": {"enable": True, "material": "VeroClear"},
        "boundary_conditions": {
            "Displacement": {"Fixed": {"Surface": ["Zmin"],
                                       "DOF": ["X", "Y", "Z", "RX", "RY", "RZ"],
                                       "Value": [0, 0, 0, 0, 0, 0]},
                             "Crush": {"Surface": ["Zmax"], "DOF": ["Z"],
                                       "Value": [-0.04]}}}})
    bc2 = apply_boundary_conditions(lat2)
    res2 = solve_fem(lat2, tol=1e-12)
    _, force2 = force_displacement_curve(lat2, res2, bc2, dof=2)
    np.testing.assert_allclose(force2, 2 * force, rtol=1e-6)


def test_homogenized_properties_single_cell_guard():
    lat = build_lattice({"geometry": {"cell_size": {"x": 1, "y": 1, "z": 1},
                                      "number_of_cells": {"x": 2, "y": 1, "z": 1},
                                      "radii": [0.05], "geom_types": ["BCC"]}})
    with pytest.raises(ValueError):
        get_homogenized_properties(lat)
