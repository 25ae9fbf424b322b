"""Host lattice builder tests.

Golden values were produced by executing the reference implementation
(pyLatticeDesign) on identical configs; bit-exact parity of node coords,
tags, deterministic indices, and relative density was verified offline.
"""

import numpy as np
import pytest

from pylatticedso_tpu import build_lattice


def test_bcc_single_cell(bcc_config):
    lat = build_lattice(bcc_config)
    assert lat.num_cells == 1
    assert lat.num_edges == 8
    assert lat.num_nodes == 9  # 8 corners + center
    assert 0.0 < lat.get_relative_density() < 1.0
    assert lat.get_lattice_boundary_box() == [0, 1, 0, 1, 0, 1]


def test_bcc_222(bcc222_config):
    lat = build_lattice(bcc222_config)
    assert lat.num_cells == 8
    assert lat.num_edges == 64
    assert lat.num_nodes == 35  # 27 corners + 8 centers
    # golden from reference run
    assert abs(lat.get_relative_density() - 0.21764953904070092) < 1e-15


def test_octet_graded_cells():
    lat = build_lattice({
        "geometry": {"cell_size": {"x": 1.5, "y": 1, "z": 2},
                     "number_of_cells": {"x": 3, "y": 2, "z": 2},
                     "radii": [0.08], "geom_types": ["Octet"]}})
    assert (lat.num_cells, lat.num_edges, lat.num_nodes) == (12, 352, 88)
    assert abs(lat.get_relative_density() - 0.2629407493541497) < 1e-12


def test_hybrid_collision_split():
    # BCC diagonals pass through Hybrid1 tetra sites and must be split
    lat = build_lattice({
        "geometry": {"cell_size": {"x": 1, "y": 1, "z": 1},
                     "number_of_cells": {"x": 2, "y": 2, "z": 1},
                     "radii": [0.05, 0.06], "geom_types": ["BCC", "Hybrid1"]}})
    assert (lat.num_cells, lat.num_edges, lat.num_nodes) == (4, 160, 87)
    assert abs(lat.get_relative_density() - 0.17194313584215376) < 1e-12
    # both radii present, types labeled
    assert set(np.unique(lat.edge_type)) == {0, 1}
    assert set(np.round(np.unique(lat.radius), 9)) == {0.05, 0.06}


def test_gradients_and_erased_blocks():
    lat = build_lattice({
        "geometry": {"cell_size": {"x": 1, "y": 1, "z": 1},
                     "number_of_cells": {"x": 3, "y": 3, "z": 3},
                     "radii": [0.05], "geom_types": ["Kelvin"]},
        "gradient": {"radii": {"rule": "linear", "direction_x": True, "parameter_x": 0.2},
                     "cell_dimension": {"rule": "linear", "direction_z": True, "parameter_z": 0.1}},
        "supplementary": {"erased_blocks": {"b1": {
            "start_point": {"x": 0.0, "y": 0.0, "z": 0.0},
            "dimensions_block": {"x": 0.5, "y": 0.5, "z": 0.5}}}}})
    assert lat.num_cells == 26  # one erased
    assert (lat.num_edges, lat.num_nodes) == (732, 420)
    assert abs(lat.get_relative_density() - 0.1365214343756539) < 1e-12
    # graded z sizes: 1 + k * 0.1
    np.testing.assert_allclose(sorted(set(lat.cell_size[:, 2])), [1.0, 1.1, 1.2])
    # graded radii along x
    radii_per_x = [np.unique(lat.radius[np.isin(lat.edge_cell,
                   np.nonzero(lat.cell_pos[:, 0] == i)[0])]) for i in range(3)]
    assert radii_per_x[1].min() > radii_per_x[0].max() - 1e-12


def test_randomness_seeded_reproducible():
    cfg = {"geometry": {"cell_size": {"x": 1, "y": 1, "z": 1},
                        "number_of_cells": {"x": 2, "y": 2, "z": 2},
                        "radii": [0.05], "geom_types": ["BCC"],
                        "enable_randomness": True, "range_radius": [0.02, 0.08]}}
    a = build_lattice(cfg)
    b = build_lattice(cfg)
    np.testing.assert_array_equal(a.radius, b.radius)
    # golden from reference run (random.seed(44) with gauss-interleaved draws)
    assert abs(a.get_relative_density() - 0.07819341451770863) < 1e-15
    assert (a.radius.min() >= 0.02) and (a.radius.max() <= 0.08)


def test_node_tags_cover_faces_edges_corners(bcc222_config):
    lat = build_lattice(bcc222_config)
    tags = set(np.unique(lat.node_tag))
    assert {1000, 1001, 1002, 1003, 1004, 1005, 1006, 1007} <= tags  # corners
    assert {10, 11, 12, 13, 14, 15} <= tags                          # faces
    # center nodes interior
    assert 0 in tags


def test_deterministic_indexing(bcc222_config):
    a = build_lattice(bcc222_config)
    b = build_lattice(bcc222_config)
    np.testing.assert_array_equal(a.edges, b.edges)
    np.testing.assert_array_equal(a.nodes, b.nodes)
    # nodes sorted lexicographically by (x, y, z)
    order = np.lexsort((a.nodes[:, 2], a.nodes[:, 1], a.nodes[:, 0]))
    np.testing.assert_array_equal(order, np.arange(a.num_nodes))


def test_surface_node_selection(bcc222_config):
    lat = build_lattice(bcc222_config)
    xmin_nodes = lat.find_nodes_on_surface(["Xmin"])
    assert np.all(lat.nodes[xmin_nodes, 0] == 0.0)
    # intersection of two surfaces = an edge of the lattice
    edge_nodes = lat.find_nodes_on_surface(["Xmax", "Zmax"])
    assert np.all(lat.nodes[edge_nodes, 0] == 2.0)
    assert np.all(lat.nodes[edge_nodes, 2] == 2.0)
    with pytest.raises(ValueError):
        lat.find_nodes_on_surface(["NotASurface"])


def test_cell_membership_csr(bcc_config):
    lat = build_lattice(bcc_config)
    assert lat.cell_edge_ptr[-1] == lat.num_edges
    assert lat.cell_node_ptr[-1] == lat.num_nodes
    # all of the single cell's beams belong to cell 0
    np.testing.assert_array_equal(
        np.sort(lat.cell_edge_idx), np.arange(lat.num_edges))


def test_shared_beams_counted_in_both_cells():
    # Cubic cells share their face edges; beams dedup but membership is dual
    lat = build_lattice({
        "geometry": {"cell_size": {"x": 1, "y": 1, "z": 1},
                     "number_of_cells": {"x": 2, "y": 1, "z": 1},
                     "radii": [0.05], "geom_types": ["Cubic"]}})
    assert lat.num_edges == 20  # 24 - 4 shared
    counts = np.diff(lat.cell_edge_ptr)
    assert counts.tolist() == [12, 12]  # shared edges in both cells


def test_config_validation_errors():
    with pytest.raises(ValueError):
        build_lattice({"geometry": {"cell_size": {"x": -1, "y": 1, "z": 1},
                                    "number_of_cells": {"x": 1, "y": 1, "z": 1},
                                    "radii": [0.1], "geom_types": ["BCC"]}})
    with pytest.raises(ValueError):
        build_lattice({"geometry": {"cell_size": {"x": 1, "y": 1, "z": 1},
                                    "number_of_cells": {"x": 1, "y": 1, "z": 1},
                                    "radii": [0.1, 0.2], "geom_types": ["BCC"]}})
    with pytest.raises(ValueError):
        build_lattice({"geometry": {}})
