"""Aux subsystems: export, checkpoint, timing, transforms, mesh trimmer, plotting."""

import json
import struct

import numpy as np
import pytest

from pylatticedso_tpu import build_lattice
from pylatticedso_tpu.design import transforms
from pylatticedso_tpu.design.mesh_trimmer import MeshTrimmer, load_stl
from pylatticedso_tpu.io.checkpoint import load_lattice, save_lattice
from pylatticedso_tpu.io.export import (export_simulation_vtu,
                                        save_json_to_grasshopper, write_pvd,
                                        write_stl_cylinders, write_vtu)
from pylatticedso_tpu.utils.timing import Timing


def small_lattice(n=(2, 2, 2), geom="BCC"):
    return build_lattice({"geometry": {
        "cell_size": {"x": 1, "y": 1, "z": 1},
        "number_of_cells": {"x": n[0], "y": n[1], "z": n[2]},
        "radii": [0.05], "geom_types": [geom]}})


# ------------------------------------------------------------------ export
def test_vtu_roundtrip_structure(tmp_path):
    lat = small_lattice()
    p = tmp_path / "lat.vtu"
    export_simulation_vtu(p, lat)
    text = p.read_text()
    assert "UnstructuredGrid" in text and "connectivity" in text
    assert f'NumberOfCells="{lat.num_edges}"' in text


def test_pvd(tmp_path):
    files = [tmp_path / "a.vtu", tmp_path / "b.vtu"]
    write_pvd(tmp_path / "c.pvd", files, [0.0, 1.0])
    assert "a.vtu" in (tmp_path / "c.pvd").read_text()


def test_grasshopper_json(tmp_path):
    lat = small_lattice()
    out = save_json_to_grasshopper(lat, tmp_path / "gh.json")
    data = json.loads(out[0].read_text())
    assert len(data["nodesX"]) == 2 * len(data["radii"])
    assert data["maxX"] == 2.0 and data["relativeDensity"] > 0
    parts = save_json_to_grasshopper(lat, tmp_path / "gh2.json", multiple_parts=2)
    assert len(parts) == 2


def test_stl_cylinders(tmp_path):
    lat = small_lattice(n=(1, 1, 1))
    p = tmp_path / "lat.stl"
    write_stl_cylinders(p, lat, n_sides=6)
    raw = p.read_bytes()
    n_tri = struct.unpack("<I", raw[80:84])[0]
    # 2 wall triangles + 2 end-cap triangles per side (watertight tubes)
    assert n_tri == lat.num_edges * 6 * 4
    tris = load_stl(p)
    assert tris.shape == (n_tri, 3, 3)


# -------------------------------------------------------------- checkpoint
def test_lattice_checkpoint_roundtrip(tmp_path):
    lat = small_lattice()
    p = tmp_path / "lat.npz"
    save_lattice(lat, p)
    lat2 = load_lattice(p)
    np.testing.assert_array_equal(lat.nodes, lat2.nodes)
    np.testing.assert_array_equal(lat.edges, lat2.edges)
    np.testing.assert_array_equal(lat.radius, lat2.radius)
    assert lat2.config.geom_types == ["BCC"]
    assert abs(lat2.get_relative_density() - lat.get_relative_density()) < 1e-15


# ------------------------------------------------------------------ timing
def test_timing_counts_and_hierarchy(capsys):
    t = Timing()

    @t.timeit
    def inner():
        pass

    @t.timeit
    def outer():
        inner()

    outer(); outer()
    assert t.count("test_timing_counts_and_hierarchy.<locals>.outer") == 2
    assert t.count("test_timing_counts_and_hierarchy.<locals>.inner") == 2
    kids = t.children("test_timing_counts_and_hierarchy.<locals>.outer")
    assert "test_timing_counts_and_hierarchy.<locals>.inner" in kids
    out = t.summary()
    assert "outer" in out
    # pickle-safe
    import pickle
    t2 = pickle.loads(pickle.dumps(t))
    assert t2.count("test_timing_counts_and_hierarchy.<locals>.outer") == 2


# -------------------------------------------------------------- transforms
def test_attractor_moves_nodes_toward_point():
    lat = small_lattice(n=(1, 1, 1))
    before = lat.nodes.copy()
    transforms.attractor_lattice(lat, (0.5, 0.5, 10.0), alpha=0.01)
    moved = lat.nodes - before
    assert np.all(moved[:, 2] > 0)  # pulled toward +z


def test_curve_lattice_lowers_far_nodes():
    lat = small_lattice(n=(2, 1, 1))
    transforms.curve_lattice(lat, (0, 0, 0), curvature_strength=0.1)
    # node farthest from the center dropped the most
    assert lat.nodes[:, 2].min() < 0


def test_cylindrical_transform_merges_seam():
    lat = small_lattice(n=(1, 4, 1))
    n_nodes0 = lat.num_nodes
    transforms.cylindrical_transform(lat, radius=2.0)
    r = np.linalg.norm(lat.nodes[:, :2], axis=1)
    np.testing.assert_allclose(r, 2.0, atol=1e-9)
    assert lat.num_nodes < n_nodes0  # seam merged


def test_move_to_cylinder_form_and_validation():
    lat = small_lattice(n=(2, 1, 1))
    with pytest.raises(ValueError):
        transforms.move_to_cylinder_form(lat, radius=0.5)
    transforms.move_to_cylinder_form(lat, radius=5.0)
    # mid-span x=1 nodes drop the most
    mid = np.isclose(lat.nodes[:, 0], 1.0)


def test_fit_to_surface():
    lat = small_lattice(n=(1, 1, 1))
    transforms.fit_to_surface(lat, lambda x, y: 0.5 * x, mode="z")
    assert lat.nodes[:, 2].max() > 1.0


# ------------------------------------------------------------ mesh trimmer
def _cube_stl(lo=0.0, hi=1.0):
    """12-triangle closed cube."""
    v = np.array([[x, y, z] for x in (lo, hi) for y in (lo, hi) for z in (lo, hi)])
    faces = [
        (0, 1, 3), (0, 3, 2), (4, 6, 7), (4, 7, 5),  # x faces
        (0, 4, 5), (0, 5, 1), (2, 3, 7), (2, 7, 6),  # y faces
        (0, 2, 6), (0, 6, 4), (1, 5, 7), (1, 7, 3),  # z faces
    ]
    return np.array([[v[a], v[b], v[c]] for a, b, c in faces])


def test_point_in_mesh():
    tm = MeshTrimmer(_cube_stl())
    inside = tm.points_inside(np.array([[0.5, 0.5, 0.5], [1.5, 0.5, 0.5],
                                        [0.2, 0.9, 0.1]]))
    np.testing.assert_array_equal(inside, [True, False, True])


def test_cell_in_mesh():
    tm = MeshTrimmer(_cube_stl())
    assert tm.is_cell_in_mesh([0.0, 0.0, 0.0], [1.0, 1.0, 1.0])
    assert not tm.is_cell_in_mesh([2.0, 2.0, 2.0], [0.5, 0.5, 0.5])


def test_beam_clipping():
    tm = MeshTrimmer(_cube_stl())
    nodes = np.array([[0.5, 0.5, 0.5], [0.5, 0.5, 1.5], [0.5, 0.5, 0.8],
                      [2.0, 2.0, 2.0], [3.0, 3.0, 3.0]])
    edges = np.array([[0, 1], [0, 2], [3, 4]], dtype=np.int32)
    radius = np.array([0.1, 0.2, 0.3])
    nn, ne, nr = tm.cut_beams_at_mesh_intersection(nodes, edges, (radius,))
    # edge 0 crossed -> clipped at z=1; edge 1 inside kept; edge 2 dropped
    assert len(ne) == 2
    assert set(nr) == {0.1, 0.2}
    zmax = nn[ne].reshape(-1, 3)[:, 2].max() if len(ne) else 0
    assert zmax <= 1.0 + 1e-9


def test_trim_built_lattice():
    lat = small_lattice(n=(2, 2, 2))
    tm = MeshTrimmer(_cube_stl(lo=-0.1, hi=1.1))
    n_before = lat.num_edges
    tm.trim_lattice(lat)
    assert 0 < lat.num_edges < n_before


# ---------------------------------------------------------------- plotting
def test_plotting_smoke(tmp_path):
    from pylatticedso_tpu import plotting
    from pylatticedso_tpu.fem.bc import apply_boundary_conditions

    lat = build_lattice({
        "geometry": {"cell_size": {"x": 1, "y": 1, "z": 1},
                     "number_of_cells": {"x": 1, "y": 1, "z": 1},
                     "radii": [0.05], "geom_types": ["BCC"]},
        "boundary_conditions": {
            "Displacement": {"Fixed": {"Surface": ["Zmin"],
                                       "DOF": ["X", "Y", "Z", "RX", "RY", "RZ"],
                                       "Value": [0, 0, 0, 0, 0, 0]}}}})
    bc = apply_boundary_conditions(lat)
    plotting.visualize_lattice(lat, enable_boundary_conditions=True, bc=bc,
                               voxel=True, save_path=tmp_path / "lat.png")
    plotting.plot_radius_distribution(lat, save_path=tmp_path / "hist.png")
    plotting.plot_convergence(
        [{"iteration": 0, "objective": 1.0, "relative_density": 0.1},
         {"iteration": 1, "objective": 0.5, "relative_density": 0.12}],
        save_path=tmp_path / "conv.png")
    assert (tmp_path / "lat.png").exists()
    assert (tmp_path / "conv.png").exists()


def test_msh_homogenization_surface_export(tmp_path):
    import numpy as np
    from pylatticedso_tpu.io.export import export_homogenization_surface_msh
    C = np.diag([100.0, 120.0, 140.0, 40.0, 45.0, 50.0])
    C[0, 1] = C[1, 0] = 30.0
    C[0, 2] = C[2, 0] = 25.0
    C[1, 2] = C[2, 1] = 28.0
    p = tmp_path / "surface.msh"
    export_homogenization_surface_msh(p, C, n_theta=12, n_phi=16,
                                      fit_box=(2.0, 2.0, 2.0))
    text = p.read_text()
    assert "$MeshFormat" in text and "2.2 0 8" in text
    n_nodes = int(text.split("$Nodes\n")[1].split("\n")[0])
    n_elems = int(text.split("$Elements\n")[1].split("\n")[0])
    assert n_nodes == 12 * 16
    assert n_elems == 2 * 11 * 15
    # fit_box: max |coord| per axis is half the box
    import re
    coords = np.array([[float(v) for v in ln.split()[1:4]]
                       for ln in text.split("$Nodes\n")[1].split("\n")[1:n_nodes + 1]])
    assert np.allclose(np.abs(coords).max(axis=0), 1.0, rtol=1e-6)


def test_hybrid_subplot_and_live_plotter(tmp_path):
    import matplotlib
    matplotlib.use("Agg")
    from pylatticedso_tpu import build_lattice
    from pylatticedso_tpu.plotting import (OptimizationPlotter,
                                           subplot_lattice_hybrid_geometries)
    lat = build_lattice({
        "geometry": {"cell_size": {"x": 1, "y": 1, "z": 1},
                     "number_of_cells": {"x": 2, "y": 1, "z": 1},
                     "radii": [0.08, 0.05], "geom_types": ["BCC", "Hybrid1"]}})
    fig = subplot_lattice_hybrid_geometries(lat, save_path=tmp_path / "hyb.png")
    assert (tmp_path / "hyb.png").exists()

    pl = OptimizationPlotter()
    for i, (o, d) in enumerate([(1.0, 0.5), (0.7, 0.4), (0.55, 0.35)]):
        pl.on_iteration({"objective": o, "relative_density": d})
    assert len(pl.obj_hist) == 3
    pl.finalize(save_path=tmp_path / "conv.png")
    assert (tmp_path / "conv.png").exists()


def test_rough_wire_stl(tmp_path):
    """Self-affine rough-wire STL (Pyrough-model replacement)."""
    import struct
    import numpy as np
    from pylatticedso_tpu import build_lattice
    from pylatticedso_tpu.io.export import (_self_affine_height,
                                            write_stl_rough_wires)
    lat = build_lattice({
        "geometry": {"cell_size": {"x": 1, "y": 1, "z": 1},
                     "number_of_cells": {"x": 1, "y": 1, "z": 1},
                     "radii": [0.05], "geom_types": ["BCC"]}})
    p = tmp_path / "rough.stl"
    write_stl_rough_wires(p, lat, n_sides=12, n_axial=10, rms=0.08)
    data = p.read_bytes()
    ntri = struct.unpack("<I", data[80:84])[0]
    # wall quads + the 2*n_sides end-cap triangles per wire (watertight)
    assert len(data) == 84 + 50 * ntri
    assert ntri == lat.num_edges * (12 * 10 * 2 + 2 * 12)
    # statistical model: normalized RMS and exact angular periodicity
    h = _self_affine_height(128, 32, 0.8, 2.5, 30, 8,
                            np.random.default_rng(1))
    assert abs(h.std() - 2.5) < 1e-9


def test_rough_wire_pyrough_config(tmp_path):
    """Pyrough-schema driven rough-wire export (the reference's
    data/inputs/preset_lattice/Pyrough pair)."""
    import struct
    from pylatticedso_tpu import build_lattice
    from pylatticedso_tpu.config import load_config
    from pylatticedso_tpu.io.export import write_stl_rough_wires_pyrough

    lat = build_lattice(load_config("Pyrough/BCC_cell.json"))
    assert lat.num_cells == 1
    p = tmp_path / "rough.stl"
    kw = write_stl_rough_wires_pyrough(
        p, lat, "data/inputs/preset_lattice/Pyrough/lattice_wire.json",
        n_axial=10, n_sides=12, n_cut=8, m_cut=4)
    # C1=2 on radius 20 -> rms 0.1 of the radius; cutoffs overridable
    assert abs(kw["rms"] - 0.1) < 1e-12 and kw["eta"] == 0.8
    data = p.read_bytes()
    ntri = struct.unpack("<I", data[80:84])[0]
    assert len(data) == 84 + 50 * ntri and ntri > 0
