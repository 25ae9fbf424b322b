"""Round-trip: a pickle produced by the REFERENCE implementation loads into
the array model and matches our own build of the same config.

The reference package (read-only at /root/reference) is imported with gmsh
stubbed out (only its meshing paths need it); the pickle payload is written
the way the reference's ``save_lattice_object`` does — sets converted to
lists, back-references scrubbed, ``_pickle_format`` marker set
(utils.py:132-361) — but into a temp file instead of the reference tree.
"""

import json
import pickle
import sys
import tempfile
import types
from pathlib import Path

import numpy as np
import pytest

from pylatticedso_tpu import build_lattice
from pylatticedso_tpu.io.reference_pickle import load_reference_pickle

REF = Path("/root/reference/src")


def _import_reference():
    if not REF.exists():
        pytest.skip("reference tree unavailable")
    sys.path.insert(0, str(REF))
    sys.modules.setdefault("gmsh", types.ModuleType("gmsh"))
    try:
        from pyLatticeDesign.lattice import Lattice  # noqa: F401
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")
    return Lattice


def _reference_style_pickle(lattice, path):
    """Write the pickle the way save_lattice_object does (utils.py:211-243):
    lists instead of sets, connected_beams dropped, format marker set."""
    for p in lattice.nodes:
        p.connected_beams = None
    lattice.nodes = list(lattice.nodes)
    lattice.beams = list(lattice.beams)
    for c in lattice.cells:
        c.beams_cell = list(c.beams_cell)
        c.points_cell = list(c.points_cell)
    lattice._pickle_format = "lattice_v2_lists"
    with open(path, "wb") as fh:
        pickle.dump(lattice, fh)


CFG = {
    "geometry": {
        "cell_size": {"x": 1, "y": 1, "z": 1},
        "number_of_cells": {"x": 2, "y": 2, "z": 1},
        "radii": [0.08],
        "geom_types": ["BCC"],
    }
}


def _build_reference_pickle(cfg, tmpdir):
    RefLattice = _import_reference()
    cfg_file = Path(tmpdir) / "cfg.json"
    cfg_file.write_text(json.dumps(cfg))
    ref_lat = RefLattice(str(cfg_file))
    pkl = Path(tmpdir) / "ref_lattice.pkl"
    _reference_style_pickle(ref_lat, pkl)
    return pkl


def test_reference_pickle_matches_native_build(tmp_path):
    pkl = _build_reference_pickle(CFG, tmp_path)
    lat = load_reference_pickle(pkl)
    ours = build_lattice(CFG)

    assert lat.num_nodes == ours.num_nodes
    assert lat.num_edges == ours.num_edges
    assert lat.num_cells == ours.num_cells
    # same coordinates and connectivity as sets (ordering may differ)
    np.testing.assert_allclose(np.sort(lat.nodes, axis=0),
                               np.sort(ours.nodes, axis=0), atol=1e-12)
    key = lambda l: {tuple(np.round(np.concatenate([l.nodes[e[0]],
                                                    l.nodes[e[1]]]), 9))
                     for e in l.edges}
    assert key(lat) == key(ours)
    np.testing.assert_allclose(lat.radius, 0.08)
    np.testing.assert_allclose(lat.cell_radii, 0.08)
    assert lat.config.geom_types == ["BCC"]
    assert lat.config.num_cells == (2, 2, 1)
    np.testing.assert_allclose(lat.get_relative_density(),
                               ours.get_relative_density(), rtol=1e-9)


def test_reference_pickle_is_solvable(tmp_path):
    """The imported lattice runs through the FEM path (migration story)."""
    pkl = _build_reference_pickle(CFG, tmp_path)
    lat = load_reference_pickle(pkl)
    lat.config.boundary_conditions = {
        "Displacement": {"Fixed": {"Surface": ["Zmin"],
                                   "DOF": ["X", "Y", "Z", "RX", "RY", "RZ"],
                                   "Value": [0, 0, 0, 0, 0, 0]}},
        "Force": {"Load": {"Surface": ["Zmax"], "DOF": ["Z"],
                           "Value": [-0.5]}}}
    from pylatticedso_tpu.fem.statics import solve_fem
    res = solve_fem(lat)
    assert np.isfinite(res.compliance) and res.compliance > 0

    # identical physics as the natively built lattice
    ours = build_lattice({**CFG,
                          "boundary_conditions": lat.config.boundary_conditions})
    res2 = solve_fem(ours)
    np.testing.assert_allclose(res.compliance, res2.compliance, rtol=1e-8)


def test_reference_pickle_rejects_non_lattice(tmp_path):
    p = tmp_path / "junk.pkl"
    with open(p, "wb") as fh:
        pickle.dump({"not": "a lattice"}, fh)
    with pytest.raises((ValueError, AttributeError)):
        load_reference_pickle(p)
