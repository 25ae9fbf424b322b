"""Every committed preset parses, validates, and (small ones) builds.

Mirrors the reference's preset library under data/inputs/preset_lattice/
(design/simulation/optimization), which its examples use as the de-facto
feature-combination matrix.
"""

import json
from pathlib import Path

import pytest

from pylatticedso_tpu import build_lattice
from pylatticedso_tpu.config import load_config

PRESETS = sorted(Path("data/inputs/preset_lattice").rglob("*.json"))


def test_preset_library_is_populated():
    names = {p.stem for p in PRESETS}
    # reference parity spot checks
    for required in ("hybrid_cell", "L_logo", "BCC_trimmed_example",
                     "Bone_cuted_hybrid", "all_design_parameters",
                     "Cantilever_L_beam", "Three_point_bending",
                     "Inversion_mechanism"):
        assert required in names, f"missing preset {required}"
    assert len(PRESETS) >= 18


@pytest.mark.parametrize("path", PRESETS, ids=lambda p: f"{p.parent.name}/{p.stem}")
def test_preset_loads(path):
    data = json.loads(path.read_text())
    if "geometry" not in data:
        # Pyrough/lattice_wire.json is a Pyrough PARAMETER file (wire
        # roughness schema), consumed by write_stl_rough_wires_pyrough —
        # in the reference too it is read by Pyrough, not the lattice
        # config loader.
        pytest.skip("non-lattice parameter preset")
    cfg = load_config(data)
    assert cfg.n_geom == len(cfg.radii)


@pytest.mark.parametrize("path", [p for p in PRESETS
                                  if p.parent.name == "design"],
                         ids=lambda p: p.stem)
def test_design_preset_builds(path):
    cfg = json.loads(path.read_text())
    n = cfg["geometry"]["number_of_cells"]
    if n["x"] * n["y"] * n["z"] > 600:
        pytest.skip("large preset: parse-only in CI")
    lat = build_lattice(cfg)
    assert lat.num_edges > 0 and lat.num_nodes > 0
    assert 0 < lat.get_relative_density() < 1
