"""Geometry catalog tests (mirror of reference Tests/ topology expectations)."""

import json

import numpy as np
import pytest

from pylatticedso_tpu import catalog

# beam counts per topology, as in the reference geometry JSONs
EXPECTED_COUNTS = {
    "BCC": 8, "BCCZ": 10, "Cubic": 12, "Octet": 36, "OctetExt": 24,
    "Octahedron": 12, "OctahedronZ": 13, "OctahedronYZ": 18, "Kelvin": 36,
    "Diamond": 32, "Original": 32, "Original2": 56, "Hybrid1": 24,
    "Hybrid2": 12, "Hybrid3": 24, "Hybrid4": 30, "Hybrid5": 30, "Auxetic": 28,
}


@pytest.mark.parametrize("name,count", sorted(EXPECTED_COUNTS.items()))
def test_beam_counts(name, count):
    beams = catalog.get_beam_structure(name)
    assert beams.shape == (count, 6)


@pytest.mark.parametrize("name", sorted(EXPECTED_COUNTS))
def test_beams_inside_unit_cube(name):
    beams = catalog.get_beam_structure(name)
    assert beams.min() >= -1e-12 and beams.max() <= 1.0 + 1e-12


@pytest.mark.parametrize("name", sorted(EXPECTED_COUNTS))
def test_no_zero_length_or_duplicate_beams(name):
    beams = catalog.get_beam_structure(name)
    p1, p2 = beams[:, :3], beams[:, 3:]
    assert np.all(np.linalg.norm(p2 - p1, axis=1) > 1e-9)
    keys = {tuple(sorted([tuple(np.round(a, 9)), tuple(np.round(b, 9))]))
            for a, b in zip(p1, p2)}
    assert len(keys) == len(beams)


def test_available_and_unknown():
    assert "BCC" in catalog.available_geometries()
    with pytest.raises(FileNotFoundError):
        catalog.get_beam_structure("NoSuchGeometry")


def test_random_geometry_picks_catalog_entry():
    rng = np.random.default_rng(0)
    beams = catalog.get_beam_structure("Random", rng=rng)
    assert beams.shape[1] == 6 and len(beams) in set(EXPECTED_COUNTS.values())


def test_register_custom_geometry():
    arr = [[0, 0, 0, 1, 1, 1]]
    catalog.register_geometry("_custom_test", arr)
    out = catalog.get_beam_structure("_custom_test")
    assert out.shape == (1, 6)


def test_load_geometry_json_with_symbolic_params(tmp_path):
    path = tmp_path / "geom.json"
    path.write_text(json.dumps({
        "name": "sym",
        "parameters": {"h": 0.3, "v": "h - tan(20 * pi / 180) / 2"},
        "beams": [[0.0, 0.0, "v", 1.0, 1.0, "1 - v"]],
    }))
    out = catalog.load_geometry_json(path)
    import math
    v = 0.3 - math.tan(math.radians(20.0)) / 2
    np.testing.assert_allclose(out[0], [0, 0, v, 1, 1, 1 - v], atol=1e-12)


def test_auxetic_matches_default_parameters():
    """Auxetic kink height val = h - tan(20 deg)/2 with h = 0.35."""
    import math
    beams = catalog.get_beam_structure("Auxetic")
    val = 0.35 - math.tan(math.radians(20.0)) / 2.0
    zs = np.unique(np.round(np.concatenate([beams[:, 2], beams[:, 5]]), 9))
    assert np.round(val, 9) in zs
