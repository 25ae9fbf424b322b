"""Materials and gradient-field tests (mirror of reference Materials/Gradient tests)."""

import json

import numpy as np
import pytest

from pylatticedso_tpu import MatProperties, available_materials
from pylatticedso_tpu.gradients import gradient_factor_table, material_field


def test_builtin_materials():
    names = available_materials()
    assert {"VeroClear", "TPU", "Ti-6Al-4V"} <= set(names)
    m = MatProperties("VeroClear")
    assert m.young_modulus == 1013.0
    assert m.poisson_ratio == 0.3
    assert m.density == 1.18e-9
    assert abs(m.shear_modulus - 1013.0 / 2.6) < 1e-12
    ti = MatProperties("Ti-6Al-4V")
    assert ti.young_modulus == 104000.0 and ti.poisson_ratio == 0.35


def test_material_json_file(tmp_path):
    p = tmp_path / "custom.json"
    p.write_text(json.dumps({"name": "X", "density": 1e-9,
                             "Young_modulus": 2000.0, "Poisson_ratio": 0.25}))
    m = MatProperties(str(p))
    assert m.name_material == "X" and m.young_modulus == 2000.0


def test_material_validation():
    with pytest.raises(FileNotFoundError):
        MatProperties("Unobtainium")
    with pytest.raises(ValueError):
        MatProperties("VeroClear", Poisson_ratio=0.7)


def test_gradient_constant():
    t = gradient_factor_table((3, 2, 4))
    np.testing.assert_array_equal(t, np.ones((4, 3)))


def test_gradient_linear():
    t = gradient_factor_table((4, 1, 1), "linear", (True, False, False), (0.5, 0, 0))
    np.testing.assert_allclose(t[:, 0], [1.0, 1.5, 2.0, 2.5])
    np.testing.assert_allclose(t[:, 1], 1.0)


def test_gradient_parabolic_symmetric():
    t = gradient_factor_table((4, 4, 4), "parabolic", (True, True, True), (1.0, 1.0, 1.0))
    np.testing.assert_allclose(t[:, 0], [1.0, 1.5, 1.5, 1.0])


def test_gradient_sinusoide_and_exponential():
    t = gradient_factor_table((3, 3, 3), "sinusoide", (True, False, False), (2.0, 0, 0))
    np.testing.assert_allclose(t[0, 0], 1.0)
    t2 = gradient_factor_table((3, 3, 3), "exponential", (True, False, False), (0.1, 0, 0))
    np.testing.assert_allclose(t2[:, 0], 1.0 + np.exp(0.1 * np.arange(3)))


def test_gradient_axis_saturation():
    # an axis shorter than max(num_cells) holds its last value
    t = gradient_factor_table((2, 5, 1), "linear", (True, False, False), (1.0, 0, 0))
    np.testing.assert_allclose(t[:, 0], [1.0, 2.0, 2.0, 2.0, 2.0])


def test_gradient_unknown_rule():
    with pytest.raises(ValueError):
        gradient_factor_table((2, 2, 2), "cubic", (True, False, False), (1, 0, 0))


def test_material_field_modes():
    f = material_field((2, 3, 4), multimat=0)
    assert f.shape == (4, 3, 2) and np.all(f == 1)
    g = material_field((3, 2, 2), multimat=1, direction=0)
    assert g.shape == (2, 2, 3)
    np.testing.assert_array_equal(g[0, 0], [1, 2, 3])  # graded along x
    r = material_field((2, 2, 2), multimat=-1, rng=np.random.default_rng(0))
    assert r.min() >= 1 and r.max() <= 3
