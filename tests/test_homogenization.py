"""Unit-cell homogenization oracles: symmetry, cubic invariance, scaling."""

import numpy as np
import pytest

from pylatticedso_tpu import build_lattice
from pylatticedso_tpu.fem.homogenization import (directional_modulus,
                                                 homogenize_cell,
                                                 orthotropic_constants)


def cell(geom, r=0.05, E="VeroClear"):
    return build_lattice({
        "geometry": {"cell_size": {"x": 1, "y": 1, "z": 1},
                     "number_of_cells": {"x": 1, "y": 1, "z": 1},
                     "radii": [r], "geom_types": [geom]},
        "simulation_parameters": {"enable": True, "material": E,
                                  "periodicity": True}})


def test_bcc_homogenization_cubic_symmetry():
    res = homogenize_cell(cell("BCC"))
    C = res.C
    # symmetry self-check (homogenization_cell.py:529-541)
    assert res.symmetry_error < 1e-6
    # cubic material: C11 = C22 = C33, C12 = C13 = C23, C44 = C55 = C66
    np.testing.assert_allclose([C[0, 0], C[1, 1]], C[2, 2], rtol=1e-6)
    np.testing.assert_allclose([C[0, 1], C[0, 2]], C[1, 2], rtol=1e-5)
    np.testing.assert_allclose([C[3, 3], C[4, 4]], C[5, 5], rtol=1e-5)
    # SPD
    w = np.linalg.eigvalsh(C)
    assert w.min() > 0
    o = res.orthotropic
    np.testing.assert_allclose(o["Ex"], o["Ez"], rtol=1e-6)
    assert 0 < o["nu_xy"] < 0.5


def test_octet_stiffer_than_bcc():
    """Octet is stretch-dominated: higher E at equal radius."""
    Eb = homogenize_cell(cell("BCC")).orthotropic["Ex"]
    Eo = homogenize_cell(cell("Octet")).orthotropic["Ex"]
    assert Eo > Eb


def test_stiffness_scales_with_material():
    r1 = homogenize_cell(cell("BCC", E="VeroClear"))     # E = 1013
    r2 = homogenize_cell(cell("BCC", E="TPU"))           # E = 20000
    np.testing.assert_allclose(r2.C, r1.C * (20000.0 / 1013.0),
                               atol=1e-9 * np.abs(r2.C).max())


def test_directional_modulus_axes_match_orthotropic():
    res = homogenize_cell(cell("Octet"))
    o = res.orthotropic
    Ex = directional_modulus(res.C, np.array(np.pi / 2), np.array(0.0))
    Ez = directional_modulus(res.C, np.array(0.0), np.array(0.0))
    np.testing.assert_allclose(Ex, o["Ex"], rtol=1e-8)
    np.testing.assert_allclose(Ez, o["Ez"], rtol=1e-8)


def test_rigid_modes_removed():
    """Fluctuation fields are finite and periodic."""
    res = homogenize_cell(cell("BCC"))
    assert np.isfinite(res.u_fluct).all()
