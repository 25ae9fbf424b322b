"""Reduced-basis / RBF surrogate oracles, incl. reference artifact parity."""

from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pylatticedso_tpu.ddm.surrogate import (SchurSurrogate, ThinPlateSplineRBF,
                                            load_reduced_basis,
                                            reduce_basis_greedy,
                                            save_reduced_basis)

RB_DIR = Path("/root/reference/data/outputs/schur_complement/reduced_basis")
SC_DIR = Path("/root/reference/data/outputs/schur_complement")


def _ref_data(geom="BCC"):
    rb = RB_DIR / f"reduced_basis_{geom}_tol_1e-6.npz"
    sc = SC_DIR / f"Schur_complement_{geom}.npz"
    if not (rb.exists() and sc.exists()):
        pytest.skip("reference artifacts unavailable")
    d = np.load(sc)
    return rb, d["radius_values"], d["schur_matrices"]


@pytest.mark.parametrize("kind", ["RBF", "nearest_neighbor", "linear"])
def test_surrogate_reconstructs_reference_artifacts(kind):
    rb, rv, sm = _ref_data()
    sur = SchurSurrogate.from_npz(rb, kind=kind)
    for i in (0, 4, 9):
        S = np.asarray(sur.reconstruct(jnp.array(rv[i])))
        err = np.abs(S - sm[i]).max() / np.abs(sm[i]).max()
        assert err < 1e-5, f"{kind} i={i}: {err:.2e}"


def test_rbf_interpolates_between_samples():
    rb, rv, sm = _ref_data()
    sur = SchurSurrogate.from_npz(rb, kind="RBF")
    S = np.asarray(sur.reconstruct(jnp.array([0.055])))
    lo, hi = sm[4], sm[5]  # r = 0.05, 0.06
    # interpolated matrix lies between neighbors in Frobenius norm
    assert np.linalg.norm(lo) < np.linalg.norm(S) < np.linalg.norm(hi)


def test_greedy_matches_reference_basis_size():
    rb, rv, sm = _ref_data()
    ref_basis = load_reduced_basis(rb)["basis_reduced_ortho"]
    schur_dict = {tuple(rv[i]): sm[i] for i in range(len(rv))}
    B, A, L = reduce_basis_greedy(schur_dict, 1e-6)
    assert B.shape == ref_basis.shape
    # orthonormality
    np.testing.assert_allclose(B.T @ B, np.eye(B.shape[1]), atol=1e-10)
    # exact reconstruction within tolerance at samples
    for i in (0, 5, 9):
        rec = (B @ A[:, i]).reshape(sm[i].shape, order="F")
        assert np.abs(rec - sm[i]).max() / np.abs(sm[i]).max() < 1e-5


def test_rbf_gradient_matches_fd_and_autodiff():
    rng = np.random.default_rng(0)
    X = rng.uniform(0.01, 0.1, size=(12, 2))
    Y = np.stack([np.sin(20 * X[:, 0]) + X[:, 1]**2,
                  X[:, 0] * X[:, 1]], axis=1)
    rbf = ThinPlateSplineRBF(X, Y)
    x = jnp.array([0.05, 0.06])
    G = np.asarray(rbf.gradient(x))
    # autodiff of evaluate agrees with the closed form
    J = np.asarray(jax.jacobian(rbf.evaluate)(x)).T
    np.testing.assert_allclose(G, J, atol=1e-10)
    # FD
    h = 1e-6
    for d in range(2):
        e = jnp.zeros(2).at[d].set(h)
        fd = (np.asarray(rbf.evaluate(x + e)) - np.asarray(rbf.evaluate(x - e))) / (2 * h)
        np.testing.assert_allclose(G[d], fd, rtol=1e-5, atol=1e-8)


def test_rbf_exact_at_training_points():
    rng = np.random.default_rng(1)
    X = rng.uniform(0, 1, size=(8, 1))
    Y = rng.normal(size=(8, 3))
    rbf = ThinPlateSplineRBF(X, Y)
    for i in range(8):
        np.testing.assert_allclose(np.asarray(rbf.evaluate(jnp.asarray(X[i]))),
                                   Y[i], atol=1e-9)


def test_save_load_roundtrip(tmp_path):
    B = np.eye(4)[:, :2]
    A = np.arange(6, dtype=float).reshape(2, 3)
    L = np.array([[0.01], [0.05], [0.1]])
    p = tmp_path / "rb.npz"
    save_reduced_basis(p, B, A, L)
    d = load_reduced_basis(p)
    np.testing.assert_array_equal(d["basis_reduced_ortho"], B)
    np.testing.assert_array_equal(d["alpha_ortho"], A)
    np.testing.assert_array_equal(d["list_elements"], L)


def test_ddm_with_surrogate_provider():
    """Surrogate-fed DDM solve stays close to the exact-Schur solve."""
    from pylatticedso_tpu import build_lattice
    from pylatticedso_tpu.ddm.solver import build_ddm_system, solve_ddm
    from pylatticedso_tpu.ddm.schur import discretize_cell, schur_complement

    lat = build_lattice({
        "geometry": {"cell_size": {"x": 1, "y": 1, "z": 1},
                     "number_of_cells": {"x": 2, "y": 1, "z": 1},
                     "radii": [0.05], "geom_types": ["BCC"]},
        "simulation_parameters": {"enable": True, "material": "VeroClear"},
        "boundary_conditions": {
            "Displacement": {"Fixed": {"Surface": ["Xmin"],
                                       "DOF": ["X", "Y", "Z", "RX", "RY", "RZ"],
                                       "Value": [0, 0, 0, 0, 0, 0]},
                             "Push": {"Surface": ["Xmax"], "DOF": ["X"],
                                      "Value": [-0.01]}}}})
    # offline: dataset of exact Schur matrices over radii (no penalization so
    # the geometry is radius-independent)
    disc = discretize_cell(lat, 0, penalization=False, share_weights=True)
    radii = np.round(np.arange(0.02, 0.09, 0.01), 3)
    schur_dict = {(r,): np.asarray(schur_complement(disc, np.array([r]),
                                                    1013.0, 0.3))
                  for r in radii}
    B, A, L = reduce_basis_greedy(schur_dict, 1e-8)
    sur = SchurSurrogate(basis=B, alpha=A, samples=L, kind="RBF")

    exact = solve_ddm(lat, penalization=False, tol=1e-11)
    sur_res = solve_ddm(lat, penalization=False, tol=1e-11,
                        schur_provider=lambda radii: sur.reconstruct(jnp.asarray(radii)))
    rel = np.linalg.norm(sur_res.u - exact.u) / np.linalg.norm(exact.u)
    assert rel < 1e-5
