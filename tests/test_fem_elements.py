"""Element-level oracles for the batched Timoshenko kernel."""

import numpy as np
import jax.numpy as jnp
import pytest

from pylatticedso_tpu.fem import (assemble_dense, build_operator, edge_geometry,
                                  element_stiffness_dense, section_stiffness, KAPPA)

E_MOD, NU = 1013.0, 0.3  # VeroClear
G_MOD = E_MOD / (2 * (1 + NU))


def timoshenko_reduced_bending_block(EI, GAk, L):
    """Textbook 2-node linear Timoshenko element with 1-pt shear quadrature,
    DOFs [w1, th1, w2, th2] — the closed form the dolfinx form compiles to."""
    s = GAk / L
    Kshear = s * np.array([
        [1, L / 2, -1, L / 2],
        [L / 2, L**2 / 4, -L / 2, L**2 / 4],
        [-1, -L / 2, 1, -L / 2],
        [L / 2, L**2 / 4, -L / 2, L**2 / 4],
    ])
    Kbend = EI / L * np.array([
        [0, 0, 0, 0], [0, 1, 0, -1], [0, 0, 0, 0], [0, -1, 0, 1],
    ])
    return Kshear + Kbend


def element_K(p1, p2, r):
    nodes = jnp.array([p1, p2], dtype=jnp.float64)
    edges = jnp.array([[0, 1]], dtype=jnp.int32)
    return np.asarray(element_stiffness_dense(nodes, edges, jnp.array([r]), E_MOD, NU))[0]


def test_axial_torsion_stiffness():
    L, r = 2.0, 0.05
    K = element_K([0, 0, 0], [L, 0, 0], r)
    S = np.pi * r**2
    I = np.pi * r**4 / 4
    # axial: u1x-u2x block
    np.testing.assert_allclose(K[0, 0], E_MOD * S / L, rtol=1e-14)
    np.testing.assert_allclose(K[0, 6], -E_MOD * S / L, rtol=1e-14)
    # torsion: thx block
    np.testing.assert_allclose(K[3, 3], G_MOD * 2 * I / L, rtol=1e-14)
    np.testing.assert_allclose(K[3, 9], -G_MOD * 2 * I / L, rtol=1e-14)


def test_bending_block_matches_reduced_integration_closed_form():
    L, r = 1.3, 0.07
    K = element_K([0, 0, 0], [L, 0, 0], r)
    S = np.pi * r**2
    I = np.pi * r**4 / 4
    EI, GAk = E_MOD * I, KAPPA * G_MOD * S
    ref = timoshenko_reduced_bending_block(EI, GAk, L)
    # x-aligned beam: w = u_z bending about y -> DOFs (2=u1z, 4=th1y, 8=u2z, 10=th2y)
    idx = np.ix_([2, 4, 8, 10], [2, 4, 8, 10])
    sign = np.array([1, -1, 1, -1])  # theta_y rotates opposite to dw/dx convention
    got = K[idx] * np.outer(sign, sign)
    np.testing.assert_allclose(np.abs(got), np.abs(ref), rtol=1e-12, atol=1e-12)
    # energy equivalence under a test displacement regardless of convention
    d = np.zeros(12); d[2] = 1.0; d[4] = 0.3; d[8] = -0.2; d[10] = 0.1
    dref = np.array([d[2], d[4], d[8], d[10]])
    e1 = d @ K @ d
    # try both sign conventions for theta; one must match
    e2a = dref @ ref @ dref
    dref_b = dref * sign
    e2b = dref_b @ ref @ dref_b
    assert min(abs(e1 - e2a), abs(e1 - e2b)) < 1e-10 * abs(e1)


def test_rigid_body_modes_and_spd():
    rng = np.random.default_rng(3)
    p1, p2 = rng.normal(size=3), rng.normal(size=3)
    K = element_K(p1, p2, 0.04)
    np.testing.assert_allclose(K, K.T, atol=1e-12)
    w = np.linalg.eigvalsh(K)
    assert np.all(w > -1e-10)
    assert (np.abs(w) < 1e-9).sum() == 6  # 6 rigid body modes
    # explicit rigid translation + rotation
    for tdir in np.eye(3):
        d = np.concatenate([tdir, np.zeros(3), tdir, np.zeros(3)])
        np.testing.assert_allclose(K @ d, 0, atol=1e-9)
    for axis in np.eye(3):
        d = np.concatenate([np.cross(axis, p1), axis, np.cross(axis, p2), axis])
        np.testing.assert_allclose(K @ d, 0, atol=1e-8)


def test_frame_invariance_under_rotation():
    """Circular section: energy of rotated config equals rotated energy."""
    rng = np.random.default_rng(7)
    p1, p2 = np.zeros(3), np.array([0.7, 0.4, -0.2])
    K = element_K(p1, p2, 0.03)
    # random rotation
    A = rng.normal(size=(3, 3)); Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0: Q[:, 0] *= -1
    Krot = element_K(Q @ p1, Q @ p2, 0.03)
    R = np.kron(np.eye(4), Q)
    np.testing.assert_allclose(Krot, R @ K @ R.T, atol=1e-9)


def test_matvec_matches_dense_assembly():
    from pylatticedso_tpu import build_lattice
    lat = build_lattice({"geometry": {"cell_size": {"x": 1, "y": 1, "z": 1},
                                      "number_of_cells": {"x": 2, "y": 1, "z": 1},
                                      "radii": [0.08], "geom_types": ["BCC"]}})
    op = build_operator(lat.nodes, lat.edges, lat.radius, E_MOD, NU)
    K = np.asarray(assemble_dense(lat.nodes, lat.edges, lat.radius, E_MOD, NU))
    rng = np.random.default_rng(0)
    u = rng.normal(size=(lat.num_nodes, 6))
    np.testing.assert_allclose(np.asarray(op.matvec(jnp.asarray(u))).reshape(-1),
                               K @ u.reshape(-1), rtol=1e-11, atol=1e-11)
    # diagonal
    np.testing.assert_allclose(np.asarray(op.diagonal()).reshape(-1),
                               np.diag(K), rtol=1e-11, atol=1e-11)
    # strain energy
    np.testing.assert_allclose(float(op.strain_energy(jnp.asarray(u))),
                               0.5 * u.reshape(-1) @ K @ u.reshape(-1), rtol=1e-11)


def test_section_gradient_matches_fd():
    from pylatticedso_tpu.fem.elements import section_stiffness_gradient
    r = jnp.array([0.03, 0.07])
    dD = np.asarray(section_stiffness_gradient(r, E_MOD, NU))
    h = 1e-7
    fd = (np.asarray(section_stiffness(r + h, E_MOD, NU).D)
          - np.asarray(section_stiffness(r - h, E_MOD, NU).D)) / (2 * h)
    np.testing.assert_allclose(dD, fd, rtol=1e-6)
