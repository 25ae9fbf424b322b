"""Structured stencil operator: exactness vs the unstructured/dense path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pylatticedso_tpu import build_lattice
from pylatticedso_tpu.fem import assemble_dense
from pylatticedso_tpu.parallel.structured import (StructuredLattice,
                                                  make_structured_compliance_step)


def _map_nodes(sl, lat):
    coord_to_cg = {}
    for c in range(sl.nc):
        x, y, z = sl.class_pos[c]
        for idx in np.argwhere(sl.node_valid[c]):
            key = (round(x[tuple(idx)], 9), round(y[tuple(idx)], 9),
                   round(z[tuple(idx)], 9))
            coord_to_cg[key] = (c, tuple(idx))
    mapping = []
    for i, p in enumerate(lat.nodes):
        key = tuple(np.round(p, 9))
        assert key in coord_to_cg, f"lattice node {p} missing from class grids"
        mapping.append((i, *coord_to_cg[key]))
    return mapping


def _check_matvec(geom, N, gradient=None, erase=None, radii=None):
    geoms = [geom] if isinstance(geom, str) else list(geom)
    radii = radii if radii is not None else [0.05] * len(geoms)
    cfg = {"geometry": {"cell_size": {"x": 1, "y": 1, "z": 1},
                        "number_of_cells": {"x": N[0], "y": N[1], "z": N[2]},
                        "radii": radii, "geom_types": geoms}}
    if gradient:
        cfg["gradient"] = gradient
    cell_valid = None
    if erase:
        cfg["supplementary"] = {"erased_blocks": {"b": {
            "start_point": {k: float(v) for k, v in zip("xyz", erase[0])},
            "dimensions_block": {k: float(v) for k, v in zip("xyz", erase[1])}}}}
        cell_valid = np.ones(N, dtype=bool)
        lo = np.array(erase[0], dtype=int)
        hi = lo + np.array(erase[1], dtype=int)
        cell_valid[lo[0]:hi[0] + 1, lo[1]:hi[1] + 1, lo[2]:hi[2] + 1] = False
    lat = build_lattice(cfg)
    sl = StructuredLattice(geom, tuple(N), (1, 1, 1), 1013.0, 0.3,
                           dtype=jnp.float64, cell_valid=cell_valid)
    assert sl.n_nodes == lat.num_nodes
    n_inst = sum(int(e["inst_valid"].sum()) for e in sl.edges)
    assert n_inst == lat.num_edges
    mapping = _map_nodes(sl, lat)
    rng = np.random.default_rng(0)
    u_lat = rng.normal(size=(lat.num_nodes, 6))
    u_f = np.zeros((sl.nc, 6) + sl.grid)
    for i, c, g in mapping:
        u_f[(c, slice(None)) + g] = u_lat[i]
    rfield = np.full((len(geoms),) + tuple(N), 0.05)
    for ci, pos in enumerate(lat.cell_pos):
        for g in range(len(geoms)):
            rfield[(g,) + tuple(pos)] = lat.cell_radii[ci, g]
    if len(geoms) == 1:
        rfield = rfield[0]    # exercise the legacy single-geometry shape
    matvec, diag = sl.make_matvec()
    out = np.asarray(matvec(jnp.asarray(u_f), jnp.asarray(rfield)))
    K = np.asarray(assemble_dense(lat.nodes, lat.edges, lat.radius, 1013.0, 0.3))
    ref = (K @ u_lat.reshape(-1)).reshape(-1, 6)
    err = max(np.abs(out[(c, slice(None)) + g] - ref[i]).max()
              for i, c, g in mapping)
    assert err < 1e-10, f"{geom} {N}: matvec err {err:.2e}"
    d = np.asarray(diag(jnp.asarray(rfield)))
    derr = max(np.abs(d[(c, slice(None)) + g] - np.diag(K).reshape(-1, 6)[i]).max()
               for i, c, g in mapping)
    assert derr < 1e-10


@pytest.mark.parametrize("geom,N", [("Octet", (3, 2, 2)), ("BCC", (2, 2, 2)),
                                    ("Cubic", (2, 3, 2)), ("Kelvin", (2, 2, 2)),
                                    ("Diamond", (2, 2, 2))])
def test_structured_matvec_matches_dense(geom, N):
    _check_matvec(geom, N)


def test_structured_graded_radius_field():
    _check_matvec("Octet", (3, 2, 2),
                  gradient={"radii": {"rule": "linear", "direction_x": True,
                                      "parameter_x": 0.3}})


def test_structured_erased_cells():
    _check_matvec("BCC", (3, 3, 2), erase=((0, 0, 0), (0.5, 0.5, 0.5)))


@pytest.mark.parametrize("geoms,N", [
    (["BCC", "Hybrid1"], (2, 2, 2)),
    (["BCC", "Hybrid1", "Hybrid4"], (2, 1, 2)),
    (["Octet", "BCC"], (2, 2, 1)),
])
def test_structured_hybrid_matvec_matches_dense(geoms, N):
    """Superposed multi-geometry (hybrid) lattices on the stencil operator,
    with one radius field per geometry (the reference's multi-geom_types
    build; previously these were stuck on the unstructured path)."""
    _check_matvec(geoms, N, radii=[0.05, 0.04, 0.06][:len(geoms)])


def test_structured_hybrid_erased():
    _check_matvec(["BCC", "Hybrid1"], (2, 2, 2), radii=[0.05, 0.04],
                  erase=((0, 0, 0), (0.5, 0.5, 0.5)))


def test_structured_compliance_and_gradient_match_unstructured():
    from pylatticedso_tpu.fem.bc import apply_boundary_conditions
    from pylatticedso_tpu.parallel.sharding import (ShardedLattice, make_mesh,
                                                    make_compliance_step)
    n = 3
    sl = StructuredLattice("Octet", (n, n, n), (1., 1., 1.), 1013.0, 0.3,
                           dtype=jnp.float64)
    fixed = sl.select_nodes(lambda x, y, z: z == 0.0)
    top = sl.select_nodes(lambda x, y, z: z == float(n))
    free = sl.node_valid & ~fixed
    f = np.zeros((sl.nc, 6) + sl.grid)
    for c in range(sl.nc):
        f[c, 2][top[c]] = -1.0 / int(top.sum())
    step = make_structured_compliance_step(sl, free, f, tol=1e-11, maxiter=3000)
    r0 = jnp.full((n, n, n), 0.05)
    c_s, g_s, _u = step(r0)

    lat = build_lattice({"geometry": {"cell_size": {"x": 1, "y": 1, "z": 1},
                                      "number_of_cells": {"x": n, "y": n, "z": n},
                                      "radii": [0.05], "geom_types": ["Octet"]},
                         "boundary_conditions": {
        "Displacement": {"Fixed": {"Surface": ["Zmin"],
                                   "DOF": ["X", "Y", "Z", "RX", "RY", "RZ"],
                                   "Value": [0, 0, 0, 0, 0, 0]}},
        "Force": {"Load": {"Surface": ["Zmax"], "DOF": ["Z"], "Value": [-1.0]}}}})
    bc = apply_boundary_conditions(lat)
    mesh = make_mesh(n_shard=1, n_dp=1)
    shl = ShardedLattice(mesh, lat.nodes, lat.edges, 1013.0, 0.3,
                         dtype=jnp.float64)
    ustep = make_compliance_step(shl, ~bc.fixed, bc.f_applied, tol=1e-11,
                                 maxiter=3000)
    c_u, g_u = ustep(shl.radius_padded(lat.radius))
    np.testing.assert_allclose(float(c_s), float(c_u), rtol=1e-9)
    # per-edge gradients aggregate to the per-cell gradient by creator cell
    cell_grad = np.zeros((n, n, n))
    for e, ci in enumerate(lat.edge_cell):
        cell_grad[tuple(lat.cell_pos[ci])] += np.asarray(g_u)[e]
    np.testing.assert_allclose(np.asarray(g_s), cell_grad, rtol=1e-6)


@pytest.mark.slow
def test_structured_candidate_batch():
    n = 2
    sl = StructuredLattice("Octet", (n, n, n), (1., 1., 1.), 1013.0, 0.3,
                           dtype=jnp.float64)
    fixed = sl.select_nodes(lambda x, y, z: z == 0.0)
    top = sl.select_nodes(lambda x, y, z: z == float(n))
    free = sl.node_valid & ~fixed
    f = np.zeros((sl.nc, 6) + sl.grid)
    for c in range(sl.nc):
        f[c, 2][top[c]] = -1.0 / int(top.sum())
    step = make_structured_compliance_step(sl, free, f, tol=1e-10, maxiter=2000)
    r0 = jnp.full((n, n, n), 0.05)
    c1, _g1, u1 = step(r0)
    c2, _g2, _u2 = step(r0 * 1.2)
    # warm start reproduces the same solution
    c2w, _gw, _uw = step(r0 * 1.2, u1)
    np.testing.assert_allclose(float(c2w), float(c2), rtol=1e-8)
    cb, gb = step.batch(jnp.stack([r0, r0 * 1.2]))
    np.testing.assert_allclose(np.asarray(cb), [float(c1), float(c2)],
                               rtol=1e-9)
    assert np.isfinite(np.asarray(gb)).all()


def test_selfadjoint_fast_path_matches_value_and_grad():
    """The compliance fast path (lambda = u identity, no adjoint solve)
    must agree with the implicit-diff double-solve path."""
    import jax
    n = 3
    sl = StructuredLattice("BCC", (n, n, n), (1., 1., 1.), 1013.0, 0.3,
                           dtype=jnp.float64)
    fixed = sl.select_nodes(lambda x, y, z: z == 0.0)
    top = sl.select_nodes(lambda x, y, z: z == float(n))
    free = sl.node_valid & ~fixed
    f = np.zeros((sl.nc, 6) + sl.grid)
    for c in range(sl.nc):
        f[c, 2][top[c]] = -1.0 / int(top.sum())
    fast = make_structured_compliance_step(sl, free, f, tol=1e-12,
                                           maxiter=3000)
    # passing the compliance functional explicitly forces the generic path
    slow = make_structured_compliance_step(
        sl, free, f, tol=1e-12, maxiter=3000,
        objective=lambda u, f_: jnp.sum(f_ * u))
    r0 = jnp.asarray(np.random.default_rng(3).uniform(0.03, 0.08, (n, n, n)))
    c_f, g_f, _ = fast(r0)
    c_s, g_s, _ = slow(r0)
    np.testing.assert_allclose(float(c_f), float(c_s), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_s), rtol=1e-6)


def test_analytic_grad_frozen_mg_and_hybrid():
    """The analytic energy-derivative gradient (default fast path) must
    match the implicit-diff gradient through the frozen-MG-state route and
    for hybrid (multi-geometry) radius fields, where the _sections VJP
    crosses creator-priority selects."""
    n = 4                      # coarsenable: mg hierarchy gets >= 2 levels
    sl = StructuredLattice("BCC", (n, n, n), (1., 1., 1.), 1013.0, 0.3,
                           dtype=jnp.float64)
    fixed = sl.select_nodes(lambda x, y, z: z == 0.0)
    top = sl.select_nodes(lambda x, y, z: z == float(n))
    free = sl.node_valid & ~fixed
    f = np.zeros((sl.nc, 6) + sl.grid)
    for c in range(sl.nc):
        f[c, 2][top[c]] = -1.0 / int(top.sum())
    mg_opts = {"nu": 2, "coarse_degree": 8, "power_iters": 3}
    fast = make_structured_compliance_step(sl, free, f, tol=1e-12,
                                           maxiter=3000, precond="mg",
                                           mg_opts=mg_opts)
    slow = make_structured_compliance_step(
        sl, free, f, tol=1e-12, maxiter=3000, precond="mg", mg_opts=mg_opts,
        objective=lambda u, f_: jnp.sum(f_ * u))
    r0 = jnp.asarray(np.random.default_rng(5).uniform(0.03, 0.08, (n, n, n)))
    ps = fast.precond_state(r0)
    c_f, g_f, _ = fast(r0, None, ps)
    c_s, g_s, _ = slow(r0, None, slow.precond_state(r0))
    np.testing.assert_allclose(float(c_f), float(c_s), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_s), rtol=1e-6)

    # hybrid: per-geometry radius field [n_geom, Nx, Ny, Nz]
    n = 2
    sl2 = StructuredLattice(["BCC", "Hybrid1"], (n, n, n), (1., 1., 1.),
                            1013.0, 0.3, dtype=jnp.float64)
    fixed = sl2.select_nodes(lambda x, y, z: z == 0.0)
    top = sl2.select_nodes(lambda x, y, z: z == float(n))
    free = sl2.node_valid & ~fixed
    f = np.zeros((sl2.nc, 6) + sl2.grid)
    for c in range(sl2.nc):
        f[c, 2][top[c]] = -1.0 / int(top.sum())
    fast2 = make_structured_compliance_step(sl2, free, f, tol=1e-12,
                                            maxiter=3000)
    slow2 = make_structured_compliance_step(
        sl2, free, f, tol=1e-12, maxiter=3000,
        objective=lambda u, f_: jnp.sum(f_ * u))
    rh = jnp.asarray(np.random.default_rng(7).uniform(0.03, 0.08,
                                                      (2, n, n, n)))
    c_f, g_f, _ = fast2(rh)
    c_s, g_s, _ = slow2(rh)
    np.testing.assert_allclose(float(c_f), float(c_s), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_s), rtol=1e-6)


def test_structured_trimmed_nodes_match_dense():
    """Node-granular trimming (node_keep): beams touching dropped nodes
    vanish and orphaned nodes are pruned — parity vs a dense assembly of
    the same subgraph (the mesh-trimmer semantics at class-grid
    granularity)."""
    N = (3, 2, 2)
    cfg = {"geometry": {"cell_size": {"x": 1, "y": 1, "z": 1},
                        "number_of_cells": {"x": N[0], "y": N[1], "z": N[2]},
                        "radii": [0.05], "geom_types": ["Octet"]}}
    lat = build_lattice(cfg)

    # spherical keep region (strictly inside => nontrivial trim)
    ctr = np.array([1.2, 1.0, 1.0])
    keep_fn = lambda x, y, z: ((x - ctr[0]) ** 2 + (y - ctr[1]) ** 2
                               + (z - ctr[2]) ** 2) <= 1.7 ** 2

    sl = StructuredLattice("Octet", N, (1, 1, 1), 1013.0, 0.3,
                           dtype=jnp.float64, node_keep=keep_fn)

    # unstructured oracle: drop edges touching dropped nodes
    node_keep = keep_fn(*lat.nodes.T)
    ekeep = node_keep[lat.edges[:, 0]] & node_keep[lat.edges[:, 1]]
    assert 0 < int(ekeep.sum()) < lat.num_edges, "trim must be nontrivial"
    n_used = np.zeros(lat.num_nodes, dtype=bool)
    n_used[lat.edges[ekeep].ravel()] = True
    assert sl.n_nodes == int(n_used.sum())
    n_inst = sum(int(e["inst_valid"].sum()) for e in sl.edges)
    assert n_inst == int(ekeep.sum())

    K = np.asarray(assemble_dense(lat.nodes, lat.edges[ekeep],
                                  lat.radius[ekeep], 1013.0, 0.3))
    # map only the surviving nodes onto the class grids
    coord_to_cg = {}
    for c in range(sl.nc):
        x, y, z = sl.class_pos[c]
        for idx in np.argwhere(sl.node_valid[c]):
            key = (round(x[tuple(idx)], 9), round(y[tuple(idx)], 9),
                   round(z[tuple(idx)], 9))
            coord_to_cg[key] = (c, tuple(idx))
    mapping = []
    for i in np.flatnonzero(n_used):
        key = tuple(np.round(lat.nodes[i], 9))
        assert key in coord_to_cg, f"surviving node {lat.nodes[i]} missing"
        mapping.append((i, *coord_to_cg[key]))
    rng = np.random.default_rng(1)
    u_lat = rng.normal(size=(lat.num_nodes, 6))
    u_f = np.zeros((sl.nc, 6) + sl.grid)
    for i, c, g in mapping:
        u_f[(c, slice(None)) + g] = u_lat[i]
    ref = (K @ u_lat.reshape(-1)).reshape(-1, 6)
    matvec, diag = sl.make_matvec()
    out = np.asarray(matvec(jnp.asarray(u_f), jnp.asarray(np.full(N, 0.05))))
    err = max(np.abs(out[(c, slice(None)) + g] - ref[i]).max()
              for i, c, g in mapping)
    assert err < 1e-10, f"trimmed matvec err {err:.2e}"


def test_structured_warped_matches_dense(monkeypatch):
    """Warped lattices (node_transform point maps — the design.transforms
    semantics, reference design_transformation.py) on the stencil
    operator: the map moves nodes but keeps grid topology, so K.u stays a
    stencil with per-instance frame/length FIELDS.  Parity vs a dense
    assembly at the transformed coordinates, for the gather form, the
    instance-anchored scatter form, the diagonal, and the analytic
    energy gradient."""
    N = (3, 2, 2)
    cfg = {"geometry": {"cell_size": {"x": 1, "y": 1, "z": 1},
                        "number_of_cells": {"x": N[0], "y": N[1], "z": N[2]},
                        "radii": [0.05], "geom_types": ["Octet"]}}
    lat = build_lattice(cfg)

    def warp(x, y, z):
        # smooth non-affine taper + twist: every instance gets a distinct
        # length and frame (no two parallel struts stay parallel)
        s = 1.0 + 0.15 * z
        th = 0.25 * z
        xc, yc = x - 1.5, y - 1.0
        return (1.5 + s * (np.cos(th) * xc - np.sin(th) * yc),
                1.0 + s * (np.sin(th) * xc + np.cos(th) * yc),
                z + 0.1 * np.sin(x))

    sl0 = StructuredLattice("Octet", N, (1, 1, 1), 1013.0, 0.3,
                            dtype=jnp.float64)
    sl = StructuredLattice("Octet", N, (1, 1, 1), 1013.0, 0.3,
                           dtype=jnp.float64, node_transform=warp)
    mapping = _map_nodes(sl0, lat)          # topology is transform-invariant
    nodes_w = np.stack(warp(lat.nodes[:, 0], lat.nodes[:, 1],
                            lat.nodes[:, 2]), axis=1)
    K = np.asarray(assemble_dense(jnp.asarray(nodes_w), lat.edges,
                                  lat.radius, 1013.0, 0.3))
    rng = np.random.default_rng(0)
    u_lat = rng.normal(size=(lat.num_nodes, 6))
    u_f = np.zeros((sl.nc, 6) + sl.grid)
    for i, c, g in mapping:
        u_f[(c, slice(None)) + g] = u_lat[i]
    r = jnp.full(N, 0.05, jnp.float64)
    ref = (K @ u_lat.reshape(-1)).reshape(-1, 6)

    def check_form(mode, tol):
        monkeypatch.setenv("PLDSO_MATVEC", mode)
        mv, dg = sl.make_matvec()
        out = np.asarray(mv(jnp.asarray(u_f), r))
        err = max(np.abs(out[(c, slice(None)) + g] - ref[i]).max()
                  for i, c, g in mapping)
        assert err < tol, f"warped {mode}: matvec err {err:.2e}"
        d = np.asarray(dg(r))
        derr = max(np.abs(d[(c, slice(None)) + g]
                          - np.diag(K).reshape(-1, 6)[i]).max()
                   for i, c, g in mapping)
        assert derr < tol, f"warped {mode}: diag err {derr:.2e}"
        return mv

    check_form("scatter", 1e-9)
    mv = check_form("gather", 1e-9)

    # pallas must decline warped lattices (per-instance frames)
    from pylatticedso_tpu.parallel.stencil_pallas import pallas_supported
    assert not pallas_supported(sl)
    assert pallas_supported(sl0)

    # analytic energy derivative (the self-adjoint gradient path) tracks
    # autodiff through the warped operator
    uj = jnp.asarray(u_f)

    def q(rf):
        return jnp.sum(uj * mv.apply(uj, mv.prepare(rf)))

    g_auto = jax.grad(q)(r)
    dq = mv.energy_dr2(uj, mv.sections(r))

    def inner(rf):
        return sum(jnp.sum(d_ * r2) for d_, r2 in zip(dq, mv.sections(rf)))

    g_ana = jax.grad(inner)(r)
    rel = float(jnp.max(jnp.abs(g_ana - g_auto))
                / (jnp.max(jnp.abs(g_auto)) + 1e-30))
    assert rel < 1e-9, f"warped analytic grad rel err {rel:.2e}"
