"""Device-mesh sharding: operator parity, preconditioners, candidate batches."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pylatticedso_tpu import build_lattice
from pylatticedso_tpu.fem import assemble_dense
from pylatticedso_tpu.fem.bc import apply_boundary_conditions
from pylatticedso_tpu.parallel.sharding import (ShardedLattice, make_mesh,
                                                make_compliance_step, pad_edges)


@pytest.fixture(scope="module")
def setup():
    lat = build_lattice({
        "geometry": {"cell_size": {"x": 1, "y": 1, "z": 1},
                     "number_of_cells": {"x": 3, "y": 2, "z": 2},
                     "radii": [0.05], "geom_types": ["Octet"]},
        "boundary_conditions": {
            "Displacement": {"Fixed": {"Surface": ["Xmin"],
                                       "DOF": ["X", "Y", "Z", "RX", "RY", "RZ"],
                                       "Value": [0, 0, 0, 0, 0, 0]}},
            "Force": {"Load": {"Surface": ["Xmax"], "DOF": ["Z"],
                               "Value": [-0.5]}}}})
    bc = apply_boundary_conditions(lat)
    mesh = make_mesh(n_shard=4, n_dp=2)
    shl = ShardedLattice(mesh, lat.nodes, lat.edges, 1013.0, 0.3,
                         dtype=jnp.float64)
    return lat, bc, mesh, shl


def test_pad_edges():
    edges = np.arange(10).reshape(5, 2).astype(np.int32)
    e2, (r2,), n_real = pad_edges(edges, [np.ones(5)], 4)
    assert len(e2) == 8 and n_real == 5
    assert np.all(e2[5:] == 0) and np.all(r2[5:] == 0)


def test_sharded_matvec_matches_dense(setup):
    lat, bc, mesh, shl = setup
    r = shl.radius_padded(lat.radius)
    D = shl.section_D(r)
    K = np.asarray(assemble_dense(lat.nodes, lat.edges, lat.radius, 1013.0, 0.3))
    rng = np.random.default_rng(0)
    u = rng.normal(size=(lat.num_nodes, 6))
    got = np.asarray(shl.matvec(jnp.asarray(u), D)).reshape(-1)
    np.testing.assert_allclose(got, K @ u.reshape(-1), rtol=1e-10, atol=1e-10)


def test_node_blocks_match_dense_diag_blocks(setup):
    lat, bc, mesh, shl = setup
    D = shl.section_D(shl.radius_padded(lat.radius))
    blk = np.asarray(shl.node_blocks(D))
    K = np.asarray(assemble_dense(lat.nodes, lat.edges, lat.radius, 1013.0, 0.3))
    for n in range(0, lat.num_nodes, 7):
        np.testing.assert_allclose(blk[n], K[6 * n:6 * n + 6, 6 * n:6 * n + 6],
                                   atol=1e-10)


def test_compliance_step_and_batch(setup):
    lat, bc, mesh, shl = setup
    step = make_compliance_step(shl, ~bc.fixed, bc.f_applied, tol=1e-10,
                                maxiter=2000)
    r = shl.radius_padded(lat.radius)
    c, g = step(r)
    assert float(c) > 0 and np.isfinite(np.asarray(g)).all()
    # thicker struts -> lower compliance
    c2, _ = step(shl.radius_padded(lat.radius * 1.2))
    assert float(c2) < float(c)
    # vmapped candidate batch reproduces single-candidate values
    batch = jnp.stack([r, shl.radius_padded(lat.radius * 1.2)])
    cb, gb = step.batch(batch)
    np.testing.assert_allclose(np.asarray(cb), [float(c), float(c2)], rtol=1e-8)


def test_block_jacobi_not_slower_than_jacobi(setup):
    lat, bc, mesh, shl = setup
    from pylatticedso_tpu.fem.solve import pcg
    D = shl.section_D(shl.radius_padded(lat.radius))
    free = jnp.asarray(~bc.fixed, dtype=jnp.float64)
    f = jnp.asarray(bc.f_applied)
    A = lambda u: free * shl.matvec(free * u, D) + (1 - free) * u
    diag = free * shl.diagonal(D) + (1 - free)
    oj = pcg(A, free * f, M=lambda x: x / jnp.where(diag == 0, 1, diag),
             maxiter=20000, tol=1e-10)
    blk = np.asarray(shl.node_blocks(D))
    fm = np.asarray(free)
    b2 = blk * fm[:, :, None] * fm[:, None, :]
    eye = np.eye(6)
    b2 = b2 + (1 - fm)[:, :, None] * eye[None] * (1 - fm)[:, None, :]
    b2 = np.where(np.abs(b2).sum((1, 2))[:, None, None] == 0, eye[None], b2)
    Binv = jnp.asarray(np.linalg.inv(b2))
    ob = pcg(A, free * f, M=lambda x: jnp.einsum("nij,nj->ni", Binv, x),
             maxiter=20000, tol=1e-10)
    assert int(ob.iterations) <= int(oj.iterations)
    np.testing.assert_allclose(np.asarray(ob.x), np.asarray(oj.x), atol=1e-7)


def test_chunked_step_matches_fused(setup):
    """step.chunked (tunnel-safe chunked CG + self-adjoint gradient) must
    reproduce the fused value_and_grad step."""
    lat, bc, mesh, shl = setup
    step = make_compliance_step(shl, ~bc.fixed, bc.f_applied, tol=1e-10,
                                maxiter=2000)
    r = shl.radius_padded(lat.radius)
    c, g = step(r)
    c2, g2, u, iters = step.chunked(r, chunk=64)
    assert iters <= 2000
    np.testing.assert_allclose(float(c2), float(c), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g),
                               rtol=1e-5, atol=1e-12)
    # warm restart from the converged solution finishes in one chunk
    c3, _g3, _u3, iters3 = step.chunked(r, u, chunk=64)
    assert iters3 <= 64
    np.testing.assert_allclose(float(c3), float(c), rtol=1e-8)


@pytest.mark.slow
def test_structured_step_sharded_parity():
    """GSPMD-sharded structured stencil step (grid slab per device) must
    match the single-device step: compliance/gradient to roundoff."""
    from pylatticedso_tpu.parallel.structured import (
        StructuredLattice, make_structured_compliance_step,
        shard_structured_step)

    N = 3                       # X = N+1 = 4 grid points, divisible by 4
    slat = StructuredLattice("Octet", (N, N, N), (1.0, 1.0, 1.0),
                             1013.0, 0.3, dtype=jnp.float64)
    free = slat.select_nodes(lambda x, y, z: z > 1e-9)
    f = slat.node_field().astype(np.float64)
    top = slat.select_nodes(lambda x, y, z: z > N - 1e-9)
    f[:, 2][top] = -0.5
    step = make_structured_compliance_step(slat, free, f, tol=1e-10,
                                           maxiter=500, precond="jacobi")
    r = np.full((N, N, N), 0.05)
    c0, g0, _u0 = step(r)

    mesh = make_mesh(n_shard=4, n_dp=2)
    sstep = shard_structured_step(step, mesh)
    c1, g1, u1 = sstep(r)
    assert sstep.grid_axis in (0, 1, 2)
    np.testing.assert_allclose(float(c1), float(c0), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-8, atol=1e-14)
    # the solution stays sharded across the mesh axis
    assert "shard" in str(u1.sharding.spec)


@pytest.mark.slow
def test_structured_step_sharded_parity_mg():
    """The BENCH-grade solver configuration — multigrid-preconditioned
    structured step with a frozen precond state — must survive GSPMD slab
    sharding: the V-cycle (per-class einsum transfers, Chebyshev smoothers,
    power-iteration lmax) is plain traced jax, so the partitioner must
    propagate the slab sharding through it and match the single-device
    step to roundoff.  BCC keeps the stencil program small enough for the
    throttled CPU host; the machinery is geometry-independent."""
    from pylatticedso_tpu.parallel.structured import (
        StructuredLattice, make_structured_compliance_step,
        shard_structured_step)

    N = 7                       # grid X = 8 (divisible by 4); MG coarsens 7->4->2
    slat = StructuredLattice("BCC", (N, 2, 2), (1.0, 1.0, 1.0),
                             1013.0, 0.3, dtype=jnp.float64)
    free = slat.select_nodes(lambda x, y, z: x > 1e-9)
    f = slat.node_field().astype(np.float64)
    tip = slat.select_nodes(lambda x, y, z: x > N - 1e-9)
    f[:, 2][tip] = -0.1
    mg_opts = {"nu": 2, "coarse_degree": 8, "smooth_frac": 0.25,
               "power_iters": 5}
    step = make_structured_compliance_step(slat, free, f, tol=1e-10,
                                           maxiter=500, precond="mg",
                                           mg_opts=mg_opts)
    r = np.full((N, 2, 2), 0.05)
    pstate = step.precond_state(r)
    # single-device reference through the SAME (implicit-diff) code path
    # the sharded wrapper dispatches to — the default step() now uses the
    # analytic self-adjoint gradient, which only agrees to ~solver tol
    free_o, f_o = step._operands
    rj = jnp.asarray(r)
    u00 = jnp.zeros_like(f_o)
    (c0, _u0), g0 = step._jitted_frozen(rj, free_o, f_o, u00, pstate)

    mesh = make_mesh(n_shard=4, n_dp=2)
    sstep = shard_structured_step(step, mesh)
    c1, g1, u1 = sstep(r, None, pstate)
    np.testing.assert_allclose(float(c1), float(c0), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-8, atol=1e-14)
    assert "shard" in str(u1.sharding.spec)
    # and the non-frozen path (per-solve precond state) shards too
    c2, _g2, _u2 = sstep(r)
    np.testing.assert_allclose(float(c2), float(c0), rtol=1e-10)
    # the analytic fast path agrees to solver tolerance
    c3, g3, _u3 = step(r, None, pstate)
    np.testing.assert_allclose(float(c3), float(c0), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(g3), np.asarray(g0),
                               rtol=1e-5, atol=1e-12)


def test_structured_step_sharded_rejects_indivisible():
    from pylatticedso_tpu.parallel.structured import (
        StructuredLattice, make_structured_compliance_step,
        shard_structured_step)

    slat = StructuredLattice("BCC", (2, 2, 2), (1.0, 1.0, 1.0), 1013.0, 0.3,
                             dtype=jnp.float64)
    free = slat.select_nodes(lambda x, y, z: z > 1e-9)
    f = slat.node_field().astype(np.float64)
    step = make_structured_compliance_step(slat, free, f, tol=1e-8,
                                           maxiter=50, precond="jacobi")
    mesh = make_mesh(n_shard=4, n_dp=2)
    with pytest.raises(ValueError, match="divisible"):
        shard_structured_step(step, mesh)


@pytest.mark.slow
def test_structured_step_sharded_parity_mg_fused(monkeypatch):
    """The FUSED V-cycle (interpret-mode kernels on the virtual mesh)
    must survive GSPMD slab sharding like the unfused one: the fused
    smoother is plain traced jax under interpret, so the partitioner has
    to propagate shardings through the flat-layout kernels and match the
    single-device step.  (Real Mosaic pallas partitioning across a
    physical multi-chip mesh remains untested — one chip.)"""
    from pylatticedso_tpu.parallel.structured import (
        StructuredLattice, make_structured_compliance_step,
        shard_structured_step)

    monkeypatch.setenv("PLDSO_MATVEC", "pallas")
    monkeypatch.setenv("PLDSO_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("PLDSO_MG_FUSED_DTYPE", "f32")
    N = 7
    slat = StructuredLattice("BCC", (N, 2, 2), (1.0, 1.0, 1.0),
                             1013.0, 0.3)
    free = slat.select_nodes(lambda x, y, z: x > 1e-9)
    f = slat.node_field().astype(np.float32)
    tip = slat.select_nodes(lambda x, y, z: x > N - 1e-9)
    f[:, 2][tip] = -0.1
    mg = {"nu": (1, 1), "coarse_degree": 8, "power_iters": 3,
          "fused": True}
    step = make_structured_compliance_step(slat, free, f, tol=1e-8,
                                           maxiter=500, precond="mg",
                                           mg_opts=mg)
    r = jnp.full((N, 2, 2), 0.05, jnp.float32)
    ps = step.precond_state(r)
    assert all(fo is not None for fo in ps["fused"])
    c0, g0, _ = step(r, None, ps)
    mesh = make_mesh(n_shard=4, n_dp=2)
    sstep = shard_structured_step(step, mesh)
    c1, g1, _u1 = sstep(r, None, ps)
    np.testing.assert_allclose(float(c1), float(c0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-4, atol=1e-8)
