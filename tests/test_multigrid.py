"""Geometric multigrid preconditioner: transfers, symmetry, convergence."""

import numpy as np
import jax
import pytest
import jax.numpy as jnp

from pylatticedso_tpu.parallel.structured import (
    StructuredLattice, make_structured_compliance_step)
from pylatticedso_tpu.parallel.multigrid import (
    build_mg_hierarchy, mg_preconditioner, make_transfers)
from pylatticedso_tpu.fem.solve import pcg


def _problem(n, dtype=jnp.float64):
    sl = StructuredLattice("BCC", (n, n, n), (1.0, 1.0, 1.0), 1013.0, 0.3,
                           dtype=dtype)
    fixed = sl.select_nodes(lambda x, y, z: z == 0.0)
    top = sl.select_nodes(lambda x, y, z: z == float(n))
    free_n = sl.node_valid & ~fixed
    f = np.zeros((sl.nc, 6) + sl.grid)
    for c in range(sl.nc):
        f[c, 2][top[c]] = -1.0
    return sl, free_n, jnp.asarray(f, dtype)


def test_restrict_is_prolong_transpose():
    rng = np.random.default_rng(0)
    fine, coarse = (7, 6, 5), (4, 4, 3)
    keys = np.array([[0.0, 0.0, 0.0], [0.5, 0.5, 0.0]])
    P, R = make_transfers(fine, coarse, keys)
    c = jnp.asarray(rng.normal(size=(2, 6) + coarse))
    f = jnp.asarray(rng.normal(size=(2, 6) + fine))
    lhs = jnp.vdot(P(c).ravel(), f.ravel())
    rhs = jnp.vdot(c.ravel(), R(f).ravel())
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-12)


def test_prolong_reproduces_linear_fields():
    # a globally affine displacement field must interpolate exactly
    # (second-order transfers: the sub-cell class offsets are honored)
    sl_f = StructuredLattice("Octet", (4, 4, 4), (1.0, 1.0, 1.0), 1.0, 0.3,
                             dtype=jnp.float64)
    sl_c = StructuredLattice("Octet", (2, 2, 2), (2.0, 2.0, 2.0), 1.0, 0.3,
                             dtype=jnp.float64)
    P, _ = make_transfers(sl_f.grid, sl_c.grid, sl_f.class_keys)

    def affine(pos):  # [3, X, Y, Z] -> [6, X, Y, Z]
        x, y, z = pos
        u = 0.3 * x - 0.2 * y + 0.05 * z + 1.0
        return np.stack([u, 2 * u, -u, 0.5 * u, u, 0 * u])

    cf = np.stack([affine(sl_c.class_pos[c]) for c in range(sl_c.nc)])
    ff = np.stack([affine(sl_f.class_pos[c]) for c in range(sl_f.nc)])
    got = np.asarray(P(jnp.asarray(cf)))
    # interior is exact; the clamped boundary extension affects only fine
    # nodes outside the coarse hull (none here: grids align at the ends)
    np.testing.assert_allclose(got, ff, atol=1e-12)


@pytest.mark.slow
def test_vcycle_is_symmetric_positive():
    sl, free_n, f = _problem(4)
    h = build_mg_hierarchy(sl, free_n)
    r0 = jnp.full(sl.num_cells, 0.05, dtype=jnp.float64)
    M = mg_preconditioner(h, r0, nu=1, coarse_degree=8)
    rng = np.random.default_rng(1)
    shape = (sl.nc, 6) + sl.grid
    mask = np.broadcast_to(free_n[:, None], shape)
    a = jnp.asarray(rng.normal(size=shape) * mask)
    b = jnp.asarray(rng.normal(size=shape) * mask)
    lhs = float(jnp.vdot(M(a).ravel(), b.ravel()))
    rhs = float(jnp.vdot(a.ravel(), M(b).ravel()))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-10)
    assert float(jnp.vdot(a.ravel(), M(a).ravel())) > 0


@pytest.mark.slow
def test_mg_pcg_beats_jacobi_iterations():
    sl, free_n, f = _problem(6)
    dt = jnp.float64
    free = jnp.asarray(
        np.broadcast_to(free_n[:, None], (sl.nc, 6) + sl.grid), dt)
    matvec, diag_fn = sl.make_matvec()
    r0 = jnp.full(sl.num_cells, 0.05, dtype=dt)
    A = lambda u: free * matvec(free * u, r0) + (1.0 - free) * u
    b = free * f
    dg = jnp.where(free > 0, free * diag_fn(r0) + (1.0 - free), 1.0)
    res_j = pcg(A, b, M=lambda r: r / dg, maxiter=2000, tol=1e-8)
    h = build_mg_hierarchy(sl, free_n)
    M = mg_preconditioner(h, r0, nu=2, coarse_degree=16)
    res_m = pcg(A, b, M=M, maxiter=500, tol=1e-8)
    assert bool(res_m.converged)
    assert int(res_m.iterations) < int(res_j.iterations) / 2
    err = jnp.linalg.norm((res_m.x - res_j.x).ravel()) \
        / jnp.linalg.norm(res_j.x.ravel())
    assert float(err) < 1e-6


def test_frozen_precond_state_parity():
    """A frozen (even stale) MG preconditioner state must not move the
    solve fixed point."""
    import numpy as np
    import jax.numpy as jnp
    from pylatticedso_tpu.parallel.structured import (
        StructuredLattice, make_structured_compliance_step)
    n = 3
    sl = StructuredLattice("BCC", (n, n, n), (1., 1., 1.), 1013.0, 0.3,
                           dtype=jnp.float64)
    fixed = sl.select_nodes(lambda x, y, z: z == 0.0)
    top = sl.select_nodes(lambda x, y, z: z == float(n))
    free = sl.node_valid & ~fixed
    f = np.zeros((sl.nc, 6) + sl.grid)
    for c in range(sl.nc):
        f[c, 2][top[c]] = -1.0 / int(top.sum())
    step = make_structured_compliance_step(sl, free, f, tol=1e-11,
                                           maxiter=3000, precond="mg")
    r0 = jnp.asarray(np.random.default_rng(0).uniform(0.03, 0.08, (n, n, n)))
    c1, g1, _ = step(r0)
    ps = step.precond_state(r0 * 0.9)          # deliberately stale
    c2, g2, _ = step(r0, None, ps)
    np.testing.assert_allclose(float(c2), float(c1), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), rtol=1e-6)


@pytest.mark.slow
def test_vcycle_nu_schedule_symmetric_and_converges():
    """Per-level nu schedule (fine smooths less than coarse): the cycle
    must stay a symmetric positive operator and still precondition."""
    sl, free_n, f = _problem(4)
    h = build_mg_hierarchy(sl, free_n)
    r0 = jnp.full(sl.num_cells, 0.05, dtype=jnp.float64)
    M = mg_preconditioner(h, r0, nu=(1, 2), coarse_degree=8)
    rng = np.random.default_rng(3)
    shape = (sl.nc, 6) + sl.grid
    mask = np.broadcast_to(free_n[:, None], shape)
    a = jnp.asarray(rng.normal(size=shape) * mask)
    b = jnp.asarray(rng.normal(size=shape) * mask)
    lhs = float(jnp.vdot(M(a).ravel(), b.ravel()))
    rhs = float(jnp.vdot(a.ravel(), M(b).ravel()))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-10)
    assert float(jnp.vdot(a.ravel(), M(a).ravel())) > 0
    dt = jnp.float64
    free = jnp.asarray(mask, dt)
    matvec, _ = sl.make_matvec()
    A = lambda u: free * matvec(free * u, r0) + (1.0 - free) * u
    res = pcg(A, free * f, M=M, maxiter=300, tol=1e-8)
    assert bool(res.converged)



def test_flexible_cg_tolerates_varying_preconditioner():
    """pcg(flexible=True) uses the IPCG beta <z,r_new-r_old>/<z,r>: on an
    SPD system with a deliberately ITERATION-VARYING SPD preconditioner it
    must still converge (standard beta loses conjugacy there), and on a
    fixed M it must agree with standard PCG."""
    import numpy as np
    import jax.numpy as jnp
    from pylatticedso_tpu.fem.solve import pcg

    rng = np.random.default_rng(0)
    n = 120
    Q = np.linalg.qr(rng.normal(size=(n, n)))[0]
    A64 = Q @ np.diag(np.linspace(1.0, 2e3, n)) @ Q.T
    x_true = rng.normal(size=n)
    b = jnp.asarray(A64 @ x_true)
    A = lambda x: jnp.asarray(A64) @ x
    d = jnp.asarray(np.diag(A64))

    # varying SPD preconditioner: scaled Jacobi whose scale depends on the
    # current residual norm (changes every iteration)
    def M_var(r):
        s = 1.0 + jnp.tanh(jnp.linalg.norm(r))
        return r / (d * s)

    out = pcg(A, b, M=M_var, maxiter=800, tol=1e-10, flexible=True)
    err = float(np.linalg.norm(np.asarray(out.x) - x_true)
                / np.linalg.norm(x_true))
    assert bool(out.converged) and err < 1e-7

    # fixed M: flexible == standard to roundoff
    M = lambda r: r / d
    x_std = pcg(A, b, M=M, maxiter=800, tol=1e-12).x
    x_flx = pcg(A, b, M=M, maxiter=800, tol=1e-12, flexible=True).x
    np.testing.assert_allclose(np.asarray(x_flx), np.asarray(x_std),
                               rtol=1e-6, atol=1e-10)
