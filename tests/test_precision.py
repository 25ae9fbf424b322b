"""Low-precision solver strategies: refinement, residual tracking."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pylatticedso_tpu.fem.solve import pcg, pcg_refined


def spd_system(n=300, cond=5e3, seed=0):
    rng = np.random.default_rng(seed)
    Q = np.linalg.qr(rng.normal(size=(n, n)))[0]
    A64 = Q @ np.diag(np.linspace(1, cond, n)) @ Q.T
    x_true = rng.normal(size=n)
    return A64, x_true, A64 @ x_true


def test_mixed_precision_refinement_beats_f32_floor():
    """f32 inner solves + f64 residuals reach ~1e-12, far below the f32
    matvec floor — the TPU accuracy strategy for the 1e-8 rtol target."""
    A64, x_true, b64 = spd_system()
    A32 = jnp.asarray(A64.astype(np.float32))
    A = lambda x: A32 @ x
    res_hi = lambda x: jnp.asarray(b64) - jnp.asarray(A64) @ x.astype(jnp.float64)
    plain = pcg(A, jnp.asarray(b64.astype(np.float32)), maxiter=3000, tol=1e-12)
    refined = pcg_refined(A, jnp.asarray(b64.astype(np.float32)), maxiter=3000,
                          tol=1e-7, refinements=3, residual_fn=res_hi)
    err_plain = np.linalg.norm(np.asarray(plain.x, np.float64) - x_true) / np.linalg.norm(x_true)
    err_ref = np.linalg.norm(np.asarray(refined.x) - x_true) / np.linalg.norm(x_true)
    assert refined.x.dtype == jnp.float64
    assert err_ref < 1e-10
    assert err_ref < err_plain * 1e-2


def test_refinement_without_hi_residual_composes_loose_solves():
    A64, x_true, b64 = spd_system(cond=100.0)
    A = lambda x: jnp.asarray(A64) @ x
    out = pcg_refined(A, jnp.asarray(b64), maxiter=60, tol=1e-4, refinements=3)
    err = np.linalg.norm(np.asarray(out.x) - x_true) / np.linalg.norm(x_true)
    assert err < 1e-9  # three 1e-4-ish contractions compose


def test_residual_history_tracking():
    A64, x_true, b64 = spd_system(n=80, cond=50)
    A = lambda x: jnp.asarray(A64) @ x
    out = pcg(A, jnp.asarray(b64), maxiter=200, tol=1e-12, track_history=True)
    h = np.asarray(out.residual_history)
    k = int(out.iterations)
    assert h.shape == (200,)
    assert np.all(h[:k] >= 0) and np.all(h[k:] == -1)
    # overall decreasing trend: final residual far below the first
    assert h[k - 1] < h[0] * 1e-8


def test_refined_solve_reaches_hi_precision_tol():
    """Adaptive refinement (f32 inner CG + f64 residual passes) converges to
    a tol far below the f32 floor — the DDM interface solve's TPU strategy."""
    from pylatticedso_tpu.fem.solve import refined_solve

    A64, x_true, b64 = spd_system()
    A32 = jnp.asarray(A64.astype(np.float32))
    A64j = jnp.asarray(A64)
    out = refined_solve(lambda x: A32 @ x, lambda x: A64j @ x,
                        jnp.asarray(b64), maxiter=3000, tol=1e-11,
                        inner_tol=1e-6)
    assert out.x.dtype == jnp.float64
    assert bool(out.converged)
    err = np.linalg.norm(np.asarray(out.x) - x_true) / np.linalg.norm(x_true)
    assert err < 1e-9


def test_linear_solve_refined_gradient_matches_analytic():
    """grad through the refined differentiable solve == the f64 analytic
    adjoint formula (custom_linear_solve over the hi-precision operator)."""
    from pylatticedso_tpu.fem.solve import linear_solve_refined

    A64, _, b64 = spd_system(n=120, cond=1e3, seed=3)
    A64j = jnp.asarray(A64)
    A32 = jnp.asarray(A64.astype(np.float32))
    theta0 = 0.7

    def f(theta):
        A_hi = lambda x: A64j @ x + theta * x
        A_lo = lambda x: A32 @ x + jnp.float32(theta0) * x  # frozen lo copy
        x = linear_solve_refined(A_lo, jnp.asarray(b64), A_hi,
                                 maxiter=2000, tol=1e-12, inner_tol=1e-6)
        return jnp.sum(x)

    g = jax.grad(f)(theta0)
    # analytic: d/dtheta 1^T (A + theta I)^-1 b = -1^T A^-1 A^-1 b  (at theta)
    Ath = A64 + theta0 * np.eye(A64.shape[0])
    x = np.linalg.solve(Ath, b64)
    lam = np.linalg.solve(Ath, np.ones_like(b64))
    expected = -lam @ x
    np.testing.assert_allclose(float(g), expected, rtol=1e-8)


def test_structured_step_bitwise_deterministic(monkeypatch):
    """BASELINE north-star clause: repeated identical solves are
    bitwise-stable.  XLA:TPU (and CPU) lowers our reductions and the MG
    V-cycle with fixed reduction orders, so the same program on the same
    inputs must return the exact same bits — including with the bf16-I/O
    smoother the bench uses.  Guards against nondeterministic rewrites
    (atomic scatter-adds, reduction reassociation) creeping into the hot
    path."""
    from pylatticedso_tpu.parallel.structured import (
        StructuredLattice, make_structured_compliance_step)

    monkeypatch.setenv("PLDSO_MG_BF16", "1")
    n = 4
    sl = StructuredLattice("BCC", (n, n, n), (1., 1., 1.), 1013.0, 0.3,
                           dtype=jnp.float32)
    fixed = sl.select_nodes(lambda x, y, z: z == 0.0)
    top = sl.select_nodes(lambda x, y, z: z == float(n))
    free = sl.node_valid & ~fixed
    f = np.zeros((sl.nc, 6) + sl.grid, dtype=np.float32)
    for c in range(sl.nc):
        f[c, 2][top[c]] = -1.0 / int(top.sum())
    step = make_structured_compliance_step(
        sl, free, f, tol=1e-6, maxiter=500, precond="mg",
        mg_opts={"nu": (1, 1), "coarse_degree": 8, "power_iters": 3})
    r0 = jnp.asarray(np.random.default_rng(7).uniform(0.03, 0.08, (n, n, n)),
                     dtype=jnp.float32)
    ps = step.precond_state(r0)
    c1, g1, u1 = jax.block_until_ready(step(r0, None, ps))
    c2, g2, u2 = jax.block_until_ready(step(r0, None, ps))
    assert np.asarray(c1).tobytes() == np.asarray(c2).tobytes()
    assert np.asarray(g1).tobytes() == np.asarray(g2).tobytes()
    assert np.asarray(u1).tobytes() == np.asarray(u2).tobytes()
    # warm-started continuation is deterministic too
    c3, g3, u3 = jax.block_until_ready(step(r0, u1, ps))
    c4, g4, u4 = jax.block_until_ready(step(r0, u2, ps))
    assert np.asarray(c3).tobytes() == np.asarray(c4).tobytes()
    assert np.asarray(g3).tobytes() == np.asarray(g4).tobytes()
