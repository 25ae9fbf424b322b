"""Pallas fused stencil matvec vs the XLA gather form (interpret mode on
CPU; the real-TPU run is scripts/test_pallas_matvec.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pylatticedso_tpu.parallel.structured import StructuredLattice
from pylatticedso_tpu.parallel.stencil_pallas import (make_pallas_matvec,
                                                      pallas_supported)


@pytest.mark.parametrize("geom,n,align8,once", [
    ("BCC", 5, False, "0"),   # unaligned layout (once is forced off there)
    ("BCC", 5, True, "0"),    # two-sided kernel on the aligned layout
    ("BCC", 5, True, "1"),
    ("Octet", 4, True, "1"),  # sweep winner on hardware: once + align8
])
def test_pallas_matches_gather(geom, n, align8, once, monkeypatch):
    monkeypatch.setenv("PLDSO_PALLAS_ONCE", once)
    slat = StructuredLattice(geom, (n, n, n), (1.0, 1.0, 1.0), 1013.0, 0.3)
    mv, _ = slat.make_matvec()
    prep_p, apply_p = make_pallas_matvec(slat, mv.prepare, mv.apply,
                                         tile=1024, interpret=True,
                                         align8=align8)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((slat.nc, 6) + slat.grid), jnp.float32)
    r = jnp.asarray(0.04 + 0.05 * rng.random((n, n, n)), jnp.float32)
    yg = mv.apply(u, mv.prepare(r))
    yp = apply_p(u, prep_p(r))
    err = float(jnp.max(jnp.abs(yg - yp)) / jnp.max(jnp.abs(yg)))
    assert err < 1e-5


@pytest.mark.slow
def test_pallas_erased_cells_and_grad():
    n = 4
    valid = np.ones((n, n, n), bool)
    valid[1, 2, 3] = False
    valid[0, 0, 0] = False
    slat = StructuredLattice("BCC", (n, n, n), (1.0, 1.0, 1.0), 1013.0, 0.3,
                             cell_valid=valid)
    mv, _ = slat.make_matvec()
    prep_p, apply_p = make_pallas_matvec(slat, mv.prepare, mv.apply,
                                         tile=512, interpret=True)
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.standard_normal((slat.nc, 6) + slat.grid), jnp.float32)
    r = jnp.asarray(0.04 + 0.05 * rng.random((n, n, n)), jnp.float32)
    yg = mv.apply(u, mv.prepare(r))
    yp = apply_p(u, prep_p(r))
    assert float(jnp.max(jnp.abs(yg - yp)) / jnp.max(jnp.abs(yg))) < 1e-5

    # custom VJP: grad w.r.t. u (kernel symmetry) and radius (XLA fallback)
    def loss(form_prep, form_apply, r_):
        return jnp.sum(form_apply(u, form_prep(r_)) ** 2)

    gg = jax.grad(lambda r_: loss(mv.prepare, mv.apply, r_))(r)
    gp = jax.grad(lambda r_: loss(prep_p, apply_p, r_))(r)
    assert float(jnp.max(jnp.abs(gg - gp)) / (jnp.max(jnp.abs(gg)) + 1e-30)) \
        < 1e-4


def test_pallas_supported_threshold():
    small = StructuredLattice("BCC", (3, 3, 3), (1.0, 1.0, 1.0), 1013.0, 0.3)
    big = StructuredLattice("BCC", (40, 40, 40), (1.0, 1.0, 1.0), 1013.0, 0.3)
    # default threshold is 0 (the kernel wins at every size on TPU); an
    # explicit min_points still gates
    assert pallas_supported(small)
    assert not pallas_supported(small, min_points=20000)
    assert pallas_supported(big, min_points=20000)


def test_pallas_bf16_smoother_form():
    """apply.lo (bf16 I/O, f32 arithmetic) must track the f32 kernel to
    bf16 rounding — the multigrid smoother's low-bandwidth matvec."""
    n = 4
    slat = StructuredLattice("Octet", (n, n, n), (1.0, 1.0, 1.0), 1013.0, 0.3)
    mv, _ = slat.make_matvec()
    prep_p, apply_p = make_pallas_matvec(slat, mv.prepare, mv.apply,
                                         tile=1024, interpret=True)
    rng = np.random.default_rng(2)
    u = jnp.asarray(rng.standard_normal((slat.nc, 6) + slat.grid), jnp.float32)
    r = jnp.asarray(0.04 + 0.05 * rng.random((n, n, n)), jnp.float32)
    aux = prep_p(r)
    y32 = apply_p(u, aux)
    y16 = apply_p.lo(u.astype(jnp.bfloat16),
                     apply_p.prepare_lo(aux)).astype(jnp.float32)
    err = float(jnp.max(jnp.abs(y32 - y16)) / jnp.max(jnp.abs(y32)))
    assert err < 0.03, err          # bf16 has ~3e-3 relative rounding


@pytest.mark.slow
def test_mg_bf16_smoother_preconditioner_converges():
    """PCG with the bf16-smoother V-cycle must reach the same solution
    (the preconditioner only changes convergence, not the fixed point)."""
    from pylatticedso_tpu.parallel.structured import (
        make_structured_compliance_step)

    n = 4
    slat = StructuredLattice("Octet", (n, n, n), (1.0, 1.0, 1.0), 1013.0, 0.3)
    free = slat.select_nodes(lambda x, y, z: z > 1e-9)
    f = slat.node_field()
    top = slat.select_nodes(lambda x, y, z: z > n - 1e-9)
    f[:, 2][top] = -0.5
    r = np.full((n, n, n), 0.05, np.float32)
    step_hi = make_structured_compliance_step(
        slat, free, f, tol=1e-8, maxiter=400, precond="mg")
    step_lo = make_structured_compliance_step(
        slat, free, f, tol=1e-8, maxiter=400, precond="mg",
        mg_opts={"lo_smoother": True})
    c_hi, g_hi, _ = step_hi(r)
    c_lo, g_lo, _ = step_lo(r)
    np.testing.assert_allclose(float(c_lo), float(c_hi), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_lo), np.asarray(g_hi),
                               rtol=1e-4, atol=1e-10)
