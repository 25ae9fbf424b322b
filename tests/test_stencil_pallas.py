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


class TestFusedSmoother:
    """Fused MG-smoother kernels (apply.fused) vs the plain XLA path
    (interpret mode).  The fused V-cycle must reproduce mg_apply exactly
    (f32 storage) and the bench solve must converge identically."""

    def _setup(self, geom="BCC", n=4):
        slat = StructuredLattice(geom, (n, n, n), (1.0, 1.0, 1.0),
                                 1013.0, 0.3)
        mv, _ = slat.make_matvec()
        prep_p, apply_p = make_pallas_matvec(slat, mv.prepare, mv.apply,
                                             tile=1024, interpret=True)
        rng = np.random.default_rng(0)
        u = jnp.asarray(rng.standard_normal((slat.nc, 6) + slat.grid),
                        jnp.float32)
        r = jnp.asarray(0.04 + 0.05 * rng.random((n, n, n)), jnp.float32)
        fixed = slat.select_nodes(lambda x, y, z: z == 0.0)
        fm = jnp.asarray(np.broadcast_to(
            (slat.node_valid & ~fixed)[:, None],
            (slat.nc, 6) + slat.grid), jnp.float32)
        return slat, mv, prep_p, apply_p, u, r, fm

    def test_residual_kernel(self):
        slat, mv, prep_p, apply_p, u, r, fm = self._setup()
        fz = apply_p.fused
        assert fz.ok
        io = jnp.float32
        r2 = prep_p(r)
        rng = np.random.default_rng(1)
        b = jnp.asarray(rng.standard_normal(u.shape), jnp.float32) * fm
        x = u * fm
        out = fz.residual(io)(fz.to_flat(b, io), fz.to_flat(x, io),
                              fz.to_flat(fm, io), fz.repad_r2(r2, io))
        got = fz.from_flat(out)
        want = fm * (b - mv.apply(x, mv.prepare(r)))
        err = float(jnp.max(jnp.abs(got - want))
                    / jnp.max(jnp.abs(want)))
        assert err < 1e-5

    def test_roundtrip_layout(self):
        slat, mv, prep_p, apply_p, u, r, fm = self._setup()
        fz = apply_p.fused
        np.testing.assert_array_equal(
            np.asarray(fz.from_flat(fz.to_flat(u, jnp.float32))),
            np.asarray(u))

    @pytest.mark.parametrize("deg,with_x0", [(1, False), (2, True),
                                             (3, False)])
    def test_cheb_run_matches_chebyshev(self, deg, with_x0):
        from pylatticedso_tpu.parallel.multigrid import _chebyshev
        slat, mv, prep_p, apply_p, u, r, fm = self._setup()
        fz = apply_p.fused
        io = jnp.float32
        r2 = prep_p(r)
        aux = mv.prepare(r)
        A = lambda v: fm * mv.apply(fm * v, aux) + (1 - fm) * v
        diag = slat.make_matvec()[1]
        D = fm * diag(r) + (1 - fm)
        D = jnp.where(D == 0, 1.0, D)
        lmax = jnp.asarray(3.0, jnp.float32)
        frac = 0.25
        rng = np.random.default_rng(2)
        b = jnp.asarray(rng.standard_normal(u.shape), jnp.float32) * fm
        x0 = (u * fm) if with_x0 else None
        want = _chebyshev(A, D, b, x0, lmax, frac, deg)

        # fused: multi-program per-step path
        fdinv = fz.to_flat(fm / D, io)
        fmf = fz.to_flat(fm, io)
        r2f = fz.repad_r2(r2, io)
        sc = fz.sc(2.0 / ((1 + frac) * lmax), 2.0 / ((1 - frac) * lmax))
        b_flat = fz.to_flat(b, io)
        if x0 is None:
            x, rr = jnp.zeros_like(b_flat), b_flat
        else:
            x = fz.to_flat(x0, io)
            rr = fz.residual(io)(b_flat, x, fmf, r2f)
        d = rr * fdinv * sc[0]
        got = None
        for k, (c1, c2) in enumerate(fz.cheb_static(frac, deg)):
            out = fz.cheb_run(io, c1, c2, k == deg - 1)(
                x, rr, d, fdinv, sc, r2f)
            if k == deg - 1:
                got = fz.from_flat(out)
            else:
                x, rr, d = out
        err = float(jnp.max(jnp.abs(got - want))
                    / (jnp.max(jnp.abs(want)) + 1e-30))
        assert err < 2e-5

        # fused: single-program full-smoother path (small grid fits)
        if fz.single_ok:
            if x0 is None:
                out2 = fz.cheb_full(io, frac, deg, False)(
                    b_flat, fdinv, sc, r2f)
            else:
                out2 = fz.cheb_full(io, frac, deg, True)(
                    b_flat, fz.to_flat(x0, io), fdinv, sc, r2f)
            got2 = fz.from_flat(out2)
            err2 = float(jnp.max(jnp.abs(got2 - want))
                         / (jnp.max(jnp.abs(want)) + 1e-30))
            assert err2 < 2e-5

    def test_fused_vcycle_matches_unfused(self, monkeypatch):
        from pylatticedso_tpu.parallel.multigrid import (
            build_mg_hierarchy, mg_precond_state, mg_apply)
        monkeypatch.setenv("PLDSO_MATVEC", "pallas")
        monkeypatch.setenv("PLDSO_PALLAS_INTERPRET", "1")
        monkeypatch.setenv("PLDSO_MG_FUSED_DTYPE", "f32")
        monkeypatch.setenv("PLDSO_MG_FUSED", "1")
        n = 4
        slat = StructuredLattice("BCC", (n, n, n), (1.0, 1.0, 1.0),
                                 1013.0, 0.3)
        fixed = slat.select_nodes(lambda x, y, z: z == 0.0)
        free_np = np.broadcast_to(
            (slat.node_valid & ~fixed)[:, None], (slat.nc, 6) + slat.grid)
        h = build_mg_hierarchy(slat, free_np)
        r0 = jnp.asarray(
            0.04 + 0.03 * np.random.default_rng(3).random((n, n, n)),
            jnp.float32)
        state = mg_precond_state(h, r0, power_iters=3)
        assert all(f is not None for f in state["fused"])
        rng = np.random.default_rng(4)
        v = jnp.asarray(rng.standard_normal((slat.nc, 6) + slat.grid),
                        jnp.float32) * h["levels"][0].free
        monkeypatch.setenv("PLDSO_MG_BF16", "0")
        M0 = mg_apply(h, state, nu=(1, 1), coarse_degree=6, fused=False)
        y0 = M0(v)
        M1 = mg_apply(h, state, nu=(1, 1), coarse_degree=6)
        y1 = M1(v)
        err = float(jnp.max(jnp.abs(y1 - y0))
                    / (jnp.max(jnp.abs(y0)) + 1e-30))
        assert err < 2e-5

    def test_fused_bf16_compute_loose_parity(self, monkeypatch):
        """PLDSO_MG_FUSED_COMPUTE=bf16 drops the fused kernels' stencil
        arithmetic to bfloat16 (the V-cycle is a preconditioner — only M's
        shape matters, not its bits): parity holds to bf16 grade."""
        monkeypatch.setenv("PLDSO_MG_FUSED_COMPUTE", "bf16")
        slat, mv, prep_p, apply_p, u, r, fm = self._setup()
        fz = apply_p.fused
        io = jnp.float32
        r2 = prep_p(r)
        rng = np.random.default_rng(1)
        b = jnp.asarray(rng.standard_normal(u.shape), jnp.float32) * fm
        x = u * fm
        out = fz.residual(io)(fz.to_flat(b, io), fz.to_flat(x, io),
                              fz.to_flat(fm, io), fz.repad_r2(r2, io))
        got = fz.from_flat(out)
        want = fm * (b - mv.apply(x, mv.prepare(r)))
        err = float(jnp.max(jnp.abs(got - want))
                    / jnp.max(jnp.abs(want)))
        assert 1e-7 < err < 8e-2      # bf16-grade, and actually engaged

    def test_fused_vcycle_hybrid_geometry(self, monkeypatch):
        """Fused V-cycle on a multi-geometry (hybrid) lattice: per-edge
        r^2 flats, collision-split templates and per-geometry radius
        fields must survive the fused kernels unchanged."""
        from pylatticedso_tpu.parallel.multigrid import (
            build_mg_hierarchy, mg_precond_state, mg_apply)
        monkeypatch.setenv("PLDSO_MATVEC", "pallas")
        monkeypatch.setenv("PLDSO_PALLAS_INTERPRET", "1")
        monkeypatch.setenv("PLDSO_MG_FUSED_DTYPE", "f32")
        monkeypatch.setenv("PLDSO_MG_FUSED", "1")
        n = 4
        slat = StructuredLattice(["BCC", "Hybrid1"], (n, n, n),
                                 (1.0, 1.0, 1.0), 1013.0, 0.3)
        fixed = slat.select_nodes(lambda x, y, z: z == 0.0)
        free_np = np.broadcast_to(
            (slat.node_valid & ~fixed)[:, None], (slat.nc, 6) + slat.grid)
        h = build_mg_hierarchy(slat, free_np)
        r0 = jnp.asarray(
            0.04 + 0.03 * np.random.default_rng(9).random((2, n, n, n)),
            jnp.float32)
        state = mg_precond_state(h, r0, power_iters=3)
        if not all(f is not None for f in state["fused"]):
            pytest.skip("hybrid template exceeds fused VMEM model here")
        rng = np.random.default_rng(10)
        v = jnp.asarray(rng.standard_normal((slat.nc, 6) + slat.grid),
                        jnp.float32) * h["levels"][0].free
        monkeypatch.setenv("PLDSO_MG_BF16", "0")
        y0 = mg_apply(h, state, nu=(1, 1), coarse_degree=6,
                      fused=False)(v)
        y1 = mg_apply(h, state, nu=(1, 1), coarse_degree=6)(v)
        err = float(jnp.max(jnp.abs(y1 - y0))
                    / (jnp.max(jnp.abs(y0)) + 1e-30))
        assert err < 2e-5

    def test_mg_opts_fused_optin_without_env(self, monkeypatch):
        """The documented library opt-in — mg_opts={"fused": True} on
        make_structured_compliance_step — must engage the fused V-cycle
        WITHOUT the PLDSO_MG_FUSED env var (the state build threads the
        option through mg_precond_state)."""
        from pylatticedso_tpu.parallel.structured import (
            StructuredLattice, make_structured_compliance_step)
        monkeypatch.setenv("PLDSO_MATVEC", "pallas")
        monkeypatch.setenv("PLDSO_PALLAS_INTERPRET", "1")
        monkeypatch.setenv("PLDSO_MG_FUSED_DTYPE", "f32")
        monkeypatch.delenv("PLDSO_MG_FUSED", raising=False)
        n = 4
        slat = StructuredLattice("BCC", (n, n, n), (1., 1., 1.), 1013.0,
                                 0.3)
        fixed = slat.select_nodes(lambda x, y, z: z == 0.0)
        top = slat.select_nodes(lambda x, y, z: z == float(n))
        free = slat.node_valid & ~fixed
        f = np.zeros((slat.nc, 6) + slat.grid, np.float32)
        for c in range(slat.nc):
            f[c, 2][top[c]] = -1.0 / int(top.sum())
        mg = {"nu": (1, 1), "coarse_degree": 6, "power_iters": 3}
        s_ref = make_structured_compliance_step(
            slat, free, f, tol=1e-8, maxiter=500, precond="mg",
            mg_opts=mg)
        s_fused = make_structured_compliance_step(
            slat, free, f, tol=1e-8, maxiter=500, precond="mg",
            mg_opts=dict(mg, fused=True))
        r0 = jnp.full((n, n, n), 0.05, jnp.float32)
        ps = s_fused.precond_state(r0)
        assert all(fo is not None for fo in ps["fused"]), \
            "opt-in state build must materialize fused operands"
        c_f, g_f, _ = s_fused(r0, None, ps)
        c_r, g_r, _ = s_ref(r0)
        np.testing.assert_allclose(float(c_f), float(c_r), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_r),
                                   rtol=1e-4, atol=1e-10)
