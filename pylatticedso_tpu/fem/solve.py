"""Preconditioned conjugate gradient on device + differentiable linear solve.

``pcg`` is a ``lax.while_loop`` re-implementation of the reference's
hand-rolled CG (conjugate_gradient_solver.py:15-122), preserving its
semantics — optional step clamp ``alpha_max``, restart period, and the dual
convergence test (residual vs ``tol * |b|`` or search-direction collapse) —
while running entirely on device over pytree-shaped unknowns.

``linear_solve`` wraps the operator in ``lax.custom_linear_solve`` so that
``jax.grad`` through a lattice equilibrium solve performs the adjoint solve
automatically (symmetric operators: the transpose solve reuses the same CG) —
the implicit-function-theorem equivalent of the reference's hand-built
adjoint pipeline (lattice_opti.py:1487-1648).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

__all__ = ["pcg", "linear_solve", "linear_solve_refined",
           "linear_solve_dense_refined", "refined_solve", "PCGResult"]


class PCGResult(NamedTuple):
    x: jnp.ndarray
    iterations: jnp.ndarray
    residual_norm: jnp.ndarray
    converged: jnp.ndarray
    residual_history: Optional[jnp.ndarray] = None  # [maxiter] padded with -1


def _dot(a, b):
    return jnp.vdot(a.reshape(-1), b.reshape(-1))


def _norm(a):
    return jnp.sqrt(_dot(a, a).real)


def pcg(A: Callable, b: jnp.ndarray, M: Optional[Callable] = None,
        x0: Optional[jnp.ndarray] = None, maxiter: int = 1000,
        tol: float = 1e-10, mintol: float = 0.0,
        alpha_max: Optional[float] = None,
        restart_every: int = 0, track_history: bool = False,
        flexible: bool = False) -> PCGResult:
    """Matrix-free PCG over arrays of any shape.

    Args mirror the reference solver; ``alpha_max``/``restart_every``/
    ``mintol`` default OFF (0 / None) since the standard CG is strictly
    better for SPD systems — pass the reference's values (0.1 / 1000 / 1e-5)
    for behavioral parity runs.  ``track_history`` records per-iteration
    residual norms (the reference's cg_progress observability,
    lattice_sim.py:1256-1304); unused slots hold -1.
    """
    if M is None:
        M = lambda r: r
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - A(x)
    z = M(r)
    p = z
    rz = _dot(r, z)
    norm_b = _norm(b)
    # a zero rhs must return x = 0 without iterating
    threshold = tol * jnp.maximum(norm_b, jnp.finfo(b.dtype).tiny)
    hist = jnp.full(maxiter, -1.0, dtype=r.dtype) if track_history else None

    def cond(state):
        return jnp.logical_and(state[5] < maxiter, jnp.logical_not(state[6]))

    def body(state):
        x, r, z, p, rz, k, _, hist = state
        Ap = A(p)
        pAp = _dot(p, Ap)
        alpha = rz / jnp.where(pAp == 0, 1.0, pAp)
        if alpha_max is not None:
            alpha = jnp.minimum(alpha, alpha_max)
        x = x + alpha * p
        r_old = r
        r = r - alpha * Ap
        res = _norm(r)
        if hist is not None:
            hist = hist.at[k].set(res)
        done = res <= threshold
        if mintol > 0:
            done = jnp.logical_or(done, _norm(p) < mintol * (_norm(x) + 1e-12))
        z = M(r)
        rz_new = _dot(r, z)
        num = _dot(z, r - r_old) if flexible else rz_new
        beta = num / jnp.where(rz == 0, 1.0, rz)
        p = z + beta * p
        if restart_every > 0:
            p = jnp.where((k + 1) % restart_every == 0, z, p)
        return (x, r, z, p, rz_new, k + 1, done, hist)

    init_done = _norm(r) <= threshold
    state = jax.lax.while_loop(cond, body,
                               (x, r, z, p, rz, jnp.asarray(0), init_done, hist))
    x, r, z, p, rz, k, done, hist = state
    return PCGResult(x=x, iterations=k, residual_norm=_norm(r), converged=done,
                     residual_history=hist)


def pcg_refined(A: Callable, b: jnp.ndarray, M: Optional[Callable] = None,
                maxiter: int = 1000, tol: float = 1e-6,
                refinements: int = 2,
                residual_fn: Optional[Callable] = None) -> PCGResult:
    """Iterative-refinement PCG for low-precision arithmetic.

    TPUs have no native float64; a single f32 CG stalls at the matvec
    rounding floor (~kappa * eps_f32 relative error).  Classical refinement
    — solve loosely, recompute the residual, solve the correction — composes
    cheap inner solves into full attainable accuracy.  To go BELOW the f32
    floor (the 1e-8 target of SURVEY.md §8), pass ``residual_fn(x) -> b - A x``
    evaluated in higher precision (XLA-emulated f64 on TPU, or a double-word
    compensated matvec); refinement then contracts the true error each pass.
    """
    out = pcg(A, b, M=M, maxiter=maxiter, tol=tol)
    iters = out.iterations
    # accumulate the solution in the residual precision (f64 when a
    # high-precision residual_fn is given) — a f32-stored solution cannot
    # express relative errors below ~6e-8 regardless of the residual quality
    hi = residual_fn(out.x).dtype if residual_fn is not None else b.dtype
    x = out.x.astype(hi)
    for _ in range(refinements):
        r = residual_fn(x) if residual_fn is not None else b - A(x)
        corr = pcg(A, r.astype(b.dtype), M=M, maxiter=maxiter, tol=tol)
        x = x + corr.x.astype(hi)
        iters = iters + corr.iterations
    r = residual_fn(x) if residual_fn is not None else b - A(x)
    res = jnp.sqrt(jnp.vdot(r.reshape(-1), r.reshape(-1)).real)
    nb = jnp.sqrt(jnp.vdot(b.reshape(-1), b.reshape(-1)).real)
    return PCGResult(x=x, iterations=iters,
                     residual_norm=res.astype(b.dtype),
                     converged=res <= tol * nb)


def linear_solve_refined(A_lo: Callable, b: jnp.ndarray,
                         A_hi: Callable, M: Optional[Callable] = None,
                         maxiter: int = 2000, tol: float = 1e-9,
                         inner_tol: float = 1e-4,
                         max_refinements: int = 12,
                         lo_dtype=jnp.float32,
                         restart_every: int = 0,
                         x0: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Differentiable refined SPD solve for f32 devices (TPU).

    The forward/adjoint CG iterations run in the fast low precision
    (``A_lo``, ``lo_dtype``); true residuals are recomputed with ``A_hi``
    (XLA-emulated f64 on TPU — slow per op but evaluated once per
    refinement pass, not per CG iteration), and correction solves repeat
    until ``|b - A x| <= tol |b|`` in the HIGH precision or
    ``max_refinements`` passes.  This is how the DDM interface solve
    reaches the reference's tol-1e-9 PETSc-f64 semantics
    (lattice_sim.py:1111-1176) on hardware without native f64: a plain f32
    CG stalls at the ~kappa*eps_f32 rounding floor.

    ``b`` may be f64; gradients flow through ``A_hi``'s operands and ``b``
    via ``lax.custom_linear_solve`` (one emulated-f64 matvec per VJP).
    The returned solution is in ``b``'s (high) precision.
    """
    def solve_fn(mv_hi, rhs):
        return refined_solve(A_lo, mv_hi, rhs, M=M, maxiter=maxiter, tol=tol,
                             inner_tol=inner_tol,
                             max_refinements=max_refinements,
                             lo_dtype=lo_dtype, restart_every=restart_every,
                             x0=x0).x

    return jax.lax.custom_linear_solve(A_hi, b, solve_fn, symmetric=True)


def refined_solve(A_lo: Callable, A_hi: Callable, b_hi: jnp.ndarray,
                  M: Optional[Callable] = None, maxiter: int = 2000,
                  tol: float = 1e-9, inner_tol: float = 1e-4,
                  max_refinements: int = 12,
                  lo_dtype=jnp.float32,
                  restart_every: int = 0,
                  x0: Optional[jnp.ndarray] = None) -> PCGResult:
    """Adaptive iterative-refinement solve (non-differentiable core).

    Low-precision inner CG + high-precision residual passes until
    ``|b - A x| <= tol |b|`` in the HIGH precision or ``max_refinements``
    passes.  Returns a PCGResult whose ``x`` is in ``b_hi``'s dtype and
    whose ``iterations`` counts total inner CG iterations.
    """
    if M is None:
        M = lambda r: r
    hi_dt = b_hi.dtype
    nb = _norm(b_hi)
    threshold = tol * jnp.maximum(nb, jnp.finfo(hi_dt).tiny)

    def inner(r_hi, g0):
        r_lo = r_hi.astype(lo_dtype)
        guess = None
        if g0 is not None:
            # A-norm-optimal step along the guess direction: handles scale
            # AND sign mismatch, so the same guess serves the forward solve
            # (g0 ~ u) and the adjoint solve under custom_linear_solve
            # (compliance adjoints are parallel to u) — one lo matvec
            Ag = A_lo(g0)
            den = _dot(g0, Ag)
            alpha = _dot(r_lo, g0) / jnp.where(den == 0, 1.0, den)
            guess = jnp.where(den == 0, 0.0, alpha) * g0
        out = pcg(A_lo, r_lo, M=M, maxiter=maxiter, tol=inner_tol,
                  x0=guess, restart_every=restart_every)
        return out.x.astype(hi_dt), out.iterations

    g0 = None if x0 is None else x0.astype(lo_dtype)
    x0h, it0 = inner(b_hi, g0)
    # state carries the hi-precision residual VECTOR: one A_hi apply per
    # pass (the emulated-f64 matvec is the expensive op on TPU)
    r0 = b_hi - A_hi(x0h)

    def cond(st):
        _, _, res, k, _ = st
        return jnp.logical_and(k < max_refinements, res > threshold)

    def body(st):
        x, r, _, k, it = st
        dx, dit = inner(r, None)
        x = x + dx
        r = b_hi - A_hi(x)
        return (x, r, _norm(r), k + 1, it + dit)

    x, _, res, _, iters = jax.lax.while_loop(
        cond, body, (x0h, r0, _norm(r0), jnp.asarray(0), it0))
    return PCGResult(x=x, iterations=iters, residual_norm=res,
                     converged=res <= threshold)


def linear_solve_dense_refined(apply_inv: Callable, b: jnp.ndarray,
                               A_hi: Callable, tol: float = 1e-9,
                               max_refinements: int = 40,
                               x0: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Differentiable mixed-precision DENSE solve (TPU path for small
    systems).

    ``apply_inv(r) -> ~A^-1 r`` applies a low-precision factorization
    (e.g. an equilibrated f32 Cholesky — dense triangular solves on the
    MXU); ``A_hi`` recomputes residuals in high precision (emulated f64 on
    TPU).  Classic f32-factor + f64-residual iterative refinement: each
    pass contracts the error by ~kappa*eps_f32, and passes cost two
    triangular solves + one hi matvec — microseconds at interface sizes,
    where a latency-bound matrix-free CG while_loop costs seconds per
    solve on TPU.  Gradients flow through ``A_hi``/``b`` via
    ``lax.custom_linear_solve``; the adjoint solve reuses the same factor.
    """
    def solve_fn(mv_hi, rhs):
        hi = rhs.dtype
        threshold = tol * jnp.maximum(_norm(rhs), jnp.finfo(hi).tiny)
        x_init = jnp.zeros_like(rhs) if x0 is None else x0.astype(hi)
        r_init = rhs - mv_hi(x_init)

        def cond(st):
            _, _, res, k = st
            return jnp.logical_and(k < max_refinements, res > threshold)

        def body(st):
            x, r, _, k = st
            x = x + apply_inv(r).astype(hi)
            r = rhs - mv_hi(x)
            return (x, r, _norm(r), k + 1)

        x, _, _, _ = jax.lax.while_loop(
            cond, body, (x_init, r_init, _norm(r_init), jnp.asarray(0)))
        return x

    return jax.lax.custom_linear_solve(A_hi, b, solve_fn, symmetric=True)


def linear_solve(A: Callable, b: jnp.ndarray, M: Optional[Callable] = None,
                 x0: Optional[jnp.ndarray] = None, maxiter: int = 2000,
                 tol: float = 1e-12, alpha_max: Optional[float] = None,
                 restart_every: int = 0, scale_x0: bool = False) -> jnp.ndarray:
    """Differentiable SPD solve: custom_linear_solve with CG forward/adjoint.

    Gradients w.r.t. anything entering ``A`` or ``b`` flow through the
    implicit function theorem; the transpose solve is the same CG because the
    operator is symmetric.  ``alpha_max``/``restart_every`` are the reference
    CG's robustness guards (conjugate_gradient_solver.py:15-122) for
    operators carrying surrogate noise.

    ``scale_x0=True`` starts each solve at the A-norm-optimal multiple of
    ``x0`` instead of ``x0`` itself (one extra matvec).  This makes a single
    warm-start guess serve both the forward solve (x0 ~ x) and the adjoint
    solve that ``jax.grad`` triggers through the same ``solve_fn`` — for
    compliance-type objectives the adjoint is parallel to x but differently
    scaled, where a raw ``x0`` would mislead CG.
    """

    def mv(x):
        return A(x)

    def solve_fn(matvec, rhs):
        guess = x0
        if x0 is not None and scale_x0:
            Ag = matvec(x0)
            den = _dot(x0, Ag)
            alpha = _dot(rhs, x0) / jnp.where(den == 0, 1.0, den)
            guess = jnp.where(den == 0, 0.0, alpha) * x0
        return pcg(matvec, rhs, M=M, x0=guess, maxiter=maxiter, tol=tol,
                   alpha_max=alpha_max, restart_every=restart_every).x

    return jax.lax.custom_linear_solve(mv, b, solve_fn, symmetric=True)
