"""Geometric multigrid preconditioner for the structured stencil operator.

The BASELINE 50^3 problem spends its time in ~500 Jacobi-PCG iterations: a
uniform lattice is homogenizable, so its low-frequency error modes are those
of an elastic continuum, and a point smoother cannot damp them.  The fix is
the classical one, done lattice-natively:

* **coarse hierarchy** — a lattice of 2x-larger cells with 2x radii has the
  same relative density hence the same homogenized moduli; its stencil
  operator is spectrally equivalent to the Galerkin coarse operator of the
  fine lattice (continuum limit), at 1/8 the cost.  Coarse per-cell radii
  are the (validity-weighted) mean of each 2x2x2 fine block, doubled.
* **transfers** — each node class lives on its own regular grid, so
  prolongation is plain per-class trilinear interpolation (factor 2) and
  restriction is its exact transpose (``jax.linear_transpose``), keeping the
  V-cycle symmetric.  The sub-cell offset between coarse and fine class
  positions makes this an O(h) (aggregation-quality) transfer — fine for a
  preconditioner.
* **smoother** — Chebyshev(deg nu) with Jacobi scaling on the interval
  [lmax/4, lmax]; lmax of D^-1 A estimated per level with a fixed-length
  power iteration inside the trace.  Polynomial smoothers are symmetric
  positive operators, so the V(nu,nu)-cycle is SPD and valid inside plain
  (non-flexible) CG.

Everything is jit-traceable: the hierarchy (shapes, stencils, masks) is
static; only the per-level radius fields and eigenvalue estimates are traced
values, re-derived from the design radii each solve.

Reference capability covered: the solver behind FEM simulation/optimization
(reference solves with SciPy sparse Cholesky / PETSc; lattice_sim.py); this
is its scalable TPU replacement.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["build_mg_hierarchy", "mg_preconditioner", "mg_precond_state",
           "mg_apply"]


# ---------------------------------------------------------------- transfers
def _interp_matrix(X: int, C: int, frac: float) -> np.ndarray:
    """[X, C] 1-D linear interpolation matrix coarse->fine (factor 2),
    offset-aware.

    A class with fractional template coordinate ``frac`` has its fine node p
    at physical (p + frac) h and its coarse node i at (2i + 2 frac) h, so the
    fine sample interpolates the coarse field at t = (p - frac) / 2 — NOT at
    p/2.  Ignoring the offset makes the transfer first-order only and CG
    iteration counts grow with N; honoring it keeps them near
    mesh-independent.  Out-of-hull samples extrapolate linearly (expressed
    by weights outside [0, 1] on the clamped end interval; clamping values
    instead would break affine exactness in the boundary layer).
    """
    P = np.zeros((X, C))
    if C == 1:
        P[:, 0] = 1.0
        return P
    pos = (np.arange(X) - frac) / 2.0
    i0 = np.clip(np.floor(pos).astype(int), 0, C - 2)
    w1 = pos - i0
    P[np.arange(X), i0] += 1.0 - w1
    P[np.arange(X), i0 + 1] += w1
    return P


def make_transfers(fine_grid: Tuple[int, int, int],
                   coarse_grid: Tuple[int, int, int],
                   class_keys: np.ndarray):
    """(prolong, restrict) for [nc, 6, X, Y, Z] class fields.

    Each class interpolates with its own per-axis sub-cell offsets
    (``class_keys`` [nc, 3], fractions in [0, 1)).  Implemented as three
    per-axis batched dense matmuls (einsum over stacked per-class [X, C]
    interpolation matrices) — one MXU op per axis instead of a per-class
    Python loop of strided interleaves, whose ~2x12 small XLA ops cost
    ~1.4 ms of pure launch overhead per transfer at 50^3.  restrict ==
    prolong^T exactly (``jax.linear_transpose``), which the symmetry of
    the V-cycle preconditioner requires.
    """
    keys = np.asarray(class_keys, dtype=float)
    nc = len(keys)
    Ps = []
    for a in range(3):
        P = np.stack([_interp_matrix(fine_grid[a], coarse_grid[a],
                                     float(keys[ci][a])) for ci in range(nc)])
        Ps.append(P)                              # [nc, fine_a, coarse_a]

    def prolong(c):
        P0 = jnp.asarray(Ps[0], c.dtype)
        P1 = jnp.asarray(Ps[1], c.dtype)
        P2 = jnp.asarray(Ps[2], c.dtype)
        f = jnp.einsum("cdqyz,cxq->cdxyz", c, P0)
        f = jnp.einsum("cdxqz,cyq->cdxyz", f, P1)
        return jnp.einsum("cdxyq,czq->cdxyz", f, P2)

    def restrict(f):
        # transpose w.r.t. the standard inner product; shape-specialized
        shape = f.shape[:2] + tuple(coarse_grid)
        t = jax.linear_transpose(prolong, jax.ShapeDtypeStruct(shape, f.dtype))
        return t(f)[0]

    return prolong, restrict


def _coarsen_cells(n: Tuple[int, int, int]) -> Tuple[int, int, int]:
    return tuple(max(1, -(-ni // 2)) for ni in n)


def _coarse_cell_valid(valid: np.ndarray) -> np.ndarray:
    nx, ny, nz = valid.shape
    cx, cy, cz = _coarsen_cells((nx, ny, nz))
    pad = np.zeros((2 * cx, 2 * cy, 2 * cz), dtype=bool)
    pad[:nx, :ny, :nz] = valid
    return (pad.reshape(cx, 2, cy, 2, cz, 2).sum(axis=(1, 3, 5)) > 0)


def make_radius_restrictor(valid: np.ndarray):
    """Coarse per-cell radii: validity-weighted 2x2x2 mean, doubled.

    Doubling keeps r/L (hence relative density and homogenized moduli)
    constant across levels, which is what makes the coarse stencil operator
    spectrally equivalent to the Galerkin one.
    """
    nx, ny, nz = valid.shape
    cx, cy, cz = _coarsen_cells((nx, ny, nz))
    w = np.zeros((2 * cx, 2 * cy, 2 * cz))
    w[:nx, :ny, :nz] = valid.astype(float)
    cnt = w.reshape(cx, 2, cy, 2, cz, 2).sum(axis=(1, 3, 5))
    cnt = np.maximum(cnt, 1.0)
    w_j = jnp.asarray(w)
    cnt_j = jnp.asarray(cnt)

    def _restrict3(r):
        p = jnp.zeros((2 * cx, 2 * cy, 2 * cz), r.dtype)
        p = p.at[:nx, :ny, :nz].set(r)
        p = p * w_j.astype(r.dtype)
        s = p.reshape(cx, 2, cy, 2, cz, 2).sum(axis=(1, 3, 5))
        return 2.0 * s / cnt_j.astype(r.dtype)

    def restrict_radius(r):
        # hybrid lattices carry one radius field per superposed geometry
        # ([n_geom, Nx, Ny, Nz]): restrict each geometry independently
        if r.ndim == 4:
            return jax.vmap(_restrict3)(r)
        return _restrict3(r)

    return restrict_radius


# ---------------------------------------------------------------- hierarchy
class MGLevel:
    def __init__(self, slat, free_field: np.ndarray):
        from .structured import StructuredLattice  # noqa: F401 (type only)
        self.slat = slat
        self.matvec, self.diag_fn = slat.make_matvec()
        fm = np.asarray(free_field)
        if fm.ndim == 4:
            fm = np.broadcast_to(fm[:, None], (slat.nc, 6) + slat.grid)
        self.free = jnp.asarray(fm, slat.dtype)

    def A(self, u, radius):
        f = self.free
        return f * self.matvec(f * u, radius) + (1.0 - f) * u

    def prepare(self, radius):
        """Loop-invariant matvec operands for a fixed radius (or None when
        the matvec has no split form)."""
        return self.matvec.prepare(radius) \
            if hasattr(self.matvec, "prepare") else None

    def A_aux(self, u, radius, aux):
        if aux is None:
            return self.A(u, radius)
        f = self.free
        return f * self.matvec.apply(f * u, aux) + (1.0 - f) * u

    def prepare_lo(self, aux):
        """bf16 copy of the hoisted operands, when the matvec has a
        low-precision form (the Pallas kernel); None otherwise."""
        ap = getattr(self.matvec, "apply", None)
        if aux is None or ap is None or not hasattr(ap, "lo"):
            return None
        return ap.prepare_lo(aux)

    def A_aux_lo(self, u, aux_lo):
        """Smoother-grade matvec: bf16 kernel I/O (f32 arithmetic inside),
        f32 vectors outside.  ~2x less HBM traffic per application; only
        valid inside the preconditioner, which is just some fixed SPD-ish
        operator — the outer CG matvec stays full f32."""
        f = self.free
        out = self.matvec.apply.lo((f * u).astype(jnp.bfloat16),
                                   aux_lo).astype(u.dtype)
        return f * out + (1.0 - f) * u

    def D(self, radius):
        f = self.free
        d = f * self.diag_fn(radius) + (1.0 - f)
        return jnp.where(d == 0, 1.0, d)


def build_mg_hierarchy(slat, free_field: np.ndarray, min_cells: int = 3,
                       max_levels: int = 10) -> dict:
    """Static multilevel structure for a StructuredLattice.

    Coarse Dirichlet/validity masks are the even-index subsample of the fine
    ones (coarse class node (i,j,k) corresponds to fine (2i,2j,2k)), ANDed
    with the coarse lattice's own node validity.
    """
    from .structured import StructuredLattice

    levels: List[MGLevel] = [MGLevel(slat, free_field)]
    prolongs: List[Callable] = []
    restricts: List[Callable] = []
    rad_restrictors: List[Callable] = []

    cur, cur_free = slat, np.asarray(free_field)
    if cur_free.ndim == 4:
        cur_free = np.broadcast_to(cur_free[:, None],
                                   (slat.nc, 6) + slat.grid).copy()
    while max(cur.num_cells) > min_cells and len(levels) < max_levels:
        n_c = _coarsen_cells(cur.num_cells)
        cv_c = _coarse_cell_valid(np.asarray(cur.cell_valid))
        coarse = StructuredLattice(
            cur.geom, n_c, tuple(2.0 * np.asarray(cur.cell_size)),
            cur.E_mod, cur.nu, kappa=cur.kappa, dtype=cur.dtype,
            cell_valid=cv_c,
            # warped lattices: the coarse rediscretization applies the
            # SAME world-coordinate point map, so coarse operators see
            # the warped geometry too (positions are world coords)
            node_transform=cur.node_transform)
        # even-index subsample, clamped to the coarse grid extent
        cx, cy, cz = coarse.grid
        sub = cur_free[:, :, 0::2, 0::2, 0::2][:, :, :cx, :cy, :cz]
        if sub.shape[2:] != coarse.grid:
            padded = np.zeros((cur.nc, 6) + coarse.grid, dtype=bool)
            padded[:, :, :sub.shape[2], :sub.shape[3], :sub.shape[4]] = sub
            sub = padded
        free_c = sub & np.broadcast_to(coarse.node_valid[:, None], sub.shape)

        rad_restrictors.append(make_radius_restrictor(np.asarray(cur.cell_valid)))
        p, r = make_transfers(cur.grid, coarse.grid, cur.class_keys)
        prolongs.append(p)
        restricts.append(r)
        levels.append(MGLevel(coarse, free_c))
        cur, cur_free = coarse, free_c

    return {"levels": levels, "prolong": prolongs, "restrict": restricts,
            "restrict_radius": rad_restrictors}


# ------------------------------------------------------------- smoothing
def _estimate_lmax(A: Callable, D: jnp.ndarray, shape, dtype,
                   iters: int = 10) -> jnp.ndarray:
    """lmax(D^-1 A) via power iteration with a deterministic start."""
    n = int(np.prod(shape))
    v = 1.0 + 0.5 * jnp.sin(jnp.arange(n, dtype=dtype) * 0.7)
    v = v.reshape(shape)
    v = v / jnp.linalg.norm(v.ravel())

    def body(_, v):
        w = A(v) / D
        return w / jnp.maximum(jnp.linalg.norm(w.ravel()), 1e-30)

    v = jax.lax.fori_loop(0, iters, body, v)
    w = A(v) / D
    lam = jnp.vdot(v.ravel(), w.ravel()) / jnp.vdot(v.ravel(), v.ravel())
    return 1.1 * lam


def _chebyshev(A: Callable, D: jnp.ndarray, b: jnp.ndarray,
               x0: Optional[jnp.ndarray], lmax, lmin_frac: float,
               degree: int) -> jnp.ndarray:
    """Chebyshev semi-iteration for A x = b, Jacobi-scaled, on
    [lmax * lmin_frac, lmax].  A polynomial in D^-1 A applied to D^-1 r:
    symmetric positive as an operator, hence V-cycle-safe.
    """
    lmin = lmax * lmin_frac
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    sigma = theta / delta
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - A(x) if x0 is not None else b
    d = (r / D) / theta

    def body(_, carry):
        x, r, d, rho = carry
        x = x + d
        r = r - A(d)
        rho_new = 1.0 / (2.0 * sigma - rho)
        d = (rho_new * rho) * d + (2.0 * rho_new / delta) * (r / D)
        return x, r, d, rho_new

    # fori_loop keeps the smoother's matvec compiled once per level instead
    # of unrolled `degree` times — V-cycle graphs get big fast otherwise
    x, _, d, _ = jax.lax.fori_loop(
        0, degree, body, (x, r, d, jnp.asarray(1.0 / sigma, b.dtype)))
    return x + d


def _mg_apply_fused(h: dict, state: dict, nus, nu_at,
                    coarse_degree: int, smooth_frac: float) -> Callable:
    """V-cycle built from the fused-smoother Pallas kernels
    (stencil_pallas.py ``apply.fused``): each Chebyshev body step is ONE
    kernel launch (stencil + all vector updates), the mid-cycle residual
    is one launch, and coarse single-program levels run their ENTIRE
    smoother (including the degree-``coarse_degree`` coarsest sweep) in
    one launch.  Smoother vectors stay in the kernels' aligned flat
    layout between launches (dtype: PLDSO_MG_FUSED_DTYPE, default bf16).

    Semantically identical to the unfused V-cycle up to the storage
    rounding of the intermediate smoother vectors — the preconditioner
    stays a fixed deterministic SPD-ish operator, so plain CG remains
    valid.  Enable with PLDSO_MG_FUSED=1.
    """
    levels: List[MGLevel] = h["levels"]
    nL = len(levels)
    lmaxs, fused_ops = state["lmaxs"], state["fused"]
    fzs = [lvl.matvec.apply.fused for lvl in levels]
    f32 = jnp.float32

    def _scalars(level, frac):
        lmax = lmaxs[level].astype(f32)
        inv_theta = 2.0 / ((1.0 + frac) * lmax)
        inv_delta = 2.0 / ((1.0 - frac) * lmax)
        return fzs[level].sc(inv_theta, inv_delta)

    def _smooth_flat(level, b_flat, x0_flat, deg, frac):
        fz, st = fzs[level], fused_ops[level]
        io = b_flat.dtype
        sc = _scalars(level, frac)
        if fz.single_ok:
            if x0_flat is None:
                return fz.cheb_full(io, frac, deg, False)(
                    b_flat, st["fdinv"], sc, st["r2"])
            return fz.cheb_full(io, frac, deg, True)(
                b_flat, x0_flat, st["fdinv"], sc, st["r2"])
        if x0_flat is None:
            x = jnp.zeros_like(b_flat)
            r = b_flat
        else:
            x = x0_flat
            r = fz.residual(io)(b_flat, x0_flat, st["fm"], st["r2"])
        inv_theta = sc[0].astype(f32)
        d = (r.astype(f32) * st["fdinv"].astype(f32)
             * inv_theta).astype(io)
        for k, (c1, c2) in enumerate(fz.cheb_static(frac, deg)):
            out = fz.cheb_run(io, c1, c2, k == deg - 1)(
                x, r, d, st["fdinv"], sc, st["r2"])
            if k == deg - 1:
                return out
            x, r, d = out

    def vcycle(level: int, b) -> jnp.ndarray:
        fz, st = fzs[level], fused_ops[level]
        io = st["fdinv"].dtype
        b_flat = fz.to_flat(b, io)
        if level == nL - 1:
            x = _smooth_flat(level, b_flat, None, coarse_degree,
                             1.0 / 64.0)
            return fz.from_flat(x, b.dtype)
        deg = nu_at(level)
        x_flat = _smooth_flat(level, b_flat, None, deg, smooth_frac)
        r_flat = fzs[level].residual(io)(b_flat, x_flat, st["fm"],
                                         st["r2"])
        # transfers in the smoother dtype: the einsum transfer pair is
        # ~1.8 ms at 50^3 (profile_r5) and preconditioner-internal, so
        # its precision only shapes M, never the CG fixed point
        r_field = fz.from_flat(r_flat, io)
        free_c = jnp.asarray(levels[level + 1].free, io)
        rc = free_c * h["restrict"][level](r_field)
        ec = vcycle(level + 1, rc)
        corr = jnp.asarray(levels[level].free, io) * h["prolong"][level](
            free_c * ec)
        x_corr = x_flat + fz.to_flat(corr, io)
        x2 = _smooth_flat(level, b_flat, x_corr, deg, smooth_frac)
        return fz.from_flat(x2, b.dtype)

    def M(r):
        return vcycle(0, r)

    return M


# ------------------------------------------------------------- V-cycle
def mg_precond_state(h: dict, radius_field: jnp.ndarray,
                     power_iters: int = 10,
                     fused: Optional[bool] = None) -> dict:
    """Radius-derived V-cycle state: per-level radii, hoisted matvec
    operands, Jacobi diagonals, and lmax estimates (a pytree of arrays,
    so it can be computed in its own jit and passed across steps — a
    descent loop whose radii move slowly can FREEZE it and skip the
    per-solve power iterations and per-level operand rebuilds)."""
    levels: List[MGLevel] = h["levels"]
    radii = [jnp.asarray(radius_field, levels[0].slat.dtype)]
    for rr in h["restrict_radius"]:
        radii.append(rr(radii[-1]))

    auxs = [lvl.prepare(rad) for lvl, rad in zip(levels, radii)]
    lmaxs = []
    for lvl, rad, aux in zip(levels, radii, auxs):
        D = lvl.D(rad)
        Af = lambda u, _l=lvl, _r=rad, _a=aux: _l.A_aux(u, _r, _a)
        lmaxs.append(_estimate_lmax(Af, D, D.shape, levels[0].slat.dtype,
                                    iters=power_iters))
    Ds = [lvl.D(rad) for lvl, rad in zip(levels, radii)]
    auxs_lo = [lvl.prepare_lo(aux) for lvl, aux in zip(levels, auxs)]
    # fused-smoother operands (stencil_pallas fused kernels): per-level
    # masked-inverse-diagonal, free-mask and r^2 flats in the smoother's
    # aligned ghost-padded layout.  None per level when the level's
    # matvec has no fused form (gather fallback, warped lattices).
    import os as _os
    io = (jnp.bfloat16
          if _os.environ.get("PLDSO_MG_FUSED_DTYPE", "bf16") == "bf16"
          else jnp.float32)
    if fused is None:
        # env default; the mg_opts={"fused": True} library opt-in arrives
        # via this parameter (threaded from make_structured_compliance_step)
        fused = _os.environ.get("PLDSO_MG_FUSED") in ("1", "force")
    fused_ops = []
    for lvl, aux, D in zip(levels, auxs, Ds):
        fz = getattr(getattr(lvl.matvec, "apply", None), "fused", None)
        if (aux is None or fz is None or not fz.ok or not fused):
            # only materialize the fused-smoother operand flats when the
            # fused V-cycle is enabled — keeps the default state pytree
            # (and every sharded/frozen-state consumer) unchanged
            fused_ops.append(None)
            continue
        fused_ops.append({
            "fdinv": fz.to_flat(lvl.free / D, io),
            "fm": fz.to_flat(lvl.free, io),
            "r2": fz.repad_r2(aux, io),
        })
    return {"radii": radii, "auxs": auxs, "Ds": Ds, "lmaxs": lmaxs,
            "auxs_lo": auxs_lo, "fused": fused_ops}


def mg_apply(h: dict, state: dict, nu=2, coarse_degree: int = 24,
             smooth_frac: float = 0.25,
             lo_smoother: Optional[bool] = None,
             fused: Optional[bool] = None) -> Callable:
    """V(nu,nu)-cycle application M(r) from a precomputed state.

    ``nu`` may be a single degree or a per-level schedule (sequence,
    clamped to its last entry for deeper levels): the fine level's
    smoothing matvecs dominate the cycle cost (~1.1 ms each at 50^3 vs
    near-free coarse-level Pallas launches), so e.g. ``nu=(1, 2)`` buys
    ~2 fine matvecs per cycle against a small CG-iteration increase.
    The cycle stays symmetric (pre == post at every level), so it
    remains a valid SPD preconditioner for plain CG.

    ``lo_smoother`` runs the smoothing matvecs through the bf16-I/O Pallas
    kernel where available (halved smoother HBM traffic; the V-cycle
    stays a fixed deterministic operator, so plain CG remains valid).
    Default: the PLDSO_MG_BF16 env var.
    """
    import os
    if lo_smoother is None:
        lo_smoother = os.environ.get("PLDSO_MG_BF16") == "1"
    nus = ([int(v) for v in nu] if isinstance(nu, (tuple, list))
           else [int(nu)])
    nu_at = lambda lvl: nus[min(lvl, len(nus) - 1)]
    levels: List[MGLevel] = h["levels"]
    nL = len(levels)
    radii, auxs, Ds, lmaxs = (state["radii"], state["auxs"], state["Ds"],
                              state["lmaxs"])
    auxs_lo = state.get("auxs_lo", [None] * nL)
    fused_ops = state.get("fused", [None] * nL)
    env_fused = os.environ.get("PLDSO_MG_FUSED", "")
    if fused is None:
        fused = env_fused in ("1", "force")
    if fused:
        if all(f is not None for f in fused_ops):
            return _mg_apply_fused(h, state, nus, nu_at, coarse_degree,
                                   smooth_frac)
        # NEVER fall back silently: a "fused" benchmark that quietly ran
        # the unfused path produced bogus A/B rows on 2026-08-21 (the
        # fine level missed the VMEM model and nobody noticed)
        missing = [i for i, f in enumerate(fused_ops) if f is None]
        msg = (f"fused V-cycle requested but levels {missing} have no "
               "fused kernels (VMEM model rejection, gather-form matvec, "
               "or state built without PLDSO_MG_FUSED) — using the "
               "unfused path")
        if env_fused == "force":
            raise RuntimeError(msg)
        import warnings
        warnings.warn(msg, RuntimeWarning, stacklevel=2)

    def vcycle(level: int, b: jnp.ndarray) -> jnp.ndarray:
        lvl, rad, D, lmax = levels[level], radii[level], Ds[level], lmaxs[level]
        if lo_smoother and auxs_lo[level] is not None:
            Af = lambda u: lvl.A_aux_lo(u, auxs_lo[level])
        else:
            Af = lambda u: lvl.A_aux(u, rad, auxs[level])
        if level == nL - 1:
            # coarsest: aggressive Chebyshev over (almost) the full spectrum
            return _chebyshev(Af, D, b, None, lmax, 1.0 / 64.0, coarse_degree)
        nu_l = nu_at(level)
        x = _chebyshev(Af, D, b, None, lmax, smooth_frac, nu_l)     # pre
        r = b - Af(x)
        rc = levels[level + 1].free * h["restrict"][level](r)
        ec = vcycle(level + 1, rc)
        x = x + lvl.free * h["prolong"][level](levels[level + 1].free * ec)
        return _chebyshev(Af, D, b, x, lmax, smooth_frac, nu_l)     # post

    def M(r):
        return vcycle(0, r)

    return M


def mg_preconditioner(h: dict, radius_field: jnp.ndarray, nu=2,
                      coarse_degree: int = 24,
                      smooth_frac: float = 0.25,
                      power_iters: int = 10) -> Callable:
    """Symmetric V(nu,nu)-cycle preconditioner M(r) for PCG.

    Per-level radii and lmax estimates are derived from ``radius_field``
    once per call (a handful of extra matvecs, amortized over the solve).
    Wrap in ``stop_gradient`` by the caller if used inside a differentiated
    region — a preconditioner never affects the fixed point.
    """
    state = mg_precond_state(h, radius_field, power_iters=power_iters)
    return mg_apply(h, state, nu=nu, coarse_degree=coarse_degree,
                    smooth_frac=smooth_frac)
