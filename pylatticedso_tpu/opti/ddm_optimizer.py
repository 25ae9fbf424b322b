"""Surrogate-DDM design optimization — the reference's headline workflow.

The reference's fast path (26 min vs 8 h, optimization_methods.md:19,62)
is: per-cell Schur surrogates (greedy RB + RBF alpha(mu)), analytic
dS/dr = B dalpha/dr, interface CG, adjoint CG, SLSQP
(lattice_opti.py:559-901, lattice_sim.py:921-1082).  Here the whole chain is
one differentiable jnp program: theta -> cell radii -> RBF alpha -> batched
S reconstruction (one GEMM) -> masked interface solve via
``lax.custom_linear_solve`` -> objective; ``jax.grad`` performs the adjoint
solve and the dS/dr chain automatically, and the SLSQP/projected drivers of
``OptimizationProblem`` are reused unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass
from itertools import product
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..design.lattice import Lattice
from ..fem.solve import linear_solve, linear_solve_refined
from ..ddm.schur import (discretize_cell_chained, schur_batch_chained,
                         schur_penalized_batch)
from ..ddm.solver import build_ddm_system
from ..ddm.surrogate import SchurSurrogate, reduce_basis_greedy
from .optimizer import OptimizationProblem

__all__ = ["DDMOptimizationProblem", "build_schur_surrogate"]


def build_schur_surrogate(lattice: Lattice, material, min_radius: float,
                          max_radius: float, step: float = 0.01,
                          tol_greedy: float = 1e-6,
                          target_h: Optional[float] = None,
                          share_weights: bool = True,
                          penalization: bool = False,
                          batch: int = 64, cell: int = 0,
                          cache_tag: str = "") -> SchurSurrogate:
    """Offline RB training over the radius grid
    (construct_schur_complement_dataset parity).

    Uses the chained condensation (per-beam binary-doubling elimination of
    the subdivision chain, then a junction-level Schur): identical to the
    subdivided computation to machine precision at ~1/1000 the dense cost,
    so dense multi-geometry grids (10 points/axis ^ 3 geometries) are
    affordable.

    ``penalization=True`` reproduces the reference's dataset semantics of
    re-penalizing the cell for every radius sample (its dataset script calls
    reset_cell_with_new_radii -> set_penalized_beams per combination,
    lattice_sim.py:1480-1500): 1.5x-radius end zones of per-sample length
    L = r/tan(theta/2), condensed exactly via the piecewise chain.  This is
    what the reference's committed optimization records were produced with.

    ``cell`` selects the representative cell to condense (default 0, the
    full template); ``cache_tag`` distinguishes cached bases of different
    cell topologies (per-group surrogates for trimmed lattices).
    """
    grid = np.round(np.arange(min_radius, max_radius + step / 2, step), 6)
    combos = np.array([c for c in product(grid, repeat=lattice.config.n_geom)
                       if sum(c) > 0.003])

    # cache the trained basis like the reference's reduced-basis npz files
    # (greedy_algorithm.py:157-233): keyed by geometries, grid, tolerance,
    # and penalization mode
    from pathlib import Path

    from ..ddm.surrogate import load_reduced_basis, save_reduced_basis
    cache = Path("data/outputs/schur_complement") / (
        "rb_" + "_".join(lattice.config.geom_types)
        + f"_{grid[0]:g}_{grid[-1]:g}_{len(grid)}"
        + f"_tol{tol_greedy:g}"
        + ("_pen" if penalization else "")
        + ("_shared" if share_weights else "")
        + (f"_{cache_tag}" if cache_tag else "") + ".npz")
    if cache.exists():
        d = load_reduced_basis(cache)
        return SchurSurrogate(basis=d["basis_reduced_ortho"],
                              alpha=d["alpha_ortho"],
                              samples=d["list_elements"], kind="RBF")
    S_all = []
    if penalization:
        if cell != 0:
            raise NotImplementedError(
                "penalized surrogate training only supports the full cell "
                "template (cell 0); train per-group surrogates without "
                "penalization")
        for i in range(0, len(combos), batch):
            S_all.append(schur_penalized_batch(
                lattice, combos[i:i + batch], material.young_modulus,
                material.poisson_ratio, target_h=target_h,
                share_weights=share_weights))
    else:
        disc = discretize_cell_chained(lattice, cell, target_h=target_h,
                                       share_weights=share_weights)
        for i in range(0, len(combos), batch):
            S_all.append(np.asarray(schur_batch_chained(
                disc, combos[i:i + batch], material.young_modulus,
                material.poisson_ratio)))
    S_all = np.concatenate(S_all, axis=0)
    schur_dict = {tuple(c): S for c, S in zip(combos, S_all)}
    B, A, L = reduce_basis_greedy(schur_dict, tol_greedy)
    try:
        save_reduced_basis(cache, B, A, L)
    except OSError:
        pass
    return SchurSurrogate(basis=B, alpha=A, samples=L, kind="RBF")


@dataclass
class _SurrogateGroup:
    """One cell-topology group of the surrogate interface operator."""
    cells: np.ndarray        # [C_g] cell ids
    bn: jnp.ndarray          # [C_g, nb_g] boundary-node ids (sim order)
    m: int                   # 6 * nb_g
    basis: jnp.ndarray       # [m*m, m_rb] reduced basis
    rbf: object              # ThinPlateSplineRBF alpha(mu)


def _topology_groups(lattice: Lattice):
    """Group cells by the radius-independent part of the DDM grouping
    signature (local subgraph, per-edge geometry types and multiplicities,
    cell size) — cells in one group share a Schur parameterization
    S_g(cell_radii) and can share one RB surrogate.

    Returns (group_of_cell [C], representative cell ids, topology tags).
    """
    import hashlib

    mult = np.bincount(lattice.cell_edge_idx, minlength=lattice.num_edges)
    sig_to_group: dict = {}
    group_of_cell = np.zeros(lattice.num_cells, dtype=np.int64)
    reps, tags = [], []
    for c in range(lattice.num_cells):
        eids = lattice.cell_edge_idx[
            lattice.cell_edge_ptr[c]:lattice.cell_edge_ptr[c + 1]]
        nids = lattice.cell_node_idx[
            lattice.cell_node_ptr[c]:lattice.cell_node_ptr[c + 1]]
        o, s = lattice.cell_origin[c], lattice.cell_size[c]
        remap = np.zeros(lattice.num_nodes, dtype=np.int64)
        remap[nids] = np.arange(len(nids))
        sig = (np.round((lattice.nodes[nids] - o) / s, 9).tobytes(),
               remap[lattice.edges[eids]].tobytes(),
               lattice.edge_type[eids].tobytes(),
               mult[eids].tobytes(),
               tuple(np.round(s, 9)))
        if sig not in sig_to_group:
            sig_to_group[sig] = len(reps)
            reps.append(c)
            h = hashlib.sha1()
            for part in sig[:-1]:
                h.update(part)
            h.update(np.asarray(sig[-1]).tobytes())
            tags.append(h.hexdigest()[:12])
        group_of_cell[c] = sig_to_group[sig]
    return group_of_cell, reps, tags


class DDMOptimizationProblem(OptimizationProblem):
    """OptimizationProblem whose equilibrium solve runs on the surrogate-DDM
    interface system instead of the full matrix-free operator."""

    def __init__(self, lattice: Lattice, surrogate: Optional[SchurSurrogate] = None,
                 tol_greedy: float = 1e-6, grid_step: float = 0.01,
                 share_weights: bool = True, penalization: bool = False,
                 spd_shift: float = 1e-6,
                 refined: Optional[bool] = None,
                 target_h: Optional[float] = None, **kwargs):
        super().__init__(lattice, **kwargs)
        #: mixed-precision interface solve: equilibrated f32 dense Cholesky
        #: on the MXU + emulated-f64 residual refinement
        #: (fem.solve.linear_solve_dense_refined).  This is how the
        #: penalized tol-1e-9 interface solve — the reference's PETSc-f64
        #: semantics — runs on TPUs, which have no native f64 (a plain f32
        #: solve stalls at the kappa*eps_f32 floor and SLSQP sees noise).
        #: Auto: ON for non-CPU backends when x64 is enabled.
        if refined is None:
            refined = bool(jax.config.x64_enabled) \
                and jax.default_backend() != "cpu"
        self.refined = refined
        #: relative diagonal shift added to every reconstructed Schur block.
        #: RBF interpolation error (~1e-3 relative) can push a cell's
        #: near-null rigid-body modes slightly NEGATIVE at the sample-grid
        #: edges (measured -1.6e-5 at r = r_min), making the interface
        #: operator indefinite and CG divergent on SLSQP line-search trials.
        self.spd_shift = spd_shift

        # interface topology from the exact DDM assembly (radius-independent
        # without penalization)
        # dtype=f64 explicitly: build_ddm_system defaults the DEVICE copies
        # to f32 on accelerators (right for solve_ddm's refined mode, which
        # re-reads the retained f64 host copies), but HERE the interface
        # data feeds the f64 surrogate operator directly — an f32-rounded
        # f_applied perturbs the objective by ~5e-8 relative, above the
        # 1e-9 solve tolerance (measured on a v5e: every eval off by
        # exactly the f32 rounding of f).
        sys_ = build_ddm_system(lattice, self.material, self.bc,
                                penalization=False,
                                share_weights=share_weights,
                                dtype=jnp.float64)
        self._iface_free = sys_.free                    # [N,6]
        self._iface_f = sys_.f_applied
        self._iface_u_imp = sys_.u_imposed
        self._n_nodes = sys_.n_nodes

        # the offline stage (batched condensation + greedy RB) is a
        # host-sized f64 problem; on accelerators it runs on the CPU
        # backend (emulated-f64 condensation on TPU would be ~100x
        # slower for zero benefit — only the ONLINE solve is hot)
        import contextlib
        ctx = contextlib.nullcontext()
        if jax.default_backend() != "cpu":
            ctx = jax.default_device(jax.devices("cpu")[0])
        if sys_.homogeneous:
            if surrogate is None:
                with ctx:
                    surrogate = build_schur_surrogate(
                        lattice, self.material, self.param.min_radius,
                        self.param.max_radius, step=grid_step,
                        tol_greedy=tol_greedy, share_weights=share_weights,
                        penalization=penalization, target_h=target_h)
            self._surrogate = surrogate
            self._cell_bnodes = sys_.cell_bnodes        # [C, nb]
            self._nb = sys_.nb
            self._m = sys_.m
            self._basis = jnp.asarray(self._surrogate.basis)
            self._groups = [_SurrogateGroup(
                cells=np.arange(lattice.num_cells),
                bn=sys_.cell_bnodes, m=sys_.m,
                basis=self._basis, rbf=surrogate._rbf)]
        else:
            # mixed-topology (trimmed/bone) lattice: one RB surrogate per
            # cell-TOPOLOGY group (same local subgraph, edge types, and
            # cell size — the radius-independent part of the exact DDM's
            # grouping signature), trained on that group's representative
            # cell.  The online operator batches per group, exactly like
            # the exact heterogeneous DDM (ddm/solver.py DDMSystem.matvec).
            if surrogate is not None:
                raise ValueError(
                    "a single pre-trained surrogate cannot serve a "
                    "mixed-topology lattice; leave surrogate=None so "
                    "per-group surrogates are trained")
            if penalization:
                import warnings
                warnings.warn(
                    "penalized per-group surrogates are not supported for "
                    "mixed-topology lattices; training without penalization",
                    stacklevel=2)
            group_of_cell, reps, tags = _topology_groups(lattice)
            self._surrogate = None
            self._cell_bnodes = self._nb = self._m = self._basis = None
            self._groups = []
            verbose = bool(int(__import__("os").environ.get(
                "PLDSO_DDM_VERBOSE", "0")))
            with ctx:
                for g, (rep, tag) in enumerate(zip(reps, tags)):
                    if verbose:
                        print(f"  training surrogate group {g + 1}/"
                              f"{len(reps)} (rep cell {rep})", flush=True)
                    sur = build_schur_surrogate(
                        lattice, self.material, self.param.min_radius,
                        self.param.max_radius, step=grid_step,
                        tol_greedy=tol_greedy, share_weights=share_weights,
                        penalization=False, cell=rep, cache_tag=tag,
                        target_h=target_h)
                    cells = np.nonzero(group_of_cell == g)[0]
                    bn = jnp.asarray(
                        np.stack([sys_.bn_list[c] for c in cells]),
                        dtype=jnp.int32)
                    self._groups.append(_SurrogateGroup(
                        cells=cells, bn=bn, m=6 * bn.shape[1],
                        basis=jnp.asarray(sur.basis), rbf=sur._rbf))
        # rebuild jitted gradients against the DDM solve.  Two drivers of
        # SLSQP wall-clock beyond the solve itself: (a) warm-starting each
        # interface solve (and its adjoint, via the A-norm-optimal guess
        # scaling) from the previous iterate's solution, and (b) one fused
        # value+grad dispatch per point — SLSQP asks for objective and
        # gradient separately, and on TPU every dispatch pays the
        # host-device round-trip.
        self._vg_aux = jax.jit(
            jax.value_and_grad(self._objective_theta_aux, has_aux=True))
        self._u_warm = None
        self._vg_cache = None

    def _eval(self, theta):
        tb = np.asarray(theta, dtype=np.float64).tobytes()
        if self._vg_cache is not None and self._vg_cache[0] == tb:
            return self._vg_cache[1], self._vg_cache[2]
        u0 = self._u_warm
        if u0 is None:
            u0 = jnp.zeros((self._n_nodes, 6), dtype=self._iface_f.dtype)
        (v, u), g = self._vg_aux(jnp.asarray(theta), u0)
        self._u_warm = u
        v = float(v)
        if self.objective_type == "compliance" and v <= 0.0:
            # compliance of a stable structure is strictly positive; a
            # non-positive value means the RBF-interpolated interface
            # operator went indefinite at this design (sparse sample
            # grids).  Surface it as NaN so the SLSQP driver's rejection
            # layer treats the trial like any other invalid region instead
            # of DESCENDING into the unphysical minimum (observed: a
            # 3-points-per-axis grid optimizing to compliance -18).
            v = float("nan")
        out = (v, np.asarray(g))
        self._vg_cache = (tb, out[0], out[1])
        return out

    def objective(self, theta) -> float:
        return self._eval(theta)[0]

    def gradient(self, theta) -> np.ndarray:
        return self._eval(theta)[1]

    # ------------------------------------------------------------------
    def _group_schur_batch(self, g: int, cell_radii: jnp.ndarray) -> jnp.ndarray:
        """[C_g, m_g, m_g] Schur blocks of topology group ``g`` from its RBF
        surrogate — one GEMM."""
        grp = self._groups[g]
        alpha = jax.vmap(grp.rbf.evaluate)(cell_radii[grp.cells])  # [C_g, m_rb]
        vec = alpha @ grp.basis.T                                  # [C_g, m*m]
        n = grp.m
        S = jnp.transpose(vec.reshape(-1, n, n), (0, 2, 1))        # F-order unravel
        S = 0.5 * (S + jnp.transpose(S, (0, 2, 1)))                # SPD hygiene
        if self.spd_shift:
            tr = jnp.einsum("cii->c", S) / n
            S = S + (self.spd_shift * tr)[:, None, None] * jnp.eye(n, dtype=S.dtype)
        return S

    def _cell_schur_batch(self, cell_radii: jnp.ndarray) -> jnp.ndarray:
        """[C, m, m] Schur blocks (homogeneous single-group lattices)."""
        return self._group_schur_batch(0, cell_radii)

    def _solve_u(self, radius_e=None, *, theta=None):
        raise RuntimeError("use _objective_theta")

    def _objective_theta(self, theta: jnp.ndarray) -> jnp.ndarray:
        return self._objective_theta_aux(theta, None)[0]

    def _objective_theta_aux(self, theta: jnp.ndarray, u0) -> jnp.ndarray:
        cr = self.param.cell_radii(theta)
        # one [C_g, m_g, m_g] reconstruction per topology group (homogeneous
        # lattices are the single-group case, one GEMM over all cells)
        S_list = [self._group_schur_batch(g, cr)
                  for g in range(len(self._groups))]
        free, f, u_imp = self._iface_free, self._iface_f, self._iface_u_imp
        N = self._n_nodes

        def make_K(Ss):
            def K(u):
                out = jnp.zeros((N, 6), dtype=u.dtype)
                for S_, grp in zip(Ss, self._groups):
                    bn = grp.bn
                    Ub = u[bn].reshape(-1, grp.m)
                    R = jnp.einsum("cij,cj->ci", S_, Ub)
                    out = out + jax.ops.segment_sum(
                        R.reshape(-1, 6), bn.reshape(-1), num_segments=N)
                return out
            return K

        def make_A(K_, free_):
            return lambda u: free_ * K_(free_ * u) + (1.0 - free_) * u

        K = make_K(S_list)
        A = make_A(K, free)

        # node-diagonal Jacobi from the assembled S blocks
        diag = jnp.zeros((N, 6), dtype=S_list[0].dtype)
        for S_, grp in zip(S_list, self._groups):
            blocks = jnp.einsum("cii->ci", S_).reshape(-1, grp.m // 6, 6)
            diag = diag + jax.ops.segment_sum(
                blocks.reshape(-1, 6), grp.bn.reshape(-1), num_segments=N)
        diag = free * diag + (1.0 - free)
        diag = jnp.where(diag == 0, 1.0, diag)

        b = free * (f - K(u_imp)) + (1.0 - free) * u_imp
        if self.refined and S_list[0].dtype == jnp.float64 and 6 * N > 20_000:
            # large-lattice TPU path: the dense assembly below is
            # O((6N)^2) memory (~10 GB already at 50k DOF) — stay
            # matrix-free: f32 CG on the surrogate operator + emulated-f64
            # residual refinement to the same tol-1e-9 semantics
            f32 = jnp.float32
            S32 = [jax.lax.stop_gradient(S_).astype(f32) for S_ in S_list]
            free32 = free.astype(f32)
            A_lo = make_A(make_K(S32), free32)
            diag32 = jax.lax.stop_gradient(diag).astype(f32)
            u = linear_solve_refined(
                A_lo, b, A_hi=A, M=lambda r: r / diag32,
                maxiter=self.cg_maxiter, tol=self.cg_tol,
                x0=None if u0 is None else jax.lax.stop_gradient(u0))
        elif self.refined and S_list[0].dtype == jnp.float64:
            # TPU path: the interface system is SMALL (a few thousand
            # DOFs), so the TPU-native solve is dense mixed precision —
            # assemble the interface matrix, equilibrate, factor once in
            # f32 on the MXU, and refine with emulated-f64 residuals
            # (linear_solve_dense_refined).  A matrix-free f32 CG
            # while_loop is latency-bound at this size (measured ~46 s per
            # value+grad on a v5e vs ~0.1 s for the dense path).  Gradients
            # flow through the f64 operator via custom_linear_solve; the
            # adjoint solve reuses the same factor.
            f32 = jnp.float32
            ndof = 6 * N
            A32 = jnp.zeros((ndof, ndof), dtype=f32)
            for S_, grp in zip(S_list, self._groups):
                bn = grp.bn
                dof = (bn[:, :, None] * 6
                       + jnp.arange(6, dtype=bn.dtype)).reshape(-1, grp.m)
                I = jnp.broadcast_to(dof[:, :, None], S_.shape).reshape(-1)
                J = jnp.broadcast_to(dof[:, None, :], S_.shape).reshape(-1)
                A32 = A32.at[I, J].add(
                    jax.lax.stop_gradient(S_).astype(f32).reshape(-1))
            free_flat = free.reshape(-1).astype(f32)
            A32 = free_flat[:, None] * A32 * free_flat[None, :] \
                + jnp.diag(1.0 - free_flat)
            # Jacobi equilibration: halves the effective condition number's
            # spread across penalized/thin-radius cells before the f32 factor
            d32 = jnp.diagonal(A32)
            s32 = jax.lax.rsqrt(jnp.where(d32 <= 0, 1.0, d32))
            L32 = jnp.linalg.cholesky(s32[:, None] * A32 * s32[None, :])

            def apply_inv(r):
                y = s32 * r.reshape(-1).astype(f32)
                y = jax.scipy.linalg.solve_triangular(L32, y, lower=True)
                y = jax.scipy.linalg.solve_triangular(L32.T, y, lower=False)
                return (s32 * y).reshape(N, 6)

            from ..fem.solve import linear_solve_dense_refined
            u = linear_solve_dense_refined(
                apply_inv, b, A_hi=A, tol=self.cg_tol,
                x0=None if u0 is None else jax.lax.stop_gradient(u0))
        else:
            # periodic restart (reference CG guard,
            # conjugate_gradient_solver.py): surrogate interpolation noise
            # can make the interface operator momentarily indefinite on
            # SLSQP line-search trials; restarting bounds the drift.  The
            # reference also clamps alpha at 0.1, but under OUR Jacobi
            # scaling natural CG steps are O(1) — the clamp stalls
            # convergence entirely (measured), so it stays off.
            u = linear_solve(A, b, M=lambda r: r / diag,
                             maxiter=self.cg_maxiter, tol=self.cg_tol,
                             restart_every=1000,
                             x0=None if u0 is None else jax.lax.stop_gradient(u0),
                             scale_x0=True)
        u = free * u + (1.0 - free) * u_imp
        return self._objective_u(u), jax.lax.stop_gradient(u)
