"""Domain-decomposition (cell-wise Schur) interface solver.

The reference's flagship path (stack 3.3 of SURVEY.md): interior DOFs of
every cell are condensed away; the global system lives on the interface
(cell-boundary) DOFs and is solved matrix-free with PCG, where one operator
application is

    r = sum_cells  scatter( S_cell @ gather(u, boundary nodes of cell) )

(lattice_sim.py:1111-1252, conjugate_gradient_solver.py:15).  Here the
per-cell loop becomes a batched dense GEMM per Schur group on the MXU plus a
``segment_sum`` scatter — one fused device program instead of
(#iters x #cells) Python-level GEMVs.

Schur matrices are computed once per unique (radii, cell size) group
(mirroring the reference's caching by radii tuple, lattice_sim.py:846-919)
or supplied by a surrogate.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..design.lattice import Lattice
from ..materials import MatProperties
from ..fem.bc import BCArrays, apply_boundary_conditions
from ..fem.solve import linear_solve, pcg
from ..sim.boundary_order import boundary_node_order
from ..sim.penalization import compute_l_zones
from .schur import CellDiscretization, discretize_cell, schur_complement

__all__ = ["DDMSystem", "build_ddm_system", "solve_ddm", "DDMResult"]


@dataclass
class DDMResult:
    u: np.ndarray            # [N,6] interface displacements (0 at interior nodes)
    reaction: np.ndarray     # [N,6]
    compliance: float
    iterations: int
    residual: float


class DDMSystem:
    """Assembled interface operator data.

    S_groups[g]: [m_g, m_g] Schur of group g (m_g = 6 * nb_g).
    cells_of_group[g]: int array of cell ids.
    cell_bnodes: [C, nb] array (homogeneous topologies) or a per-cell list
    of boundary-node id arrays in simulation order — cells of different
    topologies (trimmed/bone-shaped hybrids, lattice_sim.py:1227-1252) may
    have different boundary-node counts; the operator batches per GROUP, so
    raggedness across groups costs nothing.
    """

    def __init__(self, lattice: Lattice, S_groups, cell_group, cell_bnodes,
                 bc: BCArrays, dtype=None):
        self.lattice = lattice
        self.n_nodes = lattice.num_nodes
        # host copies at source precision (f64): the refined TPU solve
        # rebuilds a high-precision operator from these for its residuals
        self.S_np = [np.asarray(S) for S in S_groups]
        self.S = [jnp.asarray(S, dtype=dtype) for S in S_groups]
        self.cell_group = np.asarray(cell_group)
        self.cells_of_group = [np.nonzero(self.cell_group == g)[0]
                               for g in range(len(S_groups))]
        bn_list = [np.asarray(b) for b in cell_bnodes]
        #: per-cell boundary-node ids in simulation order (ragged) — the
        #: per-group surrogate optimizer regroups these by topology
        self.bn_list = bn_list
        nbs = {len(b) for b in bn_list}
        self.homogeneous = len(nbs) == 1
        if self.homogeneous:
            self.nb = nbs.pop()
            self.m = 6 * self.nb
            self.cell_bnodes = jnp.asarray(np.stack(bn_list), dtype=jnp.int32)
        else:
            self.nb = self.m = None
            self.cell_bnodes = None
        #: per-group [C_g, nb_g] boundary-node ids — the batched operator's
        #: gather/scatter maps
        self.bn_groups = [
            jnp.asarray(np.stack([bn_list[c] for c in cells]), dtype=jnp.int32)
            for cells in self.cells_of_group]
        fdt = self.S[0].dtype

        interface = np.zeros(self.n_nodes, dtype=bool)
        interface[np.concatenate([b.reshape(-1) for b in bn_list])] = True
        self.interface_nodes = interface
        mask = interface[:, None] & ~bc.fixed
        self.free = jnp.asarray(mask, dtype=fdt)
        self.u_imposed = jnp.asarray(bc.u_imposed, dtype=fdt)
        self.f_applied = jnp.asarray(bc.f_applied * interface[:, None], dtype=fdt)

    # ------------------------------------------------------------------
    def matvec(self, u: jnp.ndarray, S_list=None) -> jnp.ndarray:
        """Assembled-Schur action K_interface @ u on [N,6] fields."""
        S_list = self.S if S_list is None else S_list
        out = jnp.zeros((self.n_nodes, 6), dtype=u.dtype)
        for g, bn in enumerate(self.bn_groups):
            Cg, nbg = bn.shape
            Ub = u[bn].reshape(Cg, 6 * nbg)                 # [C_g, m_g]
            # [C_g, m_g] @ [m_g, m_g] on the MXU (S symmetric)
            contrib = (Ub @ S_list[g]).reshape(-1, 6)
            out = out + jax.ops.segment_sum(contrib, bn.reshape(-1),
                                            num_segments=self.n_nodes)
        return out

    def hi_operator(self, dtype=jnp.float64) -> Tuple[Callable, jnp.ndarray]:
        """(A_hi, b_hi): the masked interface operator and rhs rebuilt at
        high precision from the source (f64) Schur groups — the residual
        oracle for the refined TPU solve (fem.solve.linear_solve_refined)."""
        S_hi = [jnp.asarray(s, dtype=dtype) for s in self.S_np]
        free = self.free.astype(dtype)
        u_imp = self.u_imposed.astype(dtype)
        f_app = self.f_applied.astype(dtype)

        def A_hi(u):
            return free * self.matvec(free * u, S_hi) + (1.0 - free) * u

        b_hi = free * (f_app - self.matvec(u_imp, S_hi)) \
            + (1.0 - free) * u_imp
        return A_hi, b_hi

    def diagonal(self) -> jnp.ndarray:
        """diag of the assembled interface operator, [N,6]."""
        out = jnp.zeros((self.n_nodes, 6), dtype=self.S[0].dtype)
        for g, bn in enumerate(self.bn_groups):
            d = jnp.diag(self.S[g]).reshape(-1, 6)          # [nb_g, 6]
            contrib = jnp.tile(d, (bn.shape[0], 1))
            out = out + jax.ops.segment_sum(contrib, bn.reshape(-1),
                                            num_segments=self.n_nodes)
        return out

    def node_blocks(self) -> jnp.ndarray:
        """Assembled per-node 6x6 diagonal blocks, [N,6,6] (block-Jacobi data).

        The TPU analogue of the reference's assembled B^T S B preconditioner
        (cell.py:754-827, lattice_sim.py:1351-1415): instead of a global
        sparse LU, invert the node-diagonal blocks.
        """
        out = jnp.zeros((self.n_nodes, 6, 6), dtype=self.S[0].dtype)
        for g, bn in enumerate(self.bn_groups):
            nbg = bn.shape[1]
            Sg = self.S[g].reshape(nbg, 6, nbg, 6)
            blocks = jnp.einsum("ndme->nmde", Sg)[jnp.arange(nbg), jnp.arange(nbg)]
            contrib = jnp.tile(blocks, (bn.shape[0], 1, 1))
            out = out + jax.ops.segment_sum(contrib, bn.reshape(-1),
                                            num_segments=self.n_nodes)
        return out

    # ------------------------------------------------------------------
    def masked(self) -> Callable:
        fm = self.free
        return lambda u: fm * self.matvec(fm * u) + (1.0 - fm) * u

    def rhs(self) -> jnp.ndarray:
        return self.free * (self.f_applied - self.matvec(self.u_imposed)) \
            + (1.0 - self.free) * self.u_imposed

    def preconditioner(self, kind: str = "block_jacobi") -> Callable:
        # the reference's config names map onto the assembled-block scheme:
        # "mean"/"nearest_reference" approximate per-cell Schur blocks before
        # assembling B^T S B (lattice_sim.py:1312-1415); our node-block
        # Jacobi assembles the exact blocks, strictly tighter than both
        if kind in ("mean", "nearest_reference", "exact", "LU", "ILU"):
            kind = "block_jacobi"
        if kind in (None, "none"):
            return lambda r: r
        if kind == "jacobi":
            d = self.free * self.diagonal() + (1.0 - self.free)
            d = jnp.where(d == 0, 1.0, d)
            return lambda r: r / d
        if kind == "block_jacobi":
            blocks = self.node_blocks()
            fm = self.free  # [N,6]
            # zero rows/cols of fixed dofs, identity there to stay SPD
            B = blocks * fm[:, :, None] * fm[:, None, :]
            eye = jnp.eye(6, dtype=B.dtype)
            B = B + (1.0 - fm)[:, :, None] * eye[None] * (1.0 - fm)[:, None, :]
            # non-interface nodes: identity
            B = jnp.where(jnp.abs(B).sum((1, 2))[:, None, None] == 0, eye[None], B)
            # invert on the host: one-time setup, and TPUs have no f64
            # LU ("Only F32 and C64 types are implemented in LuDecomposition")
            Binv = jnp.asarray(np.linalg.inv(np.asarray(B)), dtype=B.dtype)
            return lambda r: jnp.einsum("nij,nj->ni", Binv, r)
        raise ValueError(f"unknown preconditioner {kind!r}")


def _schur_groups(lattice: Lattice, material: MatProperties,
                  penalization: bool, periodicity: bool,
                  target_h: Optional[float], dtype=None,
                  schur_provider: Optional[Callable] = None,
                  share_weights: bool = True, fe2: bool = False):
    """Compute one Schur complement per unique cell group.

    Group key: (radii, cell size) like the reference's cache
    (lattice_sim.py:853-861), PLUS the per-cell penalization L-zone and
    shared-beam-weight signatures.  The extra keys make the grouped DDM
    *algebraically exact* — boundary cells whose joints are penalized
    differently get their own condensation, where the reference reuses one
    representative per (geom, radii) and incurs an interface error.
    """
    # Condense at the highest available precision regardless of the
    # requested device dtype: the refined interface solve's residual oracle
    # (DDMSystem.hi_operator) is only as accurate as the source S, so an
    # f32-CONDENSED Schur caps attainable accuracy at ~kappa*eps_f32 no
    # matter how many refinement passes run.  On devices without native f64
    # (TPU) the condensation runs on the host CPU backend.
    import contextlib
    compute_dtype = jnp.float64 if jax.config.x64_enabled else dtype

    def _condense_ctx():
        if compute_dtype == jnp.float64 and jax.default_backend() != "cpu":
            try:
                return jax.default_device(jax.devices("cpu")[0])
            except RuntimeError:
                pass
        return contextlib.nullcontext()

    l_zones = None
    if penalization:
        l_zones = compute_l_zones(lattice.nodes, lattice.edges, lattice.radius,
                                  periodicity=periodicity)
    mult = np.bincount(lattice.cell_edge_idx, minlength=lattice.num_edges)

    def cell_signature(c):
        eids = lattice.cell_edge_idx[lattice.cell_edge_ptr[c]:lattice.cell_edge_ptr[c + 1]]
        nids = lattice.cell_node_idx[lattice.cell_node_ptr[c]:lattice.cell_node_ptr[c + 1]]
        o, s = lattice.cell_origin[c], lattice.cell_size[c]
        # the full LOCAL subgraph, not just (radii, size): trimmed/hybrid
        # lattices have cells sharing radii and size but different beam
        # sets (lattice_sim.py:1227-1252 loops per cell; we group exactly)
        remap = np.zeros(lattice.num_nodes, dtype=np.int64)
        remap[nids] = np.arange(len(nids))
        local_edges = remap[lattice.edges[eids]]
        rel_nodes = np.round((lattice.nodes[nids] - o) / s, 9)
        sig = [tuple(np.round(lattice.cell_radii[c], 8)),
               tuple(np.round(lattice.cell_size[c], 9)),
               tuple(mult[eids]),
               rel_nodes.tobytes(), local_edges.tobytes(),
               np.round(lattice.radius[eids], 9).tobytes()]
        if l_zones is not None:
            sig.append(np.round(l_zones[eids], 9).tobytes())
        return tuple(sig)

    sig_to_group: Dict = {}
    group_of_cell = np.zeros(lattice.num_cells, dtype=np.int64)
    reps = []
    for c in range(lattice.num_cells):
        s = cell_signature(c)
        if s not in sig_to_group:
            sig_to_group[s] = len(reps)
            reps.append(c)
        group_of_cell[c] = sig_to_group[s]

    S_list = []
    for rep in reps:
        if schur_provider is not None:
            S = schur_provider(lattice.cell_radii[rep])
        elif fe2:
            # FE2 mode: the operator column-assembled by inner FEM solves
            # (schur.schur_fe2) — cached per group where the reference
            # re-solves the cell on every CG iteration (lattice_sim.py:1238)
            from .schur import schur_fe2
            S = schur_fe2(lattice, rep, material, target_h=target_h)
        elif not penalization:
            # chained condensation (per-beam binary-doubling elimination of
            # the subdivision chain, then a junction-level Schur): equal to
            # the dense path to machine precision at ~1/1000 the cost —
            # penalized cells stay on the dense path because lattice-global
            # L-zones break per-beam segment uniformity
            from .schur import discretize_cell_chained, schur_complement_chained
            disc_c = discretize_cell_chained(
                lattice, rep, target_h=target_h, periodicity=periodicity,
                share_weights=share_weights)
            with _condense_ctx():
                S = np.asarray(schur_complement_chained(
                    disc_c, lattice.cell_radii[rep],
                    material.young_modulus, material.poisson_ratio,
                    dtype=compute_dtype))
        else:
            disc = discretize_cell(lattice, rep, target_h=target_h,
                                   penalization=penalization,
                                   periodicity=periodicity, l_zones=l_zones,
                                   share_weights=share_weights)
            with _condense_ctx():
                S = np.asarray(schur_complement(
                    disc, lattice.cell_radii[rep],
                    material.young_modulus, material.poisson_ratio,
                    dtype=compute_dtype))
        S_list.append(S)
    # per-cell boundary nodes: recompute ordering for every cell (cheap);
    # ragged across groups — trimmed/hybrid lattices have per-cell counts
    C = lattice.num_cells
    cell_bnodes = []
    for c in range(C):
        nids = lattice.cell_node_idx[lattice.cell_node_ptr[c]:lattice.cell_node_ptr[c + 1]]
        o, s = lattice.cell_origin[c], lattice.cell_size[c]
        bbox = [o[0], o[0] + s[0], o[1], o[1] + s[1], o[2], o[2] + s[2]]
        order = boundary_node_order(lattice.nodes[nids], bbox)
        nb_g = int(S_list[group_of_cell[c]].shape[0]) // 6
        if len(order) != nb_g:
            raise ValueError(
                f"cell {c} has {len(order)} boundary nodes but its Schur "
                f"group expects {nb_g} — inconsistent grouping signature")
        cell_bnodes.append(nids[order])
    return S_list, group_of_cell, cell_bnodes


def build_ddm_system(lattice: Lattice, material: Optional[MatProperties] = None,
                     bc: Optional[BCArrays] = None,
                     penalization: Optional[bool] = None,
                     periodicity: Optional[bool] = None,
                     target_h: Optional[float] = None,
                     schur_provider: Optional[Callable] = None,
                     share_weights: bool = True,
                     dtype=None) -> DDMSystem:
    """Assemble the interface system (exact Schur per unique cell group).

    ``schur_provider(radii) -> S`` plugs in surrogate reconstruction
    (reduced basis / RBF / nearest-neighbor) instead of exact condensation.

    ``share_weights=True`` weights face-shared beams by 1/multiplicity so the
    per-cell Schur complements assemble to exactly the global stiffness;
    ``False`` reproduces the reference's behavior of counting such beams
    once per owning cell (cell.py:293-380 dedups within a cell but every
    cell condenses its full beam set), which stiffens shared faces — needed
    when matching the reference's committed DDM optimization records.
    """
    mat = material or MatProperties(lattice.config.material_name())
    bc = bc or apply_boundary_conditions(lattice)
    if dtype is None and jax.default_backend() != "cpu":
        # accelerators without native f64 (TPU): keep the DEVICE operator
        # in fast f32 — condensation still runs at f64 on the host and
        # solve_ddm's refined mode recovers f64-grade accuracy from the
        # retained S_np copies (an emulated-f64 device operator would make
        # every CG iteration ~100x slower for no accuracy benefit)
        dtype = jnp.float32
    sim = lattice.config.simulation or {}
    ddm_cfg = sim.get("DDM", {})
    schur_type = (ddm_cfg.get("schur_complement_computation", {}) or {}).get("type", "exact")
    if penalization is None:
        # reference applies penalization only for the exact Schur type
        # (lattice_sim.py:119-123)
        penalization = schur_type == "exact" and schur_provider is None
    if periodicity is None:
        periodicity = bool(sim.get("periodicity", False))
    fe2 = schur_type == "FE2" and schur_provider is None
    S_list, group_of_cell, cell_bnodes = _schur_groups(
        lattice, mat, penalization, periodicity, target_h, dtype,
        schur_provider, share_weights=share_weights, fe2=fe2)
    return DDMSystem(lattice, S_list, group_of_cell, cell_bnodes, bc, dtype=dtype)


def solve_ddm(lattice: Lattice, material: Optional[MatProperties] = None,
              bc: Optional[BCArrays] = None, tol: float = 1e-10,
              maxiter: Optional[int] = None,
              preconditioner: Optional[str] = None,
              system: Optional[DDMSystem] = None,
              refined: Optional[bool] = None, **kwargs) -> DDMResult:
    """Solve interface equilibrium with PCG (solve_DDM parity,
    lattice_sim.py:1111-1176).

    ``refined``: mixed-precision iterative refinement — f32 CG iterations
    with emulated-f64 residual recomputation — so tolerances below the f32
    rounding floor are reachable on TPU (no native f64).  Auto: ON when the
    assembled system is f32, the requested ``tol`` is below the floor, and
    x64 is enabled.
    """
    bc = bc or apply_boundary_conditions(lattice)
    sys_ = system or build_ddm_system(lattice, material, bc, **kwargs)
    ddm_cfg = ((lattice.config.simulation or {}).get("DDM", {}) or {})
    if maxiter is None:
        maxiter = int(ddm_cfg.get("max_iterations", 10000))
    if preconditioner is None:
        if ddm_cfg.get("enable_preconditioner", True):
            preconditioner = ddm_cfg.get("preconditioner_type") or "block_jacobi"
        else:
            preconditioner = "none"
    A = sys_.masked()
    b = sys_.rhs()
    M = sys_.preconditioner(preconditioner)
    if refined is None:
        refined = (sys_.S[0].dtype == jnp.float32 and tol < 3e-7
                   and bool(jax.config.x64_enabled))
    S_post, dt_post = sys_.S, sys_.S[0].dtype
    if refined:
        from ..fem.solve import refined_solve
        A_hi, b_hi = sys_.hi_operator()
        out = refined_solve(A, A_hi, b_hi, M=M, maxiter=maxiter, tol=tol,
                            inner_tol=max(tol, 1e-4))
        # post-process (reactions, compliance) at the refined precision
        dt_post = out.x.dtype
        S_post = [jnp.asarray(s, dtype=dt_post) for s in sys_.S_np]
    else:
        out = pcg(A, b, M=M, maxiter=maxiter, tol=tol)
    free = sys_.free.astype(dt_post)
    u = free * out.x + (1.0 - free) * sys_.u_imposed.astype(dt_post)
    Ku = sys_.matvec(u, S_post)
    fixed = (1.0 - free) * jnp.asarray(
        sys_.interface_nodes[:, None], dtype=dt_post)
    f_applied = sys_.f_applied.astype(dt_post)
    reaction = fixed * (Ku - f_applied)
    f_total = f_applied + reaction
    compliance = jnp.sum(f_total * u)
    return DDMResult(
        u=np.asarray(u), reaction=np.asarray(reaction),
        compliance=float(compliance),
        iterations=int(out.iterations), residual=float(out.residual_norm),
    )
