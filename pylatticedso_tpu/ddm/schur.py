"""Per-cell static condensation (Schur complements), batched on device.

Replaces the reference's PETSc submatrix + multi-RHS LU condensation
(schur_complement.py:75-146) with a dense JAX pipeline: assemble the cell
stiffness K, split DOFs into boundary B (the face-priority ordered boundary
nodes x 6 DOFs) and interior I, and form

    S = K_BB - K_BI  K_II^{-1}  K_IB

via a Cholesky solve.  ``schur_batch`` vmaps the condensation over a batch of
radius vectors — the TPU replacement for the reference's per-radius Python
loop (lattice_sim.py:846-919): one compiled kernel, all parameter samples at
once.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fem.operator import assemble_dense
from ..sim.boundary_order import boundary_node_order
from ..sim.penalization import compute_l_zones, penalize_edges

__all__ = ["CellDiscretization", "discretize_cell", "schur_complement",
           "schur_batch", "ChainedCellDiscretization", "discretize_cell_chained",
           "schur_complement_chained", "schur_batch_chained"]


class CellDiscretization:
    """Static (radius-independent) discretization of one unit cell.

    Holds the subdivided + penalization-split mesh, per-element parent-beam
    map, penalty flags, and boundary/interior DOF indices, so that Schur
    computation over many radius vectors is a single vmapped dense kernel.
    """

    def __init__(self, nodes, edges, parent_edge, penalized, boundary_dofs,
                 interior_dofs, edge_type, n_boundary_nodes, boundary_nodes,
                 weight=None):
        self.nodes = np.asarray(nodes)
        self.edges = np.asarray(edges, dtype=np.int32)
        self.parent_edge = np.asarray(parent_edge)
        self.penalized = np.asarray(penalized)
        self.edge_type = np.asarray(edge_type)
        self.boundary_dofs = np.asarray(boundary_dofs)
        self.interior_dofs = np.asarray(interior_dofs)
        self.n_boundary_nodes = n_boundary_nodes
        self.boundary_nodes = np.asarray(boundary_nodes)
        self.weight = np.ones(len(self.edges)) if weight is None else np.asarray(weight)

    def element_radius(self, radii_per_type: jnp.ndarray,
                       coefficient: float = 1.5) -> jnp.ndarray:
        """Per-element radius from per-geometry base radii (+penalty x1.5)."""
        r = jnp.asarray(radii_per_type)[self.edge_type]
        return jnp.where(jnp.asarray(self.penalized), r * coefficient, r)


def discretize_cell(lattice, cell_index: int = 0, target_h: Optional[float] = None,
                    penalization: bool = True,
                    periodicity: Optional[bool] = None,
                    l_zones: Optional[np.ndarray] = None,
                    share_weights: bool = False) -> CellDiscretization:
    """Build the condensation-ready discretization of one cell.

    ``target_h`` defaults to ``0.05 * cell_size_x`` as in the reference's
    gmsh meshing (lattice_generation.py:50-60).  ``l_zones`` may pass
    lattice-global penalization zones (the reference computes beam angles on
    the full lattice, so shared boundary nodes see neighbor-cell beams);
    default computes them from this cell's subgraph (exact for single-cell
    lattices).
    """
    from ..fem.subdivide import subdivide_edges

    c = cell_index
    eids = lattice.cell_edge_idx[lattice.cell_edge_ptr[c]:lattice.cell_edge_ptr[c + 1]]
    nids = lattice.cell_node_idx[lattice.cell_node_ptr[c]:lattice.cell_node_ptr[c + 1]]
    # compact node set of this cell
    remap = -np.ones(lattice.num_nodes, dtype=np.int64)
    remap[nids] = np.arange(len(nids))
    nodes = lattice.nodes[nids]
    edges = remap[lattice.edges[eids]].astype(np.int32)
    etype = lattice.edge_type[eids]
    radius = lattice.radius[eids]
    if share_weights:
        # partition of unity over cells: beams lying in a shared face are
        # weighted 1/multiplicity so per-cell Schur complements sum exactly
        # to the condensed global stiffness (the reference double-counts
        # such beams — a deviation we do not reproduce)
        mult = np.bincount(lattice.cell_edge_idx, minlength=lattice.num_edges)
        weight0 = 1.0 / mult[eids]
    else:
        weight0 = np.ones(len(eids))

    if periodicity is None:
        periodicity = bool((lattice.config.simulation or {}).get("periodicity", False))
    if target_h is None:
        target_h = 0.05 * lattice.config.cell_size[0]

    o = lattice.cell_origin[c]
    s = lattice.cell_size[c]
    bbox = [o[0], o[0] + s[0], o[1], o[1] + s[1], o[2], o[2] + s[2]]

    n_parent = len(edges)
    if penalization:
        lz = l_zones[eids] if l_zones is not None else None
        pen = penalize_edges(nodes, edges, radius, periodicity=periodicity,
                             l_zones=lz)
        nodes2, edges2 = pen.nodes, pen.edges
        parent = pen.parent_edge
        mod = pen.penalized
    else:
        nodes2, edges2 = nodes, edges
        parent = np.arange(n_parent)
        mod = np.zeros(n_parent, dtype=bool)

    nodes3, edges3, seg_parent = subdivide_edges(nodes2, edges2, target_h)[:3]
    parent3 = parent[seg_parent]
    mod3 = mod[seg_parent]
    etype3 = etype[parent3]
    weight3 = weight0[parent3]

    # boundary nodes of the ORIGINAL cell graph, in simulation order
    b_nodes = boundary_node_order(nodes, bbox)
    b_dofs = (b_nodes[:, None] * 6 + np.arange(6)).reshape(-1)
    all_dofs = np.arange(6 * len(nodes3))
    i_dofs = np.setdiff1d(all_dofs, b_dofs)

    return CellDiscretization(
        nodes=nodes3, edges=edges3, parent_edge=parent3, penalized=mod3,
        boundary_dofs=b_dofs, interior_dofs=i_dofs, edge_type=etype3,
        n_boundary_nodes=len(b_nodes), boundary_nodes=b_nodes, weight=weight3,
    )


def schur_complement(disc: CellDiscretization, radii_per_type, E, nu,
                     dtype=None) -> jnp.ndarray:
    """Dense Schur complement [n_b, n_b] for one radius vector."""
    r_elem = disc.element_radius(jnp.asarray(radii_per_type, dtype=dtype))
    K = assemble_dense(disc.nodes, disc.edges, r_elem, E, nu,
                       weight=disc.weight, dtype=dtype)
    B, I = disc.boundary_dofs, disc.interior_dofs
    K_BB = K[jnp.ix_(B, B)]
    K_BI = K[jnp.ix_(B, I)]
    K_II = K[jnp.ix_(I, I)]
    chol = jax.scipy.linalg.cho_factor(K_II)
    X = jax.scipy.linalg.cho_solve(chol, K_BI.T)
    return K_BB - K_BI @ X


def schur_batch(disc: CellDiscretization, radii_batch, E, nu, dtype=None) -> jnp.ndarray:
    """vmapped condensation over a [n_samples, n_geom] radius batch."""
    f = partial(schur_complement, disc, E=E, nu=nu, dtype=dtype)
    return jax.vmap(f)(jnp.asarray(radii_batch, dtype=dtype))


# ---------------------------------------------------------------------------
# Chained condensation: exploit that the reference's subdivision (gmsh rule,
# ceil(L/0.05) collinear segments per strut) only adds interior nodes along
# straight uniform chains.  Eliminating those chain nodes per beam FIRST is
# algebraically exact (Schur of a Schur is the Schur), reduces the final
# interior block from thousands of DOFs to the cell's junction nodes, and —
# because all segments of a beam are identical — costs O(log n) 6x6 solves
# per beam via binary doubling.  This makes dense radius-grid sweeps for the
# surrogate offline stage (lattice_sim.py:846-919) ~1000x cheaper with
# machine-precision agreement.
# ---------------------------------------------------------------------------
class ChainedCellDiscretization:
    """Parent-graph discretization with per-beam segment counts."""

    def __init__(self, nodes, edges, edge_type, weight, n_seg,
                 boundary_dofs, interior_dofs, n_boundary_nodes,
                 boundary_nodes):
        self.nodes = np.asarray(nodes)
        self.edges = np.asarray(edges, dtype=np.int32)
        self.edge_type = np.asarray(edge_type)
        self.weight = np.asarray(weight)
        self.n_seg = np.asarray(n_seg, dtype=np.int64)
        self.boundary_dofs = np.asarray(boundary_dofs)
        self.interior_dofs = np.asarray(interior_dofs)
        self.n_boundary_nodes = n_boundary_nodes
        self.boundary_nodes = np.asarray(boundary_nodes)


def discretize_cell_chained(lattice, cell_index: int = 0,
                            target_h: Optional[float] = None,
                            periodicity: Optional[bool] = None,
                            share_weights: bool = False) -> ChainedCellDiscretization:
    """Chained-condensation twin of ``discretize_cell`` (penalization-free:
    a penalized beam's end zones break segment uniformity)."""
    from ..fem.subdivide import segment_counts

    c = cell_index
    eids = lattice.cell_edge_idx[lattice.cell_edge_ptr[c]:lattice.cell_edge_ptr[c + 1]]
    nids = lattice.cell_node_idx[lattice.cell_node_ptr[c]:lattice.cell_node_ptr[c + 1]]
    remap = -np.ones(lattice.num_nodes, dtype=np.int64)
    remap[nids] = np.arange(len(nids))
    nodes = lattice.nodes[nids]
    edges = remap[lattice.edges[eids]].astype(np.int32)
    etype = lattice.edge_type[eids]
    if share_weights:
        mult = np.bincount(lattice.cell_edge_idx, minlength=lattice.num_edges)
        weight = 1.0 / mult[eids]
    else:
        weight = np.ones(len(eids))
    if target_h is None:
        target_h = 0.05 * lattice.config.cell_size[0]
    lengths = np.linalg.norm(nodes[edges[:, 1]] - nodes[edges[:, 0]], axis=1)
    n_seg = segment_counts(lengths, target_h)

    o = lattice.cell_origin[c]
    s = lattice.cell_size[c]
    bbox = [o[0], o[0] + s[0], o[1], o[1] + s[1], o[2], o[2] + s[2]]
    b_nodes = boundary_node_order(nodes, bbox)
    b_dofs = (b_nodes[:, None] * 6 + np.arange(6)).reshape(-1)
    i_dofs = np.setdiff1d(np.arange(6 * len(nodes)), b_dofs)
    return ChainedCellDiscretization(nodes, edges, etype, weight, n_seg,
                                     b_dofs, i_dofs, len(b_nodes), b_nodes)


def _chain_combine(KA: jnp.ndarray, KB: jnp.ndarray) -> jnp.ndarray:
    """Concatenate two chain end-stiffness blocks [..., 12, 12], eliminating
    the shared middle node (6 DOF)."""
    M = KA[..., 6:, 6:] + KB[..., :6, :6]
    XA = jnp.linalg.solve(M, KA[..., 6:, :6])        # [..., 6, 6]
    XB = jnp.linalg.solve(M, KB[..., :6, 6:])
    Kaa = KA[..., :6, :6] - KA[..., :6, 6:] @ XA
    Kab = -KA[..., :6, 6:] @ XB
    Kba = -KB[..., 6:, :6] @ XA
    Kbb = KB[..., 6:, 6:] - KB[..., 6:, :6] @ XB
    top = jnp.concatenate([Kaa, Kab], axis=-1)
    bot = jnp.concatenate([Kba, Kbb], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _chain_power(k_seg: jnp.ndarray, n: int) -> jnp.ndarray:
    """End-stiffness of n identical segments in series (binary doubling;
    chain concatenation is associative)."""
    result = None
    P = k_seg
    while n:
        if n & 1:
            result = P if result is None else _chain_combine(result, P)
        n >>= 1
        if n:
            P = _chain_combine(P, P)
    return result


def schur_complement_chained(disc: ChainedCellDiscretization, radii_per_type,
                             E, nu, dtype=None) -> jnp.ndarray:
    """Schur complement via per-beam chain condensation.

    Matches ``schur_complement`` on the subdivided mesh to machine precision
    (same discretization, different — exact — elimination order), at
    O(junction DOFs) instead of O(subdivided DOFs) dense cost.
    """
    from ..fem.elements import element_stiffness_dense

    nodes = jnp.asarray(disc.nodes, dtype=dtype)
    edges = jnp.asarray(disc.edges, dtype=jnp.int32)
    r_elem = jnp.asarray(radii_per_type, dtype=dtype)[disc.edge_type]

    # per-parent segment element: endpoints at a and a + (b - a)/n
    pa = nodes[edges[:, 0]]
    pb = nodes[edges[:, 1]]
    n_seg = disc.n_seg
    seg_b = pa + (pb - pa) / jnp.asarray(n_seg, dtype=pa.dtype)[:, None]
    seg_nodes = jnp.concatenate([pa, seg_b], axis=0)
    P = edges.shape[0]
    seg_edges = jnp.stack([jnp.arange(P, dtype=jnp.int32),
                           jnp.arange(P, 2 * P, dtype=jnp.int32)], axis=1)
    k_seg = element_stiffness_dense(seg_nodes, seg_edges, r_elem, E, nu)

    # group parents by segment count -> one doubling per unique n
    K_eff = jnp.zeros_like(k_seg)
    for n in np.unique(n_seg):
        idx = np.nonzero(n_seg == n)[0]
        K_eff = K_eff.at[idx].set(_chain_power(k_seg[idx], int(n)))
    K_eff = K_eff * jnp.asarray(disc.weight, dtype=K_eff.dtype)[:, None, None]

    # assemble the junction-level stiffness and condense its interior
    N = disc.nodes.shape[0]
    dof = jnp.concatenate([edges[:, :1] * 6 + jnp.arange(6, dtype=jnp.int32),
                           edges[:, 1:] * 6 + jnp.arange(6, dtype=jnp.int32)],
                          axis=1)                                    # [P, 12]
    rows = jnp.repeat(dof, 12, axis=1).reshape(-1)
    cols = jnp.tile(dof, (1, 12)).reshape(-1)
    K = jnp.zeros((6 * N, 6 * N), dtype=K_eff.dtype)
    K = K.at[rows, cols].add(K_eff.reshape(-1))
    B, I = disc.boundary_dofs, disc.interior_dofs
    K_BB = K[jnp.ix_(B, B)]
    if I.size == 0:
        return K_BB
    K_BI = K[jnp.ix_(B, I)]
    K_II = K[jnp.ix_(I, I)]
    chol = jax.scipy.linalg.cho_factor(K_II)
    X = jax.scipy.linalg.cho_solve(chol, K_BI.T)
    return K_BB - K_BI @ X


def schur_batch_chained(disc: ChainedCellDiscretization, radii_batch, E, nu,
                        dtype=None) -> jnp.ndarray:
    """vmapped chained condensation over a [n_samples, n_geom] batch."""
    f = partial(schur_complement_chained, disc, E=E, nu=nu, dtype=dtype)
    return jax.vmap(f)(jnp.asarray(radii_batch, dtype=dtype))
