"""Design transforms: coordinate maps applied to the node array.

Vectorized equivalents of the reference's per-Point loops
(design_transformation.py:13-206): point-attractor warp, curvature warp,
cylindrical wrap (stents), cylinder-form bending, and fit-to-surface.  Each
transform mutates ``lattice.nodes`` in place and re-derives boundary tags.
The cylindrical wrap also merges the seam nodes (y = 0 with y = y_max) and
deduplicates the resulting coincident beams — the step the reference calls
through a method that does not exist (`delete_duplicated_beams`,
design_transformation.py:127, a latent crash not reproduced here).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import numpy as np

from .tags import tag_points

__all__ = ["attractor_lattice", "curve_lattice", "cylindrical_transform",
           "move_to_cylinder_form", "fit_to_surface"]


def _refresh(lattice) -> None:
    mins, maxs = lattice.nodes.min(axis=0), lattice.nodes.max(axis=0)
    bbox = [mins[0], maxs[0], mins[1], maxs[1], mins[2], maxs[2]]
    lattice.node_tag = tag_points(lattice.nodes, bbox)


def attractor_lattice(lattice, point_attractor: Sequence[float] = (5.0, 0.5, -2.0),
                      alpha: float = 0.5, inverse: bool = False) -> None:
    """Pull every node toward (or away from) an attractor point."""
    p = np.asarray(point_attractor, dtype=float)
    d = p[None, :] - lattice.nodes
    L = np.linalg.norm(d, axis=1)
    if inverse:
        factor = np.where(L != 0, alpha / np.where(L == 0, 1, L), alpha)
    else:
        factor = alpha * L
    lattice.nodes = lattice.nodes + d * factor[:, None]
    _refresh(lattice)


def curve_lattice(lattice, center: Sequence[float],
                  curvature_strength: float = 0.1) -> None:
    """Quadratic curvature warp of z around a center point."""
    c = np.asarray(center, dtype=float)
    d2 = np.sum((lattice.nodes - c[None, :])**2, axis=1)
    lattice.nodes = lattice.nodes.copy()
    lattice.nodes[:, 2] -= curvature_strength * d2
    _refresh(lattice)


def cylindrical_transform(lattice, radius: float, merge_seam: bool = True) -> None:
    """Wrap the lattice sheet around a cylinder (stent generator).

    y in [0, height] maps to theta in [0, 2 pi); nodes at y = height coincide
    with y = 0 and are merged, and beams collapsing onto existing beams are
    deduplicated.
    """
    nodes = lattice.nodes.copy()
    max_y = lattice.size_lattice[1]
    theta = (nodes[:, 1] / max_y) * 2.0 * np.pi
    nodes[:, 0] = radius * np.cos(theta)
    nodes[:, 1] = radius * np.sin(theta)
    lattice.nodes = nodes

    if merge_seam:
        keys = np.round(nodes, 9)
        uniq, first, inverse = np.unique(keys, axis=0, return_index=True,
                                         return_inverse=True)
        if len(uniq) < len(nodes):
            remap = inverse  # node -> merged id (ids into uniq order)
            lattice.nodes = nodes[np.sort(first)]
            order = np.argsort(first, kind="stable")
            rank = np.empty(len(first), dtype=np.int64)
            rank[order] = np.arange(len(first))
            node_map = rank[inverse]
            edges = node_map[lattice.edges].astype(lattice.edges.dtype)
            pair = np.sort(edges, axis=1)
            _, e_first = np.unique(pair, axis=0, return_index=True)
            sel = np.sort(e_first)
            lattice.edges = edges[sel]
            lattice.radius = lattice.radius[sel]
            lattice.edge_type = lattice.edge_type[sel]
            lattice.edge_mat = lattice.edge_mat[sel]
            lattice.edge_cell = lattice.edge_cell[sel]
            # membership maps are invalidated by the merge
            lattice.cell_edge_ptr = lattice.cell_edge_idx = None
            lattice.cell_node_ptr = lattice.cell_node_idx = None
    _refresh(lattice)


def move_to_cylinder_form(lattice, radius: float) -> None:
    """Bend the sheet onto a cylinder surface along x (z drop formula)."""
    x_max = lattice.nodes[:, 0].max()
    if radius <= x_max / 2:
        raise ValueError(f"Cylinder radius too small: minimum {x_max / 2}")
    x = lattice.nodes[:, 0]
    drop = radius - np.sqrt(radius**2 - (x - x_max / 2)**2)
    lattice.nodes = lattice.nodes.copy()
    lattice.nodes[:, 2] -= drop
    _refresh(lattice)


def fit_to_surface(lattice, equation: Callable, mode: str = "z",
                   params: Optional[dict] = None) -> None:
    """Offset ("z") or project ("z_plan") nodes onto z = f(x, y)."""
    params = params or {}
    x, y = lattice.nodes[:, 0], lattice.nodes[:, 1]
    fz = np.asarray([equation(xi, yi, **params) for xi, yi in zip(x, y)])
    lattice.nodes = lattice.nodes.copy()
    if mode == "z":
        lattice.nodes[:, 2] += fz
    elif mode == "z_plan":
        lattice.nodes[:, 2] = fz
    else:
        raise ValueError(f"Unsupported mode {mode!r}")
    _refresh(lattice)
