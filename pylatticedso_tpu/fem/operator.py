"""Matrix-free global stiffness operator + assembly helpers.

The hot path replaces the reference's PETSc assembled-matrix LU solves
(simulation_base.py:465-514) with gather -> per-edge strain/stress ->
scatter-add (``jax.ops.segment_sum``), the canonical TPU formulation of the
lattice stiffness action.  Dense assembly is provided for small systems
(oracles, per-cell condensation).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Union

import jax
import jax.numpy as jnp

from .elements import (EdgeGeometry, SectionStiffness, edge_dof_diag,
                       edge_forces, edge_geometry, edge_strains,
                       element_stiffness_dense, section_stiffness, KAPPA)

__all__ = ["BeamOperator", "build_operator", "assemble_dense", "masked_operator"]


class BeamOperator(NamedTuple):
    """Static data of the global stiffness action K.u on [N,6] fields."""
    edges: jnp.ndarray       # [E,2] int32
    geom: EdgeGeometry       # per-edge frame/length
    D: jnp.ndarray           # [E,6] section stiffness diagonal
    n_nodes: int

    def matvec(self, u: jnp.ndarray) -> jnp.ndarray:
        """K @ u with u of shape [N,6]; returns [N,6]."""
        n1 = self.edges[:, 0]
        n2 = self.edges[:, 1]
        u1, th1 = u[n1, :3], u[n1, 3:]
        u2, th2 = u[n2, :3], u[n2, 3:]
        eps = edge_strains(u1, th1, u2, th2, self.geom)
        sig = self.D * eps
        f_u1, f_m1, f_u2, f_m2 = edge_forces(sig, self.geom)
        contrib = jnp.concatenate([
            jnp.concatenate([f_u1, f_m1], axis=1),
            jnp.concatenate([f_u2, f_m2], axis=1),
        ], axis=0)                                    # [2E, 6]
        idx = jnp.concatenate([n1, n2])
        return jax.ops.segment_sum(contrib, idx, num_segments=self.n_nodes)

    def diagonal(self) -> jnp.ndarray:
        """diag(K) as [N,6] — Jacobi preconditioner data."""
        d = edge_dof_diag(self.geom, self.D)          # [E,12]
        contrib = jnp.concatenate([d[:, :6], d[:, 6:]], axis=0)
        idx = jnp.concatenate([self.edges[:, 0], self.edges[:, 1]])
        return jax.ops.segment_sum(contrib, idx, num_segments=self.n_nodes)

    def strain_energy(self, u: jnp.ndarray) -> jnp.ndarray:
        """1/2 u^T K u via per-edge energies (calculate_strain_energy parity,
        simulation_base.py:741-755)."""
        n1, n2 = self.edges[:, 0], self.edges[:, 1]
        eps = edge_strains(u[n1, :3], u[n1, 3:], u[n2, :3], u[n2, 3:], self.geom)
        return 0.5 * jnp.sum(self.geom.L[:, None] * self.D * eps**2)


def build_operator(nodes, edges, radius, E, nu, kappa: float = KAPPA,
                   dtype=None) -> BeamOperator:
    nodes = jnp.asarray(nodes, dtype=dtype)
    edges = jnp.asarray(edges, dtype=jnp.int32)
    radius = jnp.asarray(radius, dtype=dtype)
    geom = edge_geometry(nodes, edges)
    D = section_stiffness(radius, E, nu, kappa).D
    return BeamOperator(edges=edges, geom=geom, D=D, n_nodes=nodes.shape[0])


def assemble_dense(nodes, edges, radius, E, nu, kappa: float = KAPPA,
                   weight=None, dtype=None) -> jnp.ndarray:
    """Dense [6N, 6N] global stiffness (small systems / condensation only).

    ``weight`` scales each element's contribution — used as a partition of
    unity (1/multiplicity) for beams shared by several cells in the DDM
    condensation, so per-cell Schur complements assemble to exactly the
    global stiffness.
    """
    nodes = jnp.asarray(nodes, dtype=dtype)
    edges = jnp.asarray(edges, dtype=jnp.int32)
    Ke = element_stiffness_dense(nodes, edges, jnp.asarray(radius, dtype=dtype), E, nu, kappa)
    if weight is not None:
        Ke = Ke * jnp.asarray(weight, dtype=Ke.dtype)[:, None, None]
    N = nodes.shape[0]
    # 12 global dof ids per edge
    dof = jnp.concatenate([edges[:, :1] * 6 + jnp.arange(6, dtype=jnp.int32),
                           edges[:, 1:] * 6 + jnp.arange(6, dtype=jnp.int32)], axis=1)  # [E,12]
    rows = jnp.repeat(dof, 12, axis=1).reshape(-1)
    cols = jnp.tile(dof, (1, 12)).reshape(-1)
    K = jnp.zeros((6 * N, 6 * N), dtype=Ke.dtype)
    return K.at[rows, cols].add(Ke.reshape(-1))


def masked_operator(op: BeamOperator, free_mask: jnp.ndarray):
    """SPD-preserving Dirichlet mask: identity on fixed dofs, K on free.

    ``free_mask`` is [N,6] (1 = free).  Returns a matvec over [N,6] fields:
    A(u) = mask * K(mask * u) + (1 - mask) * u.
    """
    fm = free_mask

    def apply(u):
        return fm * op.matvec(fm * u) + (1.0 - fm) * u

    return apply
