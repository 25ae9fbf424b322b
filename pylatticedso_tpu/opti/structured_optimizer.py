"""Optimization on the structured stencil path.

For uniform lattices — single-geometry or hybrid — (the scale regime), the equilibrium
solve inside the design loop runs on the dense stencil operator instead of
the gather/scatter graph — orders of magnitude faster per CG iteration on
TPU.  Reuses ``OptimizationProblem``'s parameterizations, density
constraint, drivers, and history machinery; only the solve is swapped.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..design.lattice import Lattice
from .optimizer import OptimizationProblem
from ..parallel.structured import (StructuredLattice,
                                   make_structured_compliance_step)

__all__ = ["StructuredOptimizationProblem"]


class StructuredOptimizationProblem(OptimizationProblem):
    def __init__(self, lattice: Lattice, dtype=jnp.float64,
                 precond: str = "jacobi", mg_opts: Optional[dict] = None,
                 **kwargs):
        self._precond, self._mg_opts = precond, mg_opts
        # hybrid (multi-geometry) lattices are superposed templates with a
        # per-geometry radius field; the stencil operator handles them
        # natively (parallel/structured.py:_split_template_collisions)
        if not lattice.are_cells_identical():
            raise ValueError("structured path requires uniform cell size/radii "
                             "(per-cell DESIGN radii may still vary)")
        super().__init__(lattice, dtype=dtype, **kwargs)
        nx, ny, nz = lattice.config.num_cells
        cell_valid = np.zeros((nx, ny, nz), dtype=bool)
        for pos in lattice.cell_pos:
            cell_valid[tuple(pos)] = True
        geoms = list(lattice.config.geom_types)
        # warped lattices (design.transforms point maps): rebuild the warp
        # as per-instance stencil fields via the recorded pointwise maps.
        # node_transforms is None when a topology-changing transform ran
        # (cylindrical seam merge) — the node mapping below then fails and
        # FEM_AUTO falls back to the general-graph operator.
        tfs = getattr(lattice, "node_transforms", None)
        composed = None
        if tfs:
            def composed(x, y, z, _tfs=tuple(tfs)):
                for fn in _tfs:
                    x, y, z = fn(x, y, z)
                return x, y, z
        self._slat = StructuredLattice(
            geoms[0] if len(geoms) == 1 else geoms, (nx, ny, nz),
            tuple(lattice.config.cell_size), self.material.young_modulus,
            self.material.poisson_ratio, dtype=dtype, cell_valid=cell_valid,
            node_transform=composed)
        sl = self._slat
        map_pos = (sl.class_pos if composed is None
                   else sl.class_pos_unwarped)
        map_nodes = (lattice.nodes if composed is None
                     else lattice.nodes_pre_transform)

        # map lattice nodes onto the class grids
        coord_to_cg = {}
        for c in range(sl.nc):
            x, y, z = map_pos[c]
            for idx in np.argwhere(sl.node_valid[c]):
                key = (round(x[tuple(idx)], 9), round(y[tuple(idx)], 9),
                       round(z[tuple(idx)], 9))
                coord_to_cg[key] = (c, tuple(idx))
        self._node_map = []
        for i, p in enumerate(map_nodes):
            key = tuple(np.round(p, 9))
            if key not in coord_to_cg:
                raise ValueError(f"node {p} not on the class grids")
            self._node_map.append(coord_to_cg[key])

        def to_field(per_node):  # [N, 6] -> [nc, 6, X, Y, Z]
            out = np.zeros((sl.nc, 6) + sl.grid, dtype=np.float64)
            for i, (c, g) in enumerate(self._node_map):
                out[(c, slice(None)) + g] = per_node[i]
            return out

        # per-DOF masks: [nc, 6, X, Y, Z]
        fixed_f = to_field(self.bc.fixed.astype(float)) > 0.5
        f_field = to_field(self.bc.f_applied)
        u_imp_field = to_field(self.bc.u_imposed)
        free_f = np.broadcast_to(sl.node_valid[:, None], fixed_f.shape) & ~fixed_f

        # objective functional over the field representation
        if self.objective_type == "compliance":
            obj = None
        else:
            sels = [to_field(np.asarray(s)) for s in self._obj_sel]
            if self.objective_type == "displacement":
                # min/max applies only to displacement, matching the
                # reference (lattice_opti.py:608-613) and _objective_u.
                # Bind the sign eagerly (default arg) — a late-bound
                # closure here once silently picked up a rebound name.
                disp_sign = -1.0 if self.objective_function == "max" else 1.0
                sel = jnp.asarray(sels[0], dtype)
                obj = lambda u, f_, s=disp_sign: s * jnp.sum(sel * u)
            else:  # displacement_ratio: objective_function is ignored
                so = jnp.asarray(sels[0], dtype)
                si = jnp.asarray(sels[1], dtype)
                obj = lambda u, f_: -(jnp.sum(so * u) * jnp.sum(si * u))
        self._free_field = free_f
        self._step = make_structured_compliance_step(
            sl, free_f, f_field, u_imposed=u_imp_field, objective=obj,
            tol=self.cg_tol, maxiter=self.cg_maxiter,
            precond=self._precond, mg_opts=self._mg_opts)
        self._cell_pos_j = jnp.asarray(lattice.cell_pos)
        raw = self._step.raw
        free_j, f_j = self._step._operands
        u0 = jnp.zeros_like(f_j)
        cell_pos = self._cell_pos_j
        num_cells = sl.num_cells
        param = self.param

        n_geom = self._slat.n_geom

        def radius_field(theta):
            cr = param.cell_radii(theta)                # [C, n_geom]
            if n_geom == 1:
                rf = jnp.zeros(num_cells, dtype=cr.dtype)
                return rf.at[cell_pos[:, 0], cell_pos[:, 1],
                             cell_pos[:, 2]].set(cr[:, 0])
            rf = jnp.zeros((n_geom,) + num_cells, dtype=cr.dtype)
            return rf.at[:, cell_pos[:, 0], cell_pos[:, 1],
                         cell_pos[:, 2]].set(cr.T)

        def objective_theta(theta):
            val, _u = raw(radius_field(theta), free_j, f_j, u0)
            return val

        def objective_theta_warm(theta, u_start):
            val, u = raw(radius_field(theta), free_j, f_j, u_start)
            return val, u

        self._objective_theta_structured = objective_theta
        # warm-start successive SLSQP evaluations with the previous
        # solution: convergence-only (the implicit-diff fixed point is
        # exact regardless of x0), typically 5-10x fewer CG iterations
        # along a design path
        self._vg_warm = jax.jit(jax.value_and_grad(objective_theta_warm,
                                                   has_aux=True))
        self._u_warm = None

        def value_and_grad_warm(theta):
            u_start = self._u_warm if self._u_warm is not None \
                else jnp.zeros_like(f_j)
            (val, u), g = self._vg_warm(jnp.asarray(theta), u_start)
            self._u_warm = u
            return val, g

        self._value_and_grad = value_and_grad_warm
