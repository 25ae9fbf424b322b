"""Multi-chip SPMD execution of the lattice operator.

The reference has no distribution path at all (MPI is always COMM_SELF,
utils_simulation.py:39-103); here scale-out is native: a
``jax.sharding.Mesh`` with

* axis ``"shard"`` — elements (edges) partitioned across devices; the
  stiffness action computes each shard's scatter contribution locally and
  combines with ``psum`` over ICI,
* axis ``"dp"``   — independent design candidates (the vmapped population of
  the optimization loop) data-parallel across devices.

Nodal fields stay replicated inside one candidate (a 2M-DOF field is ~50 MB
in f32 — cheap next to HBM), so a CG iteration needs exactly one all-reduce.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..fem.elements import edge_forces, edge_geometry, edge_strains, section_stiffness

__all__ = ["make_mesh", "pad_edges", "sharded_matvec", "sharded_diag",
           "ShardedLattice"]


def make_mesh(n_shard: Optional[int] = None, n_dp: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_shard is None:
        n_shard = len(devices) // n_dp
    dev = np.array(devices[: n_dp * n_shard]).reshape(n_dp, n_shard)
    return Mesh(dev, ("dp", "shard"))


def pad_edges(edges: np.ndarray, per_edge: Sequence[np.ndarray], n_shard: int):
    """Pad the edge dimension to a multiple of n_shard with zero-stiffness
    self-loops on node 0 (harmless contributions)."""
    E = len(edges)
    Epad = -(-E // n_shard) * n_shard
    if Epad == E:
        return edges, list(per_edge), E
    pad = Epad - E
    edges2 = np.concatenate([edges, np.zeros((pad, 2), dtype=edges.dtype)])
    out = []
    for arr in per_edge:
        z = np.zeros((pad,) + arr.shape[1:], dtype=arr.dtype)
        out.append(np.concatenate([arr, z]))
    return edges2, out, E


class ShardedLattice:
    """Edge-sharded matrix-free operator over a device mesh.

    ``radius`` enters as an argument (not baked in) so the same compiled
    program serves the whole optimization trajectory and vmapped candidate
    batches.
    """

    def __init__(self, mesh: Mesh, nodes: np.ndarray, edges: np.ndarray,
                 E_mod: float, nu: float, valid_mask: Optional[np.ndarray] = None,
                 dtype=jnp.float32):
        self.mesh = mesh
        n_shard = mesh.shape["shard"]
        edges_p, (vm,), self.n_real = pad_edges(
            edges, [np.ones(len(edges)) if valid_mask is None else valid_mask],
            n_shard)
        self.n_nodes = len(nodes)
        self.E_mod, self.nu = E_mod, nu
        self.dtype = dtype

        shard_spec = NamedSharding(mesh, P(None, "shard"))
        repl = NamedSharding(mesh, P())
        # [n_shard-major layout]: reshape so axis 1 is the sharded chunk
        self.edges = jax.device_put(jnp.asarray(edges_p.T, dtype=jnp.int32), shard_spec)
        self.valid = jax.device_put(jnp.asarray(vm[None, :], dtype=dtype), shard_spec)
        nodes_j = jnp.asarray(nodes, dtype=dtype)
        p1 = jnp.take(nodes_j, jnp.asarray(edges_p[:, 0]), axis=0)
        p2 = jnp.take(nodes_j, jnp.asarray(edges_p[:, 1]), axis=0)
        d = p2 - p1
        L = jnp.linalg.norm(d, axis=1)
        L = jnp.where(L == 0, 1.0, L)
        t = d / L[:, None]
        ez = jnp.array([0.0, 0.0, 1.0], dtype=dtype)
        ex = jnp.array([1.0, 0.0, 0.0], dtype=dtype)
        ref = jnp.where((jnp.abs(t @ ez) > 0.99)[:, None], ex, ez)
        a1 = jnp.cross(ref, t)
        a1 = a1 / jnp.linalg.norm(a1, axis=1)[:, None]
        a2 = jnp.cross(t, a1)
        gspec = NamedSharding(mesh, P("shard"))
        self.t = jax.device_put(t.astype(dtype), gspec)
        self.a1 = jax.device_put(a1.astype(dtype), gspec)
        self.a2 = jax.device_put(a2.astype(dtype), gspec)
        self.L = jax.device_put(L.astype(dtype), gspec)

    # ------------------------------------------------------------------
    def section_D(self, radius: jnp.ndarray) -> jnp.ndarray:
        """[Epad, 6] stiffness diagonal (zero on padding)."""
        D = section_stiffness(radius, self.E_mod, self.nu).D
        return D * self.valid[0][:, None]

    def matvec(self, u: jnp.ndarray, D: jnp.ndarray) -> jnp.ndarray:
        """K.u for replicated u [N,6]; edge work sharded, one psum."""
        n1, n2 = self.edges[0], self.edges[1]
        u1, th1 = u[n1, :3], u[n1, 3:]
        u2, th2 = u[n2, :3], u[n2, 3:]
        from ..fem.elements import EdgeGeometry
        geom = EdgeGeometry(t=self.t, a1=self.a1, a2=self.a2, L=self.L)
        eps = edge_strains(u1, th1, u2, th2, geom)
        sig = D * eps
        f_u1, f_m1, f_u2, f_m2 = edge_forces(sig, geom)
        contrib = jnp.concatenate([
            jnp.concatenate([f_u1, f_m1], axis=1),
            jnp.concatenate([f_u2, f_m2], axis=1)], axis=0)
        idx = jnp.concatenate([n1, n2])
        return jax.ops.segment_sum(contrib, idx, num_segments=self.n_nodes)

    def radius_padded(self, radius: np.ndarray) -> jnp.ndarray:
        r = np.zeros(self.edges.shape[1])
        r[: self.n_real] = radius
        return jnp.asarray(r, dtype=self.dtype)

    def _geom(self):
        from ..fem.elements import EdgeGeometry
        return EdgeGeometry(t=self.t, a1=self.a1, a2=self.a2, L=self.L)

    def diagonal(self, D: jnp.ndarray) -> jnp.ndarray:
        """diag(K) [N,6] from the factored per-edge diagonal."""
        from ..fem.elements import edge_dof_diag
        d = edge_dof_diag(self._geom(), D)            # [Epad, 12]
        contrib = jnp.concatenate([d[:, :6], d[:, 6:]], axis=0)
        idx = jnp.concatenate([self.edges[0], self.edges[1]])
        return jax.ops.segment_sum(contrib, idx, num_segments=self.n_nodes)

    def node_blocks(self, D: jnp.ndarray) -> jnp.ndarray:
        """Assembled per-node 6x6 diagonal blocks [N,6,6] (block Jacobi).

        Each endpoint's self-block of K_e is L B_n^T D B_n with B_n the
        6x6 column block of the strain operator — assembled per node like
        the diag, but keeping the translation/rotation coupling that scalar
        Jacobi discards (typically 2-4x fewer CG iterations on slender
        lattices).
        """
        t, a1, a2, L = self.t, self.a1, self.a2, self.L
        invL = (1.0 / L)
        E = t.shape[0]
        dt = t.dtype
        # column block for endpoint 1 of each edge: rows = 6 strains,
        # cols = (u(3), th(3));  endpoint 2 is the sign-flipped u columns
        # and identical th columns -> same self-block B^T D B for both ends.
        z = jnp.zeros((E, 3), dtype=dt)
        Bu = jnp.stack([
            -t * invL[:, None], -a1 * invL[:, None], -a2 * invL[:, None],
            z, z, z], axis=1)                                   # [E,6,3]
        Bth = jnp.stack([
            z, -a2 * 0.5, a1 * 0.5,
            -t * invL[:, None], -a1 * invL[:, None], -a2 * invL[:, None]],
            axis=1)                                             # [E,6,3]
        B = jnp.concatenate([Bu, Bth], axis=2)                  # [E,6,6]
        DL = D * L[:, None]
        blk = jnp.einsum("eki,ek,ekj->eij", B, DL, B)           # [E,6,6]
        # endpoint 2's self-block is S blk S with S = diag(I3, -I3): the u
        # columns flip sign on the shear rows while the theta columns do
        # not, so the u-theta coupling sub-blocks negate
        sgn = jnp.concatenate([jnp.ones(3, dtype=dt), -jnp.ones(3, dtype=dt)])
        blk2 = blk * sgn[None, :, None] * sgn[None, None, :]
        contrib = jnp.concatenate([blk, blk2], axis=0)
        idx = jnp.concatenate([self.edges[0], self.edges[1]])
        return jax.ops.segment_sum(contrib, idx, num_segments=self.n_nodes)


_TRI6 = [(i, j) for i in range(6) for j in range(i + 1)]   # 21 lower entries


def _block_jacobi_inverse(A):
    """Explicit inverse of a symmetric-positive 6x6 block given as a python
    6x6 list of SAME-SHAPE arrays (one lane per node) — unrolled vector
    Cholesky, so every element stays an [N]-shaped lane array and nothing
    materializes an [N, 6, 6] buffer (which would tile-pad to (8, 128):
    the TPU layout trap documented in make_compliance_step).

    Returns the 21 lower-triangle entries of B^-1 in _TRI6 order.
    """
    L = [[None] * 6 for _ in range(6)]
    for j in range(6):
        s = A[j][j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        L[j][j] = jnp.sqrt(jnp.maximum(s, 1e-30))
        for i in range(j + 1, 6):
            s = A[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s / L[j][j]
    Li = [[None] * 6 for _ in range(6)]          # L^-1 (lower)
    for j in range(6):
        Li[j][j] = 1.0 / L[j][j]
        for i in range(j + 1, 6):
            s = L[i][j] * Li[j][j]
            for k in range(j + 1, i):
                s = s + L[i][k] * Li[k][j]
            Li[i][j] = -s / L[i][i]
    out = []
    for i, j in _TRI6:                           # B^-1 = L^-T L^-1
        s = None
        for k in range(i, 6):                    # k >= i >= j
            term = Li[k][i] * Li[k][j]
            s = term if s is None else s + term
        out.append(s)
    return out


def _block_apply(Binv21, r6):
    """M^-1 r for the stacked [21, ...] inverse-block entries and a [6, N]
    column field: 36 lane multiply-adds, no dot_general."""
    ix = {}
    for n, (i, j) in enumerate(_TRI6):
        ix[(i, j)] = n
        ix[(j, i)] = n
    rows = []
    for i in range(6):
        s = Binv21[ix[(i, 0)]] * r6[0]
        for j in range(1, 6):
            s = s + Binv21[ix[(i, j)]] * r6[j]
        rows.append(s)
    return jnp.stack(rows)


def make_compliance_step(shl: ShardedLattice, free_mask: np.ndarray,
                         f_ext: np.ndarray, tol: float = 1e-6,
                         maxiter: int = 4000,
                         preconditioner: str = "block_jacobi") -> Callable:
    """jit-compiled value_and_grad of compliance w.r.t. per-edge radii.

    One call = assemble (implicit) + PCG solve + adjoint gradient (free via
    self-adjointness through ``lax.custom_linear_solve``) — the BASELINE
    "iteration".  Works on replicated [N,6] fields over the mesh; radius may
    carry a leading vmap batch dim for design populations.

    The per-edge constant arrays (frames, lengths, connectivity — hundreds
    of MB at 50^3 scale) are passed as jit ARGUMENTS, not closure captures:
    captured concrete arrays get embedded into the compiled program as XLA
    constants, which blows up compilation at scale.  All per-edge work runs
    in TRANSPOSED (edge-last, [k, E]) layout with flat 1-D gathers/scatters:
    row-major [E, small] buffers tile-pad to (8, 128) on TPU — 21-170x
    memory blowups that OOM the 50^3 problem.
    """
    from ..fem.solve import linear_solve

    free_c = jnp.asarray(free_mask, dtype=shl.dtype)
    f_c = jnp.asarray(f_ext, dtype=shl.dtype)
    n_nodes = shl.n_nodes
    E_mod, nu = shl.E_mod, shl.nu
    G_mod = E_mod / (2.0 * (1.0 + nu))
    kappa = 0.9

    # transposed operands built once (host/setup time)
    tT = jnp.transpose(shl.t)            # [3, E]
    a1T = jnp.transpose(shl.a1)
    a2T = jnp.transpose(shl.a2)
    Lv = shl.L                           # [E]
    validv = shl.valid[0]                # [E]
    edges2 = shl.edges                   # [2, E]
    Epad = int(Lv.shape[0])

    # endpoint node ids: the state lives as [6, N] columns, so the matvec
    # needs only TWO column-gathers of E node indices each (u[:, e0],
    # u[:, e1]) and two column scatter-adds.  Measured on v5e at 660k
    # edges: a [6,N]->[6,E] column gather is 1.7 ms where the flat
    # 12E-element gather costs 53 ms (31x), and the column scatter-add is
    # 10x faster than the unsorted segment_sum (XLA lowers elementwise
    # gathers/scatters serially; column ops move 6-row slices).
    e_np = np.asarray(edges2)
    e0_ids = jnp.asarray(e_np[0].astype(np.int32))
    e1_ids = jnp.asarray(e_np[1].astype(np.int32))

    # ELL (fixed-degree) incidence: node n's incident half-edge positions
    # in the [6, 2E] concatenated contribution array, padded with 2E (a
    # zero column).  Turns the output assembly from two column
    # SCATTER-adds into dmax column GATHER-sums — scatters are the
    # unstructured hot loop's bottleneck (XLA serializes in-place adds;
    # measured 90 ms/matvec at 3M edges), while lattice degree bounds are
    # small (octet dmax=12 at 85% fill), so the gather form reads barely
    # more than the scatter writes.  Replaces the reference's per-cell
    # python scatter loop (lattice_sim.py:1180-1252) at "millions of
    # struts" scale.  Padded edges (self-loops at node 0) are excluded
    # from the lists; their contributions are zero anyway.
    real = np.zeros(Epad, dtype=bool)
    real[:shl.n_real] = True
    half_nodes = np.concatenate([e_np[0], e_np[1]])
    half_pos = np.arange(2 * Epad)
    keep = np.concatenate([real, real])
    hn, hp = half_nodes[keep], half_pos[keep]
    order = np.argsort(hn, kind="stable")
    counts = np.bincount(hn, minlength=n_nodes)
    dmax = int(counts.max()) if len(hn) else 0
    seg_start = np.concatenate([[0], np.cumsum(counts)[:-1]])
    slot = np.arange(len(hn)) - seg_start[hn[order]]
    ell_np = np.full((dmax, n_nodes), 2 * Epad, dtype=np.int64)
    ell_np[slot, hn[order]] = hp[order]
    fill = counts.mean() / max(dmax, 1)
    import os as _os
    use_ell = (dmax <= 48 and fill >= 0.2
               and _os.environ.get("PLDSO_UNSTRUCTURED_SCATTER") != "1")
    ell_ids = jnp.asarray(ell_np.astype(np.int32))

    def assemble_out(c1, c2, ell, e0, e1):
        """[6,E]+[6,E] half-edge contributions -> [6,N] nodal sums.

        All index arrays enter as traced arguments (not closure captures),
        per the module rule: captured concrete arrays embed as XLA
        constants.
        """
        if not use_ell:
            out = jnp.zeros((6, n_nodes), c1.dtype)
            return out.at[:, e0].add(c1).at[:, e1].add(c2)
        c = jnp.concatenate([c1, c2, jnp.zeros((6, 1), c1.dtype)], axis=1)
        out = c[:, ell[0]]
        for k in range(1, dmax):
            out = out + c[:, ell[k]]
        return out

    use_block = (preconditioner == "block_jacobi"
                 and _os.environ.get("PLDSO_UNSTRUCTURED_PRECOND",
                                     "block_jacobi") == "block_jacobi")

    def _block_factors(radius, tT, a1T, a2T, Lv, validv, e0_ids, e1_ids,
                       free):
        """Stacked [21, N] inverse node-block entries (block Jacobi).

        Assembles each node's 6x6 self-block of the free-masked operator in
        COLUMN layout (per-entry [E] lanes, two [21, N] column scatter-adds
        — the fast scatter form on TPU) and inverts it with the unrolled
        vector Cholesky.  Couplings between translations and rotations that
        scalar Jacobi discards typically buy 2-4x fewer CG iterations on
        slender lattices (cf. tests/test_sharding.py:
        test_block_jacobi_not_slower_than_jacobi).
        """
        r2 = radius * radius
        S = jnp.pi * r2 * validv
        I = jnp.pi * r2 * r2 / 4.0
        DL = [E_mod * S, kappa * G_mod * S, kappa * G_mod * S,
              G_mod * 2.0 * I * validv, E_mod * I * validv,
              E_mod * I * validv]
        DL = [d * Lv for d in DL]
        invL = 1.0 / Lv
        z = jnp.zeros_like(Lv)
        # strain rows x dof cols, endpoint-1 column block (see node_blocks)
        B = [
            [-tT[0] * invL, -tT[1] * invL, -tT[2] * invL, z, z, z],
            [-a1T[0] * invL, -a1T[1] * invL, -a1T[2] * invL,
             -a2T[0] * 0.5, -a2T[1] * 0.5, -a2T[2] * 0.5],
            [-a2T[0] * invL, -a2T[1] * invL, -a2T[2] * invL,
             a1T[0] * 0.5, a1T[1] * 0.5, a1T[2] * 0.5],
            [z, z, z, -tT[0] * invL, -tT[1] * invL, -tT[2] * invL],
            [z, z, z, -a1T[0] * invL, -a1T[1] * invL, -a1T[2] * invL],
            [z, z, z, -a2T[0] * invL, -a2T[1] * invL, -a2T[2] * invL],
        ]
        sgn = [1.0, 1.0, 1.0, -1.0, -1.0, -1.0]
        V1 = []
        V2 = []
        for i, j in _TRI6:
            s = DL[0] * B[0][i] * B[0][j]
            for k in range(1, 6):
                s = s + DL[k] * B[k][i] * B[k][j]
            V1.append(s)
            V2.append((sgn[i] * sgn[j]) * s)     # endpoint-2 self-block
        NB = jnp.zeros((21, n_nodes), Lv.dtype)
        NB = NB.at[:, e0_ids].add(jnp.stack(V1))
        NB = NB.at[:, e1_ids].add(jnp.stack(V2))
        freeT = jnp.transpose(free.reshape(n_nodes, 6))
        ix = {}
        for n, (i, j) in enumerate(_TRI6):
            ix[(i, j)] = n
            ix[(j, i)] = n
        A = [[None] * 6 for _ in range(6)]
        for i in range(6):
            for j in range(6):
                a = freeT[i] * freeT[j] * NB[ix[(i, j)]]
                if i == j:
                    a = a + (1.0 - freeT[i])
                    a = jnp.where(a == 0, 1.0, a)   # orphan nodes -> identity
                A[i][j] = a
        return jnp.stack(_block_jacobi_inverse(A))

    def compliance(radius, tT, a1T, a2T, Lv, validv, e0_ids, e1_ids,
                   ell_ids, free, f):
        r2 = radius * radius
        S = jnp.pi * r2 * validv
        I = jnp.pi * r2 * r2 / 4.0
        ES, kGS = E_mod * S, kappa * G_mod * S
        GJ, EI = G_mod * 2.0 * I * validv, E_mod * I * validv
        invL = 1.0 / Lv
        half = 0.5

        freeT = jnp.transpose(free.reshape(n_nodes, 6))      # [6, N]
        fT = jnp.transpose(f.reshape(n_nodes, 6))

        def matvec(u6):                                       # [6, N]
            g1 = u6[:, e0_ids]                                # [6, E]
            g2 = u6[:, e1_ids]
            du = g2[:3] - g1[:3]                              # [3, E]
            ths = g1[3:] + g2[3:]
            dth = g2[3:] - g1[3:]
            dot = lambda A, B: jnp.sum(A * B, axis=0)         # [E]
            e0 = dot(du, tT) * invL
            e1 = dot(du, a1T) * invL - dot(ths, a2T) * half
            e2 = dot(du, a2T) * invL + dot(ths, a1T) * half
            e3 = dot(dth, tT) * invL
            e4 = dot(dth, a1T) * invL
            e5 = dot(dth, a2T) * invL
            s0, s1, s2 = ES * e0, kGS * e1, kGS * e2
            s3, s4, s5 = GJ * e3, EI * e4, EI * e5
            fu = s0 * tT + s1 * a1T + s2 * a2T                # [3, E]
            msh = (Lv * half) * (-s1 * a2T + s2 * a1T)
            mdf = s3 * tT + s4 * a1T + s5 * a2T
            c1 = jnp.concatenate([-fu, msh - mdf])            # [6, E]
            c2 = jnp.concatenate([fu, msh + mdf])
            return assemble_out(c1, c2, ell_ids, e0_ids, e1_ids)

        if use_block:
            Binv = _block_factors(jax.lax.stop_gradient(radius), tT, a1T,
                                  a2T, Lv, validv, e0_ids, e1_ids, free)
            M = lambda r_: _block_apply(Binv, r_)
        else:
            # scalar Jacobi diagonal in the same column layout
            t2, a12, a22 = tT * tT, a1T * a1T, a2T * a2T
            d_u = (ES * t2 + kGS * (a12 + a22)) * invL        # [3, E]
            d_th = (kGS * (a22 + a12)) * (Lv * 0.25) \
                + (GJ * t2 + EI * (a12 + a22)) * invL
            dvec = jnp.concatenate([d_u, d_th])               # [6, E]
            diag = jnp.zeros((6, n_nodes), dvec.dtype)
            diag = diag.at[:, e0_ids].add(dvec).at[:, e1_ids].add(dvec)
            diag = freeT * diag + (1.0 - freeT)
            diag = jnp.where(diag == 0, 1.0, diag)
            M = lambda r_: r_ / diag

        def A(u6):
            return freeT * matvec(freeT * u6) + (1.0 - freeT) * u6

        b = freeT * fT
        u = linear_solve(A, b, M=M, maxiter=maxiter, tol=tol)
        return jnp.sum(fT * u)

    vag = jax.jit(jax.value_and_grad(compliance))
    operands = (tT, a1T, a2T, Lv, validv, e0_ids, e1_ids, ell_ids,
                free_c, f_c)

    def step(radius_padded):
        return vag(radius_padded, *operands)

    step._jitted = vag
    step._operands = operands

    def step_batch(radius_batch):
        """vmapped candidate population (radius batched, operands shared)."""
        fn = jax.jit(jax.vmap(jax.value_and_grad(compliance),
                              in_axes=(0,) + (None,) * 10))
        return fn(radius_batch, *step._operands)

    step.batch = step_batch

    def descent_loop(radius0, n_steps: int, lr: float = 1e-4,
                     r_min: float = 0.01, r_max: float = 0.1):
        """Fully device-resident projected-gradient descent: n_steps
        solve+gradient+update iterations inside ONE compiled program (a
        single dispatch — immune to per-call host/tunnel overhead)."""
        vg = jax.value_and_grad(compliance)

        @partial(jax.jit, static_argnums=1)
        def loop(r0, k, *operands):
            keep = (r0 > 0).astype(r0.dtype)

            def body(_, carry):
                r, _c = carry
                c, g = vg(r, *operands)
                r = jnp.clip(r - lr * g, r_min, r_max) * keep
                return (r, c)

            return jax.lax.fori_loop(0, k, body, (r0, jnp.zeros((), r0.dtype)))

        return loop(radius0, n_steps, *step._operands)

    step.descent_loop = descent_loop

    # ------------------------------------------------------------------
    # chunked drive: the tunneled TPU kills single executions that run
    # longer than a few minutes ("UNAVAILABLE: TPU device error"), and an
    # unstructured 50^3 solve is thousands of ~100 ms scatter matvecs.
    # step_chunked bounds every dispatch to `chunk` CG iterations (host
    # checks convergence between dispatches, warm-starting each chunk) and
    # gets the gradient from the compliance self-adjoint identity
    # dc/dr = -u.(dA/dr).u — one short differentiated-matvec dispatch
    # instead of a second full solve.
    from ..fem.solve import pcg as _pcg

    def _chunk_body(radius, u0, tT, a1T, a2T, Lv, validv, e0_ids, e1_ids,
                    ell_ids, free, f, chunk):
        r2 = radius * radius
        S = jnp.pi * r2 * validv
        I = jnp.pi * r2 * r2 / 4.0
        ES, kGS = E_mod * S, kappa * G_mod * S
        GJ, EI = G_mod * 2.0 * I * validv, E_mod * I * validv
        invL = 1.0 / Lv
        freeT = jnp.transpose(free.reshape(n_nodes, 6))
        fT = jnp.transpose(f.reshape(n_nodes, 6))

        def matvec(u6):
            g1 = u6[:, e0_ids]
            g2 = u6[:, e1_ids]
            du = g2[:3] - g1[:3]
            ths = g1[3:] + g2[3:]
            dth = g2[3:] - g1[3:]
            dot = lambda A, B: jnp.sum(A * B, axis=0)
            e0 = dot(du, tT) * invL
            e1 = dot(du, a1T) * invL - dot(ths, a2T) * 0.5
            e2 = dot(du, a2T) * invL + dot(ths, a1T) * 0.5
            e3 = dot(dth, tT) * invL
            e4 = dot(dth, a1T) * invL
            e5 = dot(dth, a2T) * invL
            s0, s1, s2 = ES * e0, kGS * e1, kGS * e2
            s3, s4, s5 = GJ * e3, EI * e4, EI * e5
            fu = s0 * tT + s1 * a1T + s2 * a2T
            msh = (Lv * 0.5) * (-s1 * a2T + s2 * a1T)
            mdf = s3 * tT + s4 * a1T + s5 * a2T
            c1 = jnp.concatenate([-fu, msh - mdf])
            c2 = jnp.concatenate([fu, msh + mdf])
            return assemble_out(c1, c2, ell_ids, e0_ids, e1_ids)

        if use_block:
            Binv = _block_factors(radius, tT, a1T, a2T, Lv, validv,
                                  e0_ids, e1_ids, free)
            M = lambda r_: _block_apply(Binv, r_)
        else:
            t2, a12, a22 = tT * tT, a1T * a1T, a2T * a2T
            d_u = (ES * t2 + kGS * (a12 + a22)) * invL
            d_th = (kGS * (a22 + a12)) * (Lv * 0.25) \
                + (GJ * t2 + EI * (a12 + a22)) * invL
            dvec = jnp.concatenate([d_u, d_th])
            diag = jnp.zeros((6, n_nodes), dvec.dtype)
            diag = diag.at[:, e0_ids].add(dvec).at[:, e1_ids].add(dvec)
            diag = freeT * diag + (1.0 - freeT)
            diag = jnp.where(diag == 0, 1.0, diag)
            M = lambda r_: r_ / diag

        def A(u6):
            return freeT * matvec(freeT * u6) + (1.0 - freeT) * u6

        b = freeT * fT
        out = _pcg(A, b, M=M, x0=u0, maxiter=chunk, tol=tol)
        return out.x, out.converged, out.residual_norm

    chunk_jit = jax.jit(_chunk_body, static_argnums=12)

    def _grad_q(radius, u6, tT, a1T, a2T, Lv, validv, e0_ids, e1_ids,
                ell_ids, free, f):
        freeT = jnp.transpose(free.reshape(n_nodes, 6))
        uf = freeT * u6
        g1 = uf[:, e0_ids]
        g2 = uf[:, e1_ids]
        du = g2[:3] - g1[:3]
        ths = g1[3:] + g2[3:]
        dth = g2[3:] - g1[3:]
        dot = lambda A, B: jnp.sum(A * B, axis=0)
        invL = 1.0 / Lv

        def q(r):
            r2 = r * r
            S = jnp.pi * r2 * validv
            I = jnp.pi * r2 * r2 / 4.0
            ES, kGS = E_mod * S, kappa * G_mod * S
            GJ, EI = G_mod * 2.0 * I * validv, E_mod * I * validv
            e0 = dot(du, tT) * invL
            e1 = dot(du, a1T) * invL - dot(ths, a2T) * 0.5
            e2 = dot(du, a2T) * invL + dot(ths, a1T) * 0.5
            e3 = dot(dth, tT) * invL
            e4 = dot(dth, a1T) * invL
            e5 = dot(dth, a2T) * invL
            # strain-energy form: u.K.u = sum_e (ES e0^2 + kGS (e1^2+e2^2)
            # + GJ e3^2 + EI (e4^2+e5^2)) L  — no scatter needed
            return jnp.sum((ES * e0 * e0 + kGS * (e1 * e1 + e2 * e2)
                            + GJ * e3 * e3 + EI * (e4 * e4 + e5 * e5)) * Lv)

        return -jax.grad(q)(radius)

    grad_jit = jax.jit(_grad_q)

    def step_chunked(radius_padded, u0=None, chunk: int = 256,
                     max_chunks: int = 64, on_fail: str = "raise"):
        """(compliance, grad, u, n_iters): tunnel-safe warm-startable
        solve + self-adjoint gradient.  ``u0``/returned ``u`` are [6, N]
        column-layout fields.

        Non-convergence within ``max_chunks * chunk`` iterations RAISES by
        default — a gradient from an unconverged field silently poisons an
        optimization loop; pass ``on_fail="warn"`` to get the r3 behavior
        (RuntimeWarning + best-effort gradient).
        """
        u = jnp.zeros((6, n_nodes), dtype=shl.dtype) if u0 is None else u0
        iters = 0
        converged, res = False, None
        for _ in range(max_chunks):
            u, converged, res = chunk_jit(radius_padded, u, *operands, chunk)
            jax.block_until_ready(u)
            iters += chunk
            converged = bool(converged)
            if converged:
                break
        if not converged:
            msg = (f"step.chunked: CG did not converge within "
                   f"{max_chunks * chunk} iterations (residual "
                   f"{float(res):.3e}, tol {tol:g})")
            if on_fail != "warn":
                raise RuntimeError(
                    msg + "; raise max_chunks/chunk, loosen tol, or pass "
                          "on_fail='warn' to accept the unconverged field.")
            import warnings
            warnings.warn(
                msg + "; the returned gradient is computed from the "
                      "unconverged displacement field.",
                RuntimeWarning, stacklevel=2)
        step_chunked.last_converged = converged
        step_chunked.last_residual = float(res) if res is not None else None
        fT = jnp.transpose(operands[-1].reshape(n_nodes, 6))
        c = jnp.sum(fT * u)
        g = grad_jit(radius_padded, u, *operands)
        return c, g, u, iters

    step.chunked = step_chunked
    return step


def _node_blocks_from(geom, D, edges, n_nodes, flat: bool = False):
    """Assembled per-node 6x6 blocks from explicit operands (see
    ShardedLattice.node_blocks for the derivation).

    ``flat`` routes the scatter through a 1-D per-entry segment_sum —
    required at scale, where a materialized [2E, 6, 6] would tile-pad to
    (8, 128) and exceed HBM.
    """
    t, a1, a2, L = geom
    invL = (1.0 / L)
    E = t.shape[0]
    dt = t.dtype
    z = jnp.zeros((E, 3), dtype=dt)
    Bu = jnp.stack([
        -t * invL[:, None], -a1 * invL[:, None], -a2 * invL[:, None],
        z, z, z], axis=1)
    Bth = jnp.stack([
        z, -a2 * 0.5, a1 * 0.5,
        -t * invL[:, None], -a1 * invL[:, None], -a2 * invL[:, None]], axis=1)
    B = jnp.concatenate([Bu, Bth], axis=2)
    DL = D * L[:, None]
    blk = jnp.einsum("eki,ek,ekj->eij", B, DL, B)
    sgn = jnp.concatenate([jnp.ones(3, dtype=dt), -jnp.ones(3, dtype=dt)])
    blk2 = blk * sgn[None, :, None] * sgn[None, None, :]
    if not flat:
        contrib = jnp.concatenate([blk, blk2], axis=0)
        idx = jnp.concatenate([edges[0], edges[1]])
        return jax.ops.segment_sum(contrib, idx, num_segments=n_nodes)
    ent = jnp.arange(36, dtype=edges.dtype)
    idx = jnp.concatenate([
        (edges[0][:, None] * 36 + ent).reshape(-1),
        (edges[1][:, None] * 36 + ent).reshape(-1)])
    contrib = jnp.concatenate([blk.reshape(-1), blk2.reshape(-1)])
    out = jax.ops.segment_sum(contrib, idx, num_segments=36 * n_nodes)
    return out.reshape(n_nodes, 6, 6)
