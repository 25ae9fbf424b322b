"""Structured stencil operator for uniform periodic lattices.

A uniform lattice (one unit-cell template tiled on a regular grid) is not an
unstructured graph: its nodes decompose into a few CLASSES — the unique
template-node positions modulo the cell — each living on a regular
(Nx+1, Ny+1, Nz+1) grid, and its beams into a few TEMPLATE EDGES, each
connecting class A at cell g to class B at cell g + d for a constant integer
offset d and a constant local frame.

K.u then becomes, per template edge, dense shifted-slice arithmetic over
[6, X, Y, Z] class fields — no gather, no scatter, no indices.  On TPU this
is the difference between XLA's serialized scatter lowering (~100 ms per
matvec at 50^3) and a handful of fused elementwise passes at HBM bandwidth.

Scope: uniform cell size, no penalization; single-geometry AND hybrid
(superposed multi-geometry) templates, with erased cells through a
per-cell validity mask.  The general unstructured path (parallel.sharding)
covers the rest (graded cell sizes, trimmed node clouds, penalized radii).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..catalog import get_beam_structure

__all__ = ["StructuredLattice", "make_structured_compliance_step",
           "shard_structured_step"]


def _split_template_collisions(templates, tol: float = 1e-9):
    """Split template beams at other template points lying strictly inside
    them (colinear, 0 < t < 1) — the builder's hybrid collision rule
    applied once at TEMPLATE level (design/lattice.py:
    _split_hybrid_collisions; reference check_hybrid_collision,
    lattice.py:1111-1216).  Superposition is identical in every cell, so
    one template split reproduces the per-cell splitting globally; split
    points are other geometries' nodes, so the class set is unchanged."""
    pts = np.unique(np.round(np.concatenate(
        [t.reshape(-1, 3) for t in templates]), 9), axis=0)
    out = []
    for tpl in templates:
        segs = []
        for beam in tpl:
            p1, p2 = beam[:3], beam[3:]
            v = p2 - p1
            L2 = float(v @ v)
            w = pts - p1
            cr = np.cross(np.broadcast_to(v, pts.shape), w)
            colinear = (cr * cr).sum(1) <= (tol * np.sqrt(max(L2, 1e-300))) ** 2
            t = (w @ v) / max(L2, 1e-300)
            interior = colinear & (t > 1e-12) & (t < 1.0 - 1e-12)
            chain = ([p1] + [p1 + tt * v for tt in np.sort(t[interior])]
                     + [p2])
            for a, b in zip(chain[:-1], chain[1:]):
                segs.append(np.concatenate([a, b]))
        out.append(np.asarray(segs))
    return out


def _class_decomposition(templates):
    """Template beams -> node classes + normalized template edges.

    ``templates``: one [n_beams, 2, 3] array per geometry.  Hybrid lattices
    SUPERPOSE every geometry's beams in every cell, each geometry carrying
    its own per-cell radius (the reference's multi-``geom_types`` build,
    lattice.py); classes are merged across geometries by their 9-digit
    fractional key and template edges by their canonical (class, offset)
    form, with each creator tagged by its source geometry.

    Returns (class_keys [nc,3], edges: list of dicts with class ids, offset,
    endpoint fractional positions, creator (shift, geometry) pairs).
    """
    pts_all, geom_of_beam = [], []
    for gi, template in enumerate(templates):
        pts_all.append(template.reshape(-1, 3))
        geom_of_beam.extend([gi] * len(template))
    pts = np.concatenate(pts_all)
    offs = np.floor(pts + 1e-12).astype(np.int64)          # 1.0 -> next cell
    keys = np.round(pts - offs, 9)
    uniq, inv = np.unique(keys, axis=0, return_inverse=True)

    # pre-dedup per-class cell offsets: class-c node at grid q exists iff a
    # cell q - o exists for some original template offset o of that class
    class_offsets = [set() for _ in range(len(uniq))]
    for i in range(len(pts)):
        class_offsets[int(inv[i])].add(tuple(offs[i].tolist()))

    edges = {}
    for b in range(len(pts) // 2):
        ia, ib = 2 * b, 2 * b + 1
        gi = geom_of_beam[b]
        ca, cb = int(inv[ia]), int(inv[ib])
        oa, ob = offs[ia], offs[ib]
        # canonical form: shift both offsets by their componentwise min (the
        # same physical stencil created by neighboring cells differs only by
        # a uniform shift) and order the endpoints deterministically
        s = np.minimum(oa, ob)
        oa2, ob2 = tuple((oa - s).tolist()), tuple((ob - s).tolist())
        ka, kb = keys[ia], keys[ib]
        if ((cb,) + ob2) < ((ca,) + oa2):
            oa2, ob2, ca, cb, ka, kb = ob2, oa2, cb, ca, kb, ka
        canon = ((ca,) + oa2, (cb,) + ob2)
        if canon not in edges:
            edges[canon] = {
                "ca": ca, "cb": cb, "oa": oa2, "ob": ob2,
                "fa": np.asarray(oa2) + ka,   # A position rel. anchor cell
                "fb": np.asarray(ob2) + kb,
                "shifts": set(),
            }
        # an instance at anchor g is created by cell g - s (of geometry gi)
        edges[canon]["shifts"].add(tuple(s.tolist()) + (gi,))
    return uniq, list(edges.values()), class_offsets


@dataclass
class StructuredLattice:
    """Class-grid representation of a uniform lattice.

    ``geom`` may be one geometry name or a sequence of names: a HYBRID
    lattice superposes every geometry's beams in every cell (the
    reference's multi-``geom_types`` build), and the radius argument of
    the operators then accepts an extra leading geometry axis
    ([n_geom, Nx, Ny, Nz]; lower-rank radii broadcast to all geometries).
    """

    geom: object                               # str | Sequence[str]
    num_cells: Tuple[int, int, int]
    cell_size: Tuple[float, float, float]
    E_mod: float
    nu: float
    kappa: float = 0.9
    dtype: object = jnp.float32
    cell_valid: Optional[np.ndarray] = None   # [Nx,Ny,Nz] bool (erasure)
    node_keep: Optional[object] = None        # [nc,X,Y,Z] bool or p(x,y,z)
    # node-granular TRIMMING (design.mesh_trimmer shapes at structured
    # speed): beams with a dropped endpoint are removed, like the
    # builder's trim pass.  A callable receives world coordinates.
    node_transform: Optional[object] = None   # f(x, y, z) -> (x', y', z')
    # WARPED lattices (design.transforms point maps: attractor, curve,
    # fit-to-surface, ... — reference design_transformation.py): the
    # transform moves nodes but keeps the grid TOPOLOGY, so K.u stays a
    # stencil — only the per-edge frame/length constants become per-
    # instance grid FIELDS.  This keeps "millions of struts" lattices on
    # the dense-stencil path (~ms matvecs) instead of the gather-rate-
    # limited general-graph path (~89 ms/CG-iter at 3M edges on v5e).
    # Topology-changing transforms (cylindrical seam merge) are out of
    # scope — those route through parallel.sharding.

    def __post_init__(self):
        self.geoms = ([self.geom] if isinstance(self.geom, str)
                      else list(self.geom))
        self.n_geom = len(self.geoms)
        tpls = [get_beam_structure(g) for g in self.geoms]
        if self.n_geom > 1:
            tpls = _split_template_collisions(tpls)
        self.class_keys, self.edges, class_offsets = _class_decomposition(tpls)
        self.nc = len(self.class_keys)
        nx, ny, nz = self.num_cells
        self.grid = (nx + 1, ny + 1, nz + 1)
        csz = np.asarray(self.cell_size)
        if self.cell_valid is None:
            self.cell_valid = np.ones(self.num_cells, dtype=bool)
        # cell validity padded by one ghost layer on every side, so creator
        # lookups g - s index with non-negative slices
        cvp = np.zeros((nx + 2, ny + 2, nz + 2), dtype=bool)
        cvp[1:nx + 1, 1:ny + 1, 1:nz + 1] = self.cell_valid

        # per-edge constants: frame, length, instance extent, creator masks
        for e in self.edges:
            vec = (np.asarray(e["fb"]) - np.asarray(e["fa"])) * csz
            L = float(np.linalg.norm(vec))
            t = vec / L
            ref = np.array([1.0, 0, 0]) if abs(t[2]) > 0.99 else np.array([0, 0, 1.0])
            a1 = np.cross(ref, t); a1 /= np.linalg.norm(a1)
            a2 = np.cross(t, a1)
            e["L"], e["t"], e["a1"], e["a2"] = L, t, a1, a2
            m = np.maximum(e["oa"], e["ob"])
            ext = (nx + 1 - m[0], ny + 1 - m[1], nz + 1 - m[2])
            e["ext"] = ext
            # creator priority: the reference's first-wins dedup keeps the
            # earliest-generated creating cell = smallest index = largest s;
            # within one cell, geometries generate in geom_types order, so
            # the SMALLEST geometry index wins.  Iteration order below is
            # lowest-priority FIRST (later entries overwrite).
            shifts = sorted(e["shifts"],
                            key=lambda p: (p[:3], -p[3]))
            e["creators"] = shifts                 # (sx, sy, sz, gi) tuples
            inst = np.zeros(ext, dtype=bool)
            for s in shifts:
                sl = tuple(slice(1 - s[ax], 1 - s[ax] + ext[ax]) for ax in range(3))
                inst |= cvp[sl]
            e["inst_valid"] = inst

        # node-class validity from the pre-dedup template offsets
        X, Y, Z = self.grid
        gx, gy, gz = np.meshgrid(np.arange(X), np.arange(Y), np.arange(Z),
                                 indexing="ij")
        self.node_valid = np.zeros((self.nc,) + self.grid, dtype=bool)
        for c in range(self.nc):
            ok = np.zeros(self.grid, dtype=bool)
            for o in class_offsets[c]:
                sl = tuple(slice(1 - o[ax], 1 - o[ax] + self.grid[ax])
                           for ax in range(3))
                ok |= cvp[sl]
            self.node_valid[c] = ok

        # node world positions (for BC selection)
        self.class_pos = {}
        for c, key in enumerate(self.class_keys):
            px = (gx + key[0]) * csz[0]
            py = (gy + key[1]) * csz[1]
            pz = (gz + key[2]) * csz[2]
            self.class_pos[c] = np.stack([px, py, pz])

        # warped lattices: transform positions, then derive per-edge
        # per-INSTANCE frames/lengths (grid fields) from the transformed
        # endpoints — same branchless reference-axis rule as the
        # unstructured path (fem/elements.edge_geometry; reference
        # beam_model.py:197-216), so the two operators agree bit-for-bit
        # on the same warped lattice.
        if self.node_transform is not None:
            # unwarped positions kept for exact node mapping (the
            # structured optimizer matches lattice nodes in PRE-transform
            # coordinates — integer-grid arithmetic on both sides)
            self.class_pos_unwarped = {c: self.class_pos[c].copy()
                                       for c in range(self.nc)}
            for c in range(self.nc):
                x, y, z = self.class_pos[c]
                self.class_pos[c] = np.stack(self.node_transform(x, y, z))
            for e in self.edges:
                ext, oa, ob = e["ext"], e["oa"], e["ob"]
                sa = (slice(None),) + tuple(
                    slice(oa[ax], oa[ax] + ext[ax]) for ax in range(3))
                sb = (slice(None),) + tuple(
                    slice(ob[ax], ob[ax] + ext[ax]) for ax in range(3))
                pA = self.class_pos[e["ca"]][sa]
                pB = self.class_pos[e["cb"]][sb]              # [3, ext]
                vec = pB - pA
                L = np.linalg.norm(vec, axis=0)
                Ls = np.where(L > 0, L, 1.0)   # collapsed-instance guard
                t = vec / Ls
                ex_ = np.array([1.0, 0.0, 0.0])[:, None, None, None]
                ez_ = np.array([0.0, 0.0, 1.0])[:, None, None, None]
                ref = np.where(np.abs(t[2]) > 0.99, ex_, ez_)
                a1 = np.cross(ref, t, axisa=0, axisb=0, axisc=0)
                a1n = np.linalg.norm(a1, axis=0)
                a1 = a1 / np.where(a1n > 0, a1n, 1.0)
                a2 = np.cross(t, a1, axisa=0, axisb=0, axisc=0)
                e["warp_frames"] = np.stack([t, a1, a2])      # [3, 3, ext]
                e["warp_L"] = Ls

        # node-granular trimming: drop nodes outside ``node_keep``, remove
        # every beam instance touching a dropped endpoint, then prune
        # orphaned nodes (the builder's trim pass, design/mesh_trimmer.py,
        # at class-grid granularity)
        if self.node_keep is not None:
            keep = self.node_keep
            if callable(keep):
                k = np.zeros((self.nc,) + self.grid, dtype=bool)
                for c in range(self.nc):
                    x, y, z = self.class_pos[c]
                    k[c] = keep(x, y, z)
                keep = k
            self.node_valid &= np.asarray(keep, dtype=bool)
            used = np.zeros_like(self.node_valid)
            for e in self.edges:
                ext, oa, ob = e["ext"], e["oa"], e["ob"]
                sa = tuple(slice(oa[ax], oa[ax] + ext[ax]) for ax in range(3))
                sb = tuple(slice(ob[ax], ob[ax] + ext[ax]) for ax in range(3))
                ka = self.node_valid[e["ca"]][sa]
                kb = self.node_valid[e["cb"]][sb]
                e["inst_valid"] = e["inst_valid"] & ka & kb
                used[e["ca"]][sa] |= e["inst_valid"]
                used[e["cb"]][sb] |= e["inst_valid"]
            self.node_valid &= used

    # ------------------------------------------------------------------
    @property
    def n_nodes(self) -> int:
        return int(self.node_valid.sum())

    @property
    def n_edges(self) -> int:
        return len(self.edges) * int(np.prod(self.num_cells))

    def node_field(self, fill: float = 0.0) -> np.ndarray:
        """Fresh [nc, 6, X, Y, Z] nodal field."""
        return np.full((self.nc, 6) + self.grid, fill, dtype=np.float32)

    def select_nodes(self, predicate) -> np.ndarray:
        """Boolean [nc, X, Y, Z] mask from a coordinate predicate p(x,y,z)."""
        out = np.zeros((self.nc,) + self.grid, dtype=bool)
        for c in range(self.nc):
            x, y, z = self.class_pos[c]
            out[c] = predicate(x, y, z) & self.node_valid[c]
        return out

    # ------------------------------------------------------------------
    def make_matvec(self):
        """Dense stencil K.u over [nc, 6, X, Y, Z] fields.

        Returns matvec(u, radius_field) with radius_field [Nx, Ny, Nz] (per
        cell; every strut of a cell shares its radius, the unit_cell design
        parameterization) or a scalar.
        """
        nx, ny, nz = self.num_cells
        E_mod, nu, kappa = self.E_mod, self.nu, self.kappa
        G_mod = E_mod / (2.0 * (1.0 + nu))
        dt = self.dtype
        warped = self.node_transform is not None
        consts = []
        for e in self.edges:
            if warped:
                # per-INSTANCE geometry fields (see __post_init__): frames
                # [3, ext] each, length [ext] — the same strain/force
                # arithmetic below broadcasts over them unchanged.
                wf = e["warp_frames"]
                t_, a1_, a2_ = (jnp.asarray(wf[0], dt),
                                jnp.asarray(wf[1], dt),
                                jnp.asarray(wf[2], dt))
                L_ = jnp.asarray(e["warp_L"], dt)
            else:
                t_, a1_, a2_, L_ = (jnp.asarray(e["t"], dt),
                                    jnp.asarray(e["a1"], dt),
                                    jnp.asarray(e["a2"], dt), float(e["L"]))
            # instance-validity masks are EMBEDDED jit constants; their
            # cell-validity component is redundant (the r^2 bases are
            # already cell_valid-multiplied, and every stiffness term is
            # proportional to r^2, so invalid instances contribute
            # exactly zero) — embedding them anyway cost ~150 MB of
            # program constants at 100^3 and blew the remote compile
            # tunnel's request limit (HTTP 413, bench_n100).  Only
            # node_keep TRIMMING carries real information: keep the mask
            # solely in that case.
            inst_c = (jnp.asarray(e["inst_valid"], dt)
                      if self.node_keep is not None else None)
            consts.append((
                t_, a1_, a2_, L_, e["ca"], e["cb"],
                e["oa"], e["ob"], e["ext"], e["creators"], inst_c))

        def _b(w):
            """Frame-vector broadcast: template frames are [3] constants,
            warped frames are [3, ext] fields — both multiply [*, ext]."""
            return w if w.ndim == 4 else w[:, None, None, None]

        geoP = None
        if warped:
            # ghost-padded per-edge geometry fields for the gather form:
            # rows 0-8 the instance frames (t, a1, a2 by xyz), row 9 the
            # length (padded with 1.0 — the padded r^2 is zero there, and
            # 1/L must stay finite).  Radius-independent, so they live
            # OUTSIDE prepare(); closure-captured, which embeds them as
            # XLA constants (CLAUDE.md trap) — acceptable at the warped
            # path's target sizes (<= ~32^3; ~50 MB), revisit with an
            # explicit-argument plumbing if warped 50^3 becomes hot.
            Xg, Yg, Zg = self.grid
            geo_np = np.zeros((len(self.edges), 10, Xg + 2, Yg + 2, Zg + 2),
                              np.float64)
            geo_np[:, 9] = 1.0
            for i, e in enumerate(self.edges):
                ext = e["ext"]
                blk = (slice(1, 1 + ext[0]), slice(1, 1 + ext[1]),
                       slice(1, 1 + ext[2]))
                geo_np[(i, slice(0, 9)) + blk] = \
                    e["warp_frames"].reshape(9, *ext)
                geo_np[(i, 9) + blk] = e["warp_L"]
            geoP = jnp.asarray(geo_np, dt)

        def _sections(radius):
            """Per-edge per-instance r^2 from the padded per-cell field,
            first-creating cell winning for shared beams.  ``radius``:
            scalar / [Nx,Ny,Nz] (broadcast to all geometries) or
            [n_geom, Nx, Ny, Nz] (hybrid: one radius field per superposed
            geometry)."""
            r = jnp.asarray(radius, dt)
            r = jnp.broadcast_to(r, (self.n_geom, nx, ny, nz))
            valid = jnp.asarray(self.cell_valid, dt)
            # square ONCE per geometry (selection commutes with squaring
            # on r >= 0), and skip the first-wins select entirely for
            # single-creator edges: _sections runs once per solve AND in
            # the analytic-gradient VJP, and its per-edge op chains cost
            # ~3 ms/step at 50^3 before this (profile_r5)
            rps2 = []
            for g in range(self.n_geom):
                rp = jnp.zeros((nx + 2, ny + 2, nz + 2), dt)
                rv = r[g] * valid
                rps2.append(rp.at[1:nx + 1, 1:ny + 1, 1:nz + 1].set(
                    rv * rv))
            out = []
            for (*_frame, ca, cb, oa, ob, ext, creators, inst) in consts:
                r2_inst = None
                for s in creators:  # low->high priority; later overwrites
                    sl = tuple(slice(1 - s[ax], 1 - s[ax] + ext[ax])
                               for ax in range(3))
                    cand = rps2[s[3]][sl]
                    r2_inst = cand if r2_inst is None \
                        else jnp.where(cand > 0, cand, r2_inst)
                if r2_inst is None:
                    r2_inst = jnp.zeros(ext, dt)
                out.append(r2_inst if inst is None else r2_inst * inst)
            return out

        def _slices(ca, cb, oa, ob, ext):
            sxa = (slice(None),) + tuple(
                slice(oa[ax], oa[ax] + ext[ax]) for ax in range(3))
            sxb = (slice(None),) + tuple(
                slice(ob[ax], ob[ax] + ext[ax]) for ax in range(3))
            return sxa, sxb

        def matvec(u, radius):
            # u: [nc, 6, X, Y, Z]
            r2s = _sections(radius)
            out = jnp.zeros_like(u)
            for (t, a1, a2, L, ca, cb, oa, ob, ext, _cr, _iv), r2 in zip(consts, r2s):
                S = jnp.pi * r2
                I = jnp.pi * r2 * r2 / 4.0
                ES, kGS = E_mod * S, kappa * G_mod * S
                GJ, EI = 2.0 * G_mod * I, E_mod * I
                invL = 1.0 / L
                sxa, sxb = _slices(ca, cb, oa, ob, ext)
                uA = u[ca][sxa]            # [6, ext]
                uB = u[cb][sxb]
                du = uB[:3] - uA[:3]
                ths = uA[3:] + uB[3:]
                dth = uB[3:] - uA[3:]
                dot = lambda V, w: (V * _b(w)).sum(0)
                e0 = dot(du, t) * invL
                e1 = dot(du, a1) * invL - dot(ths, a2) * 0.5
                e2 = dot(du, a2) * invL + dot(ths, a1) * 0.5
                e3 = dot(dth, t) * invL
                e4 = dot(dth, a1) * invL
                e5 = dot(dth, a2) * invL
                s0, s1, s2 = ES * e0, kGS * e1, kGS * e2
                s3, s4, s5 = GJ * e3, EI * e4, EI * e5
                o = lambda s, w: s[None] * _b(w)
                fu = o(s0, t) + o(s1, a1) + o(s2, a2)
                msh = (L * 0.5) * (o(s2, a1) - o(s1, a2))
                mdf = o(s3, t) + o(s4, a1) + o(s5, a2)
                fA = jnp.concatenate([-fu, msh - mdf])
                fB = jnp.concatenate([fu, msh + mdf])
                out = out.at[(ca,) + sxa].add(fA)
                out = out.at[(cb,) + sxb].add(fB)
            return out

        # Batched prepare: every per-edge padded r^2 field is a pure
        # 3-D SHIFT of one per-geometry squared base grid (selection
        # commutes with squaring; the per-edge placement offset (1,1,1)
        # and the creator shift s in {0,1}^3 compose into q -> q - s), so
        # the whole [n_e, Xp, Yp, Zp] tensor is n_e lazy flat slices +
        # ONE concat + ONE static-mask multiply, instead of ~2 ops per
        # edge per stage (~70 XLA launches, 3.0 ms/solve at 50^3 —
        # profile_r5c).  The static mask bakes placement extent AND
        # instance validity.
        _Xp, _Yp, _Zp = (g + 2 for g in self.grid)
        _F2 = _Xp * _Yp * _Zp
        _strides = (_Yp * _Zp, _Zp, 1)
        # placement box and cell validity are IMPLIED by the shift
        # structure (the shifted base is nonzero exactly on the box of
        # valid creating cells), so a mask constant is needed only for
        # node_keep trimming — embedding it unconditionally cost ~170 MB
        # of program constants at 100^3 (remote-compile HTTP 413)
        _prep_mask = None
        if self.node_keep is not None:
            _mask_np = np.zeros((len(consts), _Xp, _Yp, _Zp), np.float32)
            for _e, e in enumerate(self.edges):
                ext = e["ext"]
                _mask_np[_e, 1:1 + ext[0], 1:1 + ext[1], 1:1 + ext[2]] = \
                    np.asarray(e["inst_valid"], np.float32)
            _prep_mask = jnp.asarray(_mask_np, dt)
        _maxsh = sum(_strides)                  # covers any s in {0,1}^3

        def prepare_gather(radius):
            """Radius field -> per-edge padded r^2 fields [n_edges, Xp, Yp,
            Zp].  Loop-invariant inside a solve: compute ONCE per radius and
            reuse across every CG/smoother matvec."""
            r = jnp.asarray(radius, dt)
            r = jnp.broadcast_to(r, (self.n_geom, nx, ny, nz))
            valid = jnp.asarray(self.cell_valid, dt)
            flats = []
            for g in range(self.n_geom):
                B = jnp.zeros((_Xp, _Yp, _Zp), dt)
                rv = r[g] * valid
                B = B.at[1:nx + 1, 1:ny + 1, 1:nz + 1].set(rv * rv)
                flats.append(jnp.pad(B.reshape(-1), (_maxsh, _maxsh)))

            def row(s):                          # B[q - s], zeros outside
                sh = sum(int(s[ax]) * _strides[ax] for ax in range(3))
                return flats[s[3]][_maxsh - sh:_maxsh - sh + _F2]

            rows = []
            for (*_f, ext, creators, _iv) in consts:
                cand = None
                for s in creators:   # low->high priority; later overwrites
                    c = row(s)
                    cand = c if cand is None else jnp.where(c > 0, c, cand)
                if cand is None:     # creator-less edge (mirrors _sections)
                    cand = jnp.zeros(_F2, dt)
                rows.append(cand)
            stacked = jnp.stack(rows).reshape(len(consts), _Xp, _Yp, _Zp)
            return stacked if _prep_mask is None else stacked * _prep_mask

        def apply_gather(u, r2ps):
            """Gather-form K.u: every output point SUMS shifted-slice reads
            instead of 2x24 scatter-adds into the output buffer.  Same
            arithmetic as ``matvec`` reorganized around the output index, so
            XLA fuses the whole operator into stencil loop nests with no
            serialized in-place updates (the scatter form's bottleneck).

            For template edge e with cell offsets (oa, ob): the instance
            anchored at g contributes fA at node (g + oa) of class ca and fB
            at (g + ob) of class cb.  Re-indexed by output point p:
              out[ca](p) += fA(uA = u[ca](p), uB = u[cb](p + d), r2(p - oa))
              out[cb](p) += fB(uA = u[ca](p - d), uB = u[cb](p), r2(p - ob))
            with d = ob - oa in {-1,0,1}^3.  One-cell zero padding on both
            sides makes every read a static in-bounds slice; out-of-range
            contributions vanish because the padded r2 is zero there.
            """
            X, Y, Z = self.grid
            up = jnp.pad(u, ((0, 0), (0, 0), (1, 1), (1, 1), (1, 1)))

            def sl(base, off):
                """[6, X, Y, Z] slice of a padded [*,6,Xp,Yp,Zp] field at
                integer offset ``off`` (each component in {-1,0,1})."""
                return base[:, 1 + off[0]:1 + off[0] + X,
                            1 + off[1]:1 + off[1] + Y,
                            1 + off[2]:1 + off[2] + Z]

            def slr(r2p, off):
                return r2p[1 + off[0]:1 + off[0] + X,
                           1 + off[1]:1 + off[1] + Y,
                           1 + off[2]:1 + off[2] + Z]

            zero = jnp.zeros((6, X, Y, Z), dt)
            acc = [zero] * self.nc
            dot = lambda V, w: (V * _b(w)).sum(0)
            o = lambda s, w: s[None] * _b(w)
            for ei, ((t, a1, a2, L, ca, cb, oa, ob, ext, _cr, _iv), r2p) \
                    in enumerate(zip(consts, r2ps)):
                d = (ob[0] - oa[0], ob[1] - oa[1], ob[2] - oa[2])
                for side in (0, 1):
                    if side == 0:      # A-side: self = ca at p, other at p+d
                        uA = sl(up[ca], (0, 0, 0))
                        uB = sl(up[cb], d)
                        anchor = (-oa[0], -oa[1], -oa[2])
                        r2 = slr(r2p, anchor)
                        c_out = ca
                    else:              # B-side: self = cb at p, other at p-d
                        uA = sl(up[ca], (-d[0], -d[1], -d[2]))
                        uB = sl(up[cb], (0, 0, 0))
                        anchor = (-ob[0], -ob[1], -ob[2])
                        r2 = slr(r2p, anchor)
                        c_out = cb
                    if warped:
                        # instance geometry rides the same anchor shift as
                        # r^2 (both are fields over the instance grid)
                        gs = sl(geoP[ei], anchor)
                        t, a1, a2 = gs[0:3], gs[3:6], gs[6:9]
                        L = gs[9]
                    invL = 1.0 / L
                    S = jnp.pi * r2
                    I = jnp.pi * r2 * r2 / 4.0
                    ES, kGS = E_mod * S, kappa * G_mod * S
                    GJ, EI = 2.0 * G_mod * I, E_mod * I
                    du = uB[:3] - uA[:3]
                    ths = uA[3:] + uB[3:]
                    dth = uB[3:] - uA[3:]
                    e0 = dot(du, t) * invL
                    e1 = dot(du, a1) * invL - dot(ths, a2) * 0.5
                    e2 = dot(du, a2) * invL + dot(ths, a1) * 0.5
                    e3 = dot(dth, t) * invL
                    e4 = dot(dth, a1) * invL
                    e5 = dot(dth, a2) * invL
                    s0, s1, s2 = ES * e0, kGS * e1, kGS * e2
                    s3, s4, s5 = GJ * e3, EI * e4, EI * e5
                    fu = o(s0, t) + o(s1, a1) + o(s2, a2)
                    msh = (L * 0.5) * (o(s2, a1) - o(s1, a2))
                    mdf = o(s3, t) + o(s4, a1) + o(s5, a2)
                    f_side = jnp.concatenate([-fu, msh - mdf]) if side == 0 \
                        else jnp.concatenate([fu, msh + mdf])
                    acc[c_out] = acc[c_out] + f_side
            return jnp.stack(acc)

        def diag(radius):
            r2s = _sections(radius)
            out = jnp.zeros((self.nc, 6) + self.grid, dt)
            for (t, a1, a2, L, ca, cb, oa, ob, ext, _cr, _iv), r2 in zip(consts, r2s):
                S = jnp.pi * r2
                I = jnp.pi * r2 * r2 / 4.0
                ES, kGS = E_mod * S, kappa * G_mod * S
                GJ, EI = 2.0 * G_mod * I, E_mod * I
                invL = 1.0 / L
                t2 = _b(t * t)
                a12 = _b(a1 * a1)
                a22 = _b(a2 * a2)
                d_u = (ES * t2 + kGS * (a12 + a22)) * invL
                d_th = kGS * (a22 + a12) * (L * 0.25) \
                    + (GJ * t2 + EI * (a12 + a22)) * invL
                dvec = jnp.concatenate([d_u, d_th])
                sxa, sxb = _slices(ca, cb, oa, ob, ext)
                out = out.at[(ca,) + sxa].add(dvec)
                out = out.at[(cb,) + sxb].add(dvec)
            return out

        def energy_dr2(uf, r2s):
            """Analytic d(u^T K u)/d(r^2) per edge-template instance.

            u^T K u = sum_e (ES e0^2 + kGS (e1^2+e2^2) + GJ e3^2
                             + EI (e4^2+e5^2)) L_e with S = pi r^2,
            I = pi r^4 / 4 (the validated strain-energy form of
            sharding._grad_q), so the r^2-derivative is one ELEMENTWISE
            stencil pass over the strains — no transpose of the matvec:
              dq/dr2 = pi L [E e0^2 + kG (e1^2+e2^2) + G r2 e3^2
                             + E r2 / 2 (e4^2+e5^2)].
            Combined with the (cheap, scalar-field) VJP of ``_sections``
            this replaces the 28 ms autodiff pass through prepare+apply
            with a ~1-matvec-cost forward pass (profile_step_tpu.py).
            """
            out = []
            for (t, a1, a2, L, ca, cb, oa, ob, ext, _cr, _iv), r2 in zip(
                    consts, r2s):
                invL = 1.0 / L
                sxa, sxb = _slices(ca, cb, oa, ob, ext)
                uA = uf[ca][sxa]
                uB = uf[cb][sxb]
                du = uB[:3] - uA[:3]
                ths = uA[3:] + uB[3:]
                dth = uB[3:] - uA[3:]
                dot = lambda V, w: (V * _b(w)).sum(0)
                e0 = dot(du, t) * invL
                e1 = dot(du, a1) * invL - dot(ths, a2) * 0.5
                e2 = dot(du, a2) * invL + dot(ths, a1) * 0.5
                e3 = dot(dth, t) * invL
                e4 = dot(dth, a1) * invL
                e5 = dot(dth, a2) * invL
                out.append((jnp.pi * L) * (
                    E_mod * e0 * e0 + kappa * G_mod * (e1 * e1 + e2 * e2)
                    + G_mod * r2 * e3 * e3
                    + (0.5 * E_mod) * r2 * (e4 * e4 + e5 * e5)))
            return out

        def matvec_gather(u, radius):
            return apply_gather(u, prepare_gather(radius))

        import os
        mode = os.environ.get("PLDSO_MATVEC", "gather")
        if mode == "pallas":
            from .stencil_pallas import make_pallas_matvec, pallas_supported
            if pallas_supported(self) and self.dtype == jnp.float32:
                try:
                    # PLDSO_PALLAS_INTERPRET=1: emulated kernels (CPU
                    # tests of the pallas-only paths, e.g. the fused MG
                    # smoother) — orders of magnitude slower, never for
                    # real runs
                    prep_p, apply_p = make_pallas_matvec(
                        self, prepare_gather, apply_gather,
                        interpret=os.environ.get(
                            "PLDSO_PALLAS_INTERPRET") == "1")
                except ValueError:
                    # template too wide for the scoped-VMEM budget at any
                    # legal tile (e.g. 16-class hybrids at large N, where
                    # the x-halo forces tile > 2800).  NOTE: this guards
                    # only the construction-time VMEM estimate; raising
                    # PLDSO_PALLAS_VMEM_BUDGET (or other env overrides)
                    # past the calibrated model surfaces later as a
                    # remote-compile JaxRuntimeError with no fallback.
                    prep_p = apply_p = None
                if apply_p is not None:
                    def matvec_pallas(u, radius):
                        return apply_p(u, prep_p(radius))

                    matvec_pallas.prepare = prep_p
                    matvec_pallas.apply = apply_p
                    matvec_pallas.sections = _sections
                    matvec_pallas.energy_dr2 = energy_dr2
                    return matvec_pallas, diag
            mode = "gather"          # tiny (coarse) grids: XLA form wins
        if mode == "gather":
            matvec_gather.prepare = prepare_gather
            matvec_gather.apply = apply_gather
            matvec_gather.sections = _sections
            matvec_gather.energy_dr2 = energy_dr2
            return matvec_gather, diag
        matvec.sections = _sections
        matvec.energy_dr2 = energy_dr2
        return matvec, diag


def make_structured_compliance_step(slat: StructuredLattice,
                                    free_mask: np.ndarray, f_ext: np.ndarray,
                                    u_imposed: Optional[np.ndarray] = None,
                                    objective=None,
                                    tol: float = 1e-6, maxiter: int = 4000,
                                    precond: str = "jacobi",
                                    mg_opts: Optional[dict] = None):
    """value_and_grad of an objective w.r.t. the per-cell radius field.

    ``free_mask``: [nc, X, Y, Z] bool (free nodes) or [nc, 6, X, Y, Z]
    bool (free DOFs); ``f_ext``: [nc, 6, X, Y, Z] applied forces;
    ``u_imposed``: optional nonzero Dirichlet values; ``objective(u, f)``:
    scalar functional (default: compliance sum(f * u)); ``precond``:
    "jacobi" or "mg" (geometric multigrid V-cycle — mesh-independent CG
    iteration counts, ~6 extra matvecs per iteration; wins at large N).
    """
    from ..fem.solve import linear_solve, pcg

    matvec, diag_fn = slat.make_matvec()
    dt = slat.dtype
    free_mask = np.asarray(free_mask)
    if free_mask.ndim == 4:            # per-node -> per-DOF
        free_mask = free_mask[:, None]
    free = jnp.asarray(np.broadcast_to(free_mask, f_ext.shape), dt)

    if precond not in ("jacobi", "mg"):
        raise ValueError(f"unknown precond {precond!r}: use 'jacobi' or 'mg'")
    mg_hier = None
    if precond == "mg":
        from .multigrid import build_mg_hierarchy, mg_preconditioner
        mg_hier = build_mg_hierarchy(
            slat, np.broadcast_to(free_mask, f_ext.shape))
    f = jnp.asarray(f_ext, dt)
    u_imp = jnp.zeros_like(f) if u_imposed is None else jnp.asarray(u_imposed, dt)
    default_objective = objective is None
    if objective is None:
        objective = lambda u, f_: jnp.sum(f_ * u)

    def _solve(radius_field, free, f, u0, pstate=None):
        if hasattr(matvec, "prepare"):
            # hoist the radius -> r^2-field construction out of the CG loop
            aux = matvec.prepare(radius_field)
            K = lambda u: matvec.apply(u, aux)
        else:
            K = lambda u: matvec(u, radius_field)

        def A(u):
            return free * K(free * u) + (1.0 - free) * u

        b = free * (f - K(u_imp)) + (1.0 - free) * u_imp
        if mg_hier is not None:
            from .multigrid import mg_apply, mg_precond_state
            # preconditioner never moves the fixed point: detach its radii.
            # ``pstate`` may carry a FROZEN earlier design's state (descent
            # steps move radii slowly), skipping the per-solve lmax power
            # iterations and per-level operand rebuilds.
            opts = dict(mg_opts or {})
            power = opts.pop("power_iters", 10)
            if pstate is None:
                pstate = mg_precond_state(
                    mg_hier, jax.lax.stop_gradient(radius_field),
                    power_iters=power, fused=opts.get("fused"))
            M = mg_apply(mg_hier, pstate, **opts)
        else:
            dg = free * diag_fn(jax.lax.stop_gradient(radius_field)) \
                + (1.0 - free)
            dg = jnp.where(dg == 0, 1.0, dg)
            M = lambda r_: r_ / dg
        u0 = jax.lax.stop_gradient(u0)

        def solve_fn(mv, rhs):
            # warm start affects convergence only, not the fixed point, so
            # implicit differentiation stays exact
            return pcg(mv, rhs, M=M, x0=u0 * free, maxiter=maxiter,
                       tol=tol).x

        u = jax.lax.custom_linear_solve(A, b, solve_fn, symmetric=True)
        return free * u + (1.0 - free) * u_imp

    def compliance(radius_field, free, f, u0):
        u = _solve(radius_field, free, f, u0)
        return objective(u, f), u

    def compliance_frozen(radius_field, free, f, u0, pstate):
        u = _solve(radius_field, free, f, u0, pstate)
        return objective(u, f), u

    vag = jax.jit(jax.value_and_grad(compliance, has_aux=True))
    vag_frozen = jax.jit(jax.value_and_grad(compliance_frozen, has_aux=True))

    # self-adjoint fast path: for pure compliance with zero imposed
    # displacements, the adjoint equals the primal solution (A symmetric,
    # rhs == objective cotangent), so the gradient needs NO second CG
    # solve.  The reference exploits the same identity (u^T dS/dr u
    # per-cell compliance terms, lattice_opti.py:701-760).  Two gradient
    # forms:
    #   * "analytic" (DEFAULT when eligible): the closed-form energy
    #     derivative pass (matvec.energy_dr2) + the scalar-field VJP of
    #     ``_sections`` — ~1 matvec of work.  The r3 autodiff variant
    #     through prepare+apply cost 28 ms/step at 50^3 (profile_step)
    #     and made self-adjoint SLOWER than implicit-diff; this one
    #     removes both the adjoint solve and the autodiff pass.
    #   * PLDSO_GRAD=implicit: implicit differentiation through
    #     custom_linear_solve (warm-started adjoint CG re-solve) —
    #     required for non-compliance objectives / imposed displacements,
    #     kept as an A/B switch for the default case.
    #   * PLDSO_SELFADJOINT=1 (legacy r3 switch): self-adjoint with the
    #     autodiff prepare+apply VJP.
    import os as _os
    sa_eligible = (default_objective and u_imposed is None)
    grad_mode = _os.environ.get("PLDSO_GRAD", "analytic")
    selfadjoint = sa_eligible and _os.environ.get("PLDSO_SELFADJOINT") == "1"
    analytic = (sa_eligible and not selfadjoint and grad_mode == "analytic"
                and hasattr(matvec, "energy_dr2"))

    def _sa_step(radius_field, u0):
        u = _solve(jax.lax.stop_gradient(radius_field), free, f, u0)
        u = jax.lax.stop_gradient(u)
        c = jnp.sum(f * u)
        uf = free * u

        def q(rf):
            if hasattr(matvec, "prepare"):
                return jnp.sum(uf * matvec.apply(uf, matvec.prepare(rf)))
            return jnp.sum(uf * matvec(uf, rf))

        g = -jax.grad(q)(radius_field)
        return c, g, u

    sa_jit = jax.jit(_sa_step) if selfadjoint else None

    def _analytic_grad(radius_field, uf):
        # NOTE: uf = free * u computed by the caller — big operands enter
        # jitted code as arguments, never closure captures (module rule)
        rsg = jax.lax.stop_gradient(radius_field)
        dq = [jax.lax.stop_gradient(x)
              for x in matvec.energy_dr2(uf, matvec.sections(rsg))]

        def inner(rf):
            tot = None
            for d_, r2 in zip(dq, matvec.sections(rf)):
                s = jnp.sum(d_ * r2)
                tot = s if tot is None else tot + s
            return tot

        return -jax.grad(inner)(radius_field)

    def _sa_analytic(radius_field, free, f, u0, pstate=None):
        u = _solve(jax.lax.stop_gradient(radius_field), free, f, u0, pstate)
        u = jax.lax.stop_gradient(u)
        return jnp.sum(f * u), _analytic_grad(radius_field, free * u), u

    sa_an = jax.jit(_sa_analytic) if analytic else None
    sa_an_frozen = jax.jit(lambda r, fr, f_, u0, ps:
                           _sa_analytic(r, fr, f_, u0, ps)) if analytic else None

    def step(radius_field, u0=None, precond_state=None):
        """Returns (compliance, grad, u); pass the previous step's u as
        ``u0`` to warm-start the solves (fewer CG iterations in a descent
        loop; exactness unaffected).  ``precond_state`` (from
        ``step.precond_state(r)``) freezes the multigrid preconditioner
        state across steps — valid for slowly moving radii, skipping the
        per-solve lmax power iterations and operand rebuilds; the solve
        fixed point is unaffected (M only changes convergence)."""
        if u0 is None:
            u0 = jnp.zeros_like(f)
        if precond_state is not None and mg_hier is not None:
            if sa_an_frozen is not None:
                return sa_an_frozen(radius_field, free, f, u0, precond_state)
            (c, u), g = vag_frozen(radius_field, free, f, u0, precond_state)
            return c, g, u
        if sa_an is not None:
            return sa_an(radius_field, free, f, u0)
        if sa_jit is not None:
            return sa_jit(radius_field, u0)
        (c, u), g = vag(radius_field, free, f, u0)
        return c, g, u

    if mg_hier is not None:
        from .multigrid import mg_precond_state as _mps
        _power = (mg_opts or {}).get("power_iters", 10)
        _fused_opt = (mg_opts or {}).get("fused")
        step.precond_state = jax.jit(
            lambda r: _mps(mg_hier, r, power_iters=_power,
                           fused=_fused_opt))

    step._jitted = vag
    step._jitted_frozen = vag_frozen
    step._sa_frozen = sa_an_frozen  # default fast path (None if ineligible)
    step._operands = (free, f)
    step.raw = compliance          # (radius_field, free, f, u0) -> (obj, u)

    # built once so repeated step_batch calls hit the jit cache (a fresh
    # jit-wrapped closure per call would recompile every invocation)
    vag_batch = jax.jit(jax.vmap(jax.value_and_grad(compliance, has_aux=True),
                                 in_axes=(0, None, None, None)))

    def step_batch(radius_fields):
        """vmapped design-candidate population: [B, Nx, Ny, Nz] radii."""
        u0 = jnp.zeros_like(f)
        (c, u), g = vag_batch(radius_fields, free, f, u0)
        return c, g

    step.batch = step_batch
    return step


def shard_structured_step(step, mesh, axis_name: str = "shard",
                          grid_axis: Optional[int] = None):
    """Multi-device execution of a structured compliance step by GSPMD.

    Shards the nodal fields ``[nc, 6, X, Y, Z]`` along ONE grid axis over
    ``mesh[axis_name]`` and lets XLA's SPMD partitioner propagate the
    sharding through the whole jitted step — pad/shift slices of the
    stencil become halo exchanges (collective-permutes over ICI on real
    hardware), CG dot products become psums.  This is the scaling-book
    recipe (annotate shardings, let XLA insert collectives) rather than a
    hand-written halo pipeline: the flat static-slice formulation of
    ``apply_gather`` is exactly the pattern GSPMD partitions well.

    The radius field and multigrid preconditioner state stay replicated
    (tiny next to the nodal fields; MG coarse levels drop below the
    device count anyway, where XLA chooses its own layouts).

    ``grid_axis``: 0/1/2 for X/Y/Z; default picks the largest grid axis
    divisible by the mesh axis size (device_put requires even shards).
    Parity vs the single-device step is f32 roundoff (different
    reduction orders).  Returns a function with the same signature as
    ``step`` (radius_field, u0=None, precond_state=None).

    No reference equivalent: the reference is strictly single-process
    (MPI always COMM_SELF, utils_simulation.py:39,72,103); this is the
    TPU-native scale-out of SURVEY.md §5.8.
    """
    from jax.sharding import NamedSharding, PartitionSpec

    n_shard = mesh.shape[axis_name]
    free, f = step._operands
    grid = tuple(free.shape[2:])
    if grid_axis is None:
        cands = [ax for ax in np.argsort(grid)[::-1]
                 if grid[ax] % n_shard == 0]
        if not cands:
            raise ValueError(
                f"no grid axis of {grid} divisible by {axis_name}={n_shard}; "
                f"pad the lattice (e.g. nx = k*{n_shard} - 1) or pass "
                f"grid_axis explicitly")
        grid_axis = int(cands[0])
    elif grid[grid_axis] % n_shard != 0:
        raise ValueError(f"grid axis {grid_axis} of {grid} not divisible "
                         f"by {axis_name}={n_shard}")

    spec5 = [None] * 5
    spec5[2 + grid_axis] = axis_name
    sh5 = NamedSharding(mesh, PartitionSpec(*spec5))
    rep = NamedSharding(mesh, PartitionSpec())
    free_s = jax.device_put(free, sh5)
    f_s = jax.device_put(f, sh5)

    def sharded_step(radius_field, u0=None, precond_state=None):
        r = jax.device_put(jnp.asarray(radius_field), rep)
        u0 = jnp.zeros_like(f_s) if u0 is None else u0
        u0 = jax.device_put(u0, sh5)
        if precond_state is not None:
            pstate = jax.device_put(precond_state, rep)
            (c, u), g = step._jitted_frozen(r, free_s, f_s, u0, pstate)
        else:
            (c, u), g = step._jitted(r, free_s, f_s, u0)
        return c, g, u

    sharded_step.mesh = mesh
    sharded_step.grid_axis = grid_axis
    sharded_step.shardings = (sh5, rep)
    return sharded_step
