"""Pallas-fused stencil matvec for the structured lattice operator.

The XLA gather-form matvec (structured.py:apply_gather) lowers to ~20
separate HBM passes (one fused loop nest per template-edge side) because
slices at different offsets defeat XLA's fusion across edges: measured
3.45 ms at 50^3 on one v5e, ~25x off the ~0.14 ms bandwidth bound.

This kernel performs the whole operator K.u in ONE pass over HBM:

* **flat-shift formulation** — on the ghost-padded grid [Xp, Yp, Zp]
  (one zero cell on every side), a 3-D stencil read at offset
  (dx, dy, dz) is a 1-D shift by dx*Yp*Zp + dy*Zp + dz of the flattened
  array, exactly, for every interior point (reads land in the ghost
  region, never out of bounds).  Fields are stored [nc*6, F] /
  [n_edges, F] with F = Xp*Yp*Zp: all shifts become static column
  slices.
* **halo via neighbor tiles** — the grid walks column chunks of size T
  (> max shift); each program sees the previous/current/next tile of u
  and r^2 (clamped at the ends), concatenated to [rows, 3T] in VMEM, so
  every shifted read is a static in-VMEM slice.  Clamping only corrupts
  ghost outputs, which the caller discards (and the solver masks with
  ``free``).
* **factored Timoshenko arithmetic** — per template-edge side, the
  generalized strains e0..e5 -> internal forces chain of
  structured.py:apply_gather evaluated on (6, T) tiles with the frame
  vectors (t, a1, a2) baked in as Python-float scalars: ~100 VPU flops
  per point per edge side, no intermediate HBM traffic.

Reference capability covered: the inner K.u of the FEM solver
(/root/reference/src/pyLatticeSim/lattice_sim.py:1180-1252, there a
scipy/PETSc sparse matvec) — here as a fused TPU kernel.

Gradients: K.u is symmetric in u (vjp_u(g) = K.g with the same radii);
the cotangent w.r.t. the per-edge r^2 fields falls back to ``jax.vjp``
of the XLA gather form — it runs once per optimization step (at the end
of the adjoint solve), not once per CG iteration, so its cost is noise.

A 2-D (x-slab x yz-chunk) tiling variant lived here through round 4
(git history: make_pallas_matvec_2d).  It passed interpret-mode parity
on every template but NEVER lowered on hardware: every configuration
crashed the v5e remote Mosaic compiler (first "offset mismatch on
non-concat dimension" on the halo assembly — fixed by column-first
concatenation — then an opaque tpu_compile_helper exit 1 with no
diagnostic; data/outputs/tpu_queue/{probe_2d,sweep2d_r4}.log).  Removed
rather than shipped as interpret-only: the 1-D kernel at tile 3072
once+align8 measures 1.109 ms/matvec at 50^3, and the VPU-bound
arithmetic (~100 flops/point/edge-side) caps what any retiling can
recover to well under 2x.
"""

from __future__ import annotations

import sys
from functools import partial
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["make_pallas_matvec", "pallas_supported"]


def _edge_sides(slat, Yp: int, Zp: int):
    """Static per-edge-side records: self/other class, flat shifts, frame."""
    recs = []
    for ei, e in enumerate(slat.edges):
        d = (e["ob"][0] - e["oa"][0], e["ob"][1] - e["oa"][1],
             e["ob"][2] - e["oa"][2])
        flat = lambda v: int(v[0]) * (Yp * Zp) + int(v[1]) * Zp + int(v[2])
        # side A: output class ca at p; other endpoint at p + d; r^2 at p - oa
        recs.append(dict(ei=ei, side=0, cs=e["ca"], co=e["cb"],
                         du=flat(d), dr=flat([-o for o in e["oa"]]),
                         t=e["t"], a1=e["a1"], a2=e["a2"], L=e["L"]))
        # side B: output class cb at p; other endpoint at p - d; r^2 at p - ob
        recs.append(dict(ei=ei, side=1, cs=e["cb"], co=e["ca"],
                         du=flat([-x for x in d]),
                         dr=flat([-o for o in e["ob"]]),
                         t=e["t"], a1=e["a1"], a2=e["a2"], L=e["L"]))
    return recs


def pallas_supported(slat, min_points: int = 0) -> bool:
    """The fused kernel wins at every size on TPU: at large N it is
    bandwidth/VPU-bound (one HBM pass vs ~20), and at small (multigrid
    coarse-level) sizes ONE kernel launch replaces ~500 XLA ops whose
    fixed overheads cost ~2.5 ms per matvec regardless of grid size."""
    if getattr(slat, "node_transform", None) is not None:
        # warped lattices carry per-instance frame/length FIELDS; the
        # kernels' packed constant-coefficient form assumes per-template
        # frames.  The XLA gather form handles them (structured.py).
        return False
    Xp, Yp, Zp = (g + 2 for g in slat.grid)
    return Xp * Yp * Zp >= min_points


def _pack_dense_coefs(recs, E_mod, G_mod, kappa):
    """Constant (8, NCOLS) coefficient table for the dense kernel form.

    Pallas kernels cannot capture constant ARRAYS, so every (6,)
    matrix column of the per-record E = A2 @ [d; p3] and
    rows = B_side @ S contractions is packed column-wise into one
    small VMEM operand (column j = table[:6, j]); all-zero columns
    are skipped at pack time.  Columns 0/1 hold the stiffness
    monomial coefficients K = r2*colA + r2^2*colB.  Annotates each
    record with its ``dense_a`` / ``dense_b`` column index lists.
    """
    cols = []

    def add(col):
        if all(c == 0.0 for c in col):
            return None
        cols.append([float(c) for c in col] + [0.0, 0.0])
        return len(cols) - 1

    add([np.pi * E_mod, np.pi * kappa * G_mod, np.pi * kappa * G_mod,
         0.0, 0.0, 0.0])                                    # idx 0
    add([0.0, 0.0, 0.0, np.pi / 2.0 * G_mod,
         np.pi / 4.0 * E_mod, np.pi / 4.0 * E_mod])          # idx 1
    for r in recs:
        t, a1, a2, L = r["t"], r["a1"], r["a2"], r["L"]
        invL = 1.0 / L
        a_cols = []
        for k in range(3):
            j = add([t[k] * invL, a1[k] * invL, a2[k] * invL,
                     0.0, 0.0, 0.0])
            if j is not None:
                a_cols.append(("d", k, j))
        for k in range(3):
            j = add([0.0, 0.0, 0.0, t[k] * invL, a1[k] * invL,
                     a2[k] * invL])
            if j is not None:
                a_cols.append(("d", 3 + k, j))
        for k in range(3):
            j = add([0.0, -0.5 * a2[k], 0.5 * a1[k], 0.0, 0.0, 0.0])
            if j is not None:
                a_cols.append(("p", k, j))
        sgn = -1.0 if r["side"] == 0 else 1.0
        half_L = 0.5 * L
        b_defs = [
            (0, [sgn * t[0], sgn * t[1], sgn * t[2], 0.0, 0.0, 0.0]),
            (1, [sgn * a1[0], sgn * a1[1], sgn * a1[2],
                 -half_L * a2[0], -half_L * a2[1], -half_L * a2[2]]),
            (2, [sgn * a2[0], sgn * a2[1], sgn * a2[2],
                 half_L * a1[0], half_L * a1[1], half_L * a1[2]]),
            (3, [0.0, 0.0, 0.0, sgn * t[0], sgn * t[1], sgn * t[2]]),
            (4, [0.0, 0.0, 0.0, sgn * a1[0], sgn * a1[1], sgn * a1[2]]),
            (5, [0.0, 0.0, 0.0, sgn * a2[0], sgn * a2[1], sgn * a2[2]]),
        ]
        b_cols = []
        for srow, col in b_defs:
            j = add(col)
            if j is not None:
                b_cols.append((srow, j))
        r["dense_a"], r["dense_b"] = a_cols, b_cols
    table = np.zeros((8, max(len(cols), 1)), dtype=np.float32)
    for j, col in enumerate(cols):
        table[:, j] = col
    return table


def make_pallas_matvec(slat, xla_prepare: Callable, xla_apply: Callable,
                       tile: int = 3072, interpret: bool = False,
                       align8: Optional[bool] = None):
    """Fused-stencil (prepare, apply) pair for a StructuredLattice.

    ``xla_prepare``/``xla_apply`` are the existing gather-form callables;
    prepare is reused (it runs once per solve), and apply supplies the
    r^2-cotangent VJP.

    ``align8`` pads each class's 6 DOF rows to 8 in the kernel's input
    layout so every class-row window starts on a vreg sublane boundary
    (TPU vregs are (8, 128)): unaligned 6-row slices force a sublane
    relayout on every downstream op.  +33% u-read HBM traffic — the
    kernel is VPU-bound, so the trade wins (measured on v5e at 50^3:
    1.32 ms vs 1.45 ms per matvec; bench 0.240 vs 0.302 s/iter).
    Default ON; disable with PLDSO_PALLAS_ALIGN8=0.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import os as _os

    if align8 is None:
        align8 = _os.environ.get("PLDSO_PALLAS_ALIGN8", "1") == "1"
    dense = _os.environ.get("PLDSO_PALLAS_DENSE") == "1"
    # compute-per-edge-once (implies the dense form): generalized strains
    # and internal forces are evaluated ONCE per template edge on an
    # extended window [a, a+T+|du|), and BOTH endpoint-class contributions
    # are static slices of it — ~eliminates half the strain-stage VPU work
    # for edges whose flat shift |du| << T (all dx=0 edges: |du| <= Zp+1).
    # Edges with |du| > T//2 fall back to the two-sided form.
    # Default ON (with align8 the extended windows fit scoped VMEM; plain
    # once does NOT — measured v5e 50^3: 1.224 ms/matvec vs 1.32 align8,
    # bench 0.163 vs 0.173 s/iter).  PLDSO_PALLAS_ONCE=0 restores the
    # two-sided form.
    once = _os.environ.get("PLDSO_PALLAS_ONCE", "1") == "1"
    # the VMEM model below is calibrated for the align8 layout; without it
    # the unaligned 6-row extended windows add relayout temporaries the
    # model cannot see (the estimate DROPS to 11.6M while real usage rises
    # to a measured 17.09M scoped for Octet 50^3 once@T=3072, failing
    # remote AOT compile — data/outputs/tpu_queue/bench_once.log), so the
    # compute-once form is only offered on the aligned layout
    if not align8:
        once = False
    dense = dense or once

    X, Y, Z = slat.grid
    Xp, Yp, Zp = X + 2, Y + 2, Z + 2
    F = Xp * Yp * Zp
    nc = slat.nc
    n_e = len(slat.edges)
    row_stride = 8 if align8 else 6
    rows_in = nc * row_stride
    rows_u = nc * 6
    recs = _edge_sides(slat, Yp, Zp)
    H = max(abs(r["du"]) for r in recs + [dict(du=r2["dr"]) for r2 in recs])
    # adaptive tile: single-program when the whole field fits one tile
    # (coarse multigrid levels), else the VMEM-sized default
    T = min(int(tile), -(-F // 128) * 128)
    if nc > 8:
        # wide multi-geometry templates: the alpha model underestimates
        # their temporaries >2x (measured 34.97M real scoped at T=3072,
        # 16.34M at ~T=1400 — linear in T), so clamp to the empirically
        # fitting tile instead of trusting the search
        T = min(T, int(_os.environ.get("PLDSO_PALLAS_HYBRID_MAXTILE",
                                       "1280")))
    Tmin = -(-(H + 1) // 128) * 128
    T = max(T, Tmin)
    if T <= H:
        raise ValueError(f"tile {T} must exceed halo {H}")

    # Scoped-VMEM fit model (Mosaic budget is 16 MB): double-buffered
    # pipeline blocks + kernel stack (windows/strain/force temporaries,
    # ~alpha bytes per edge-window column; alpha calibrated on v5e remote
    # AOT numbers: hybrid nc=16/n_e=70 at T=3072 measured 34.97M scoped,
    # Octet once+align8 at T=3072 fits).  Pick the LARGEST tile that
    # fits, preferring the compute-once form; a template too wide to fit
    # at any tile > halo raises ValueError (caller falls back to the XLA
    # gather form — hybrid lattices at large N, where the x-halo alone
    # forces T > 2800 and the 16-class operand blocks exceed the budget).
    def _vmem_est(Tc, once_flag):
        blocks = 4 * Tc * (3 * rows_in + 3 * n_e + rows_u) * 2
        w = 0
        for rr in recs:
            if rr["side"]:
                continue
            duw = abs(rr["du"])
            w += (Tc + duw) if (once_flag and duw <= Tc // 2) else 2 * Tc
        # wide multi-geometry templates spill far more temporaries than
        # the alpha model sees: the 16-class hybrid at 50^3 measured
        # 16.34M real scoped vs an under-14M estimate, and a SMALLER tile
        # measured 18.22M (extended once-windows grow as T shrinks) —
        # bench_hybrid_r5 OOMs, 2026-08-21.  A 1.5x margin routes large
        # hybrid grids to the honest construction-time fallback (XLA
        # gather at the fine level; coarse MG levels still fit).
        margin = 1.5 if nc > 8 else 1.0
        return margin * (blocks + 19.0 * 4.0 * w)

    budget = float(_os.environ.get("PLDSO_PALLAS_VMEM_BUDGET", "14e6"))

    def _best_tile(once_flag):
        for Tc in range(T, Tmin - 1, -128):
            if _vmem_est(Tc, once_flag) <= budget:
                return Tc
        return None

    # prefer compute-once only when its largest fitting tile is at least
    # half the two-sided one (launch count within 2x): once at a much
    # smaller tile means many more programs, whose fixed costs can exceed
    # the strain-stage savings
    t_two = _best_tile(False)
    t_once = _best_tile(True) if once else None
    if t_once is not None and (t_two is None or 2 * t_once >= t_two):
        sel = (t_once, True)
    elif t_two is not None:
        sel = (t_two, False)
    else:
        sel = None
    if sel is None:
        raise ValueError(
            f"stencil template (nc={nc}, n_e={n_e}, halo {H}) does not fit "
            f"the scoped-VMEM budget at any tile in [{Tmin}, {T}]: "
            f"min estimate {_vmem_est(Tmin, False)/1e6:.1f}M > "
            f"{budget/1e6:.1f}M")
    T, once = sel
    _T_sel = T
    dense = _os.environ.get("PLDSO_PALLAS_DENSE") == "1" or once
    nprog = -(-F // T)
    Fp = nprog * T
    if _os.environ.get("PLDSO_PALLAS_DEBUG") == "1":
        print(f"# pallas stencil: grid={slat.grid} nc={nc} n_e={n_e} "
              f"halo={H} tile={T} nprog={nprog} once={once} "
              f"align8={align8} vmem_est={_vmem_est(T, once)/1e6:.1f}M",
              file=sys.stderr)

    E_mod, nu, kappa = slat.E_mod, slat.nu, slat.kappa
    G_mod = E_mod / (2.0 * (1.0 + nu))
    dt = slat.dtype
    if dt != jnp.float32:
        raise ValueError("pallas stencil matvec is float32-only")

    coef_np = (_pack_dense_coefs(recs, E_mod, G_mod, kappa) if dense
               else np.zeros((8, 1), dtype=np.float32))
    coefs_dev = jnp.asarray(coef_np)
    n_coef = coef_np.shape[1]

    def make_stencil_acc(T, ct=jnp.float32):
        """Shared stencil accumulation: (up, uc, un, rp, rc, rn, coefs,
        cache) -> per-class (6, T) contributions of K.u.  ``up/uc/un`` may
        be VMEM refs (pipelined tiles) or plain jnp arrays already in VMEM
        (the single-program multi-step smoother re-applies the stencil to
        values it just computed) — both support the same slicing.

        ``ct``: the in-kernel compute dtype for the dense form (fused
        smoother kernels may use bfloat16 — the preconditioner is any
        fixed operator; NEVER for the outer CG matvec).  The legacy
        non-dense branch mixes f32 scalars and stays f32-only."""
        if ct != jnp.float32 and not dense:
            ct = jnp.float32

        def stencil_acc(up, uc, un, rp, rc, rn, coefs, cache):

            def window(prev, cur, nxt, row0, nrows, a, w):
                """(nrows, w) f32 window at static logical columns
                [a, a+w) of the [.., 3T] neighborhood (prev = [-T, 0),
                cur = [0, T), nxt = [T, 2T)), without materializing it.
                Memoized: many edge-sides share the same (class, offset)
                read (e.g. both endpoints of parallel template edges), and
                the unaligned column shifts are the kernel's dominant VPU
                cost."""
                key = (id(cur), row0, nrows, a, w)
                if key in cache:
                    return cache[key]
                rs = slice(row0, row0 + nrows)
                parts = []
                for ref, lo in ((prev, -T), (cur, 0), (nxt, T)):
                    s, e = max(a, lo), min(a + w, lo + T)
                    if s < e:
                        parts.append(ref[rs, s - lo:e - lo])
                out = parts[0] if len(parts) == 1 \
                    else jnp.concatenate(parts, axis=1)
                out = out.astype(ct)
                cache[key] = out
                return out

            def shifted(prev, cur, nxt, row0, nrows, off):
                return window(prev, cur, nxt, row0, nrows, off, T)

            def coef_col(j):
                key = ("coef", j)
                if key not in cache:
                    # (6, 1) sublane slice, in the compute dtype
                    cache[key] = coefs[0:6, j:j + 1].astype(ct)
                return cache[key]

            def stiffness_rows(r2, key):
                """K (6, w): [ES, kGS, kGS, GJ, EI, EI] from r^2, built as
                two column-broadcast FMAs (coef table columns 0/1);
                memoized per distinct r-window."""
                ck = ("K",) + key
                if ck in cache:
                    return cache[ck]
                K = r2[None, :] * coef_col(0) + (r2 * r2)[None, :] * coef_col(1)
                cache[ck] = K
                return K

            def col_accum(terms):
                """sum_j row_j[None, :] * table_col_j — (6, T)-dense
                broadcast-FMA form of a constant (6 x k) matmul (all-zero
                columns were dropped at pack time)."""
                out = None
                for row, j in terms:
                    term = row[None, :] * coef_col(j)
                    out = term if out is None else out + term
                return out

            acc = [jnp.zeros((6, T), ct) for _ in range(nc)]

            def edge_once(rA, rB):
                """Compute-once form: strains + internal forces of one
                template edge on the extended window [a, a+T+|du|); both
                endpoint contributions are static T-column slices."""
                du, dr = rA["du"], rA["dr"]
                ca, cb = rA["cs"], rA["co"]
                a, w = min(0, -du), T + abs(du)
                uA = window(up, uc, un, row_stride * ca, 6, a, w)
                uB = window(up, uc, un, row_stride * cb, 6, a + du, w)
                r2 = window(rp, rc, rn, rA["ei"], 1, a + dr, w)[0]
                K = stiffness_rows(r2, (rA["ei"], a + dr, w))
                d = uB - uA                       # (6, w)
                p3 = uA[3:] + uB[3:]              # (3, w)
                E = col_accum([(d[k] if src == "d" else p3[k], j)
                               for (src, k, j) in rA["dense_a"]])
                Sd = K * E                        # (6, w) internal forces
                sA = Sd[:, -a:T - a]
                sB = Sd[:, -a - du:T - a - du]
                acc[ca] = acc[ca] + col_accum(
                    [(sA[srow], j) for (srow, j) in rA["dense_b"]])
                acc[cb] = acc[cb] + col_accum(
                    [(sB[srow], j) for (srow, j) in rB["dense_b"]])

            for r in recs:
                if once and abs(r["du"]) <= T // 2:
                    if r["side"] == 0:
                        edge_once(r, recs[2 * r["ei"] + 1])
                    continue
                t, a1, a2, L = r["t"], r["a1"], r["a2"], r["L"]
                invL = 1.0 / L
                cs, co = r["cs"], r["co"]
                uS = shifted(up, uc, un, row_stride * cs, 6, 0)   # self
                uO = shifted(up, uc, un, row_stride * co, 6, r["du"])
                r2 = shifted(rp, rc, rn, r["ei"], 1, r["dr"])[0]  # [T]
                if r["side"] == 0:
                    uA, uB = uS, uO
                else:
                    uA, uB = uO, uS

                if dense:
                    # (6, T)-dense formulation: E = A2 @ [d; p3],
                    # rows = B_side @ (K * E) — every op is a (6, T)
                    # broadcast-FMA instead of a chain of (T,)-shaped
                    # rank-1 ops (Mosaic lays (T,) as (1, T): one sublane
                    # of 8 — 1/8 VPU density).  Matrix columns come from
                    # the packed coefficient table (trace-time indices).
                    K = stiffness_rows(r2, (r["ei"], r["dr"]))
                    d = uB - uA                       # (6, T)
                    p3 = uA[3:] + uB[3:]              # (3, T)
                    E = col_accum(
                        [(d[k] if src == "d" else p3[k], j)
                         for (src, k, j) in r["dense_a"]])
                    Sd = K * E                        # (6, T) internal forces
                    acc[cs] = acc[cs] + col_accum(
                        [(Sd[srow], j) for (srow, j) in r["dense_b"]])
                    continue

                S = jnp.float32(np.pi) * r2
                I = jnp.float32(np.pi / 4.0) * r2 * r2
                ES, kGS = E_mod * S, (kappa * G_mod) * S
                GJ, EI = (2.0 * G_mod) * I, E_mod * I
                du = uB[:3] - uA[:3]
                ths = uA[3:] + uB[3:]
                dth = uB[3:] - uA[3:]

                # frame components are trace-time Python floats and MANY
                # are exactly zero (octet edges: t has 2 nonzeros, a2
                # often 1) — skip zero terms HERE; Mosaic does not fold
                # 0.0 * vector, so each skipped term is a real VPU op
                def dot(V, w):
                    acc_ = None
                    for k in range(3):
                        c = float(w[k])
                        if c == 0.0:
                            continue
                        term = V[k] if c == 1.0 else c * V[k]
                        acc_ = term if acc_ is None else acc_ + term
                    return 0.0 if acc_ is None else acc_

                def axpy3(ws_cs):
                    """[sum_j c_j[k] * s_j for k in 0..2] skipping zeros."""
                    out = []
                    for k in range(3):
                        acc_ = None
                        for w, s in ws_cs:
                            c = float(w[k])
                            if c == 0.0:
                                continue
                            term = s if c == 1.0 else c * s
                            acc_ = term if acc_ is None else acc_ + term
                        out.append(0.0 if acc_ is None else acc_)
                    return out

                e0 = dot(du, t) * invL
                e1 = dot(du, a1) * invL - dot(ths, a2) * 0.5
                e2 = dot(du, a2) * invL + dot(ths, a1) * 0.5
                e3 = dot(dth, t) * invL
                e4 = dot(dth, a1) * invL
                e5 = dot(dth, a2) * invL
                s0, s1, s2 = ES * e0, kGS * e1, kGS * e2
                s3, s4, s5 = GJ * e3, EI * e4, EI * e5
                # force rows (3, T): fu = s0 t + s1 a1 + s2 a2, unrolled
                fu = axpy3([(t, s0), (a1, s1), (a2, s2)])
                msh_raw = axpy3([(a1, s2), (a2, -1.0 * s1)])
                msh = [(L * 0.5) * m if not isinstance(m, float) else 0.0
                       for m in msh_raw]
                mdf = axpy3([(t, s3), (a1, s4), (a2, s5)])
                if r["side"] == 0:   # fA = [-fu, msh - mdf]
                    rows = [-fu[0], -fu[1], -fu[2],
                            msh[0] - mdf[0], msh[1] - mdf[1], msh[2] - mdf[2]]
                else:                # fB = [fu, msh + mdf]
                    rows = [fu[0], fu[1], fu[2],
                            msh[0] + mdf[0], msh[1] + mdf[1], msh[2] + mdf[2]]
                rows = [jnp.zeros((T,), jnp.float32)
                        if isinstance(q, float) else q for q in rows]
                acc[cs] = acc[cs] + jnp.stack(rows)
            return acc

        return stencil_acc

    def make_kernel(io_dtype, T=None):
        """Plain matvec kernel; loads upcast ``io_dtype`` -> f32 (all
        arithmetic stays f32), output downcast to ``io_dtype``.  bf16 I/O
        halves the kernel's HBM traffic — used for the multigrid SMOOTHER
        matvecs (the preconditioner is any fixed operator; the outer CG
        matvec stays f32)."""
        stencil_acc = make_stencil_acc(T if T is not None else _T_sel)

        def kernel(up, uc, un, rp, rc, rn, coefs, out_ref):
            acc = stencil_acc(up, uc, un, rp, rc, rn, coefs, {})
            out_ref[:] = jnp.concatenate(acc, axis=0).astype(io_dtype)

        return kernel

    specs_u = [
        pl.BlockSpec((rows_in, T), lambda i: (0, jnp.maximum(i - 1, 0)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rows_in, T), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((rows_in, T), lambda i: (0, jnp.minimum(i + 1, nprog - 1)),
                     memory_space=pltpu.VMEM),
    ]
    specs_r = [
        pl.BlockSpec((n_e, T), lambda i: (0, jnp.maximum(i - 1, 0)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n_e, T), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((n_e, T), lambda i: (0, jnp.minimum(i + 1, nprog - 1)),
                     memory_space=pltpu.VMEM),
    ]
    spec_coef = [pl.BlockSpec((8, n_coef), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)]

    def make_call(io_dtype):
        nbytes = jnp.dtype(io_dtype).itemsize
        return pl.pallas_call(
            make_kernel(io_dtype),
            grid=(nprog,),
            in_specs=specs_u + specs_r + spec_coef,
            out_specs=pl.BlockSpec((rows_u, T), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows_u, Fp), io_dtype),
            cost_estimate=pl.CostEstimate(
                flops=110 * len(recs) * F, transcendentals=0,
                bytes_accessed=nbytes * (3 * rows_in + 3 * n_e + rows_u) * Fp),
            interpret=interpret,
        )

    call = make_call(jnp.float32)
    call_lo = make_call(jnp.bfloat16)

    def _to_flat(u):
        """[nc, 6, X, Y, Z] -> [nc*row_stride, Fp] ghost-padded flat."""
        up = jnp.pad(u, ((0, 0), (0, row_stride - 6), (0, 0), (0, 0), (0, 0)))
        up = jnp.pad(up, ((0, 0), (0, 0), (1, 1), (1, 1), (1, 1)))
        flat = up.reshape(rows_in, F)
        return jnp.pad(flat, ((0, 0), (0, Fp - F)))

    def _from_flat(flat):
        up = flat[:, :F].reshape(nc, 6, Xp, Yp, Zp)
        return up[:, :, 1:-1, 1:-1, 1:-1]

    def prepare(radius):
        """r^2 fields [n_e, Fp] (ghost-padded flat), from the XLA prepare
        (creator-priority selects; once per solve)."""
        r2ps = xla_prepare(radius)                 # [n_e, Xp, Yp, Zp]
        flat = r2ps.reshape(n_e, F)
        return jnp.pad(flat, ((0, 0), (0, Fp - F)))

    def _raw_apply(u, r2f):
        flat = _to_flat(u)
        out = call(flat, flat, flat, r2f, r2f, r2f, coefs_dev)
        return _from_flat(out)

    def _xla_apply_from_flat(u, r2f):
        r2ps = r2f[:, :F].reshape(n_e, Xp, Yp, Zp)
        return xla_apply(u, r2ps)

    @jax.custom_vjp
    def apply(u, r2f):
        return _raw_apply(u, r2f)

    def _fwd(u, r2f):
        return _raw_apply(u, r2f), (u, r2f)

    def _bwd(res, g):
        u, r2f = res
        gu = _raw_apply(g, r2f)                    # K is symmetric in u
        _, vjp = jax.vjp(lambda a: _xla_apply_from_flat(u, a), r2f)
        return gu, vjp(g)[0]

    apply.defvjp(_fwd, _bwd)

    def apply_lo(u_lo, r2f_lo):
        """bfloat16-I/O matvec: same f32 arithmetic, half the HBM traffic.
        For the multigrid smoother only (never the outer CG matvec or a
        differentiated path); inputs/outputs are bf16 [.., Fp] flats /
        [nc, 6, X, Y, Z] fields."""
        flat = _to_flat(u_lo)
        out = call_lo(flat, flat, flat, r2f_lo, r2f_lo, r2f_lo, coefs_dev)
        return _from_flat(out)

    apply.lo = apply_lo
    apply.prepare_lo = lambda r2f: r2f.astype(jnp.bfloat16)

    # ------------------------------------------------ fused MG smoother
    # Kernels that fuse the multigrid smoother's vector algebra into the
    # stencil pass (multigrid.py:_chebyshev body):
    #     x <- x + d;   r <- r - K d;   d <- c1_k d + (c2_k/delta) r*fDinv
    # Key fact: the Chebyshev rho-recurrence depends only on the STATIC
    # spectrum fraction (sigma = (1+frac)/(1-frac)), so the per-step
    # c1/c2 are Python floats baked into the kernel; the only traced
    # scalars are 1/theta and 1/delta, passed as one tiny VMEM operand.
    # On single-program grids (coarse MG levels, where the whole padded
    # field fits one tile) `cheb_full` runs the ENTIRE degree-nu smoother
    # — including the x0 residual — in ONE kernel launch: ghost columns
    # of d stay exactly zero across in-VMEM iterations (d-updates
    # multiply by fDinv, whose ghost columns are zero), so re-applying
    # the stencil to just-computed values is safe without halo exchange.
    # All vectors live in the ghost-padded aligned flat layout
    # (rows_in, Fp_f) so kernel outputs feed the next kernel unconverted.

    def _cheb_static(frac, degree):
        sigma = (1.0 + frac) / (1.0 - frac)
        rho, out = 1.0 / sigma, []
        for _ in range(degree):
            rho_new = 1.0 / (2.0 * sigma - rho)
            out.append((rho_new * rho, 2.0 * rho_new))
            rho = rho_new
        return out

    class _Fused:
        pass

    fused = _Fused()

    # fused tile: same halo constraint, extra pointwise blocks (worst
    # case cheb_run: x, r, fdinv in + x', r', d' out ~= 6*rows_in),
    # sized by the configured smoother storage dtype — an f32-sized
    # estimate rejects the FINE level at 50^3 outright (silent unfused
    # fallback; caught 2026-08-21).  If the WHOLE padded field fits one
    # tile under the fused budget (coarse MG levels), prefer it even when
    # it exceeds the default tile: single-program unlocks the one-launch
    # full-smoother kernel.
    _io_bytes = (2 if _os.environ.get("PLDSO_MG_FUSED_DTYPE",
                                      "bf16") == "bf16" else 4)

    def _fits(Tc):
        return (_vmem_est(Tc, once)
                + _io_bytes * Tc * 6 * rows_in * 2 <= budget)

    T_full = max(-(-F // 128) * 128, Tmin)
    _tf = T_full if _fits(T_full) else None
    if _tf is None:
        for Tc in range(T, Tmin - 1, -128):
            if _fits(Tc):
                _tf = Tc
                break
    fused.ok = _tf is not None
    if fused.ok:
        T_f = _tf
        nprog_f = -(-F // T_f)
        Fp_f = nprog_f * T_f
        # single-program full-smoother feasibility (coarse levels): the
        # whole field in VMEM + per-edge window temporaries
        fused.single_ok = nprog_f == 1
        fused.rows = rows_in
        fused.Fp = Fp_f
        fused.dtypes = (jnp.float32, jnp.bfloat16)

        def to_flat8(u, io):
            up = jnp.pad(u, ((0, 0), (0, row_stride - 6),
                             (0, 0), (0, 0), (0, 0)))
            up = jnp.pad(up, ((0, 0), (0, 0), (1, 1), (1, 1), (1, 1)))
            flat = up.reshape(rows_in, F)
            return jnp.pad(flat, ((0, 0), (0, Fp_f - F))).astype(io)

        def from_flat8(flat, dtype=jnp.float32):
            up = flat[:, :F].astype(dtype).reshape(nc, row_stride,
                                                   Xp, Yp, Zp)
            return up[:, :6, 1:-1, 1:-1, 1:-1]

        def repad_r2(r2f, io):
            """matvec-layout [n_e, Fp] r^2 flats -> fused layout
            [n_e, Fp_f]."""
            base = r2f[:, :F]
            return jnp.pad(base, ((0, 0), (0, Fp_f - F))).astype(io)

        fused.to_flat = to_flat8
        fused.from_flat = from_flat8
        fused.repad_r2 = repad_r2
        # (2,) SMEM scalar operand: a (1,1) VMEM slice broadcast to
        # (rows, T) crashes Mosaic at some tiles ("Broadcast in both
        # sublanes and lanes", profile_r5b.log) — SMEM scalars lower
        # through the supported scalar*vector path
        fused.sc = lambda inv_theta, inv_delta: jnp.stack(
            [inv_theta, inv_delta]).astype(jnp.float32)

        def _halo_specs(rows, Tc, np_):
            return [
                pl.BlockSpec((rows, Tc), lambda i: (0, jnp.maximum(i - 1, 0)),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rows, Tc), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rows, Tc),
                             lambda i: (0, jnp.minimum(i + 1, np_ - 1)),
                             memory_space=pltpu.VMEM),
            ]

        def _pt_spec(rows, Tc):
            return pl.BlockSpec((rows, Tc), lambda i: (0, i),
                                memory_space=pltpu.VMEM)

        _spec_sc = pl.BlockSpec(memory_space=pltpu.SMEM)
        _spec_coef_f = pl.BlockSpec((8, n_coef), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)

        def _pad_acc(acc, io):
            """per-class (6, T) list -> (rows_in, T) with zero pad rows."""
            z = jnp.zeros((row_stride - 6, acc[0].shape[1]), acc[0].dtype)
            return jnp.concatenate(
                [jnp.concatenate([a, z], axis=0) for a in acc],
                axis=0).astype(io)

        _cache = {}

        def _residual_call(io):
            ct = (jnp.bfloat16 if _os.environ.get(
                "PLDSO_MG_FUSED_COMPUTE") == "bf16" else jnp.float32)
            key = ("res", jnp.dtype(io).name, jnp.dtype(ct).name)
            if key in _cache:
                return _cache[key]
            stencil_acc = make_stencil_acc(T_f, ct)

            def kernel(xp_, xc_, xn_, rp_, rc_, rn_, coefs, b_, fm_,
                       out_ref):
                acc = stencil_acc(xp_, xc_, xn_, rp_, rc_, rn_, coefs, {})
                kx = _pad_acc(acc, jnp.float32)
                out_ref[:] = (fm_[...].astype(jnp.float32)
                              * (b_[...].astype(jnp.float32) - kx)
                              ).astype(io)

            call = pl.pallas_call(
                kernel, grid=(nprog_f,),
                in_specs=(_halo_specs(rows_in, T_f, nprog_f)
                          + _halo_specs(n_e, T_f, nprog_f)
                          + [_spec_coef_f, _pt_spec(rows_in, T_f),
                             _pt_spec(rows_in, T_f)]),
                out_specs=_pt_spec(rows_in, T_f),
                out_shape=jax.ShapeDtypeStruct((rows_in, Fp_f), io),
                cost_estimate=pl.CostEstimate(
                    flops=110 * len(recs) * F, transcendentals=0,
                    bytes_accessed=jnp.dtype(io).itemsize
                    * (6 * rows_in + 3 * n_e) * Fp_f),
                interpret=interpret,
            )
            _cache[key] = lambda b, x, fm, r2f: call(
                x, x, x, r2f, r2f, r2f, coefs_dev, b, fm)
            return _cache[key]

        def _cheb_run_call(io, c1, c2, final):
            """One fused Chebyshev body step (+ optional final x+d+d'
            emit).  c1/c2 are the static rho-recurrence floats for this
            step; the traced 1/delta arrives via the sc operand."""
            ct = (jnp.bfloat16 if _os.environ.get(
                "PLDSO_MG_FUSED_COMPUTE") == "bf16" else jnp.float32)
            key = ("run", jnp.dtype(io).name, jnp.dtype(ct).name,
                   c1, c2, final)
            if key in _cache:
                return _cache[key]
            stencil_acc = make_stencil_acc(T_f, ct)

            def kernel(dp_, dc_, dn_, rp_, rc_, rn_, coefs, x_, r_, fd_,
                       sc_, *outs):
                acc = stencil_acc(dp_, dc_, dn_, rp_, rc_, rn_, coefs, {})
                kd = _pad_acc(acc, jnp.float32)
                d_cur = dc_[...].astype(jnp.float32)
                x1 = x_[...].astype(jnp.float32) + d_cur
                r1 = r_[...].astype(jnp.float32) - kd
                inv_delta = sc_[1]
                d1 = (c1 * d_cur
                      + (c2 * inv_delta) * r1 * fd_[...].astype(jnp.float32))
                if final:
                    outs[0][:] = (x1 + d1).astype(io)
                else:
                    outs[0][:] = x1.astype(io)
                    outs[1][:] = r1.astype(io)
                    outs[2][:] = d1.astype(io)

            n_out = 1 if final else 3
            call = pl.pallas_call(
                kernel, grid=(nprog_f,),
                in_specs=(_halo_specs(rows_in, T_f, nprog_f)
                          + _halo_specs(n_e, T_f, nprog_f)
                          + [_spec_coef_f] + [_pt_spec(rows_in, T_f)] * 3
                          + [_spec_sc]),
                out_specs=[_pt_spec(rows_in, T_f)] * n_out,
                out_shape=[jax.ShapeDtypeStruct((rows_in, Fp_f), io)] * n_out,
                cost_estimate=pl.CostEstimate(
                    flops=110 * len(recs) * F, transcendentals=0,
                    bytes_accessed=jnp.dtype(io).itemsize
                    * ((6 + n_out) * rows_in + 3 * n_e) * Fp_f),
                interpret=interpret,
            )

            def run(x, r, d, fd, sc, r2f):
                out = call(d, d, d, r2f, r2f, r2f, coefs_dev, x, r, fd, sc)
                return out[0] if final else tuple(out)

            _cache[key] = run
            return _cache[key]

        def _cheb_full_call(io, frac, degree, with_x0):
            """Single-program-only: the ENTIRE Chebyshev smoother (x0
            residual + degree body steps + final emit) in one launch."""
            ct = (jnp.bfloat16 if _os.environ.get(
                "PLDSO_MG_FUSED_COMPUTE") == "bf16" else jnp.float32)
            key = ("full", jnp.dtype(io).name, jnp.dtype(ct).name,
                   frac, degree, with_x0)
            if key in _cache:
                return _cache[key]
            stencil_acc = make_stencil_acc(T_full, ct)
            cs = _cheb_static(frac, degree)

            def kernel(*refs):
                if with_x0:
                    (b_, x0_, fd_, sc_, r2_, coefs, out_ref) = refs
                else:
                    (b_, fd_, sc_, r2_, coefs, out_ref) = refs
                r2v = r2_[...]
                cache = {}
                inv_theta = sc_[0]
                inv_delta = sc_[1]
                b = b_[...].astype(jnp.float32)
                fd = fd_[...].astype(jnp.float32)
                if with_x0:
                    x = x0_[...].astype(jnp.float32)
                    acc = stencil_acc(x, x, x, r2v, r2v, r2v, coefs, cache)
                    r = b - _pad_acc(acc, jnp.float32)
                else:
                    x = jnp.zeros((rows_in, T_full), jnp.float32)
                    r = b
                d = (r * fd) * inv_theta
                for c1, c2 in cs:
                    acc = stencil_acc(d, d, d, r2v, r2v, r2v, coefs, cache)
                    kd = _pad_acc(acc, jnp.float32)
                    x = x + d
                    r = r - kd
                    d = c1 * d + (c2 * inv_delta) * r * fd
                out_ref[:] = (x + d).astype(io)

            pt = [_pt_spec(rows_in, T_full)]
            specs = (pt + (pt if with_x0 else [])
                     + pt + [_spec_sc,
                             pl.BlockSpec((n_e, T_full), lambda i: (0, 0),
                                          memory_space=pltpu.VMEM),
                             _spec_coef_f])
            call = pl.pallas_call(
                kernel, grid=(1,),
                in_specs=specs,
                out_specs=_pt_spec(rows_in, T_full),
                out_shape=jax.ShapeDtypeStruct((rows_in, T_full), io),
                cost_estimate=pl.CostEstimate(
                    flops=110 * len(recs) * F * (degree + int(with_x0)),
                    transcendentals=0,
                    bytes_accessed=jnp.dtype(io).itemsize
                    * ((3 + int(with_x0)) * rows_in + n_e) * T_full),
                interpret=interpret,
            )
            if with_x0:
                fn = lambda b, x0, fd, sc, r2f: call(b, x0, fd, sc,
                                                     r2f, coefs_dev)
            else:
                fn = lambda b, fd, sc, r2f: call(b, fd, sc, r2f, coefs_dev)
            _cache[key] = fn
            return _cache[key]

        fused.residual = _residual_call
        fused.cheb_run = _cheb_run_call
        fused.cheb_full = _cheb_full_call
        fused.cheb_static = _cheb_static
    apply.fused = fused
    return prepare, apply

