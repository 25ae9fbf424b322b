"""Size the windowed one-hot MXU matvec (parallel/unstructured_pallas.py).

The unstructured matvec is gather-rate-limited on TPU: XLA lowers
arbitrary gathers/scatters at ~2.3 G elements/s regardless of form (ELL
vs scatter measured 89 vs 90 ms/CG-iter at 3M edges), so ANY
formulation that indexes ~73M elements per matvec is stuck at 30-90 ms.
The kernel instead tiles output nodes into fixed blocks, keeps each
tile's incident edges' OTHER endpoints inside a contiguous node window,
and turns both the gather and the assembly into dense one-hot matmuls
built in VMEM (iota-compare) — sparse data movement as MXU work.

This probe answers, for Morton-ordered nodes on real lattices:
  * edges per output-node tile (padding waste at fixed K),
  * the other-endpoint window span per tile (required W),
  * the overflow fraction at candidate W (edges whose other endpoint
    falls outside the window; they take a slow XLA-gather side path).

Usage: N=50 GEOM=Octet python scripts/probe_edge_locality.py
"""
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

N = int(os.environ.get("N", "20"))
GEOM = os.environ.get("GEOM", "Octet")
S = int(os.environ.get("S", "128"))        # output nodes per tile

from pylatticedso_tpu import build_lattice

lat = build_lattice({
    "geometry": {"cell_size": {"x": 1, "y": 1, "z": 1},
                 "number_of_cells": {"x": N, "y": N, "z": N},
                 "radii": [0.05], "geom_types": [GEOM]}})
nodes, edges = lat.nodes, lat.edges
n, E = len(nodes), len(edges)
print(f"{GEOM} {N}^3: {n} nodes, {E} edges", flush=True)


def morton(p):
    q = ((p - p.min(0)) / (np.ptp(p, 0) + 1e-12)
         * ((1 << 10) - 1)).astype(np.uint32)
    code = np.zeros(len(p), dtype=np.uint64)
    for b in range(10):
        for a in range(3):
            code |= ((q[:, a].astype(np.uint64) >> b) & 1) << np.uint64(3 * b + a)
    return code


order = np.argsort(morton(nodes), kind="stable")
rank = np.empty(n, dtype=np.int64)
rank[order] = np.arange(n)
e = rank[edges]                              # renumbered endpoints

# half-edges grouped by output node tile (each edge contributes to both
# endpoints -> appears in two tiles)
half_out = np.concatenate([e[:, 0], e[:, 1]])
half_oth = np.concatenate([e[:, 1], e[:, 0]])
tile = half_out // S
n_tiles = (n + S - 1) // S
cnt = np.bincount(tile, minlength=n_tiles)
print(f"tiles (S={S}): {n_tiles}; half-edges/tile min {cnt.min()} "
      f"mean {cnt.mean():.0f} p99 {np.percentile(cnt, 99):.0f} max {cnt.max()}")
for K in (512, 1024, 2048):
    waste = np.clip(K - cnt, 0, None).sum() / (n_tiles * K)
    over = np.clip(cnt - K, 0, None).sum() / len(half_out)
    print(f"  K={K}: pad waste {100 * waste:.1f}%  overflow(half-edges) "
          f"{100 * over:.2f}%")

# other-endpoint window per tile: [w_b, w_b + W) must cover most of them
srt = np.argsort(tile, kind="stable")
t_s, o_s = tile[srt], half_oth[srt]
starts = np.searchsorted(t_s, np.arange(n_tiles))
ends = np.searchsorted(t_s, np.arange(n_tiles) + 1)
spans = []
for b in range(n_tiles):
    seg = o_s[starts[b]:ends[b]]
    if len(seg) == 0:
        spans.append(0)
        continue
    lo, hi = np.percentile(seg, [0.5, 99.5])   # trim the 1% tails
    spans.append(hi - lo)
spans = np.asarray(spans)
print(f"other-endpoint span/tile (central 99%): mean {spans.mean():.0f} "
      f"p90 {np.percentile(spans, 90):.0f} max {spans.max():.0f}")
for W in (1024, 2048, 4096):
    ov = 0
    for b in range(n_tiles):
        seg = o_s[starts[b]:ends[b]]
        if len(seg) == 0:
            continue
        med = np.median(seg)
        w0 = int(np.clip(med - W // 2, 0, max(n - W, 0)))
        ov += np.count_nonzero((seg < w0) | (seg >= w0 + W))
    print(f"  W={W}: overflow {100 * ov / len(half_out):.3f}% of half-edges")
