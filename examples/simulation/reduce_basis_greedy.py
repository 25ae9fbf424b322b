"""Greedy reduced basis over a Schur-complement dataset.

Mirrors examples/simulation/reduce_basis_schur_with_greedy.py of the
reference: load (or compute) a Schur dataset for a cell geometry, run the
greedy orthonormal basis reduction at a tolerance, save the basis npz.
"""

import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[2]))  # repo root


from itertools import product
from pathlib import Path

import numpy as np

from pylatticedso_tpu import MatProperties, build_lattice
from pylatticedso_tpu.ddm.schur import discretize_cell, schur_batch
from pylatticedso_tpu.ddm.surrogate import (reduce_basis_greedy,
                                            save_reduced_basis)
from pylatticedso_tpu.io.checkpoint import atomic_savez

GEOM = "BCC"
TOL = 1e-3
out = Path("data/outputs/schur_complement")
out.mkdir(parents=True, exist_ok=True)
dataset = out / f"Schur_complement_{GEOM}.npz"

if dataset.exists():
    d = np.load(dataset)
    radius_values = [tuple(r) for r in d["radius_values"]]
    schur_matrices = list(d["schur_matrices"])
    print(f"loaded dataset: {len(radius_values)} samples from {dataset}")
else:
    cell = build_lattice({
        "geometry": {"cell_size": {"x": 1, "y": 1, "z": 1},
                     "number_of_cells": {"x": 1, "y": 1, "z": 1},
                     "radii": [0.05], "geom_types": [GEOM]},
        "simulation_parameters": {"enable": True, "material": "VeroClear",
                                  "periodicity": True}})
    mat = MatProperties("VeroClear")
    disc = discretize_cell(cell, penalization=False)
    grid = np.round(np.arange(0.02, 0.11, 0.01), 3)
    combos = [c for c in product(grid, repeat=cell.config.n_geom)]
    S = np.asarray(schur_batch(disc, np.array(combos),
                               mat.young_modulus, mat.poisson_ratio))
    radius_values = [tuple(c) for c in combos]
    schur_matrices = list(S)
    atomic_savez(dataset, radius_values=np.array(radius_values),
                 schur_matrices=S)
    print(f"computed dataset: {len(combos)} samples -> {dataset}")

schur_dict = dict(zip(radius_values, schur_matrices))
basis, alpha, elements = reduce_basis_greedy(schur_dict, tol=TOL, verbose=1)
rb_file = out / f"reduced_basis_{GEOM}_tol_{TOL:g}.npz"
save_reduced_basis(rb_file, basis, alpha, elements)

n = schur_matrices[0].shape[0]
print(f"reduced basis: {basis.shape[1]} vectors for {len(schur_dict)} "
      f"samples of {n}x{n} matrices "
      f"(compression {len(schur_dict) / basis.shape[1]:.1f}x)")

# reconstruction check
err = 0.0
for (r, S_ref), a in zip(schur_dict.items(), alpha.T):
    S_rec = (basis @ a).reshape(n, n, order="F")
    err = max(err, np.linalg.norm(S_rec - S_ref) / np.linalg.norm(S_ref))
print(f"max reconstruction error over dataset: {err:.3e} (tol {TOL:g})")
print(f"saved {rb_file}")
