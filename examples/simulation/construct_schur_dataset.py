"""Build a Schur-complement dataset over a radius grid + greedy reduced basis
(the offline stage of the surrogate DDM; reference:
examples/simulation/construct_schur_complement_dataset.py)."""

import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[2]))  # repo root


from itertools import product
from pathlib import Path

import numpy as np

from pylatticedso_tpu import MatProperties, build_lattice
from pylatticedso_tpu.ddm.schur import discretize_cell, schur_complement
from pylatticedso_tpu.ddm.surrogate import reduce_basis_greedy, save_reduced_basis
from pylatticedso_tpu.io.checkpoint import atomic_savez

GEOM = "BCC"
out = Path("data/outputs/schur_complement")
out.mkdir(parents=True, exist_ok=True)

cell = build_lattice({
    "geometry": {"cell_size": {"x": 1, "y": 1, "z": 1},
                 "number_of_cells": {"x": 1, "y": 1, "z": 1},
                 "radii": [0.05], "geom_types": [GEOM]},
    "simulation_parameters": {"enable": True, "material": "VeroClear",
                              "periodicity": True}})
mat = MatProperties("VeroClear")
disc = discretize_cell(cell, penalization=False)

grid = np.round(np.arange(0.01, 0.11, 0.01), 3)
radius_values, schur_matrices = [], []
for combo in product(grid, repeat=cell.config.n_geom):
    if sum(combo) <= 0.003:
        continue
    S = np.asarray(schur_complement(disc, np.array(combo),
                                    mat.young_modulus, mat.poisson_ratio))
    radius_values.append(list(combo))
    schur_matrices.append(S)
    print(f"radii {combo}: S {S.shape}, ||S|| = {np.linalg.norm(S):.4f}")

atomic_savez(out / f"Schur_complement_{GEOM}.npz",
             radius_values=np.array(radius_values),
             schur_matrices=np.array(schur_matrices))

schur_dict = {tuple(r): S for r, S in zip(radius_values, schur_matrices)}
B, A, L = reduce_basis_greedy(schur_dict, tol=1e-6, verbose=1)
save_reduced_basis(out / f"reduced_basis_{GEOM}_tol_1e-6.npz", B, A, L)
print(f"saved dataset + reduced basis ({B.shape[1]} vectors) to {out}/")
