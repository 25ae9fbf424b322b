"""Schur complement of a hybrid unit cell.

Mirrors examples/simulation/schur_complement_example.py of the reference
(get_schur_complement on the hybrid_cell_simulation preset): condense the
cell's interior DOFs onto its boundary nodes and print the dense interface
operator.
"""

import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[2]))  # repo root


import numpy as np

from pylatticedso_tpu import MatProperties, build_lattice
from pylatticedso_tpu.ddm.schur import discretize_cell, schur_complement

lattice = build_lattice("simulation/hybrid_cell_simulation")
mat = MatProperties(lattice.config.material_name())

disc = discretize_cell(lattice, cell_index=0,
                       periodicity=bool(
                           (lattice.config.simulation or {}).get("periodicity",
                                                                 False)))
S = np.asarray(schur_complement(disc, np.asarray(lattice.config.radii),
                                mat.young_modulus, mat.poisson_ratio))

print(f"boundary nodes: {S.shape[0] // 6}, S shape: {S.shape}")
print(f"||S||_F = {np.linalg.norm(S):.6f}, "
      f"symmetry error = {np.abs(S - S.T).max():.3e}")
np.set_printoptions(precision=3, suppress=True, linewidth=140)
print("Schur complement matrix (top-left 12x12 block):\n", S[:12, :12])
