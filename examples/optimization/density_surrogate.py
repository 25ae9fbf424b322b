"""Build the exact relative-density dataset (device voxel quadrature) and fit
the differentiable Kriging surrogate (reference:
examples/optimization/example_surrogate_model_for_relative_densities.py)."""

import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[2]))  # repo root


from pathlib import Path

import jax.numpy as jnp
import numpy as np

from pylatticedso_tpu.opti.density import (KrigingDensity, density_dataset,
                                           density_voxel)
from pylatticedso_tpu.catalog import get_beam_structure

out = Path("data/outputs/relative_densities")
out.mkdir(parents=True, exist_ok=True)

GEOMS = ["BCC"]
grid = np.round(np.arange(0.01, 0.105, 0.01), 3)
ds = density_dataset(GEOMS, grid, resolution=96)
for k, v in sorted(ds.items()):
    print(f"radii {k}: rho = {v:.5f}")

model = KrigingDensity.fit(ds)
model.save(out / f"kriging_{'_'.join(GEOMS)}.npz")

for r in (0.033, 0.05, 0.085):
    val, grad = model.mean_and_grad(jnp.array([r]))
    exact = density_voxel(get_beam_structure(GEOMS[0]),
                          np.full(len(get_beam_structure(GEOMS[0])), r),
                          resolution=128)
    print(f"r={r}: kriging {float(val):.5f} (grad {float(grad[0]):.4f}) "
          f"vs voxel {exact:.5f}")
