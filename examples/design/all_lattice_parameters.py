"""Build a lattice exercising every design feature at once.

Mirrors examples/design/all_lattice_parameters.py of the reference: the
all_design_parameters preset combines radius + cell-size gradients, an
erased block, and a yz-plane symmetry on an Octahedron cell.
"""

import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[2]))  # repo root


from pathlib import Path

from pylatticedso_tpu import build_lattice
from pylatticedso_tpu.plotting import visualize_lattice

out = Path("data/outputs/examples")
out.mkdir(parents=True, exist_ok=True)

lattice = build_lattice("design/all_design_parameters", verbose=1)
lattice.print_statistics_lattice()
print(f"relative density: {lattice.get_relative_density():.4f}")
rmin, rmax = lattice.get_beam_radius_min_max()
print(f"beam radii span [{rmin:.4f}, {rmax:.4f}] (gradient applied)")

visualize_lattice(lattice, beam_color_type="radii", voxel=True,
                  save_path=out / "all_design_parameters.png")
print(f"wrote {out / 'all_design_parameters.png'}")
