"""Load a saved lattice and visualize it.

Mirrors examples/design/saved_lattice_example.py of the reference
(open_pickle_lattice).  Loads the npz checkpoint written by
save_lattice_example.py; additionally, if a reference-produced ``.pkl``
lattice is dropped in the same directory, it is imported through
``load_reference_pickle`` (migration path for reference users).
"""

import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[2]))  # repo root


from pathlib import Path

from pylatticedso_tpu.io.checkpoint import load_lattice
from pylatticedso_tpu.io.reference_pickle import load_reference_pickle
from pylatticedso_tpu.plotting import visualize_lattice

saved_dir = Path("data/outputs/saved_lattice_file")
npz = saved_dir / "L_logo_saved.npz"
if not npz.exists():
    raise SystemExit(f"{npz} not found — run save_lattice_example.py first")

lattice = load_lattice(npz)
print(f"loaded {lattice.name}: {lattice.num_cells} cells, "
      f"{lattice.num_edges} beams, rho = {lattice.get_relative_density():.4f}")
visualize_lattice(lattice, beam_color_type="radii",
                  save_path=Path("data/outputs/examples") / "L_logo_loaded.png")

for pkl in sorted(saved_dir.glob("*.pkl")):
    ref = load_reference_pickle(pkl)
    print(f"imported reference pickle {pkl.name}: {ref.num_cells} cells, "
          f"{ref.num_edges} beams")
