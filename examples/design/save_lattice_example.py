"""Save a lattice to a checkpoint file.

Mirrors examples/design/save_lattice_example.py of the reference (pickle
save of the L_logo preset + radii plot).  Arrays checkpoint to one atomic
``.npz`` instead of a scrubbed pickle (io/checkpoint.py).
"""

import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[2]))  # repo root


from pathlib import Path

from pylatticedso_tpu import build_lattice
from pylatticedso_tpu.io.checkpoint import save_lattice
from pylatticedso_tpu.plotting import visualize_lattice

out = Path("data/outputs/saved_lattice_file")
out.mkdir(parents=True, exist_ok=True)

lattice = build_lattice("design/L_logo", verbose=1)
lattice.print_statistics_lattice()

save_lattice(lattice, out / "L_logo_saved.npz")
print(f"saved {out / 'L_logo_saved.npz'}")

visualize_lattice(lattice, beam_color_type="radii",
                  save_path=Path("data/outputs/examples") / "L_logo.png")
