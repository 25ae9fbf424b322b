"""Quantify the reference's committed relative-density artifacts against
checkable ground truth, and commit the result as a numerical table.

Claim under audit (docs/guides + L-beam example docstring): "the
reference's runtime density model is not reproducible from its committed
artifacts".  This script turns that prose into numbers:

1. BCC single-radius table: the reference's committed dataset values
   (data/RelativeDensities_BCC.pkl) vs this repo's voxel union quadrature
   at high resolution vs the ANALYTIC upper bound sum(pi r^2 L) (a union
   of cylinders cannot exceed the sum of member volumes — at small radii
   overlaps are O(r^3) so the union is within a few percent of the
   bound).  The reference's committed values sit ~20-25% BELOW even the
   overlap-free bound, which no union of full-length cylinders can do.
2. 3-geometry dataset cross-stats on the common radius grid.
3. Record-consistency: a GPR fitted with the reference's own pipeline
   settings on the reference's own committed 3-geometry dataset,
   evaluated at the reference's committed Cantilever_L_beam solution
   radii, vs the density its record logs — and the same GPR fitted on
   this repo's voxel dataset.  Measured 2026-08-17: ref-dataset GPR
   0.2215 vs logged 0.3000 (26% off — their runtime model cannot have
   been fit on the committed dataset); voxel-dataset GPR 0.3061 (2% from
   the logged value, consistent with their runtime model being fit on
   CAD-accurate data that was NOT committed).

Writes data/outputs/relative_densities/reference_density_comparison.json.
Run from the repo root; needs /root/reference checked out.
Runtime dominated by the two GPR fits (~15 min on the 1-vCPU host).
"""

import json
import sys
import warnings
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

from pylatticedso_tpu.catalog import get_beam_structure
from pylatticedso_tpu.io.reference_density import (
    default_reference_root, load_reference_density_dataset,
    load_reference_kriging)
from pylatticedso_tpu.opti.density import KrigingDensity, density_voxel

warnings.filterwarnings("ignore")

root = default_reference_root()
assert root is not None, "reference checkout not found"
out = {}

# 1. BCC one-radius table -------------------------------------------------
bcc = load_reference_density_dataset(root / "data/RelativeDensities_BCC.pkl")
tpl = get_beam_structure("BCC")
p1, p2 = tpl[:, :3], tpl[:, 3:]
lengths = np.linalg.norm(p2 - p1, axis=1)
rows = []
for (r,), v_ref in sorted(bcc.items()):
    if r > 0.1:
        continue
    v_upper = float(np.pi * r * r * lengths.sum())   # no-overlap bound
    v_vox = density_voxel(tpl, np.full(len(tpl), r), resolution=256)
    rows.append({"r": r, "reference_dataset": v_ref,
                 "voxel_res256": v_vox,
                 "analytic_upper_bound_sum_cyl": v_upper,
                 "ref_below_upper_bound_pct":
                     100.0 * (v_upper - v_ref) / v_upper})
out["bcc_single_radius"] = rows

# 1b. committed kriging_model_BCC vs its own dataset ----------------------
kd_ref = load_reference_kriging(root / "surrogate_model/kriging_model_BCC")
pred = np.array([float(kd_ref.mean(jnp.asarray(list(k)))) for k in sorted(bcc)])
vals = np.array([bcc[k] for k in sorted(bcc)])
out["kriging_model_BCC_vs_own_dataset"] = {
    "max_abs_err": float(np.abs(pred - vals).max()),
    "note": "their committed 1-D model does interpolate their committed "
            "1-D dataset; the inconsistency is dataset-vs-geometry, "
            "not model-vs-dataset",
}

# 2. 3-geometry dataset cross-stats --------------------------------------
ref3 = load_reference_density_dataset(
    root / "data/RelativeDensities_BCC_Hybrid1_Hybrid4.pkl")
import pickle
ours3 = pickle.load(open(
    "data/outputs/density_datasets/BCC_Hybrid1_Hybrid4_0.01_0.1_10.pkl", "rb"))
common = sorted(set(ref3) & set(ours3))
d = np.array([ours3[k] - ref3[k] for k in common])
out["three_geometry_dataset_diff"] = {
    "n_common": len(common), "n_reference": len(ref3), "n_ours": len(ours3),
    "max_abs": float(np.abs(d).max()), "mean_abs": float(np.abs(d).mean()),
    "median_abs": float(np.median(np.abs(d))),
    "reference_low_fraction": float((d > 0).mean()),
}

# 3. record consistency ---------------------------------------------------
rec = json.load(open(
    root.parents[1] / "outputs/optimization_data_files/"
    "Cantilever_L_beam_optimized_expe.json"))
theta = np.asarray(rec["solution"]["final_parameters"], float)
radii = rec["min_radius"] + (rec["max_radius"] - rec["min_radius"]) * theta
cells = radii.reshape(-1, 3)

print("fitting GPR on reference dataset ...")
kd1 = KrigingDensity.fit(ref3)
rho1 = float(np.mean([float(kd1.mean(jnp.asarray(c))) for c in cells]))
print("fitting GPR on voxel dataset ...")
kd2 = KrigingDensity.fit(ours3)
rho2 = float(np.mean([float(kd2.mean(jnp.asarray(c))) for c in cells]))
out["lbeam_record_consistency"] = {
    "record_logged_final_density":
        float(rec["solution"]["final_relative_density"]),
    "gpr_on_reference_committed_dataset": rho1,
    "gpr_on_voxel_dataset": rho2,
}

dst = Path("data/outputs/relative_densities/reference_density_comparison.json")
dst.parent.mkdir(parents=True, exist_ok=True)
dst.write_text(json.dumps(out, indent=1))
print(json.dumps(out, indent=1))
