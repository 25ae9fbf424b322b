"""Pin down the reference's exact runtime Kriging variant.

scripts/reference_kriging_replica.py showed volumes_lattice.csv is the
source of the reference's runtime density model (all six records 0.1-0.5%
vs the committed pkl's ~28%).  The residual suggests a slightly different
training recipe; this sweep tries the 2x2x2 of
  {variation filter on/off} x {80% train split / full fit} x
  {max_vol 0.6 window / no window}
and scores each at the six records' logged densities.  The constant
records are exact fixed points of the runtime model (SLSQP active
constraint): rho(0.0650580,x3)=0.2999999, rho(0.0442350,x3)=0.1499999.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp
import warnings

warnings.filterwarnings("ignore")

from pylatticedso_tpu.opti.density import KrigingDensity
from scripts.reference_kriging_replica import (
    REF, OUT, load_csv_dataset, reference_filters, record_cells,
    mean_density)


def fit(ds, split, random_state=42):
    from sklearn.gaussian_process import GaussianProcessRegressor
    from sklearn.gaussian_process.kernels import RBF, ConstantKernel
    from sklearn.model_selection import train_test_split
    from sklearn.pipeline import Pipeline
    from sklearn.preprocessing import StandardScaler

    X = np.array(list(ds.keys()), float)
    y = np.array(list(ds.values()), float)
    if split:
        X, _, y, _ = train_test_split(X, y, test_size=0.2,
                                      random_state=random_state)
    pipe = Pipeline([
        ("x_scaler", StandardScaler()),
        ("gpr", GaussianProcessRegressor(
            kernel=ConstantKernel(1.0, (1e-3, 1e3)) * RBF(
                length_scale=[1.0] * X.shape[1],
                length_scale_bounds=(1e-3, 1e3)),
            alpha=1e-10, n_restarts_optimizer=10, normalize_y=True,
            random_state=random_state)),
    ])
    pipe.fit(X, y)
    return pipe


RECORDS = {
    "ref_Lbeam": (REF / "optimization_data_files/Cantilever_L_beam_optimized_expe.json"),
    "ref_inversion": (REF / "optimization_data_files/Inversion_mechanism_optimized_expe.json"),
    "ref_tpb": (REF / "optimization_data_files/Three_point_bending_optimized_expe.json"),
    "ref_Lbeam_const": (REF / "optimization_data_files/Cantilever_L_beam_constant_expe.json"),
    "ref_tpb_const": (REF / "optimization_data_files/Three_point_bending_constant_expe.json"),
}


def main():
    raw = load_csv_dataset(REF / "relative_densities/data/volumes_lattice.csv")
    results = []
    for varfilt in (True, False):
        for window in (True, False):
            ds = raw
            if window:
                ds = {k: v for k, v in ds.items() if 0.0 <= v <= 0.6}
            if varfilt:
                ds = reference_filters(ds, min_vol=-np.inf, max_vol=np.inf)
            for split in (True, False):
                pipe = fit(ds, split)
                kd = KrigingDensity.from_sklearn(pipe)
                row = {"variation_filter": varfilt, "vol_window": window,
                       "train_split": split, "n_train": len(pipe[1].X_train_),
                       "kernel": str(pipe.named_steps["gpr"].kernel_)}
                errs = []
                for label, path in RECORDS.items():
                    cells, rho_logged, _ = record_cells(path)
                    rho = mean_density(kd, cells)
                    row[label] = rho
                    errs.append(abs(rho - rho_logged))
                row["max_abs_err"] = float(max(errs))
                results.append(row)
                print(json.dumps(row), flush=True)
                tag = (f"{'vf' if varfilt else 'novf'}_"
                       f"{'win' if window else 'nowin'}_"
                       f"{'split' if split else 'full'}")
                kd.save(OUT / f"kriging_variant_{tag}.npz")
    results.sort(key=lambda r: r["max_abs_err"])
    (OUT / "reference_kriging_variants.json").write_text(
        json.dumps(results, indent=1))
    print("BEST:", json.dumps(results[0]), flush=True)


if __name__ == "__main__":
    main()
