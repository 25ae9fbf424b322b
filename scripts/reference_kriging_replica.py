"""Reconstruct the reference's RUNTIME density model from its committed
artifacts and validate it against every committed optimization record.

Finding chain (settles VERDICT r3 "Missing #1" apples-to-apples):

* The reference optimizer prices density with a joblib Kriging model
  named ``kriging_model_BCC_Hybrid1_Hybrid4`` (lattice_opti.py:1652-1674)
  which is NOT committed; all six committed records are 3-geometry
  BCC+Hybrid1+Hybrid4 problems.
* Two candidate datasets ARE committed under
  data/outputs/relative_densities/data/:
  ``RelativeDensities_BCC_Hybrid1_Hybrid4.pkl`` (1180 pts) and
  ``volumes_lattice.csv`` (1330 pts, converted by csv_to_dataset,
  surrogate_model_relative_densities.py:244-282).  They DISAGREE
  (mean +0.089, max +0.95 at common keys).
* The two *constant* records pin the runtime model at two points:
  rho(0.0650580,x3) = 0.2999999 and rho(0.0442350,x3) = 0.1499999
  (theta 0.6117556 / 0.3803889, r = 0.01 + 0.09*theta).  Linear
  interpolation along the equal-radius diagonal gives 0.30016 / 0.15130
  for the CSV and 0.20955 / 0.13094 for the pkl: the CSV is the source
  of their runtime model; the committed pkl cannot be.

This script re-fits the reference's EXACT training pipeline
(evaluate_kriging_from_pickle, surrogate_model_relative_densities.py:
524-660: load-dataset filters min_vol=0/max_vol=0.6 + KDTree variation
filter d=0.02/dv=0.1 (:465-517,191-241), train_test_split(test_size=0.2,
random_state=42), Pipeline(StandardScaler -> GPR(C(1,(1e-3,1e3)) *
RBF([1]*3,(1e-3,1e3)), alpha=1e-10, n_restarts_optimizer=10,
normalize_y=True, random_state=42))) on BOTH candidate datasets, then
evaluates each fitted model at all six reference record solutions and at
this repo's records, reporting predicted vs logged densities.

Outputs:
  data/outputs/relative_densities/replica/kriging_replica_csv.npz   (KrigingDensity)
  data/outputs/relative_densities/replica/kriging_replica_pkl.npz
  data/outputs/relative_densities/replica/reference_kriging_replica.json

CPU job (~minutes for the two GPR fits on the 1-vCPU host).
"""

import csv as _csv
import json
import pickle
import sys
import warnings
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

from pylatticedso_tpu.opti.density import KrigingDensity

warnings.filterwarnings("ignore")

REF = Path("/root/reference/data/outputs")
OUT = Path("data/outputs/relative_densities/replica")
OUT.mkdir(parents=True, exist_ok=True)


def load_csv_dataset(path):
    """volumes_lattice.csv -> {(r1,r2,r3): density} (csv_to_dataset,
    surrogate_model_relative_densities.py:244-282)."""
    ds = {}
    with open(path) as fh:
        for row in _csv.DictReader(fh):
            k = (float(row["Radius1"]), float(row["Radius2"]),
                 float(row["Radius3"]))
            ds[k] = float(row["Volume"])
    return ds


def load_pkl_dataset(path):
    with open(path, "rb") as fh:
        raw = pickle.load(fh)
    return {tuple(float(c) for c in k): float(v) for k, v in raw.items()}


def reference_filters(ds, min_vol=0.0, max_vol=0.6,
                      distance_threshold=0.02, variation_threshold=0.1):
    """The reference's load_dataset volume window + KDTree variation
    filter (surrogate_model_relative_densities.py:228-241,465-517)."""
    ds = {k: v for k, v in ds.items() if min_vol <= v <= max_vol}
    from scipy.spatial import KDTree
    radii = np.array(list(ds.keys()), float)
    vols = np.array(list(ds.values()), float)
    tree = KDTree(radii)
    drop = set()
    for i, p in enumerate(radii):
        for j in tree.query_ball_point(p, distance_threshold):
            if i != j and abs(vols[i] - vols[j]) > variation_threshold:
                drop.add(i)
                drop.add(j)
    keep = [i for i in range(len(radii)) if i not in drop]
    return {tuple(radii[i]): vols[i] for i in keep}


def reference_fit(ds, random_state=42):
    """The reference's exact GPR training call
    (surrogate_model_relative_densities.py:598-617): NOTE it fits on an
    80% train split, not the full dataset."""
    from sklearn.gaussian_process import GaussianProcessRegressor
    from sklearn.gaussian_process.kernels import RBF, ConstantKernel
    from sklearn.model_selection import train_test_split
    from sklearn.pipeline import Pipeline
    from sklearn.preprocessing import StandardScaler

    X = np.array(list(ds.keys()), float)
    y = np.array(list(ds.values()), float)
    X_train, _, y_train, _ = train_test_split(
        X, y, test_size=0.2, random_state=random_state)
    kernel = ConstantKernel(1.0, (1e-3, 1e3)) * RBF(
        length_scale=X.shape[1] * [1.0], length_scale_bounds=(1e-3, 1e3))
    pipe = Pipeline([
        ("x_scaler", StandardScaler()),
        ("gpr", GaussianProcessRegressor(
            kernel=kernel, alpha=1e-10, n_restarts_optimizer=10,
            normalize_y=True, random_state=random_state)),
    ])
    pipe.fit(X_train, y_train)
    return pipe


def record_cells(path):
    """Record solution -> per-cell radii [n_cells, 3] + logged values."""
    rec = json.loads(Path(path).read_text())
    sol = rec["solution"]
    theta = np.asarray(sol.get("final_parameters", sol.get("parameters")),
                       float)
    lo = float(rec.get("min_radius", 0.01))
    hi = float(rec.get("max_radius", 0.1))
    radii = lo + (hi - lo) * theta
    if radii.size == 1:
        radii = np.repeat(radii, 3)
    cells = radii.reshape(-1, 3)
    logged_rho = sol.get("final_relative_density",
                         sol.get("relative_density"))
    logged_obj = sol.get("final_objective", sol.get("objective"))
    return cells, float(logged_rho), float(logged_obj)


def mean_density(kd, cells):
    f = jax.jit(jax.vmap(kd.mean))
    return float(np.mean(np.asarray(f(jnp.asarray(cells)))))


def main():
    out = {}
    csv_ds = load_csv_dataset(REF / "relative_densities/data/volumes_lattice.csv")
    pkl_ds = load_pkl_dataset(
        REF / "relative_densities/data/RelativeDensities_BCC_Hybrid1_Hybrid4.pkl")

    models = {}
    for name, ds in (("csv", csv_ds), ("pkl", pkl_ds)):
        filt = reference_filters(ds)
        print(f"{name}: {len(ds)} -> {len(filt)} after reference filters",
              flush=True)
        pipe = reference_fit(filt)
        kd = KrigingDensity.from_sklearn(pipe)
        kd.save(OUT / f"kriging_replica_{name}.npz")
        models[name] = kd
        out[f"{name}_n_raw"] = len(ds)
        out[f"{name}_n_filtered"] = len(filt)
        out[f"{name}_kernel"] = str(pipe.named_steps["gpr"].kernel_)
        print(f"  kernel: {out[f'{name}_kernel']}", flush=True)

    records = {
        "ref_Lbeam": REF / "optimization_data_files/Cantilever_L_beam_optimized_expe.json",
        "ref_inversion": REF / "optimization_data_files/Inversion_mechanism_optimized_expe.json",
        "ref_tpb": REF / "optimization_data_files/Three_point_bending_optimized_expe.json",
        "ref_Lbeam_const": REF / "optimization_data_files/Cantilever_L_beam_constant_expe.json",
        "ref_inversion_const": REF / "optimization_data_files/Inversion_mechanism_constant_expe.json",
        "ref_tpb_const": REF / "optimization_data_files/Three_point_bending_constant_expe.json",
        "our_Lbeam": "data/outputs/optimization_data_files/Cantilever_L_beam_optimized.json",
        "our_inversion": "data/outputs/optimization_data_files/Inversion_mechanism_optimized.json",
        "our_tpb": "data/outputs/optimization_data_files/Three_point_bending_optimized.json",
        "our_inversion_const": "data/outputs/optimization_data_files/Inversion_mechanism_constant.json",
        "our_tpb_const": "data/outputs/optimization_data_files/Three_point_bending_constant.json",
    }
    table = {}
    for label, path in records.items():
        cells, rho_logged, obj = record_cells(path)
        row = {"logged_rho": rho_logged, "logged_objective": obj,
               "n_cells": len(cells)}
        for name, kd in models.items():
            row[f"rho_{name}_replica"] = mean_density(kd, cells)
        table[label] = row
        print(label, json.dumps(row), flush=True)
    out["records"] = table

    (OUT / "reference_kriging_replica.json").write_text(
        json.dumps(out, indent=1))
    print("written", OUT / "reference_kriging_replica.json", flush=True)


if __name__ == "__main__":
    main()
