"""Optimization layer: parameterizations, gradients, SLSQP, projected gradient."""

import numpy as np
import jax.numpy as jnp
import pytest

from pylatticedso_tpu import build_lattice
from pylatticedso_tpu.opti.density import (KrigingDensity, density_dataset,
                                           density_voxel)
from pylatticedso_tpu.opti.optimizer import OptimizationProblem
from pylatticedso_tpu.opti.parameterization import make_parameterization
from pylatticedso_tpu.catalog import get_beam_structure


def cantilever(nx=3, geom="BCC", r=0.05):
    return build_lattice({
        "geometry": {"cell_size": {"x": 1, "y": 1, "z": 1},
                     "number_of_cells": {"x": nx, "y": 1, "z": 1},
                     "radii": [r], "geom_types": [geom]},
        "simulation_parameters": {"enable": True, "material": "VeroClear"},
        "boundary_conditions": {
            "Displacement": {"Fixed": {"Surface": ["Xmin"],
                                       "DOF": ["X", "Y", "Z", "RX", "RY", "RZ"],
                                       "Value": [0, 0, 0, 0, 0, 0]}},
            "Force": {"Load": {"Surface": ["Xmax"], "DOF": ["Z"],
                               "Value": [-0.1]}}}})


# ---------------------------------------------------------------- density
def test_voxel_density_single_cylinder():
    b = np.array([[0.0, 0.5, 0.5, 1.0, 0.5, 0.5]])
    v = density_voxel(b, np.array([0.05]), resolution=128)
    assert abs(v - np.pi * 0.0025) < 5e-4


def test_voxel_density_union_less_than_sum():
    bcc = get_beam_structure("BCC")
    v = density_voxel(bcc, np.full(8, 0.05), resolution=64)
    naive = 8 * np.pi * 0.0025 * np.sqrt(3) / 2
    assert 0.5 * naive < v < naive  # overlap + clipping reduce volume


def test_kriging_fits_and_differentiates():
    grid = np.round(np.arange(0.01, 0.101, 0.01), 3)
    ds = density_dataset(["BCC"], grid, resolution=48)
    km = KrigingDensity.fit(ds)
    # interpolates training data closely
    for k, v in list(ds.items())[::3]:
        assert abs(float(km.mean(jnp.array(k))) - v) < 5e-3
    # gradient positive (density grows with radius) and matches FD
    val, grad = km.mean_and_grad(jnp.array([0.055]))
    h = 1e-5
    fd = (float(km.mean(jnp.array([0.055 + h])))
          - float(km.mean(jnp.array([0.055 - h])))) / (2 * h)
    assert grad[0] > 0
    np.testing.assert_allclose(float(grad[0]), fd, rtol=1e-5)


def test_kriging_save_load_roundtrip(tmp_path):
    ds = density_dataset(["BCC"], [0.02, 0.05, 0.08], resolution=32)
    km = KrigingDensity.fit(ds)
    p = tmp_path / "krig.npz"
    km.save(p)
    km2 = KrigingDensity.load(p)
    x = jnp.array([0.05])
    np.testing.assert_allclose(float(km.mean(x)), float(km2.mean(x)), rtol=1e-12)


# ---------------------------------------------------------- parameterization
def test_parameterizations_shapes():
    lat = cantilever(3)
    for kind, n in [({"type": "constant"}, 1),
                    ({"type": "unit_cell"}, 3),
                    ({"type": "linear", "direction": ["x"]}, 2)]:
        p = make_parameterization(lat, kind)
        assert p.n_params == n
        r = np.asarray(p.cell_radii(jnp.asarray(p.x0)))
        assert r.shape == (3, 1)
        assert np.all((r >= p.min_radius - 1e-12) & (r <= p.max_radius + 1e-12))


def test_linear_field_gradient_direction():
    lat = cantilever(4)
    p = make_parameterization(lat, {"type": "linear", "direction": ["x"]})
    theta = jnp.asarray(np.array([0.5, 0.5]))  # positive slope along x
    r = np.asarray(p.cell_radii(theta)).ravel()
    assert r[0] < r[-1]  # cells ordered along x


# ---------------------------------------------------------------- optimizer
def test_objective_gradient_matches_fd():
    lat = cantilever(2)
    prob = OptimizationProblem(lat, opt_params={"type": "unit_cell"},
                               constraints={}, cg_tol=1e-12, cg_maxiter=2000)
    x0 = prob.param.x0
    g = prob.gradient(x0)
    h = 1e-5
    for k in range(prob.param.n_params):
        e = np.zeros_like(x0); e[k] = h
        fd = (prob.objective(x0 + e) - prob.objective(x0 - e)) / (2 * h)
        np.testing.assert_allclose(g[k], fd, rtol=1e-4)


def test_slsqp_reduces_compliance_with_density_bound():
    lat = cantilever(3)
    prob = OptimizationProblem(lat, opt_params={"type": "unit_cell"},
                               constraints={"relative_density": {"value": 0.08,
                                                                 "mode": "upper"}},
                               cg_tol=1e-11, cg_maxiter=3000)
    v0 = prob.objective(prob.param.x0)
    res = prob.optimize_slsqp(max_iterations=25)
    assert res.success
    assert res.objective < v0
    assert res.density <= 0.08 + 1e-6
    # the clamped root cell carries the most material
    assert res.radii[0, 0] == res.radii.max()


def test_projected_gradient_reduces_compliance():
    lat = cantilever(2)
    prob = OptimizationProblem(lat, opt_params={"type": "unit_cell"},
                               constraints={}, cg_tol=1e-11, cg_maxiter=2000)
    v0 = prob.objective(prob.param.x0)
    res = prob.optimize_projected(max_iterations=10)
    assert res.objective < v0


def test_save_optimization_json(tmp_path):
    lat = cantilever(2)
    prob = OptimizationProblem(lat, opt_params={"type": "constant"},
                               constraints={}, cg_tol=1e-10, cg_maxiter=1000)
    res = prob.optimize_projected(max_iterations=3)
    out = tmp_path / "opt.json"
    prob.save_optimization_json(out, res)
    import json
    data = json.loads(out.read_text())
    assert "solution" in data and "history" in data
    assert data["solution"]["objective"] == pytest.approx(res.objective)


def test_displacement_objective():
    lat = cantilever(2)
    prob = OptimizationProblem(
        lat, objective_type="displacement", objective_function="max",
        objective_data={"Surface": ["Xmax"], "DOF": ["Z"]},
        opt_params={"type": "constant"}, constraints={},
        cg_tol=1e-11, cg_maxiter=2000)
    x0 = prob.param.x0
    g = prob.gradient(x0)
    h = 1e-5
    e = np.zeros_like(x0); e[0] = h
    fd = (prob.objective(x0 + e) - prob.objective(x0 - e)) / (2 * h)
    np.testing.assert_allclose(g[0], fd, rtol=1e-4)


def test_optimize_lattice_entrypoint():
    """Config-driven one-call API (simulation_type FEM)."""
    from pylatticedso_tpu.opti import optimize_lattice
    lat = build_lattice({
        "geometry": {"cell_size": {"x": 1, "y": 1, "z": 1},
                     "number_of_cells": {"x": 2, "y": 1, "z": 1},
                     "radii": [0.05], "geom_types": ["BCC"]},
        "simulation_parameters": {"enable": True, "material": "VeroClear"},
        "boundary_conditions": {
            "Displacement": {"Fixed": {"Surface": ["Xmin"],
                                       "DOF": ["X", "Y", "Z", "RX", "RY", "RZ"],
                                       "Value": [0, 0, 0, 0, 0, 0]}},
            "Force": {"Load": {"Surface": ["Xmax"], "DOF": ["Z"],
                               "Value": [-0.1]}}},
        "optimization_informations": {
            "objective_function": "min", "objective_type": "compliance",
            "max_iterations": 5, "simulation_type": "FEM",
            "enable_parameter_normalization": True,
            "optimization_parameters": {"type": "constant"},
            "constraints": {}}})
    problem, result = optimize_lattice(lat, cg_tol=1e-10, cg_maxiter=2000)
    assert result.objective <= problem.objective(problem.param.x0) + 1e-12


def test_density_dataset_resume_and_outliers(tmp_path):
    from pylatticedso_tpu.opti.density import density_dataset, filter_outliers
    p = tmp_path / "ds.pkl"
    ds = density_dataset(["BCC"], [0.02, 0.05], resolution=24,
                         resume_path=p, save_every=1)
    assert p.exists() and len(ds) == 2
    ds2 = density_dataset(["BCC"], [0.02, 0.05, 0.08], resolution=24,
                          resume_path=p)
    assert len(ds2) == 3
    for k, v in ds.items():
        assert ds2[k] == v  # resumed entries untouched
    corrupted = dict(ds2); corrupted[(0.06,)] = 5.0
    clean = filter_outliers(corrupted, n_neighbors=2)
    assert (0.06,) not in clean and len(clean) == 3


def test_project_density_restores_feasibility():
    """Uniform-shift feasibility restoration (optimize_slsqp returns only
    density-feasible points; SLSQP's own constraint tolerance lets its
    final iterate sit ~1e-5 over an active bound)."""
    lat = cantilever(3)
    prob = OptimizationProblem(lat, opt_params={"type": "unit_cell"},
                               constraints={"relative_density": {
                                   "value": 0.08, "mode": "upper"}},
                               cg_tol=1e-11, cg_maxiter=3000)
    # a deliberately over-budget point
    x = np.full(prob.param.n_params, 0.8)
    assert prob.density(x) > 0.08
    xp = prob.project_density(x)
    assert prob.density(xp) <= 0.08 + 1e-9
    # projection is a pure uniform shift (all components move equally,
    # up to bound clipping)
    d = x - xp
    np.testing.assert_allclose(d, d[0], rtol=0, atol=1e-12)
    # feasible points are untouched
    xf = np.full(prob.param.n_params, 0.05)
    np.testing.assert_array_equal(prob.project_density(xf), xf)


def test_slsqp_survives_nan_pockets():
    """NaN/Inf trial evaluations (surrogate-invalid corners) must be
    rejected by the line search and never poison the returned point."""
    lat = cantilever(3)
    prob = OptimizationProblem(lat, opt_params={"type": "unit_cell"},
                               constraints={"relative_density": {
                                   "value": 0.08, "mode": "upper"}},
                               cg_tol=1e-11, cg_maxiter=3000)
    inner = prob._value_and_grad

    def poisoned(x):
        v, g = inner(x)
        # a NaN pocket on part of the box the optimizer will try to enter
        bad = float(jnp.max(x)) > 0.62
        if bad:
            return jnp.float64(jnp.nan), jnp.full_like(jnp.asarray(x),
                                                       jnp.nan)
        return v, g

    prob._value_and_grad = poisoned
    res = prob.optimize_slsqp(max_iterations=15)
    assert np.isfinite(res.objective) and res.objective > 0
    assert res.density <= 0.08 + 1e-6
    assert np.max(res.theta) <= 0.62 + 1e-9
