"""Structured (stencil-operator) optimization path vs the unstructured one."""

import numpy as np
import jax.numpy as jnp
import pytest

from pylatticedso_tpu import build_lattice
from pylatticedso_tpu.opti import optimize_lattice
from pylatticedso_tpu.opti.optimizer import OptimizationProblem
from pylatticedso_tpu.opti.structured_optimizer import (
    StructuredOptimizationProblem)


def cantilever(nx=3, ny=2, nz=2, geom="Octet", r=0.05, opti=None):
    cfg = {
        "geometry": {"cell_size": {"x": 1, "y": 1, "z": 1},
                     "number_of_cells": {"x": nx, "y": ny, "z": nz},
                     "radii": [r], "geom_types": [geom]},
        "boundary_conditions": {
            "Displacement": {"Fixed": {"Surface": ["Xmin"],
                                       "DOF": ["X", "Y", "Z", "RX", "RY", "RZ"],
                                       "Value": [0, 0, 0, 0, 0, 0]}},
            "Force": {"Load": {"Surface": ["Xmax"], "DOF": ["Z"],
                               "Value": [-0.1]}}}}
    if opti:
        cfg["optimization_informations"] = opti
    return build_lattice(cfg)


OPT = {"type": "unit_cell"}
CON = {"relative_density": {"value": 0.10, "mode": "upper"}}


def test_structured_matches_unstructured_value_and_grad():
    lat = cantilever()
    up = OptimizationProblem(lat, opt_params=OPT, constraints=CON)
    sp = StructuredOptimizationProblem(lat, opt_params=OPT, constraints=CON)
    x0 = jnp.asarray(np.asarray(sp.param.x0) * 0.9 + 0.03)
    vs, gs = sp._value_and_grad(x0)
    vu, gu = up._value_and_grad(x0)
    np.testing.assert_allclose(float(vs), float(vu), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gu), rtol=1e-8)


def test_structured_slsqp_runs_and_respects_density():
    lat = cantilever()
    sp = StructuredOptimizationProblem(lat, opt_params=OPT, constraints=CON)
    res = sp.optimize_slsqp(max_iterations=5)
    assert res.iterations >= 1
    assert res.density < 0.10 + 1e-2
    assert np.isfinite(res.objective) and res.objective > 0
    # radii stay within the parameterization bounds
    assert np.all(res.radii >= sp.param.min_radius - 1e-12)
    assert np.all(res.radii <= sp.param.max_radius + 1e-12)


@pytest.mark.parametrize("objective_type", ["displacement", "displacement_ratio"])
@pytest.mark.parametrize("objective_function", ["min", "max"])
def test_structured_matches_unstructured_displacement_objectives(
        objective_type, objective_function):
    """Sign parity for displacement objectives under min/max (the 'max'
    negation must apply only to 'displacement', and identically on both
    paths — guards the late-binding closure regression)."""
    lat = cantilever(nx=2, ny=1, nz=1, geom="BCC")
    obj_data = {"Surface": ["Xmax"], "DOF": ["Z"]}
    kw = dict(objective_type=objective_type,
              objective_function=objective_function,
              objective_data=obj_data, opt_params=OPT, constraints={})
    up = OptimizationProblem(lat, **kw)
    sp = StructuredOptimizationProblem(lat, **kw)
    x0 = jnp.asarray(np.asarray(sp.param.x0) * 0.9 + 0.03)
    vs, gs = sp._value_and_grad(x0)
    vu, gu = up._value_and_grad(x0)
    np.testing.assert_allclose(float(vs), float(vu), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gu), rtol=1e-7)
    if objective_type == "displacement":
        # under a -Z tip load the mean Z displacement is negative; 'min'
        # keeps it, 'max' negates (reference lattice_opti.py:608-613)
        assert (float(vs) < 0) == (objective_function == "min")


@pytest.mark.slow
def test_structured_hybrid_matches_unstructured_value_and_grad():
    """Hybrid (multi-geometry) lattices on the structured path: the
    per-geometry radius field must reproduce the unstructured FEM
    objective AND its gradient w.r.t. every per-cell-per-geometry
    parameter."""
    lat = build_lattice({
        "geometry": {"cell_size": {"x": 1, "y": 1, "z": 1},
                     "number_of_cells": {"x": 2, "y": 2, "z": 1},
                     "radii": [0.05, 0.04], "geom_types": ["BCC", "Hybrid1"]},
        "boundary_conditions": {
            "Displacement": {"Fixed": {"Surface": ["Xmin"],
                                       "DOF": ["X", "Y", "Z", "RX", "RY", "RZ"],
                                       "Value": [0, 0, 0, 0, 0, 0]}},
            "Force": {"Load": {"Surface": ["Xmax"], "DOF": ["Z"],
                               "Value": [-0.1]}}}})
    up = OptimizationProblem(lat, opt_params=OPT, constraints=CON)
    sp = StructuredOptimizationProblem(lat, opt_params=OPT, constraints=CON)
    assert sp.param.n_params == lat.num_cells * 2
    rng = np.random.default_rng(3)
    x0 = jnp.asarray(0.3 + 0.4 * rng.random(sp.param.n_params))
    vs, gs = sp._value_and_grad(x0)
    vu, gu = up._value_and_grad(x0)
    np.testing.assert_allclose(float(vs), float(vu), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gu), rtol=1e-7)


def test_optimize_lattice_routes_structured():
    opti = {"simulation_type": "FEM_AUTO",
            "objective_type": "compliance", "objective_function": "min",
            "optimization_parameters": {"type": "unit_cell"},
            "constraints": CON, "max_iterations": 3}
    lat = cantilever(nx=2, ny=1, nz=1, geom="BCC", opti=opti)
    problem, res = optimize_lattice(lat)
    assert isinstance(problem, StructuredOptimizationProblem)
    assert res.iterations >= 1


def test_structured_warped_matches_unstructured_value_and_grad():
    """Warped lattices (design.transforms) route onto the stencil path:
    the recorded pointwise maps rebuild the warp as per-instance fields
    and the objective/gradient match the general-graph operator."""
    from pylatticedso_tpu.design.transforms import (curve_lattice,
                                                    move_to_cylinder_form)
    lat = cantilever()
    # z-only maps (the x/y surface tags used by the BCs survive) whose z
    # offset varies with x and y: every strut length and frame changes
    curve_lattice(lat, center=(1.5, 1.0, 5.0), curvature_strength=0.02)
    move_to_cylinder_form(lat, radius=4.0)
    assert len(lat.node_transforms) == 2
    up = OptimizationProblem(lat, opt_params=OPT, constraints=CON)
    sp = StructuredOptimizationProblem(lat, opt_params=OPT, constraints=CON)
    assert sp._slat.node_transform is not None
    x0 = jnp.asarray(np.asarray(sp.param.x0) * 0.9 + 0.03)
    vs, gs = sp._value_and_grad(x0)
    vu, gu = up._value_and_grad(x0)
    np.testing.assert_allclose(float(vs), float(vu), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gu), rtol=1e-7)


def test_structured_declines_seam_merged_cylinder():
    """The cylindrical seam merge changes topology: the structured path
    must raise (FEM_AUTO then falls back to the general operator)."""
    from pylatticedso_tpu.design.transforms import cylindrical_transform
    lat = cantilever(nx=2, ny=2, nz=1, geom="BCC")
    n_pre = lat.num_nodes
    cylindrical_transform(lat, radius=2.0 / np.pi)
    assert lat.node_transforms is None      # poisoned by the seam merge
    assert lat.num_nodes < n_pre            # the seam actually merged
    # membership maps were rebuilt under the merge: surface BC
    # resolution still works on the merged cylinder
    assert lat.find_nodes_on_surface(["Zmin"]).size > 0
    nids = lat.cell_node_idx
    assert nids.min() >= 0 and nids.max() < lat.num_nodes
    with pytest.raises(ValueError):
        StructuredOptimizationProblem(lat, opt_params=OPT, constraints=CON)
