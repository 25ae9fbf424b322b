from .density import (KrigingDensity, density_analytic, density_dataset,
                      density_voxel, filter_outliers)
from .optimizer import OptimizationProblem, OptimizationResult
from .parameterization import Parameterization, make_parameterization


def _density_violation(result, constraints) -> float:
    """Constraint violation of an OptimizationResult's density (0 when
    feasible or unconstrained)."""
    import math
    spec = constraints.get("relative_density")
    if spec is None or not math.isfinite(result.density):
        return 0.0
    d, target = result.density - spec["value"], 0.0
    mode = spec.get("mode", "upper")
    tol = spec.get("tolerance", 0.0)
    if mode == "upper":
        return max(d, target)
    if mode == "lower":
        return max(-d, target)
    if mode == "band":
        return max(abs(d) - tol, target)
    return abs(d)  # eq


def _better_result(r1, r2, constraints, feas_tol: float = 1e-6):
    """Pick the better of two OptimizationResults: feasible beats
    infeasible; among equals, lower objective wins (the internal objective
    is always minimized — max objectives are negated upstream)."""
    v1, v2 = (_density_violation(r, constraints) for r in (r1, r2))
    k1 = (v1 > feas_tol, v1 if v1 > feas_tol else r1.objective)
    k2 = (v2 > feas_tol, v2 if v2 > feas_tol else r2.objective)
    return r1 if k1 <= k2 else r2


def slsqp_polish(problem, result, max_iterations: int = 50,
                 ftol: float = 1e-6, max_restarts: int = 4):
    """Repeat free SLSQP polishes from the current best point until a
    restart stops improving the objective (keeping the better, feasible
    point each time).

    Why: a single SLSQP run can terminate prematurely when two consecutive
    iterates happen to satisfy its ftol test at a line-search fork.
    Measured on the L-beam record: the TPU and CPU-x64 trajectories were
    IDENTICAL (every eval within 1e-9 relative) for 120 evaluations, then
    forked on a single roundoff-level accept/reject flip — one branch
    polished to 4.547e-3, the other declared success 1% higher at
    4.590e-3.  Restarting resets SLSQP's internal state; from a true KKT
    point the restart terminates after one iteration, so the cost of
    robustness is one cheap extra SLSQP call.
    """
    import numpy as np
    best = result
    saved_x0 = problem.param.x0
    try:
        for _ in range(max_restarts):
            problem.param.x0 = np.asarray(best.theta)
            nxt = problem.optimize_slsqp(max_iterations=max_iterations,
                                         ftol=ftol)
            cand = _better_result(best, nxt, problem.constraints or {})
            improved = (cand is nxt) and (
                best.objective - nxt.objective
                > 10.0 * ftol * max(abs(best.objective), 1e-30))
            best = cand
            if not improved:
                break
    finally:
        # restart points must not leak into the problem's configured
        # initial design for later optimize runs
        problem.param.x0 = saved_x0
    return best


def optimize_lattice(lattice, max_iterations=None, driver: str = "slsqp",
                     **kwargs):
    """One-call design optimization from the config's
    ``optimization_informations`` block (LatticeOpti.optimize_lattice parity,
    lattice_opti.py:141-226).

    ``simulation_type: "DDM"`` routes through the surrogate-DDM problem;
    ``"FEM_STRUCTURED"`` (or ``"FEM_AUTO"`` when the lattice qualifies)
    uses the dense stencil operator — the TPU-fast path for uniform
    single-geometry lattices; anything else uses the full matrix-free
    operator.  Returns (problem, OptimizationResult).
    """
    cfg = lattice.config.optimization or {}
    sim_type = cfg.get("simulation_type", "FEM")
    common = dict(
        objective_type=cfg.get("objective_type", "compliance"),
        objective_function=cfg.get("objective_function", "min"),
        objective_data=cfg.get("objective_data"),
        opt_params=cfg.get("optimization_parameters", {"type": "constant"}),
        constraints=cfg.get("constraints", {}),
        normalized=cfg.get("enable_parameter_normalization", True),
    )
    common.update(kwargs)
    robust_drive = False
    if sim_type == "DDM":
        from .ddm_optimizer import DDMOptimizationProblem
        # the reference's DDM datasets are built on penalized cells
        # (its dataset script re-applies set_penalized_beams per radius
        # sample), so penalization defaults ON for the DDM route
        common.setdefault("penalization", True)
        problem = DDMOptimizationProblem(lattice, **common)
        # modern scipy's C SLSQP needs the feasible-start + move-limit
        # drive on density-constrained surrogate problems (see
        # OptimizationProblem.optimize_slsqp)
        robust_drive = bool(common.get("constraints"))
    elif sim_type in ("FEM_STRUCTURED", "FEM_AUTO"):
        from .structured_optimizer import StructuredOptimizationProblem
        try:
            problem = StructuredOptimizationProblem(lattice, **common)
        except ValueError:
            if sim_type == "FEM_STRUCTURED":
                raise
            problem = OptimizationProblem(lattice, **common)
    else:
        problem = OptimizationProblem(lattice, **common)
    iters = max_iterations if max_iterations is not None \
        else cfg.get("max_iterations", 20)
    if driver == "slsqp":
        if robust_drive:
            result1 = problem.optimize_slsqp(max_iterations=iters,
                                             ftol=cfg.get("ftol", 1e-6),
                                             feasible_start=True,
                                             move_limit=0.1)
            # restart-until-stationary free polish; keeps the better,
            # feasible point each round (the free polish can regress —
            # the very scipy>=1.16 pathology the move-limited phase
            # guards against)
            result = slsqp_polish(problem, result1, max_iterations=iters,
                                  ftol=cfg.get("ftol", 1e-6))
        else:
            result = problem.optimize_slsqp(max_iterations=iters)
    elif driver == "projected":
        result = problem.optimize_projected(max_iterations=iters)
    else:
        raise ValueError(f"unknown driver {driver!r}")
    return problem, result


__all__ = [
    "KrigingDensity", "density_analytic", "density_dataset", "density_voxel",
    "filter_outliers", "OptimizationProblem", "OptimizationResult",
    "Parameterization", "make_parameterization", "optimize_lattice",
    "slsqp_polish",
]
