"""Compliance minimization under a relative-density bound (SLSQP driver)."""

import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[2]))  # repo root


from pathlib import Path

from pylatticedso_tpu import build_lattice
from pylatticedso_tpu.opti.optimizer import OptimizationProblem
from pylatticedso_tpu.plotting import plot_convergence

out = Path("data/outputs/optimization_data_files")
out.mkdir(parents=True, exist_ok=True)

lattice = build_lattice("cantilever_compliance")
cfg = lattice.config.optimization

problem = OptimizationProblem(
    lattice,
    opt_params=cfg["optimization_parameters"],
    constraints=cfg["constraints"],
    cg_tol=1e-11, cg_maxiter=4000,
)
print(f"{problem.param.n_params} design parameters "
      f"({problem.param.kind} parameterization)")
print(f"initial compliance: {problem.objective(problem.param.x0):.6e}, "
      f"density {problem.density(problem.param.x0):.4f}")

result = problem.optimize_slsqp(max_iterations=cfg.get("max_iterations", 20))
print(f"final   compliance: {result.objective:.6e}, density {result.density:.4f} "
      f"({result.iterations} iterations, success={result.success})")
print("per-cell radii:", result.radii.ravel().round(4))

problem.save_optimization_json(out / "cantilever_compliance.json", result)
plot_convergence(result.history, save_path=out / "cantilever_convergence.png")
