from sqp_solver_tpu.ops.linear_solver import get_linear_solver, ldlt_factor, ldlt_solve

__all__ = ["get_linear_solver", "ldlt_factor", "ldlt_solve"]
