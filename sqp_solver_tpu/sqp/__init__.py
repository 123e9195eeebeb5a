from sqp_solver_tpu.sqp.api import SQP
from sqp_solver_tpu.sqp.bfgs import bfgs_update
from sqp_solver_tpu.sqp.diff import sqp_solve_diff
from sqp_solver_tpu.sqp.sequence import sqp_solve_sequence
from sqp_solver_tpu.sqp.solver import sqp_solve
from sqp_solver_tpu.sqp.types import (
    NonlinearProblem,
    SQPInfo,
    SQPResult,
    SQPSettings,
    SQPStatus,
)

__all__ = [
    "sqp_solve",
    "sqp_solve_diff",
    "sqp_solve_sequence",
    "SQP",
    "bfgs_update",
    "NonlinearProblem",
    "SQPSettings",
    "SQPStatus",
    "SQPInfo",
    "SQPResult",
]
