from sqp_solver_tpu.qp.admm import qp_solve
from sqp_solver_tpu.qp.api import QPSolver
from sqp_solver_tpu.qp.diff import qp_solve_diff
from sqp_solver_tpu.qp.classify import (
    EQUALITY_CONSTRAINT,
    INEQUALITY_CONSTRAINT,
    LOOSE_BOUNDS,
    constr_type_init,
    rho_vec_from_type,
)
from sqp_solver_tpu.qp.scaling import Scaling, ruiz_equilibrate
from sqp_solver_tpu.qp.sequence import qp_solve_sequence
from sqp_solver_tpu.qp.types import (
    QPInfo,
    QPResult,
    QPSettings,
    QPState,
    QPStatus,
    QuadraticProblem,
)

__all__ = [
    "qp_solve",
    "qp_solve_diff",
    "qp_solve_sequence",
    "QPSolver",
    "QuadraticProblem",
    "QPSettings",
    "QPStatus",
    "QPInfo",
    "QPState",
    "QPResult",
    "constr_type_init",
    "rho_vec_from_type",
    "ruiz_equilibrate",
    "Scaling",
    "INEQUALITY_CONSTRAINT",
    "EQUALITY_CONSTRAINT",
    "LOOSE_BOUNDS",
]
