from sqp_solver_tpu.runtime.native import (
    native_available,
    native_qp_solve,
    native_qp_solve_batch,
)

__all__ = ["native_available", "native_qp_solve", "native_qp_solve_batch"]
