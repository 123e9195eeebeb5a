from sqp_solver_tpu.utils.precision import hdot, hmat
from sqp_solver_tpu.utils.debug import is_psd, print_qp

__all__ = ["hdot", "hmat", "is_psd", "print_qp"]
