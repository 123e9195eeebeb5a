"""Stateful ``SQP`` wrapper mirroring the reference class API
(``include/solvers/sqp.hpp:82-115``: ``solve`` / ``primal_solution`` /
``dual_solution`` / ``settings`` / ``info``).  The functional core is
:func:`sqp_solver_tpu.sqp.solver.sqp_solve`."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from sqp_solver_tpu.sqp.solver import sqp_solve
from sqp_solver_tpu.sqp.types import NonlinearProblem, SQPInfo, SQPSettings

__all__ = ["SQP"]


class SQP:
    def __init__(self, settings: Optional[SQPSettings] = None):
        self._settings = settings or SQPSettings()
        self._result = None

    @property
    def settings(self) -> SQPSettings:
        return self._settings

    @settings.setter
    def settings(self, s: SQPSettings) -> None:
        self._settings = s

    def solve(
        self,
        problem: NonlinearProblem,
        x0: Optional[jax.Array] = None,
        lam0: Optional[jax.Array] = None,
        num_var: Optional[int] = None,
    ):
        """Solve; ``x0=None`` zero-initializes (reference overload at
        ``src/sqp.cpp:34``; requires ``num_var`` to size x)."""
        if x0 is None:
            if num_var is None:
                raise ValueError("x0=None requires num_var")
            x0 = jnp.zeros((num_var,), problem.l.dtype)
        self._result = jax.jit(sqp_solve)(problem, x0, lam0, self._settings)
        return self._result

    def primal_solution(self) -> jax.Array:
        return self._result.x

    def dual_solution(self) -> jax.Array:
        return self._result.lam

    @property
    def info(self) -> SQPInfo:
        return self._result.info
