"""Stateful ``QPSolver`` wrapper mirroring the reference class API.

The functional core is :func:`sqp_solver_tpu.qp.admm.qp_solve`; this thin
object-oriented shell reproduces the reference workflow
(``include/solvers/qp.hpp:147-169``: ``setup`` / ``update_qp`` / ``solve`` /
``primal_solution`` / ``dual_solution`` / ``settings`` / ``info``) so users
migrating from the C++ library keep their call sites.  Jitted executables
are cached per (shape, dtype, settings).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sqp_solver_tpu.qp.admm import qp_solve
from sqp_solver_tpu.qp.types import QPInfo, QPSettings, QPState, QPStatus, QuadraticProblem

__all__ = ["QPSolver"]

_jit_qp_solve = jax.jit(qp_solve, static_argnames=())


class QPSolver:
    """Drop-in style equivalent of the reference ``qp_solver::QPSolver``.

    Unlike the reference, ``warm_start`` works as documented: with
    ``settings.warm_start=True`` consecutive ``solve`` calls reuse the
    previous (x, z, y); with ``False`` they genuinely reset (the reference's
    reset is a no-op bug, ``src/qp.cpp:78-82`` — we implement the intended
    semantics).
    """

    def __init__(self, settings: Optional[QPSettings] = None):
        self._settings = settings or QPSettings()
        self._qp: Optional[QuadraticProblem] = None
        self._state: Optional[QPState] = None
        self._result = None
        self._status = QPStatus.UNINITIALIZED

    # -- reference-API surface -------------------------------------------
    @property
    def settings(self) -> QPSettings:
        return self._settings

    @settings.setter
    def settings(self, s: QPSettings) -> None:
        self._settings = s

    def setup(self, qp: QuadraticProblem) -> None:
        """Bind a problem; zero-initialize the iterates."""
        self._qp = qp
        self._state = QPState.zeros(qp.n, qp.m, qp.P.dtype)
        self._status = QPStatus.UNSOLVED
        self._result = None

    def update_qp(self, qp: QuadraticProblem) -> None:
        """Re-bind a same-shape problem, keeping iterates (cheap re-solve
        path, reference ``src/qp.cpp:47-62``).  The jitted executable is
        reused — only device data changes."""
        if self._qp is None:
            raise RuntimeError("call setup() first")
        if (qp.n, qp.m) != (self._qp.n, self._qp.m):
            raise ValueError("update_qp requires the same problem dimensions")
        self._qp = qp
        self._status = QPStatus.UNSOLVED

    def solve(self, qp: Optional[QuadraticProblem] = None):
        if qp is not None:
            if self._qp is None or (qp.n, qp.m) != (self._qp.n, self._qp.m):
                self.setup(qp)
            else:
                self._qp = qp
        if self._qp is None:
            raise RuntimeError("call setup() first")
        if self._status == QPStatus.UNINITIALIZED:
            return self._result

        if self._settings.warm_start and self._result is not None:
            state = self._result.state
        else:
            state = QPState.zeros(self._qp.n, self._qp.m, self._qp.P.dtype)

        self._result = _jit_qp_solve(self._qp, self._settings, state)
        self._status = QPStatus(int(self._result.info.status))
        return self._result

    def primal_solution(self) -> jax.Array:
        return self._result.x

    def dual_solution(self) -> jax.Array:
        return self._result.y

    @property
    def info(self) -> QPInfo:
        return self._result.info

    # -- unit-test hook, parity with reference static method --------------
    @staticmethod
    def constr_type_init(l, u) -> np.ndarray:
        from sqp_solver_tpu.qp.classify import constr_type_init

        return np.asarray(constr_type_init(jnp.asarray(l), jnp.asarray(u)))
