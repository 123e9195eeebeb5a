"""Shared numeric fixtures, transcribed from the reference test suite.

These numbers are the conformance spec (SURVEY.md §4): the same problems
and expected optima as the reference's GTest fixtures.
"""

import jax.numpy as jnp
import numpy as np

from sqp_solver_tpu.qp.types import QuadraticProblem

INF = float("inf")


def simple_qp(dtype=jnp.float64) -> QuadraticProblem:
    """Canonical 2-var/3-constraint QP (reference tests/qp_solver_test.cpp:12-41).
    Optimum x* = [0.3, 0.7]."""
    return QuadraticProblem(
        P=jnp.array([[4.0, 1.0], [1.0, 2.0]], dtype=dtype),
        q=jnp.array([1.0, 1.0], dtype=dtype),
        A=jnp.array([[1.0, 1.0], [1.0, 0.0], [0.0, 1.0]], dtype=dtype),
        l=jnp.array([1.0, 0.0, 0.0], dtype=dtype),
        u=jnp.array([1.0, 0.7, 0.7], dtype=dtype),
    )


SIMPLE_QP_SOLUTION = np.array([0.3, 0.7])
