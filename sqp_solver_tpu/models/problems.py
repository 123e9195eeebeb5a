"""Reference problem fixtures as first-class models.

Each constructor cites the reference test it reproduces; the expected
optimum ships alongside as ``*_SOLUTION`` for conformance checks.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from sqp_solver_tpu.qp.types import QuadraticProblem
from sqp_solver_tpu.sqp.types import NonlinearProblem

__all__ = [
    "simple_qp",
    "SIMPLE_QP_SOLUTION",
    "simple_nlp",
    "SIMPLE_NLP_SOLUTION",
    "simple_qp_nlp",
    "constrained_rosenbrock_2d",
    "CONSTRAINED_ROSENBROCK_2D_SOLUTION",
    "rosenbrock",
    "rosenbrock_box",
    "simple_nlp2",
    "SIMPLE_NLP2_SOLUTION",
]

INF = float("inf")

SIMPLE_QP_SOLUTION = np.array([0.3, 0.7])
SIMPLE_NLP_SOLUTION = np.array([1.0, 1.0])
CONSTRAINED_ROSENBROCK_2D_SOLUTION = np.array([0.707106781, 0.707106781])
SIMPLE_NLP2_SOLUTION = np.array([-1.0, -1.0])


def simple_qp(dtype=jnp.float64) -> QuadraticProblem:
    """2-var/3-constraint QP, optimum [0.3, 0.7]
    (reference tests/qp_solver_test.cpp:12-41)."""
    return QuadraticProblem(
        P=jnp.array([[4.0, 1.0], [1.0, 2.0]], dtype=dtype),
        q=jnp.array([1.0, 1.0], dtype=dtype),
        A=jnp.array([[1.0, 1.0], [1.0, 0.0], [0.0, 1.0]], dtype=dtype),
        l=jnp.array([1.0, 0.0, 0.0], dtype=dtype),
        u=jnp.array([1.0, 0.7, 0.7], dtype=dtype),
    )


def simple_nlp(dtype=jnp.float64) -> NonlinearProblem:
    """min -(x0+x1) s.t. 1 <= ||x||^2 <= 2, x >= 0; optimum [1, 1]
    (reference tests/sqp_test.cpp:8-44)."""
    return NonlinearProblem(
        l=jnp.array([1.0, 0.0, 0.0], dtype=dtype),
        u=jnp.array([2.0, INF, INF], dtype=dtype),
        objective=lambda x: -jnp.sum(x),
        constraint=lambda x: jnp.concatenate([jnp.array([x @ x]), x]),
    )


def simple_qp_nlp(dtype=jnp.float64) -> NonlinearProblem:
    """The SimpleQP posed as an NLP with hand-coded linearizations
    (reference tests/sqp_test.cpp:92-124); optimum [0.3, 0.7]."""
    P = jnp.array([[4.0, 1.0], [1.0, 2.0]], dtype=dtype)
    q = jnp.array([1.0, 1.0], dtype=dtype)
    eye2 = jnp.eye(2, dtype=dtype)

    def objective(x):
        return 0.5 * x @ (P @ x) + q @ x

    def objective_linearized(x):
        return objective(x), P @ x + q

    def constraint(x):
        return jnp.concatenate([jnp.array([jnp.sum(x)]), x])

    def constraint_linearized(x):
        J = jnp.concatenate([jnp.ones((1, 2), dtype=dtype), eye2], axis=0)
        return constraint(x), J

    return NonlinearProblem(
        l=jnp.array([1.0, 0.0, 0.0], dtype=dtype),
        u=jnp.array([1.0, 0.7, 0.7], dtype=dtype),
        objective=objective,
        constraint=constraint,
        objective_linearized=objective_linearized,
        constraint_linearized=constraint_linearized,
    )


def rosenbrock(x, a=1.0, b=100.0):
    """n-D Rosenbrock (reference tests/sqp_test_autodiff.cpp:61-71)."""
    return jnp.sum((a - x[:-1]) ** 2 + b * (x[1:] - x[:-1] ** 2) ** 2)


def constrained_rosenbrock_2d(dtype=jnp.float64) -> NonlinearProblem:
    """2-D Rosenbrock s.t. x <= y and ||x||^2 == 1; optimum
    [sqrt(2)/2, sqrt(2)/2] (reference tests/sqp_test_autodiff.cpp:73-99)."""
    return NonlinearProblem(
        l=jnp.array([-INF, 1.0], dtype=dtype),
        u=jnp.array([0.0, 1.0], dtype=dtype),
        objective=rosenbrock,
        constraint=lambda x: jnp.array([x[0] - x[1], x @ x]),
    )


def rosenbrock_box(n: int, dtype=jnp.float64) -> NonlinearProblem:
    """n-D Rosenbrock with box constraints 0 <= x <= 1; optimum 1-vector
    (reference tests/sqp_test_autodiff.cpp:122-144)."""
    return NonlinearProblem(
        l=jnp.zeros((n,), dtype=dtype),
        u=jnp.ones((n,), dtype=dtype),
        objective=rosenbrock,
        constraint=lambda x: x,
    )


def simple_nlp2(dtype=jnp.float64) -> NonlinearProblem:
    """Nocedal & Wright Example 12.1: min x0+x1 s.t. ||x||^2 == 2; optimum
    [-1, -1] (reference tests/sqp_test_autodiff.cpp:244-265)."""
    return NonlinearProblem(
        l=jnp.array([2.0], dtype=dtype),
        u=jnp.array([2.0], dtype=dtype),
        objective=lambda x: jnp.sum(x),
        constraint=lambda x: jnp.array([x @ x]),
    )
