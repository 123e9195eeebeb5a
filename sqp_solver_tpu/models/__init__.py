"""Canonical problem families.

The reference keeps its problems test-side (L3 layer, SURVEY.md §1); here
they are a first-class model library so users, tests, and benchmarks share
one definition.  Every model reproduces a reference fixture (cited in its
docstring) and is a plain :class:`NonlinearProblem` /
:class:`QuadraticProblem` — jit/vmap-ready.
"""

from sqp_solver_tpu.models.mpc import mpc_qp_batch, random_qp_batch
from sqp_solver_tpu.models.problems import (
    constrained_rosenbrock_2d,
    rosenbrock_box,
    simple_nlp,
    simple_nlp2,
    simple_qp,
    simple_qp_nlp,
)

__all__ = [
    "simple_qp",
    "simple_nlp",
    "simple_qp_nlp",
    "constrained_rosenbrock_2d",
    "rosenbrock_box",
    "simple_nlp2",
    "mpc_qp_batch",
    "random_qp_batch",
]
