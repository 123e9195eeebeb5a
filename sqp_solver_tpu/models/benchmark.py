"""Flagship benchmark problem family.

A batched smooth NLP sized to the north-star config (BASELINE.md: batched
SQP throughput at n <= 128): maximize Σx inside a per-problem sphere cap
with box bounds —

    min -Σx   s.t.   ||x||^2 <= r_b^2,   0 <= x <= 1

(an n-dimensional generalization of the reference's SimpleNLP fixture,
``tests/sqp_test.cpp:8-44``).  The optimum is x* = min(1, r_b/sqrt(n)) * 1,
giving a closed-form accuracy check for every batch element.  The sphere
radius r is the batched parameter, so the batch exercises heterogeneous
active sets and per-problem convergence masking.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from sqp_solver_tpu.sqp.types import NonlinearProblem

__all__ = ["sphere_cap_nlp_batch", "sphere_cap_solution"]


def sphere_cap_nlp_batch(
    batch: int, n: int, seed: int = 0, dtype=jnp.float32, r_range=(0.55, 0.9)
):
    """Returns (problem with batched leaves, x0 batch (B, n)).

    ``r_range`` scales the sphere radii relative to sqrt(n): the default
    keeps the sphere constraint active and away from the degenerate
    r ~ sqrt(n) boundary (where sphere and box are simultaneously active
    and the KKT point is ill-conditioned); pass (0.5, 1.2) for the
    stress distribution that includes degenerate instances.
    """
    rng = np.random.default_rng(seed)
    r = rng.uniform(r_range[0] * np.sqrt(n), r_range[1] * np.sqrt(n), size=(batch,))
    l = np.concatenate([np.zeros((batch, 1)), np.zeros((batch, n))], axis=1)
    u = np.concatenate([(r**2)[:, None], np.ones((batch, n))], axis=1)

    def objective(x, params):
        del params
        return -jnp.sum(x)

    def constraint(x, params):
        del params
        return jnp.concatenate([jnp.array([x @ x]), x])

    # layout-native linearizations (see NonlinearProblem docs): the kernel
    # tier consumes J in (m, n, B) — building it directly from (n, B)
    # vectors skips a ~67 MB minor-axis relayout per outer iteration at
    # n=128, B=1024.  c = [x'x; x] => J = [2x'; I], H_L = 2 lam_0 I.
    def constraint_linearized_t(x, params):
        del params
        B_, n_ = x.shape
        cv = jnp.concatenate([jnp.sum(x * x, axis=1, keepdims=True), x], axis=1)
        eye_t = jnp.broadcast_to(
            jnp.eye(n_, dtype=x.dtype)[:, :, None], (n_, n_, B_)
        )
        Jt = jnp.concatenate([2.0 * x.T[None, :, :], eye_t], axis=0)
        return cv, Jt

    def lagrangian_hessian_t(x, lam, params):
        del params
        B_, n_ = x.shape
        return jnp.eye(n_, dtype=x.dtype)[:, :, None] * (2.0 * lam[:, 0])[None, None, :]

    problem = NonlinearProblem(
        l=jnp.asarray(l, dtype=dtype),
        u=jnp.asarray(u, dtype=dtype),
        params=jnp.asarray(r, dtype=dtype),
        objective=objective,
        constraint=constraint,
        constraint_linearized_t=constraint_linearized_t,
        lagrangian_hessian_t=lagrangian_hessian_t,
    )
    x0 = jnp.asarray(
        np.full((batch, n), 0.25) + rng.uniform(0, 0.05, size=(batch, n)), dtype=dtype
    )
    return problem, x0


def sphere_cap_solution(problem) -> np.ndarray:
    """Closed-form optimum per batch element: min(1, r/sqrt(n)) * ones."""
    r = np.sqrt(np.asarray(problem.u[:, 0], np.float64))
    n = problem.l.shape[1] - 1
    scale = np.minimum(1.0, r / np.sqrt(n))
    return np.broadcast_to(scale[:, None], (r.shape[0], n)) * np.ones((1, n))
