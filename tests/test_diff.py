"""Differentiable QP layer: implicit-function-theorem gradients vs
finite differences on every problem leaf."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sqp_solver_tpu.models.mpc import random_qp_batch
from sqp_solver_tpu.qp import QPSettings, QuadraticProblem, qp_solve_diff

# tight forward solve so the finite-difference baseline is clean
S = QPSettings(eps_abs=1e-10, eps_rel=1e-10, max_iter=20000,
               adaptive_rho=True, adaptive_rho_interval=50, polish=True)


def _loss(qp, gvec):
    x = qp_solve_diff(qp, S)
    return jnp.sum(gvec * x)


def test_qp_grads_match_finite_differences():
    qp = random_qp_batch(batch=3, n=6, m=9, seed=5, dtype=jnp.float64)
    key = jax.random.PRNGKey(0)
    gvec = jax.random.normal(key, qp.q.shape, jnp.float64)

    grads = jax.grad(lambda q_: _loss(q_, gvec))(qp)

    eps = 1e-6
    rng = np.random.default_rng(1)
    for leaf in ("P", "q", "A", "l", "u"):
        base = np.asarray(getattr(qp, leaf))
        # probe 5 random coordinates per leaf (full FD would be slow)
        flat_idx = rng.choice(base.size, size=min(5, base.size), replace=False)
        for fi in flat_idx:
            idx = np.unravel_index(fi, base.shape)
            # skip rows whose bound is infinite (gradient trivially 0,
            # and FD on inf is meaningless)
            if leaf in ("l", "u") and not np.isfinite(base[idx]):
                continue
            pert = np.zeros_like(base)
            pert[idx] = eps
            if leaf == "P":
                # keep P symmetric under perturbation, like the gradient
                pert = 0.5 * (pert + np.swapaxes(pert, -1, -2))
                pert *= 2.0  # e_ij + e_ji perturbation; grad is symmetrized
            qp_p = dataclasses.replace(qp, **{leaf: jnp.asarray(base + pert)})
            qp_m = dataclasses.replace(qp, **{leaf: jnp.asarray(base - pert)})
            fd = (
                float(_loss(qp_p, gvec)) - float(_loss(qp_m, gvec))
            ) / (2 * eps)
            if leaf == "P":
                ij = idx
                ji = idx[:-2] + (idx[-1], idx[-2])
                an = float(
                    np.asarray(getattr(grads, leaf))[ij]
                    + np.asarray(getattr(grads, leaf))[ji]
                )
            else:
                an = float(np.asarray(getattr(grads, leaf))[idx])
            assert abs(fd - an) < 1e-4 * (1.0 + abs(fd)), (
                leaf, idx, fd, an,
            )


def test_inactive_bounds_zero_gradient():
    """Inactive constraints do not influence x* locally: their l/u
    gradients are exactly zero, and a loose row's A gradient is zero."""
    qp = random_qp_batch(batch=2, n=5, m=7, seed=9, dtype=jnp.float64)
    # widen the last row's bounds so it is strictly inactive
    l = qp.l.at[:, -1].set(-1e4)
    u = qp.u.at[:, -1].set(1e4)
    qp = dataclasses.replace(qp, l=l, u=u)
    gvec = jnp.ones_like(qp.q)
    grads = jax.grad(lambda q_: _loss(q_, gvec))(qp)
    np.testing.assert_array_equal(np.asarray(grads.l[:, -1]), 0.0)
    np.testing.assert_array_equal(np.asarray(grads.u[:, -1]), 0.0)
    np.testing.assert_array_equal(np.asarray(grads.A[:, -1, :]), 0.0)


def test_single_problem_and_jit():
    """Shape-polymorphic: a single (unbatched) problem differentiates
    under jit, and the equality-row l/u gradients split 50/50."""
    import jax.scipy  # noqa: F401

    P = jnp.array([[4.0, 1.0], [1.0, 2.0]])
    q = jnp.array([1.0, 1.0])
    A = jnp.array([[1.0, 1.0], [1.0, 0.0], [0.0, 1.0]])
    l = jnp.array([1.0, 0.0, 0.0])
    u = jnp.array([1.0, 0.7, 0.7])
    qp = QuadraticProblem(
        P=P.astype(jnp.float64), q=q.astype(jnp.float64),
        A=A.astype(jnp.float64), l=l.astype(jnp.float64),
        u=u.astype(jnp.float64),
    )
    gvec = jnp.array([1.0, -2.0], jnp.float64)
    gfn = jax.jit(jax.grad(lambda q_: _loss(q_, gvec)))
    grads = gfn(qp)
    # row 0 is the equality row: gradient splits equally between l and u
    np.testing.assert_allclose(
        np.asarray(grads.l[0]), np.asarray(grads.u[0]), rtol=1e-12
    )
    # finite-difference check on q (the simplest leaf)
    eps = 1e-6
    for i in range(2):
        qp_p = dataclasses.replace(qp, q=qp.q.at[i].add(eps))
        qp_m = dataclasses.replace(qp, q=qp.q.at[i].add(-eps))
        fd = (float(_loss(qp_p, gvec)) - float(_loss(qp_m, gvec))) / (2 * eps)
        assert abs(fd - float(grads.q[i])) < 1e-5, (i, fd, float(grads.q[i]))
