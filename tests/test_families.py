"""OSQP-paper benchmark families (models/families.py): every class solves,
agrees with the long-double C++ oracle, and satisfies problem-level
optimality checks (closed-form KKT solution for the equality class,
original-space objective parity for the machine-learning classes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sqp_solver_tpu.models.families import (
    equality_qp_batch,
    huber_qp_batch,
    lasso_qp_batch,
    portfolio_qp_batch,
    svm_qp_batch,
)
from sqp_solver_tpu.parallel.batch import qp_solve_batch
from sqp_solver_tpu.qp import QPSettings, QPStatus
from sqp_solver_tpu.runtime.native import native_available, native_qp_solve_batch

SETTINGS = QPSettings(
    alpha=1.6,
    eps_abs=1e-7,
    eps_rel=1e-7,
    max_iter=4000,
    check_termination=25,
    adaptive_rho=True,
    adaptive_rho_interval=50,
    polish=True,
)

B = 6


def _solve(problem, impl="fused", settings=SETTINGS):
    res = jax.jit(lambda p: qp_solve_batch(p, settings, impl=impl))(problem)
    return res


def _oracle(problem):
    x, y, status, _ = native_qp_solve_batch(
        np.asarray(problem.P, np.float64),
        np.asarray(problem.q, np.float64),
        np.asarray(problem.A, np.float64),
        np.asarray(problem.l, np.float64),
        np.asarray(problem.u, np.float64),
        QPSettings(eps_abs=1e-10, eps_rel=1e-10, max_iter=20000,
                   adaptive_rho=True),
    )
    assert (status == QPStatus.SOLVED).all()
    return x


class TestEqualityQP:
    def test_matches_closed_form_f64(self):
        problem, x_star = equality_qp_batch(B, n=12, p=6, seed=0, dtype=jnp.float64)
        res = _solve(problem, impl="vmap")
        assert (np.asarray(res.info.status) == QPStatus.SOLVED).all()
        np.testing.assert_allclose(np.asarray(res.x), x_star, atol=1e-6)

    def test_fused_f32(self):
        problem, x_star = equality_qp_batch(B, n=12, p=6, seed=1, dtype=jnp.float32)
        # 1e-7 residuals are below f32 reach; the polish step supplies the
        # accuracy at f32-reachable ADMM tolerances
        f32_settings = QPSettings(
            alpha=1.6, eps_abs=1e-5, eps_rel=1e-5, max_iter=4000,
            check_termination=25, adaptive_rho=True,
            adaptive_rho_interval=50, polish=True,
        )
        res = _solve(problem, settings=f32_settings)
        assert (np.asarray(res.info.status) == QPStatus.SOLVED).all()
        np.testing.assert_allclose(np.asarray(res.x), x_star, atol=2e-3)


@pytest.mark.skipif(not native_available(), reason="native oracle unavailable")
class TestFamiliesVsOracle:
    @pytest.mark.parametrize(
        "family",
        [
            lambda: lasso_qp_batch(B, n_features=6, n_samples=10, seed=2,
                                   dtype=jnp.float64),
            lambda: huber_qp_batch(B, n_features=6, n_samples=10, seed=3,
                                   dtype=jnp.float64),
            lambda: svm_qp_batch(B, n_features=6, n_samples=10, seed=4,
                                 dtype=jnp.float64),
            lambda: portfolio_qp_batch(B, n_assets=10, n_factors=3, seed=5,
                                       dtype=jnp.float64),
        ],
        ids=["lasso", "huber", "svm", "portfolio"],
    )
    def test_solves_and_agrees(self, family):
        problem, _ = family()
        res = _solve(problem)
        status = np.asarray(res.info.status)
        assert (status == QPStatus.SOLVED).all(), status
        x_ref = _oracle(problem)
        # primal agreement on the original variables; the ML liftings can
        # have degenerate lifted coordinates (e.g. ties in t), so compare
        # the full z but at a family tolerance
        np.testing.assert_allclose(np.asarray(res.x), x_ref, atol=5e-4)


class TestObjectiveParity:
    """Solutions must minimize the ORIGINAL (un-lifted) objectives: the
    QP encoding is only trustworthy if the original-space objective at our
    solution is no worse than at perturbations of it."""

    def test_lasso_objective(self):
        problem, meta = lasso_qp_batch(B, n_features=6, n_samples=10, seed=6,
                                       dtype=jnp.float64)
        res = _solve(problem)
        nf = meta["n_features"]
        x = np.asarray(res.x, np.float64)[:, :nf]
        F, b, lam = meta["F"], meta["b"], meta["lam"]

        def obj(xv):
            r = np.einsum("bsn,bn->bs", F, xv) - b
            return 0.5 * np.sum(r * r, axis=1) + lam * np.sum(np.abs(xv), axis=1)

        f0 = obj(x)
        rng = np.random.default_rng(0)
        for _ in range(8):
            assert (f0 <= obj(x + 1e-3 * rng.normal(size=x.shape)) + 1e-9).all()

    def test_huber_objective(self):
        problem, meta = huber_qp_batch(B, n_features=6, n_samples=10, seed=7,
                                       dtype=jnp.float64)
        res = _solve(problem)
        nf = meta["n_features"]
        x = np.asarray(res.x, np.float64)[:, :nf]
        F, b, M = meta["F"], meta["b"], meta["M"]

        def obj(xv):
            w = np.einsum("bsn,bn->bs", F, xv) - b
            quad = w * w
            lin = M * (2.0 * np.abs(w) - M)
            return np.sum(np.where(np.abs(w) <= M, quad, lin), axis=1)

        f0 = obj(x)
        rng = np.random.default_rng(1)
        for _ in range(8):
            assert (f0 <= obj(x + 1e-3 * rng.normal(size=x.shape)) + 1e-9).all()

    def test_svm_objective(self):
        problem, meta = svm_qp_batch(B, n_features=6, n_samples=10, seed=8,
                                     dtype=jnp.float64)
        res = _solve(problem)
        nf = meta["F"].shape[-1]
        x = np.asarray(res.x, np.float64)[:, :nf]
        F, b, lam = meta["F"], meta["b"], meta["lam"]

        def obj(xv):
            margin = b * np.einsum("bsn,bn->bs", F, xv)
            hinge = np.maximum(0.0, 1.0 - margin)
            return 0.5 * np.sum(xv * xv, axis=1) + lam * np.sum(hinge, axis=1)

        f0 = obj(x)
        rng = np.random.default_rng(2)
        for _ in range(8):
            assert (f0 <= obj(x + 1e-3 * rng.normal(size=x.shape)) + 1e-9).all()

    def test_portfolio_budget_and_objective(self):
        problem, meta = portfolio_qp_batch(B, n_assets=10, n_factors=3, seed=9,
                                           dtype=jnp.float64)
        res = _solve(problem)
        na = meta["mu"].shape[-1]
        x = np.asarray(res.x, np.float64)[:, :na]
        np.testing.assert_allclose(np.sum(x, axis=1), 1.0, atol=1e-6)
        assert (x >= -1e-6).all() and (x <= 1.0 + 1e-6).all()
        mu, F, D, gamma = meta["mu"], meta["F"], meta["D"], meta["gamma"]

        def obj(xv):
            y = np.einsum("bnk,bn->bk", F, xv)
            risk = np.sum(D * xv * xv, axis=1) + np.sum(y * y, axis=1)
            return gamma * risk - np.sum(mu * xv, axis=1)

        f0 = obj(x)
        # compare against feasible perturbations (projected back onto the
        # simplex-ish feasible set by renormalizing positive parts)
        rng = np.random.default_rng(3)
        for _ in range(8):
            xp = np.clip(x + 1e-3 * rng.normal(size=x.shape), 0.0, 1.0)
            xp = xp / np.sum(xp, axis=1, keepdims=True)
            assert (f0 <= obj(xp) + 1e-9).all()
