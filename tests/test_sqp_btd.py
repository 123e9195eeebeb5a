"""Structured (btd inner QP) SQP tier — correctness vs the dense tiers.

The tier's quasi-Newton sequence differs from the dense tiers by design
(per-stage block-diagonal damped BFGS — see sqp/solver_btd.py module
docs), so cross-checks are at the KKT level and against the dense
kernel tier's solution with a tolerance, not bitwise.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sqp_solver_tpu.models.mpc import mpc_nlp_stagewise_batch
from sqp_solver_tpu.qp import QPSettings
from sqp_solver_tpu.sqp import SQPSettings, SQPStatus
from sqp_solver_tpu.sqp.solver_batched import sqp_solve_fused
from sqp_solver_tpu.sqp.solver_btd import sqp_solve_kernel_btd


def btd_settings(block_size=4, **kw):
    return SQPSettings(
        max_iter=40,
        eps_prim=1e-5,
        eps_dual=1e-5,
        termination="kkt",
        qp_impl="kernel_btd",
        qp=QPSettings(
            alpha=1.6,
            eps_abs=1e-6,
            eps_rel=1e-6,
            max_iter=2000,
            check_termination=25,
            warm_start=True,
            adaptive_rho=True,
            adaptive_rho_interval=50,
            block_size=block_size,
        ),
        **kw,
    )


def kkt_residuals(problem, x, lam):
    """Independent f64 KKT recompute: (stationarity_inf, violation_inf)."""
    xp = jnp.asarray(np.asarray(x), jnp.float64)
    lp = jnp.asarray(np.asarray(lam), jnp.float64)
    params = jax.tree.map(lambda v: jnp.asarray(np.asarray(v), jnp.float64),
                          problem.params)
    grad = jax.vmap(jax.grad(problem.objective), in_axes=(0, 0))(xp, params)
    J = jax.vmap(jax.jacfwd(problem.constraint), in_axes=(0, 0))(xp, params)
    cv = jax.vmap(problem.constraint, in_axes=(0, 0))(xp, params)
    stat = grad + jnp.einsum("bmn,bm->bn", J, lp)
    l64 = np.asarray(problem.l, np.float64)
    u64 = np.asarray(problem.u, np.float64)
    viol = np.maximum(l64 - np.asarray(cv), 0) + np.maximum(
        np.asarray(cv) - u64, 0
    )
    return np.abs(np.asarray(stat)).max(), viol.max()


class TestStructuredSQPTier:
    def test_mpc_nlp_solves_to_kkt(self):
        # polish is the recommended config for this family: the loop phase
        # drives feasibility to ~1e-7 but the alpha-scaled dual update
        # (reference semantics, src/sqp.cpp:87) freezes the multipliers at
        # the f32 merit-noise floor once steps are tiny — measured
        # identically on the DENSE kernel tier (stationarity 0.28 there vs
        # 0.11 here at 120 outer iterations); the Newton-KKT polish
        # epilogue then recovers machine-precision stationarity (f64 run:
        # 6.7e-16)
        problem, x0, b = mpc_nlp_stagewise_batch(4, horizon=4, seed=0)
        s = dataclasses.replace(btd_settings(block_size=b), polish=True)
        res = jax.jit(lambda p, x: sqp_solve_kernel_btd(p, x, None, s))(
            problem, x0
        )
        st = np.asarray(res.info.status)
        assert np.mean(st == SQPStatus.SOLVED) == 1.0, st
        stat, viol = kkt_residuals(problem, res.x, res.lam)
        # f32 solve certified on independent f64 residuals
        assert stat < 5e-4, stat
        assert viol < 5e-4, viol

    def test_mpc_nlp_f64_loop_phase(self):
        # without polish, f64: the loop phase alone reaches ~1e-4
        # stationarity and full feasibility (block-diagonal BFGS pays no
        # outer-iteration penalty vs the dense tiers on this family —
        # dense fused f64 at the same budget: iters [86, 150, 132, 14])
        problem, x0, b = mpc_nlp_stagewise_batch(
            4, horizon=4, seed=0, dtype=jnp.float64
        )
        s = dataclasses.replace(btd_settings(block_size=b), max_iter=150)
        res = jax.jit(lambda p, x: sqp_solve_kernel_btd(p, x, None, s))(
            problem, x0
        )
        stat, viol = kkt_residuals(problem, res.x, res.lam)
        assert stat < 5e-4, stat
        assert viol < 1e-8, viol

    def test_matches_dense_fused_tier(self):
        # f64: the btd tier lands on the same KKT point as the dense XLA
        # fused tier (dense damped BFGS) — different quasi-Newton
        # sequences, one optimum.  (The dense KERNEL tier is not the
        # comparator here: at these shapes in f32 it diverges on this
        # family — its own robustness envelope, not this tier's.)
        problem, x0, b = mpc_nlp_stagewise_batch(
            4, horizon=4, seed=1, dtype=jnp.float64
        )
        s_btd = dataclasses.replace(btd_settings(block_size=b), polish=True)
        s_dense = dataclasses.replace(
            s_btd, qp_impl="fused",
            qp=dataclasses.replace(s_btd.qp, block_size=0),
        )
        r_btd = jax.jit(lambda p, x: sqp_solve_fused(p, x, None, s_btd))(
            problem, x0
        )
        r_dense = jax.jit(lambda p, x: sqp_solve_fused(p, x, None, s_dense))(
            problem, x0
        )
        # same KKT point through a different quasi-Newton sequence
        assert np.asarray(r_btd.info.status).max() == SQPStatus.SOLVED
        err = np.abs(np.asarray(r_btd.x) - np.asarray(r_dense.x)).max()
        assert err < 1e-6, err

    def test_soc_mode_converges(self):
        problem, x0, b = mpc_nlp_stagewise_batch(3, horizon=4, seed=2)
        s = dataclasses.replace(
            btd_settings(block_size=b), second_order_correction=True,
            polish=True,
        )
        res = jax.jit(lambda p, x: sqp_solve_kernel_btd(p, x, None, s))(
            problem, x0
        )
        st = np.asarray(res.info.status)
        assert np.mean(st == SQPStatus.SOLVED) == 1.0, st
        stat, viol = kkt_residuals(problem, res.x, res.lam)
        assert stat < 5e-4 and viol < 5e-4, (stat, viol)

    def test_polish_epilogue(self):
        problem, x0, b = mpc_nlp_stagewise_batch(3, horizon=4, seed=3)
        s = dataclasses.replace(btd_settings(block_size=b), polish=True)
        res = jax.jit(lambda p, x: sqp_solve_kernel_btd(p, x, None, s))(
            problem, x0
        )
        stat, viol = kkt_residuals(problem, res.x, res.lam)
        assert stat < 5e-4 and viol < 5e-4, (stat, viol)

    def test_validation(self):
        problem, x0, b = mpc_nlp_stagewise_batch(2, horizon=4, seed=0)
        with pytest.raises(ValueError, match="block_size"):
            SQPSettings(qp_impl="kernel_btd").validate()
        with pytest.raises(ValueError, match="scaling"):
            s = btd_settings(block_size=b)
            s = dataclasses.replace(s, qp=dataclasses.replace(s.qp, scaling=4))
            sqp_solve_kernel_btd(problem, x0, None, s)
        with pytest.raises(ValueError, match="multiple"):
            # horizon=3 -> n=12, not a multiple of the internal block 8
            p3, x3, b3 = mpc_nlp_stagewise_batch(2, horizon=3, seed=0)
            sqp_solve_kernel_btd(p3, x3, None, btd_settings(block_size=b3))
