"""Solution polish: accuracy gain vs the long-double oracle, never-worse
acceptance, all dtypes and solver paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sqp_solver_tpu.models.mpc import random_qp_batch
from sqp_solver_tpu.parallel.batch import qp_solve_batch
from sqp_solver_tpu.qp import QPSettings, qp_solve
from sqp_solver_tpu.qp.polish import polish_qp
from sqp_solver_tpu.runtime import native_available, native_qp_solve_batch

pytestmark = pytest.mark.skipif(not native_available(), reason="g++ unavailable")

S = QPSettings(eps_abs=1e-4, eps_rel=1e-4, max_iter=500, adaptive_rho=True,
               adaptive_rho_interval=50)
ORACLE = QPSettings(eps_abs=1e-12, eps_rel=1e-12, max_iter=200000, adaptive_rho=True)


@pytest.fixture(scope="module")
def oracle():
    qp64 = random_qp_batch(batch=24, n=10, m=14, seed=11, dtype=jnp.float64)
    x_ref, *_ = native_qp_solve_batch(
        *(np.asarray(v) for v in (qp64.P, qp64.q, qp64.A, qp64.l, qp64.u)), ORACLE
    )
    return qp64, x_ref


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.float64])
def test_polish_improves_accuracy(oracle, dtype):
    qp64, x_ref = oracle
    qp = jax.tree.map(lambda a: a.astype(dtype), qp64)
    res = qp_solve_batch(qp, S)
    pol = polish_qp(qp, res, S)
    err0 = np.abs(np.asarray(res.x, np.float64) - x_ref).max(axis=1)
    err1 = np.abs(np.asarray(pol.x, np.float64) - x_ref).max(axis=1)
    # strong median gain, and never meaningfully worse
    assert np.percentile(err1, 50) < 0.25 * np.percentile(err0, 50)
    assert err1.max() < max(2e-5, 1.2 * err0.max())


def test_polish_flag_in_settings(oracle):
    qp64, x_ref = oracle
    qp = jax.tree.map(lambda a: a.astype(jnp.float32), qp64)
    import dataclasses

    res = qp_solve_batch(qp, dataclasses.replace(S, polish=True))
    err = np.abs(np.asarray(res.x, np.float64) - x_ref).max(axis=1)
    assert np.percentile(err, 50) < 2e-5


def test_polish_single_problem(oracle):
    qp64, x_ref = oracle
    one = jax.tree.map(lambda a: a[0], qp64)
    res = qp_solve(one, S)
    pol = polish_qp(one, res, S)
    assert np.abs(np.asarray(pol.x) - x_ref[0]).max() <= max(
        1e-7, np.abs(np.asarray(res.x) - x_ref[0]).max()
    )


def test_sqp_polish_parity_per_problem_vs_batched():
    """The per-problem tier's polish epilogue is the SAME text as the
    batched tiers' (sqp.common.polish_nlp): it must honor polish_passes
    and the status-refresh rescue identically.  Round-2 review found
    sqp_solve silently single-pass — a user migrating tiers got different
    rescue behavior on degenerate instances."""
    import dataclasses

    from sqp_solver_tpu.models.benchmark import sphere_cap_nlp_batch
    from sqp_solver_tpu.sqp import SQPSettings, sqp_solve
    from sqp_solver_tpu.sqp.solver_batched import sqp_solve_fused
    from sqp_solver_tpu.qp import QPSettings

    # stress distribution includes degenerate r ~ sqrt(n) instances where
    # multi-pass polish (re-guessed active sets) is what rescues
    problem, x0 = sphere_cap_nlp_batch(16, 8, dtype=jnp.float64, r_range=(0.5, 1.2))
    settings = SQPSettings(
        max_iter=30, eps_prim=1e-6, eps_dual=1e-6, termination="kkt",
        polish=True, polish_passes=3,
        qp=QPSettings(alpha=1.6, eps_abs=1e-6, eps_rel=1e-6, max_iter=2000,
                      check_termination=25, warm_start=True, adaptive_rho=True,
                      adaptive_rho_interval=50),
    )
    fused = sqp_solve_fused(problem, x0, None, settings)
    per = jax.vmap(lambda pr, x: sqp_solve(pr, x, None, settings))(problem, x0)
    st_f = np.asarray(fused.info.status)
    st_p = np.asarray(per.info.status)
    # both tiers rescue the same way: the per-problem tier may not be a
    # strict subset anymore (it polishes multi-pass + refreshes status)
    assert (st_p == 0).mean() >= (st_f == 0).mean() - 1e-9
    both = (st_f == 0) & (st_p == 0)
    np.testing.assert_allclose(
        np.asarray(per.x)[both], np.asarray(fused.x)[both], atol=2e-5
    )
