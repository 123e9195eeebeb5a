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
