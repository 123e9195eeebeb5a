"""Native C++ engine tests: oracle correctness + property-based conformance
of the JAX solver against long-double ground truth on random QPs."""

import jax.numpy as jnp
import numpy as np
import pytest

from sqp_solver_tpu.models.mpc import random_qp_batch
from sqp_solver_tpu.parallel.batch import qp_solve_batch
from sqp_solver_tpu.qp import QPSettings
from sqp_solver_tpu.runtime import (
    native_available,
    native_qp_solve,
    native_qp_solve_batch,
)

pytestmark = pytest.mark.skipif(not native_available(), reason="g++ unavailable")

TIGHT = QPSettings(eps_abs=1e-12, eps_rel=1e-12, max_iter=200000, adaptive_rho=True)


class TestNativeEngine:
    def test_simple_qp_fixture(self):
        P = np.array([[4.0, 1.0], [1.0, 2.0]])
        q = np.array([1.0, 1.0])
        A = np.array([[1.0, 1.0], [1.0, 0.0], [0.0, 1.0]])
        l = np.array([1.0, 0.0, 0.0])
        u = np.array([1.0, 0.7, 0.7])
        x, y, status, iters = native_qp_solve(P, q, A, l, u, TIGHT)
        assert status == 0
        np.testing.assert_allclose(x, [0.3, 0.7], atol=1e-9)

    def test_batch_threads_match_single(self):
        qp = random_qp_batch(batch=12, n=6, m=9, seed=4, dtype=jnp.float64)
        Pb, qb, Ab, lb, ub = (np.asarray(v) for v in (qp.P, qp.q, qp.A, qp.l, qp.u))
        xb, yb, st, it = native_qp_solve_batch(Pb, qb, Ab, lb, ub, TIGHT, n_threads=4)
        assert np.all(st == 0)
        for i in range(3):
            xi, yi, s, _ = native_qp_solve(Pb[i], qb[i], Ab[i], lb[i], ub[i], TIGHT)
            np.testing.assert_allclose(xb[i], xi, atol=1e-12)


class TestPropertyConformance:
    """JAX f64 solver vs the long-double oracle on random problems — the
    1e-6 agreement bar on instances beyond the reference fixtures."""

    def test_random_qps_match_oracle(self):
        B = 16
        qp = random_qp_batch(batch=B, n=10, m=14, seed=11, dtype=jnp.float64)
        x_ref, y_ref, st_ref, _ = native_qp_solve_batch(
            *(np.asarray(v) for v in (qp.P, qp.q, qp.A, qp.l, qp.u)), TIGHT
        )
        ours = qp_solve_batch(
            qp, QPSettings(eps_abs=1e-10, eps_rel=1e-10, max_iter=100000, adaptive_rho=True)
        )
        ok = (st_ref == 0) & (np.asarray(ours.info.status) == 0)
        assert ok.mean() > 0.9
        err = np.abs(np.asarray(ours.x)[ok] - x_ref[ok]).max()
        assert err <= 1e-6, f"max |x - x_oracle| = {err:.3e}"
