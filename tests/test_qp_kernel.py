"""Whole-QP-solve kernel (interpret mode) vs the fused batched solver."""

import jax.numpy as jnp
import numpy as np
import pytest

from sqp_solver_tpu.models.mpc import random_qp_batch
from sqp_solver_tpu.ops.qp_kernel import qp_solve_kernel
from sqp_solver_tpu.qp import QPSettings, QPStatus
from sqp_solver_tpu.qp.admm_batched import qp_solve_fused

SETTINGS = QPSettings(
    alpha=1.6,
    eps_abs=1e-5,
    eps_rel=1e-5,
    max_iter=200,
    check_termination=25,
    adaptive_rho=True,
    adaptive_rho_interval=50,
    schedule="fixed",
)


class TestWholeQPKernel:
    def test_matches_fused_solver(self):
        qp = random_qp_batch(batch=16, n=8, m=12, seed=5, dtype=jnp.float32)
        ref = qp_solve_fused(qp, SETTINGS, backend="xla")
        out = qp_solve_kernel(qp, SETTINGS, interpret=True)
        ok = (np.asarray(ref.info.status) == 0) & (np.asarray(out.info.status) == 0)
        assert ok.mean() > 0.8
        np.testing.assert_allclose(
            np.asarray(out.x)[ok], np.asarray(ref.x)[ok], atol=1e-4
        )

    def test_simple_qp_fixture(self):
        from sqp_solver_tpu.models.problems import simple_qp

        qp = simple_qp(dtype=jnp.float32)
        qpb = jnp.broadcast_to
        batch = type(qp)(
            P=qpb(qp.P, (4, 2, 2)), q=qpb(qp.q, (4, 2)), A=qpb(qp.A, (4, 3, 2)),
            l=qpb(qp.l, (4, 3)), u=qpb(qp.u, (4, 3)),
        )
        out = qp_solve_kernel(batch, SETTINGS, interpret=True)
        assert np.all(np.asarray(out.info.status) == QPStatus.SOLVED)
        np.testing.assert_allclose(
            np.asarray(out.x), np.tile([0.3, 0.7], (4, 1)), atol=1e-3
        )

    def test_warm_start(self):
        qp = random_qp_batch(batch=8, n=6, m=9, seed=9, dtype=jnp.float32)
        first = qp_solve_kernel(qp, SETTINGS, interpret=True)
        again = qp_solve_kernel(qp, SETTINGS, state=first.state, interpret=True)
        assert np.asarray(again.info.iter).max() <= np.asarray(first.info.iter).max()
