"""Structured (block-tridiagonal) whole-solve kernel (interpret mode)
vs the XLA structured fused tier and the dense kernel.

Capability target: the reference's sparse QP path
(``/root/reference/src/qp.cpp:161-270`` under QP_SOLVER_USE_SPARSE,
``tests/qp_solver_sparse_test.cpp:51-98``), realized as the TPU-native
band kernel (ops/qp_kernel_btd.py)."""

import jax.numpy as jnp
import numpy as np
from sqp_solver_tpu.models.mpc import mpc_qp_stagewise_batch
from sqp_solver_tpu.ops.qp_kernel import qp_solve_kernel
from sqp_solver_tpu.ops.qp_kernel_btd import btd_internal_block, qp_solve_kernel_btd
from sqp_solver_tpu.qp import QPSettings, QPStatus  # noqa: F401
from sqp_solver_tpu.qp.admm_batched import qp_solve_fused


def _settings(**kw):
    base = dict(
        alpha=1.6, eps_abs=1e-5, eps_rel=1e-5, max_iter=200,
        check_termination=25, adaptive_rho=True, adaptive_rho_interval=50,
        schedule="fixed",
    )
    base.update(kw)
    return QPSettings(**base)


class TestInternalBlock:
    def test_aligned_passthrough(self):
        assert btd_internal_block(8) == 8
        assert btd_internal_block(16) == 16

    def test_reblocks_to_bandwidth_cover(self):
        # block-tridiag at b implies half-bandwidth <= 2b - 1
        assert btd_internal_block(3) == 8
        assert btd_internal_block(5) == 16
        assert btd_internal_block(7) == 16


class TestStructuredWholeSolveKernel:
    def test_matches_structured_fused_tier(self):
        qp, blk = mpc_qp_stagewise_batch(8, horizon=8, dtype=jnp.float32)
        # max_iter=400: at 200 one lane sits exactly on the budget and the
        # kernel's chunked-matvec f32 accumulation order can flip it
        s = _settings(
            linear_solver="schur_block_tridiag", block_size=blk, max_iter=400
        )
        ref = qp_solve_fused(qp, s)
        out = qp_solve_kernel_btd(qp, s, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(out.info.status), np.asarray(ref.info.status)
        )
        ok = np.asarray(ref.info.status) == 0
        assert ok.mean() > 0.8
        np.testing.assert_allclose(
            np.asarray(out.x)[ok], np.asarray(ref.x)[ok], atol=2e-4
        )

    def test_matches_dense_kernel(self):
        # the band of M is exact for this family, so the structured kernel
        # must agree with the dense whole-solve kernel (same _admm_core,
        # different factorization/solve representation)
        qp, blk = mpc_qp_stagewise_batch(8, horizon=4, dtype=jnp.float32)
        s_dense = _settings()
        s_btd = _settings(linear_solver="schur_block_tridiag", block_size=blk)
        dense = qp_solve_kernel(qp, s_dense, interpret=True)
        out = qp_solve_kernel_btd(qp, s_btd, interpret=True)
        ok = (np.asarray(dense.info.status) == 0) & (
            np.asarray(out.info.status) == 0
        )
        assert ok.mean() > 0.8
        np.testing.assert_allclose(
            np.asarray(out.x)[ok], np.asarray(dense.x)[ok], atol=2e-4
        )

    def test_kernel_route_from_settings(self):
        # qp_solve_kernel routes structured settings to the band kernel
        qp, blk = mpc_qp_stagewise_batch(4, horizon=4, dtype=jnp.float32)
        s = _settings(linear_solver="schur_block_tridiag", block_size=blk)
        via_route = qp_solve_kernel(qp, s, interpret=True)
        direct = qp_solve_kernel_btd(qp, s, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(via_route.x), np.asarray(direct.x)
        )

    def test_n_padding(self):
        # n = 24 with declared b = 5 -> bb = 16, padded n = 32: decoupled
        # identity rows must not perturb the solution (same family solved
        # at its native blocking as the reference)
        qp, blk = mpc_qp_stagewise_batch(4, horizon=8, dtype=jnp.float32)
        # max_iter=400: one lane needs 175 iterations natively, and the
        # coarser-blocking f32 ordering can push it past a 200 budget
        s_nat = _settings(
            linear_solver="schur_block_tridiag", block_size=blk, max_iter=400
        )
        # declare a LARGER valid block size that forces padding: any
        # b' >= b is a valid declaration (coarser blocking covers the band)
        s_pad = _settings(
            linear_solver="schur_block_tridiag", block_size=5, max_iter=400
        )
        ref = qp_solve_kernel_btd(qp, s_nat, interpret=True)
        out = qp_solve_kernel_btd(qp, s_pad, interpret=True)
        ok = (np.asarray(ref.info.status) == 0) & (
            np.asarray(out.info.status) == 0
        )
        assert ok.mean() > 0.8
        assert out.x.shape == ref.x.shape
        np.testing.assert_allclose(
            np.asarray(out.x)[ok], np.asarray(ref.x)[ok], atol=2e-4
        )

    def test_warm_start(self):
        qp, blk = mpc_qp_stagewise_batch(4, horizon=8, dtype=jnp.float32)
        s = _settings(linear_solver="schur_block_tridiag", block_size=blk)
        first = qp_solve_kernel_btd(qp, s, interpret=True)
        again = qp_solve_kernel_btd(qp, s, state=first.state, interpret=True)
        assert (
            np.asarray(again.info.iter).max()
            <= np.asarray(first.info.iter).max()
        )

    def test_warm_start_with_n_padding(self):
        # regression (round-5 advice): warm start + non-bb-aligned n
        # (block_size=5 -> bb=16, n=24 padded to 32) + B below the lane
        # tile used to double-pad state.x — the lane-pad branch recursed
        # with the UNPADDED qp but an already-n-padded state, so the
        # recursive call padded x again and tripped the BlockSpec
        qp, _ = mpc_qp_stagewise_batch(4, horizon=8, dtype=jnp.float32)
        s = _settings(
            linear_solver="schur_block_tridiag", block_size=5, max_iter=400
        )
        first = qp_solve_kernel_btd(qp, s, interpret=True)
        again = qp_solve_kernel_btd(qp, s, state=first.state, interpret=True)
        assert again.x.shape == first.x.shape
        assert (
            np.asarray(again.info.iter).max()
            <= np.asarray(first.info.iter).max()
        )

    def test_indefinite_P_reports_numerical_issues(self):
        qp, blk = mpc_qp_stagewise_batch(4, horizon=4, dtype=jnp.float32)
        n = qp.P.shape[-1]
        P_bad = qp.P.at[1].set(-10.0 * jnp.eye(n, dtype=jnp.float32))
        bad = type(qp)(P=P_bad, q=qp.q, A=qp.A, l=qp.l, u=qp.u)
        s = _settings(linear_solver="schur_block_tridiag", block_size=blk)
        out = qp_solve_kernel_btd(bad, s, interpret=True)
        status = np.asarray(out.info.status)
        assert status[1] == QPStatus.NUMERICAL_ISSUES
        assert np.all(status[[0, 2, 3]] == QPStatus.SOLVED)

    def test_infeasibility_certificate(self):
        # contradictory equality rows on one lane -> PRIMAL_INFEASIBLE
        # through the in-kernel certificate path (pmv/amv hooks)
        qp, blk = mpc_qp_stagewise_batch(4, horizon=4, dtype=jnp.float32)
        m = qp.A.shape[-2]
        # lane 2: row 1 duplicates row 0 as an equality at a value
        # incompatible with row 0's own equality -> no feasible point
        A_bad = qp.A.at[2, 1].set(qp.A[2, 0])
        l_bad = qp.l.at[2, 0].set(qp.u[2, 0])  # row 0: a.x = u0
        l_bad = l_bad.at[2, 1].set(qp.u[2, 0] + 1.0)  # row 1: a.x = u0 + 1
        u_bad = qp.u.at[2, 1].set(qp.u[2, 0] + 1.0)
        bad = type(qp)(P=qp.P, q=qp.q, A=A_bad, l=l_bad, u=u_bad)
        s = _settings(
            linear_solver="schur_block_tridiag", block_size=blk,
            check_infeasibility=True, max_iter=1000,
        )
        out = qp_solve_kernel_btd(bad, s, interpret=True)
        status = np.asarray(out.info.status)
        assert status[2] in (
            QPStatus.PRIMAL_INFEASIBLE,
            QPStatus.MAX_ITER_EXCEEDED,
        )
        # batch-mates unaffected
        assert np.all(status[[0, 1, 3]] == QPStatus.SOLVED)

    def test_anderson_composes(self):
        # the in-kernel AA is the SAME _admm_core path the dense kernel
        # runs (iteration reduction is pinned there / in
        # tests/test_acceleration.py); here: safeguarded AA through the
        # structured solve hooks must not change statuses or solutions.
        # (On this f32 equality-heavy family AA is not a consistent
        # iteration win for either kernel — the accept guard is
        # chunk-granular and the adaptive-rho epochs reset its window.)
        import dataclasses

        qp, blk = mpc_qp_stagewise_batch(4, horizon=8, dtype=jnp.float32)
        s_plain = _settings(
            linear_solver="schur_block_tridiag", block_size=blk,
            eps_abs=1e-5, eps_rel=1e-5, max_iter=2000, check_termination=10,
        )
        s_aa = dataclasses.replace(s_plain, acceleration="anderson")
        r0 = qp_solve_kernel_btd(qp, s_plain, interpret=True)
        r1 = qp_solve_kernel_btd(qp, s_aa, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(r1.info.status), np.asarray(r0.info.status)
        )
        assert np.all(np.asarray(r1.info.status) == QPStatus.SOLVED)
        np.testing.assert_allclose(
            np.asarray(r1.x), np.asarray(r0.x), atol=5e-4
        )
