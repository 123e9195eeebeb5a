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

    def test_indefinite_P_reports_numerical_issues(self):
        # a clamped Cholesky pivot must surface as NUMERICAL_ISSUES for the
        # poisoned problem only — not silently return garbage, and not
        # poison batch-mates
        qp = random_qp_batch(batch=4, n=6, m=9, seed=3, dtype=jnp.float32)
        P_bad = qp.P.at[1].set(-10.0 * jnp.eye(6, dtype=jnp.float32))
        bad_batch = type(qp)(P=P_bad, q=qp.q, A=qp.A, l=qp.l, u=qp.u)
        out = qp_solve_kernel(bad_batch, SETTINGS, interpret=True)
        status = np.asarray(out.info.status)
        assert status[1] == QPStatus.NUMERICAL_ISSUES
        assert np.all(status[[0, 2, 3]] == QPStatus.SOLVED)

    def test_info_fidelity_vs_fused(self):
        # rho_updates / rho_estimate must be real values (drop-in equivalent
        # with the other tiers), not zero placeholders
        qp = random_qp_batch(batch=8, n=6, m=9, seed=11, dtype=jnp.float32)
        ref = qp_solve_fused(qp, SETTINGS, backend="xla")
        out = qp_solve_kernel(qp, SETTINGS, interpret=True)
        # reference counts the setup rho_vec_update: always >= 1
        assert np.asarray(out.info.rho_updates).min() >= 1
        ok = (np.asarray(ref.info.status) == 0) & (np.asarray(out.info.status) == 0)
        np.testing.assert_allclose(
            np.asarray(out.info.rho_updates)[ok],
            np.asarray(ref.info.rho_updates)[ok],
        )
        # estimates derive from residuals, which differ slightly between
        # tiers (arithmetic ordering); agreement is qualitative
        np.testing.assert_allclose(
            np.asarray(out.info.rho_estimate)[ok],
            np.asarray(ref.info.rho_estimate)[ok],
            rtol=0.15,
        )


class TestSOCFactorReuse:
    """Factor reuse across bounds-only re-solves (the reference TODO at
    src/sqp.cpp:273: SOC changes only l, u)."""

    def _inputs(self, qp):
        B, n = qp.q.shape
        m = qp.A.shape[-2]
        Bt = jnp.moveaxis(qp.P, 0, -1)
        Jt = jnp.moveaxis(qp.A, 0, -1)
        zn = jnp.zeros((n, B), jnp.float32)
        zm = jnp.zeros((m, B), jnp.float32)
        msk = jnp.zeros((8, B), jnp.float32).at[2].set(1.0)  # active only
        return Bt, Jt, qp.q.T, qp.l.T, qp.u.T, zn, zn, msk, zn, zm, zm

    def test_reuse_skips_setup_factorization(self):
        from sqp_solver_tpu.ops.qp_kernel import sqp_step_kernel

        qp = random_qp_batch(batch=8, n=6, m=9, seed=2, dtype=jnp.float32)
        s = QPSettings(alpha=1.6, eps_abs=1e-5, eps_rel=1e-5, max_iter=200,
                       check_termination=25, adaptive_rho=True,
                       adaptive_rho_interval=50, schedule="fixed")
        Bt, Jt, gt, lt, ut, st_, dgl, msk, x0, z0, y0 = self._inputs(qp)
        p1, z1, y1, B1, st1, minv = sqp_step_kernel(
            Bt, Jt, gt, lt, ut, st_, dgl, msk, x0, z0, y0, s,
            do_bfgs=False, want_minv=True, interpret=True,
        )
        assert np.asarray(st1[8]).min() >= 1  # at least the setup factor

        # bounds-only re-solve, warm-started, with the carried factor
        lt2, ut2 = lt - 0.01, ut - 0.01
        msk2 = msk.at[3].set(st1[7])  # rho carried over
        out_reuse = sqp_step_kernel(
            B1, Jt, gt, lt2, ut2, st_, dgl, msk2, p1, z1, y1, s,
            do_bfgs=False, minv_in=minv, interpret=True,
        )
        out_fresh = sqp_step_kernel(
            B1, Jt, gt, lt2, ut2, st_, dgl, msk, p1, z1, y1, s,
            do_bfgs=False, interpret=True,
        )
        st_reuse, st_fresh = out_reuse[4], out_fresh[4]
        # the reuse path performed NO setup factorization
        assert np.asarray(st_reuse[8]).max() == 0
        assert np.asarray(st_fresh[8]).min() >= 1
        # and produced the same solution
        np.testing.assert_allclose(
            np.asarray(out_reuse[0]), np.asarray(out_fresh[0]), atol=1e-4
        )


class TestSpdInverseKernel:
    def test_matches_xla_inverse(self):
        from sqp_solver_tpu.ops.qp_kernel import spd_inverse_kernel

        rng = np.random.default_rng(7)
        B, n = 12, 16
        G = rng.standard_normal((B, n, n)).astype(np.float32) / np.sqrt(n)
        M = np.einsum("bki,bkj->bij", G, G) + np.eye(n, dtype=np.float32)
        Minv_t, fail = spd_inverse_kernel(jnp.moveaxis(jnp.asarray(M), 0, -1))
        Minv = np.moveaxis(np.asarray(Minv_t), -1, 0)
        ref = np.linalg.inv(M.astype(np.float64))
        np.testing.assert_allclose(Minv, ref, atol=5e-5)
        assert (np.asarray(fail) == 0).all()

    def test_fail_flag_on_indefinite(self):
        from sqp_solver_tpu.ops.qp_kernel import spd_inverse_kernel

        B, n = 4, 8
        M = np.broadcast_to(np.eye(n, dtype=np.float32), (B, n, n)).copy()
        M[1] = -np.eye(n)  # indefinite lane
        _, fail = spd_inverse_kernel(jnp.moveaxis(jnp.asarray(M), 0, -1))
        fail = np.asarray(fail)
        assert fail[1] > 0 and fail[0] == 0


class TestScanChainedWarmStarts:
    """The sustained-MPC bench leg chains K warm-started kernel-tier
    solves inside one lax.scan, carrying QPState between steps.  This
    locks that contract: QPState must be a valid scan carry for the
    kernel tier, and warm-started steps must keep solving.  (CPU runs
    the kernel in interpret mode — the contract is structural.)"""

    def test_qpstate_is_a_scan_carry(self):
        import jax

        from sqp_solver_tpu.models.mpc import _double_integrator_condensed
        from sqp_solver_tpu.parallel.batch import qp_solve_batch
        from sqp_solver_tpu.qp.types import (
            QPSettings, QPState, QuadraticProblem,
        )

        B, H, K, dt = 8, 4, 3, 0.1
        Sx, Su = _double_integrator_condensed(H, dt)
        P1 = jnp.asarray(Su[:, 0, :].T @ Su[:, 0, :] + 0.1 * np.eye(H),
                         jnp.float32)
        A1 = jnp.asarray(np.concatenate([np.eye(H), Su[:, 1, :]], axis=0),
                         jnp.float32)
        Spx_x = jnp.asarray(Sx[:, 0, :].T, jnp.float32)
        Spx_u = jnp.asarray(Su[:, 0, :], jnp.float32)
        Svx_x = jnp.asarray(Sx[:, 1, :].T, jnp.float32)
        Ad = jnp.asarray([[1.0, dt], [0.0, 1.0]], jnp.float32)
        Bd = jnp.asarray([[0.5 * dt * dt], [dt]], jnp.float32)
        s = QPSettings(
            alpha=1.6, eps_abs=1e-4, eps_rel=1e-4, max_iter=200,
            check_termination=25, adaptive_rho=True,
            adaptive_rho_interval=50, schedule="fixed",
        )

        def rollout(x0):
            qs0 = QPState(
                x=jnp.zeros((B, H), jnp.float32),
                z=jnp.zeros((B, 2 * H), jnp.float32),
                y=jnp.zeros((B, 2 * H), jnp.float32),
            )

            def step(carry, _):
                st_, qs_ = carry
                qv = (st_ @ Spx_x) @ Spx_u
                voff = st_ @ Svx_x
                lv = jnp.concatenate(
                    [jnp.full((B, H), -2.0), -1.5 - voff], axis=1)
                uv = jnp.concatenate(
                    [jnp.full((B, H), 2.0), 1.5 - voff], axis=1)
                qp = QuadraticProblem(
                    P=jnp.broadcast_to(P1, (B, H, H)), q=qv,
                    A=jnp.broadcast_to(A1, (B, 2 * H, H)), l=lv, u=uv,
                )
                r = qp_solve_batch(qp, s, state=qs_, impl="kernel")
                nxt = st_ @ Ad.T + r.x[:, 0][:, None] * Bd[:, 0]
                return (nxt, r.state), (
                    jnp.mean((r.info.status == 0).astype(jnp.float32)),
                    jnp.sqrt(jnp.mean(nxt[:, 0] ** 2)),
                )

            _, ys = jax.lax.scan(step, (x0, qs0), None, length=K)
            return ys

        x0 = jax.random.uniform(
            jax.random.PRNGKey(3), (B, 2), jnp.float32, -1.0, 1.0)
        solved, pos = jax.jit(rollout)(x0)
        solved = np.asarray(solved)
        pos = np.asarray(pos)
        assert (solved == 1.0).all(), solved
        # the controller regulates: fleet position RMS decreases
        assert pos[-1] < pos[0], pos
