"""Fused batch-explicit QP solver vs the vmapped reference implementation,
and the Pallas kernel (interpret mode on CPU) vs the XLA chunk."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sqp_solver_tpu.models.mpc import mpc_qp_batch, random_qp_batch
from sqp_solver_tpu.parallel.batch import qp_solve_batch
from sqp_solver_tpu.qp import QPSettings, QPStatus
from sqp_solver_tpu.qp.admm_batched import qp_solve_fused


SETTINGS = QPSettings(
    alpha=1.6,
    eps_abs=1e-6,
    eps_rel=1e-6,
    max_iter=2000,
    check_termination=25,
    adaptive_rho=True,
    adaptive_rho_interval=50,
)


class TestFusedMatchesVmap:
    @pytest.mark.parametrize("dtype", [jnp.float64, jnp.float32])
    def test_random_qps(self, dtype):
        qp = random_qp_batch(batch=24, n=8, m=12, seed=5, dtype=dtype)
        ref = qp_solve_batch(qp, SETTINGS)
        out = jax.jit(lambda p: qp_solve_fused(p, SETTINGS, backend="xla"))(qp)
        # identical math modulo chunk-boundary freezing -> same optima
        tol = 1e-8 if dtype == jnp.float64 else 1e-4
        np.testing.assert_allclose(np.asarray(out.x), np.asarray(ref.x), atol=tol)
        mismatch = np.sum(
            np.asarray(out.info.status) != np.asarray(ref.info.status)
        )
        # f32 accumulation-order differences between the residual paths can
        # flip a borderline problem's convergence at exactly the tolerance
        allowed = 0 if dtype == jnp.float64 else 1
        assert mismatch <= allowed, f"{mismatch} status mismatches"

    def test_mpc_batch(self):
        qp = mpc_qp_batch(batch=16, horizon=8, dtype=jnp.float64)
        ref = qp_solve_batch(qp, SETTINGS)
        out = qp_solve_fused(qp, SETTINGS, backend="xla")
        np.testing.assert_allclose(np.asarray(out.x), np.asarray(ref.x), atol=1e-8)

    def test_batch_padding(self):
        # B=13 not a multiple of the pallas tile: wrapper pads and slices
        qp = random_qp_batch(batch=13, n=6, m=9, seed=7, dtype=jnp.float64)
        ref = qp_solve_batch(qp, SETTINGS)
        out = qp_solve_fused(qp, SETTINGS, backend="xla")
        assert out.x.shape == (13, 6)
        np.testing.assert_allclose(np.asarray(out.x), np.asarray(ref.x), atol=1e-8)

    def test_warm_start_state(self):
        qp = random_qp_batch(batch=8, n=6, m=9, seed=9, dtype=jnp.float64)
        first = qp_solve_fused(qp, SETTINGS, backend="xla")
        again = qp_solve_fused(qp, SETTINGS, state=first.state, backend="xla")
        assert np.asarray(again.info.iter).max() <= np.asarray(first.info.iter).max()


class TestPallasKernelInterpret:
    def test_kernel_matches_xla_chunk(self):
        from sqp_solver_tpu.ops.admm_kernel import admm_chunk_pallas, admm_chunk_xla

        rng = np.random.default_rng(0)
        B, n, m = 8, 6, 10
        D = n + m
        W = jnp.asarray(rng.normal(size=(B, D, D)) * 0.1, jnp.float32)
        P = jnp.asarray(rng.normal(size=(B, n, n)), jnp.float32)
        A = jnp.asarray(rng.normal(size=(B, m, n)), jnp.float32)
        vecs = [jnp.asarray(rng.normal(size=(B, D)), jnp.float32) for _ in range(4)]
        qv, sc, s, yp = vecs
        ri = jnp.asarray(rng.uniform(0.1, 1.0, (B, D)), jnp.float32)
        rp = 1.0 / ri
        lp = jnp.asarray(rng.normal(size=(B, D)) - 2.0, jnp.float32)
        up = lp + 3.0
        a = dict(alpha=1.6, seg=7)
        s1, y1, st1 = admm_chunk_xla(W, P, A, qv, sc, ri, rp, lp, up, s, yp, **a)
        s2, y2, st2 = admm_chunk_pallas(
            W, P, A, qv, sc, ri, rp, lp, up, s, yp, interpret=True, tile=8, **a
        )
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(st1), np.asarray(st2), atol=1e-4, rtol=1e-4)

    def test_fused_solver_with_interpret_kernel(self):
        qp = random_qp_batch(batch=16, n=8, m=12, seed=3, dtype=jnp.float32)
        ref = qp_solve_fused(qp, SETTINGS, backend="xla")
        out = qp_solve_fused(qp, SETTINGS, backend="pallas_interpret")
        np.testing.assert_allclose(np.asarray(out.x), np.asarray(ref.x), atol=1e-4)
        assert np.mean(np.asarray(out.info.status) == QPStatus.SOLVED) > 0.9
