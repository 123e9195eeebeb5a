"""BlockSparse (arbitrary unstructured sparsity) + matrix-free CG path.

Covers the capability the reference reserves for Eigen::SimplicialLDLT
(include/solvers/qp.hpp:126-129) and its disabled sparse test
(tests/qp_solver_sparse_test.cpp:51-98): solve a QP whose P and A carry
an arbitrary (block-granular) sparsity pattern, with NO structured-band
assumption — fully matrix-free, no Gram, no factorization, no fill-in.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from sqp_solver_tpu.models.sparse import sparse_qp_pair
from sqp_solver_tpu.ops.block_sparse import BlockSparse, from_dense, to_dense
from sqp_solver_tpu.qp import QPSettings, QPStatus, qp_solve

CG = QPSettings(
    linear_solver="cg", eps_abs=1e-7, eps_rel=1e-7, max_iter=2000,
    check_termination=25, adaptive_rho=True,
)


class TestBlockSparseOps:
    def _mat(self, seed=0, shape=(96, 64), bs=32):
        rng = np.random.default_rng(seed)
        Rb, Cb = shape[0] // bs, shape[1] // bs
        M = np.zeros(shape, np.float64)
        for i in range(Rb):
            for j in range(Cb):
                if rng.uniform() < 0.4 or i == j:
                    M[i * bs : (i + 1) * bs, j * bs : (j + 1) * bs] = (
                        rng.normal(size=(bs, bs))
                    )
        return M

    def test_roundtrip_and_mv(self):
        M = self._mat()
        S = from_dense(M, bs=32)
        np.testing.assert_allclose(np.asarray(to_dense(S)), M)
        x = np.random.default_rng(1).normal(size=M.shape[1])
        y = np.random.default_rng(2).normal(size=M.shape[0])
        np.testing.assert_allclose(np.asarray(S.mv(jnp.asarray(x))), M @ x,
                                   rtol=1e-10)
        np.testing.assert_allclose(np.asarray(S.rmv(jnp.asarray(y))), M.T @ y,
                                   rtol=1e-10)

    def test_diag_and_gram(self):
        M = self._mat(seed=3, shape=(64, 64), bs=32)
        S = from_dense(M, bs=32)
        np.testing.assert_allclose(np.asarray(S.diag()), np.diag(M))
        w = np.abs(np.random.default_rng(4).normal(size=64)) + 0.1
        x = np.random.default_rng(5).normal(size=64)
        ref = M.T @ (w * (M @ x))
        np.testing.assert_allclose(
            np.asarray(S.scaled_gram_mv(jnp.asarray(w), jnp.asarray(x))),
            ref, rtol=1e-10,
        )

    def test_pattern_is_static_jit_aux(self):
        import jax

        M = self._mat(seed=6)
        S = from_dense(M, bs=32)
        calls = []

        @jax.jit
        def f(S, x):
            calls.append(1)
            return S.mv(x)

        x = jnp.ones(M.shape[1])
        f(S, x)
        # same pattern, new values: NO retrace
        S2 = BlockSparse(S.data * 2.0, S.rows, S.cols, S.shape, S.bs)
        f(S2, x)
        assert len(calls) == 1


class TestSparseQPSolve:
    def test_matches_dense_solve(self):
        dense, sparse = sparse_qp_pair(
            n=256, m=256, bs=64, density=0.15, seed=7, dtype=jnp.float64
        )
        r_dense = qp_solve(dense, CG)
        r_sparse = qp_solve(sparse, CG)
        assert int(r_dense.info.status) == QPStatus.SOLVED
        assert int(r_sparse.info.status) == QPStatus.SOLVED
        np.testing.assert_allclose(
            np.asarray(r_sparse.x), np.asarray(r_dense.x), atol=1e-5
        )
        # iterate trajectories agree (same preconditioner, same operator)
        assert abs(int(r_sparse.info.iter) - int(r_dense.info.iter)) <= 25

    def test_matches_default_dense_backend(self):
        dense, sparse = sparse_qp_pair(
            n=128, m=128, bs=32, density=0.3, seed=8, dtype=jnp.float64
        )
        r_chol = qp_solve(dense, dataclasses.replace(CG, linear_solver="schur_cholesky"))
        r_sparse = qp_solve(sparse, CG)
        assert int(r_chol.info.status) == QPStatus.SOLVED
        assert int(r_sparse.info.status) == QPStatus.SOLVED
        np.testing.assert_allclose(
            np.asarray(r_sparse.x), np.asarray(r_chol.x), atol=1e-5
        )

    def test_warm_start(self):
        _, sparse = sparse_qp_pair(
            n=128, m=128, bs=32, density=0.3, seed=9, dtype=jnp.float64
        )
        first = qp_solve(sparse, CG)
        again = qp_solve(sparse, CG, state=first.state)
        assert int(again.info.iter) <= int(first.info.iter)

    def test_factorizing_backend_rejected(self):
        _, sparse = sparse_qp_pair(
            n=128, m=128, bs=32, density=0.3, seed=10, dtype=jnp.float64
        )
        with pytest.raises(ValueError, match="matrix-free"):
            qp_solve(sparse, dataclasses.replace(CG, linear_solver="schur_cholesky"))

    def test_unsupported_epilogues_rejected(self):
        _, sparse = sparse_qp_pair(
            n=128, m=128, bs=32, density=0.3, seed=11, dtype=jnp.float64
        )
        for kw in ({"polish": True}, {"scaling": 10}):
            with pytest.raises(ValueError, match="BlockSparse"):
                qp_solve(sparse, dataclasses.replace(CG, **kw))

    def test_infeasibility_certificate_sparse(self):
        # contradictory duplicate equality rows -> PRIMAL_INFEASIBLE via
        # the polymorphic certificate path (qp/infeasibility.py)
        from sqp_solver_tpu.ops.block_sparse import from_dense, to_dense
        from sqp_solver_tpu.qp.types import QuadraticProblem

        dense, sparse = sparse_qp_pair(
            n=128, m=128, bs=32, density=0.3, seed=12, dtype=jnp.float64
        )
        A = np.asarray(to_dense(sparse.A)).copy()
        A[1] = A[0]
        l = np.asarray(dense.l).copy()
        u = np.asarray(dense.u).copy()
        l[0] = u[0]  # row 0: a.x = u0
        l[1] = u[0] + 1.0  # row 1: a.x = u0 + 1 -> contradiction
        u[1] = u[0] + 1.0
        bad = QuadraticProblem(
            P=sparse.P, q=sparse.q, A=from_dense(A, 32),
            l=jnp.asarray(l), u=jnp.asarray(u),
        )
        s = dataclasses.replace(CG, check_infeasibility=True, max_iter=4000)
        out = qp_solve(bad, s)
        assert int(out.info.status) in (
            QPStatus.PRIMAL_INFEASIBLE, QPStatus.MAX_ITER_EXCEEDED
        )


class TestStripPreparation:
    """The strip-formulation matvec (round 5): ``prepare()`` builds the
    per-output-block-row strip array once; hot loops (the CG backend's
    factor step) pass it back via ``prepared=`` so no gather/transpose
    rides an iteration.  Prepared and derive-on-the-fly paths must be
    bitwise-identical (same contraction, same operands)."""

    def test_prepared_matches_unprepared(self):
        rng = np.random.default_rng(9)
        bs = 32
        M = np.zeros((96, 64))
        for i, j in ((0, 0), (0, 1), (1, 1), (2, 0)):
            M[i * bs:(i + 1) * bs, j * bs:(j + 1) * bs] = rng.normal(
                size=(bs, bs))
        S = from_dense(M, bs=bs)
        x = jnp.asarray(rng.normal(size=64))
        y = jnp.asarray(rng.normal(size=96))
        pf = S.prepare(False)
        pt = S.prepare(True)
        np.testing.assert_array_equal(
            np.asarray(S.mv(x, prepared=pf)), np.asarray(S.mv(x)))
        np.testing.assert_array_equal(
            np.asarray(S.rmv(y, prepared=pt)), np.asarray(S.rmv(y)))
        # and both match the dense operator
        np.testing.assert_allclose(np.asarray(S.mv(x)), M @ np.asarray(x),
                                   rtol=1e-10)
        np.testing.assert_allclose(np.asarray(S.rmv(y)), M.T @ np.asarray(y),
                                   rtol=1e-10)

    def test_cg_factor_carries_strips(self):
        """The CG backend prepares strip arrays at FACTOR time — outside
        the iteration loop — for BlockSparse operands."""
        from sqp_solver_tpu.ops.linear_solver import get_linear_solver

        dense, sparse = sparse_qp_pair(
            n=128, m=128, bs=32, density=0.4, seed=2, dtype=jnp.float64
        )
        solver = get_linear_solver("cg")
        rho = jnp.full(128, 0.1)
        fac = solver.factor(sparse.P, sparse.A, 1e-6, rho)
        assert "P_mv" in fac and "A_mv" in fac and "A_rmv" in fac
        # and the factored solve agrees with the dense twin's
        fac_d = solver.factor(dense.P, dense.A, 1e-6, rho)
        rhs1 = jnp.asarray(np.random.default_rng(3).normal(size=128))
        rhs2 = jnp.asarray(np.random.default_rng(4).normal(size=128))
        xs = solver.solve(fac, sparse.P, sparse.A, 1e-6, rho, rhs1, rhs2, 0)
        xd = solver.solve(fac_d, dense.P, dense.A, 1e-6, rho, rhs1, rhs2, 0)
        np.testing.assert_allclose(np.asarray(xs), np.asarray(xd),
                                   atol=1e-9, rtol=1e-9)
