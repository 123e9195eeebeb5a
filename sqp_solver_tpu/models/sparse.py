"""Arbitrary-unstructured-sparsity QP family.

The benchmark family for the BlockSparse + matrix-free-CG path
(ops/block_sparse.py, qp/admm.py 'cg'): a random block-sparsity pattern
with no banded or bordered structure — the case the structured backends
(schur_block_tridiag / schur_arrow) cannot express and the reference
aims at Eigen::SimplicialLDLT for (include/solvers/qp.hpp:126-129,
tests/qp_solver_sparse_test.cpp:51-98).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from sqp_solver_tpu.ops.block_sparse import from_dense
from sqp_solver_tpu.qp.types import QuadraticProblem

__all__ = ["sparse_qp_pair"]


def sparse_qp_pair(
    n: int = 2048,
    m: int = 2048,
    bs: int = 128,
    density: float = 0.05,
    seed: int = 0,
    dtype=jnp.float32,
    pattern_seed: int | None = None,
):
    """Random block-sparse strictly convex QP; returns ``(dense, sparse)``
    twins of the SAME problem (``sparse`` carries BlockSparse P and A).

    P: symmetric random block pattern at ``density`` (diagonal blocks
    always present), made strictly PD by diagonal dominance.  A: random
    block pattern at ``density`` (at least one block per block-row).
    Bounds are finite and feasible by construction.

    The block PATTERN comes from ``pattern_seed`` (default: ``seed``) and
    the VALUES from ``seed``: benchmark reps must keep the pattern fixed
    (it is static pytree aux data — a new pattern is a new compile) while
    salting the data, so pass the same ``pattern_seed`` with fresh
    ``seed`` values.
    """
    prng = np.random.default_rng(seed if pattern_seed is None else pattern_seed)
    rng = np.random.default_rng(seed)
    Rb, Cb = n // bs, n // bs
    Mb = m // bs

    # --- P: symmetric block pattern, diagonally dominant ---------------
    P = np.zeros((n, n), np.float64)
    for i in range(Rb):
        for j in range(i + 1):
            on_diag = i == j
            if not on_diag and prng.uniform() > density:
                continue
            blk = rng.normal(size=(bs, bs)) / np.sqrt(n)
            P[i * bs : (i + 1) * bs, j * bs : (j + 1) * bs] = blk
    P = 0.5 * (P + P.T)
    dom = np.abs(P).sum(axis=1)  # diagonal dominance margin
    P[np.arange(n), np.arange(n)] += dom + 0.1

    # --- A: random block pattern, >= 1 block per block-row -------------
    A = np.zeros((m, n), np.float64)
    for i in range(Mb):
        cols = np.nonzero(prng.uniform(size=Cb) < density)[0]
        if len(cols) == 0:
            cols = [int(prng.integers(Cb))]
        for j in cols:
            A[i * bs : (i + 1) * bs, j * bs : (j + 1) * bs] = rng.normal(
                size=(bs, bs)
            ) / np.sqrt(bs * len(cols))

    q = rng.normal(size=n)
    x_feas = rng.normal(size=n)
    Ax = A @ x_feas
    width = rng.uniform(0.5, 2.0, size=m)
    l, u = Ax - width, Ax + width

    dense = QuadraticProblem(
        P=jnp.asarray(P, dtype), q=jnp.asarray(q, dtype),
        A=jnp.asarray(A, dtype), l=jnp.asarray(l, dtype),
        u=jnp.asarray(u, dtype),
    )
    sparse = QuadraticProblem(
        P=from_dense(np.asarray(P, np.float64).astype(np.dtype(dtype)), bs),
        q=dense.q,
        A=from_dense(np.asarray(A, np.float64).astype(np.dtype(dtype)), bs),
        l=dense.l,
        u=dense.u,
    )
    return dense, sparse
