"""Block-sparse (BSR) matrices for arbitrary unstructured sparsity.

The reference's sparse ambition is ``Eigen::SimplicialLDLT`` over an
arbitrary sparsity pattern (``include/solvers/qp.hpp:126-129``; the
disabled sparse test ``tests/qp_solver_sparse_test.cpp:51-98``).  A
scalar-sparse factorization is the wrong primitive on TPU — gather-heavy,
MXU-hostile, and the fill-in is data-dependent.  The TPU-native
representation of "arbitrary sparsity" is **block sparsity at MXU
granularity**: the matrix is a static grid of ``bs x bs`` tiles, only the
nonzero tiles are stored, and every operation is a batched dense kernel
over the stored tiles:

    y = M x      ->  gather x tiles by block-column, one batched
                     (nb, bs, bs) @ (nb, bs) matmul, segment-sum by
                     block-row (all three are native XLA/MXU ops)

The PATTERN is static (hashable aux data — jit recompiles per pattern,
exactly like shapes); the VALUES are traced.  This is how the structured
backends' contract generalizes: ``schur_block_tridiag``/``schur_arrow``
cover banded/bordered structure, ``BlockSparse`` covers anything.

Solvers consume this through the matrix-free CG path (qp/sparse.py) — no
Gram or factorization is ever formed, so there is no fill-in problem at
all; preconditioning uses the block diagonal (qp/sparse.py builds it with
one extra batched matmul + segment-sum).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["BlockSparse", "from_dense", "to_dense"]


@jax.tree_util.register_pytree_node_class
class BlockSparse:
    """Block-CSR-style matrix: ``data[k]`` is the dense ``(bs, bs)`` tile
    at block position ``(rows[k], cols[k])``.

    ``rows``/``cols`` are STATIC (python tuples of ints — part of the
    pytree aux data, so jit specializes on the pattern); ``data`` is a
    traced ``(nb, bs, bs)`` array.  ``shape`` is the dense shape; both
    dims must be multiples of ``bs``.
    """

    def __init__(self, data, rows, cols, shape, bs):
        self.data = data
        self.rows = tuple(int(r) for r in rows)
        self.cols = tuple(int(c) for c in cols)
        self.shape = (int(shape[0]), int(shape[1]))
        self.bs = int(bs)

    # -- pytree protocol ---------------------------------------------------
    def tree_flatten(self):
        return (self.data,), (self.rows, self.cols, self.shape, self.bs)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        rows, cols, shape, bs = aux
        return cls(leaves[0], rows, cols, shape, bs)

    # -- ops ----------------------------------------------------------------
    @property
    def nblocks(self) -> int:
        return len(self.rows)

    @property
    def dtype(self):
        return self.data.dtype

    def _onehot(self, idx, num) -> jnp.ndarray:
        """(num, nb) static selection matrix.  Gather/scatter on TPU
        lower to slow serialized ops; with a STATIC pattern both are
        small dense matmuls (measured at n=4096, 5% blocks: the
        segment-sum formulation ran the whole CG solve 6.5x slower than
        dense — one-hot matmuls remove that entirely)."""
        oh = np.zeros((num, len(idx)), np.float32)
        oh[np.asarray(idx), np.arange(len(idx))] = 1.0
        return jnp.asarray(oh, self.data.dtype)

    def mv(self, x: jnp.ndarray) -> jnp.ndarray:
        """y = M x for x (n,): one-hot gather matmul, batched tile
        matvec, one-hot scatter matmul — all MXU-native."""
        hp = jax.lax.Precision.HIGHEST
        nr = self.shape[0] // self.bs
        nc = self.shape[1] // self.bs
        xb = x.reshape(nc, self.bs)
        gathered = jnp.einsum(
            "cn,cj->nj", self._onehot(self.cols, nc), xb, precision=hp
        )  # (nb, bs)
        prod = jnp.einsum("nij,nj->ni", self.data, gathered, precision=hp)
        y = jnp.einsum(
            "rn,ni->ri", self._onehot(self.rows, nr), prod, precision=hp
        )
        return y.reshape(self.shape[0])

    def rmv(self, y: jnp.ndarray) -> jnp.ndarray:
        """x = M' y for y (m,): same tiles, roles of rows/cols swapped."""
        hp = jax.lax.Precision.HIGHEST
        nr = self.shape[0] // self.bs
        nc = self.shape[1] // self.bs
        yb = y.reshape(nr, self.bs)
        gathered = jnp.einsum(
            "rn,ri->ni", self._onehot(self.rows, nr), yb, precision=hp
        )  # (nb, bs)
        prod = jnp.einsum("nij,ni->nj", self.data, gathered, precision=hp)
        x = jnp.einsum(
            "cn,nj->cj", self._onehot(self.cols, nc), prod, precision=hp
        )
        return x.reshape(self.shape[1])

    def scaled_gram_mv(self, w: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        """(M' diag(w) M) x without forming the Gram."""
        return self.rmv(w * self.mv(x))

    def diag(self) -> jnp.ndarray:
        """Dense diagonal of M (square only)."""
        assert self.shape[0] == self.shape[1]
        nr = self.shape[0] // self.bs
        out = jnp.zeros((nr, self.bs), self.data.dtype)
        diag_mask = np.asarray(
            [r == c for r, c in zip(self.rows, self.cols)]
        )
        if not diag_mask.any():
            return out.reshape(-1)
        idx = np.nonzero(diag_mask)[0]
        d = jnp.diagonal(self.data[jnp.asarray(idx)], axis1=-2, axis2=-1)
        out = out.at[jnp.asarray([self.rows[i] for i in idx])].add(d)
        return out.reshape(-1)


def from_dense(M, bs: int = 128, tol: float = 0.0, pad: bool = False) -> BlockSparse:
    """Detect the block pattern of a CONCRETE (host) matrix and build the
    BlockSparse.  Pattern detection is a host-side constructor — inside
    jit the pattern must already be fixed (pass BlockSparse through).

    Dims must be multiples of ``bs``: the solver path sizes ``q``/``l``/
    ``u`` off the operator's shape, so a silently padded operator would
    desync ``qp.n``/``qp.m`` from the vectors.  Pass ``pad=True`` to
    zero-pad anyway — then the CALLER must pad the QP vectors to the
    returned ``.shape`` too."""
    M = np.asarray(M)
    nr, nc = M.shape
    if nr % bs or nc % bs:
        if not pad:
            raise ValueError(
                f"from_dense: shape {M.shape} is not a multiple of bs={bs}; "
                "pad the matrix (and the QP's q/l/u) yourself or pass "
                "pad=True and pad the vectors to the returned .shape"
            )
        pr, pc = (-nr) % bs, (-nc) % bs
        M = np.pad(M, ((0, pr), (0, pc)))
        nr, nc = M.shape
    Rb, Cb = nr // bs, nc // bs
    tiles = M.reshape(Rb, bs, Cb, bs)
    norms = np.abs(tiles).max(axis=(1, 3))  # (Rb, Cb)
    rows, cols = np.nonzero(norms > tol)
    if len(rows) == 0:  # keep at least one block so shapes are non-degenerate
        rows, cols = np.asarray([0]), np.asarray([0])
    data = np.stack([tiles[r, :, c, :] for r, c in zip(rows, cols)])
    return BlockSparse(jnp.asarray(data, M.dtype), rows, cols, (nr, nc), bs)


def to_dense(S: BlockSparse) -> jnp.ndarray:
    out = jnp.zeros(S.shape, S.data.dtype)
    bs = S.bs
    for k, (r, c) in enumerate(zip(S.rows, S.cols)):
        out = out.at[r * bs : (r + 1) * bs, c * bs : (c + 1) * bs].add(
            S.data[k]
        )
    return out
