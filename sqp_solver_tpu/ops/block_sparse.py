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

    # The matvec is a STRIP formulation: per output block-row, the (up
    # to) K stored tiles are laid side by side into one dense
    # (K*bs, bs) strip, the needed x blocks are pre-gathered with a
    # STATIC index map (one cheap take — indices are pattern data, known
    # at trace time), and the whole matvec is ONE batched contraction
    # einsum('rji,rj->ri').  History: a scalar segment-sum formulation
    # ran the CG solve 6.5x slower than dense (round 4), and the
    # one-hot gather/scatter-matmul formulation that replaced it still
    # lost 5.3x to its dense twin — three chained small ops per matvec,
    # each carrying fixed dispatch/layout cost, dominate at n=4096
    # (round-4 verdict).  The strip form is a single bandwidth-bound op
    # reading only the stored tiles (nb*bs^2*4 bytes vs n^2*4 dense).
    def _plan(self, transpose: bool):
        """Static per-output-block-row strip plan: (idxmap, srcmap),
        both (nR, K) numpy int32.  idxmap[r, k] indexes the PADDED tile
        array (nb = the all-zero pad tile); srcmap[r, k] is the input
        block to multiply.  Cached per instance (pattern is static)."""
        key = "_plan_t" if transpose else "_plan_n"
        hit = getattr(self, key, None)
        if hit is not None:
            return hit
        outs = self.cols if transpose else self.rows
        srcs = self.rows if transpose else self.cols
        n_out = (self.shape[1] if transpose else self.shape[0]) // self.bs
        per = {}
        for k, (o, s) in enumerate(zip(outs, srcs)):
            per.setdefault(o, []).append((k, s))
        K = max((len(v) for v in per.values()), default=1)
        idxmap = np.full((n_out, K), self.nblocks, np.int32)
        srcmap = np.zeros((n_out, K), np.int32)
        for o, lst in per.items():
            for j, (k, s) in enumerate(lst):
                idxmap[o, j] = k
                srcmap[o, j] = s
        plan = (idxmap, srcmap)
        object.__setattr__(self, key, plan)
        return plan

    def prepare(self, transpose: bool = False) -> jnp.ndarray:
        """Build the traced strip array (nR, K*bs, bs) for mv
        (``transpose=False``) or rmv.  Hot loops (the CG backend) call
        this ONCE outside the loop and pass the result back via
        ``prepared=`` so the gather/transpose never rides an iteration."""
        idxmap, _ = self._plan(transpose)
        n_out, K = idxmap.shape
        pad = jnp.zeros((1, self.bs, self.bs), self.data.dtype)
        data_p = jnp.concatenate([self.data, pad], axis=0)
        tiles = jnp.take(data_p, jnp.asarray(idxmap.reshape(-1)), axis=0)
        tiles = tiles.reshape(n_out, K, self.bs, self.bs)
        if not transpose:
            # y[i] = sum_j M[i, j] x[j]: contract over the tile ROW axis
            # j — lay strips as [.., j, i] so the contraction is over the
            # sublane-friendly middle axis
            tiles = jnp.swapaxes(tiles, -1, -2)
        return tiles.reshape(n_out, K * self.bs, self.bs)

    def _apply(self, v, transpose: bool, prepared=None):
        hp = jax.lax.Precision.HIGHEST
        _, srcmap = self._plan(transpose)
        n_out, K = srcmap.shape
        n_in = (self.shape[0] if transpose else self.shape[1]) // self.bs
        strips = self.prepare(transpose) if prepared is None else prepared
        vb = jnp.take(
            v.reshape(n_in, self.bs), jnp.asarray(srcmap.reshape(-1)), axis=0
        ).reshape(n_out, K * self.bs)
        out = jnp.einsum("rji,rj->ri", strips, vb, precision=hp)
        return out.reshape(n_out * self.bs)

    def mv(self, x: jnp.ndarray, prepared=None) -> jnp.ndarray:
        """y = M x for x (n,): static-index block gather + ONE batched
        strip contraction (see class comment)."""
        return self._apply(x, False, prepared)

    def rmv(self, y: jnp.ndarray, prepared=None) -> jnp.ndarray:
        """x = M' y for y (m,): same tiles, strips built per block-col."""
        return self._apply(y, True, prepared)

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
