"""Whole-QP-solve Pallas TPU kernel.

One kernel = one complete ADMM QP solve for a tile of problems, in the
*transposed* layout: every array carries the problem index in the LAST
(lane) dimension — P is (n, n, TL), vectors are (n, TL) — so 128 problems
ride the 128 VPU lanes and the sequential small-matrix algorithms
(Cholesky column loop, triangular substitution) are fully lane-vectorized.

Everything lives in VMEM for the whole solve:

    classify rho  ->  for each rho epoch:
                          [skip unless some active lane changed rho]
                          M = P + sigma I + A' diag(rho) A
                          L = chol(M);  Minv = L^-T L^-1   (in-kernel)
                          for each chunk: [skip if all lanes done]
                              `seg` ADMM iterations
                          residuals, per-problem done masks, rho estimate

This eliminates the per-chunk kernel-launch + operand re-layout cost of
the chunked design (measured ~30 ms per chunk at B=4096 against ~2 ms of
kernel compute) and never materializes the (B, D, D) iteration operator in
HBM at all.  Exploiting the block structure (apply M^-1 and A separately)
also does ~30% fewer MACs per iteration than the fused-W form.

Two properties matter for the throughput story:

* **On-device early exit.**  ``lax.cond`` inside a Pallas kernel runs on
  the TPU scalar core — unlike an XLA-level while_loop condition, which
  host-syncs (~19 ms each through a tunneled chip).  Chunks are skipped
  once every lane in the tile converges, and the per-epoch factorization
  is skipped unless some still-active lane actually changed rho.  With
  warm starts (the SQP loop), most tiles converge in the first chunk of
  later outer iterations, so the fixed schedule costs almost nothing.

* **Blocked, shrinking factorization.**  The Cholesky / triangular-inverse
  / L'L loops process columns in blocks and statically shrink the trailing
  view after each block (Python-unrolled blocks => static shapes), cutting
  the factorization's VPU work from ~3 n^3 to ~1.4 n^3 per problem — the
  difference between n = 128 fitting the solve budget or not.

Semantics match qp.admm_batched / qp.admm with schedule="fixed" (same
iterate math, same termination cadence, chunk-granular freezing);
validated against them in interpret mode by tests/test_qp_kernel.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sqp_solver_tpu.qp.classify import (
    LOOSE_BOUNDS_THRESH,
    RHO_EQ_FACTOR,
    RHO_MAX,
    RHO_MIN,
    RHO_TOL,
)
from sqp_solver_tpu.qp.types import (
    QPInfo,
    QPResult,
    QPSettings,
    QPState,
    QPStatus,
    QuadraticProblem,
)

__all__ = [
    "qp_solve_kernel", "sqp_step_kernel", "pick_lane_tile",
    "spd_inverse_kernel", "polish_kkt_kernel",
]

# column/row block for the shrinking factorization loops: large enough to
# amortize the per-block slice bookkeeping, small enough that the trailing
# views shrink meaningfully at n = 128
_FACTOR_BLOCK = 32

# VMEM is 128 MB on v5e; vmem_limit_bytes bounds the kernel's scoped stack
# (input/output pipeline buffers are accounted separately by Mosaic), so ask
# for the whole chip minus a little headroom and let pick_lane_tile keep the
# estimated live set under ~60% of it (measured: the Mosaic stack runs ~10%
# above the analytic estimate, plus double-buffered operands)
_VMEM_CAP = 127 * 1024 * 1024


def _vmem_bytes_per_lane(n: int, m: int) -> int:
    """Peak live f32 words per problem lane inside the kernel: P, A, Minv
    persistent; T + L + Li transient during factorization; ~24 vector rows
    (iterates, bounds, rhs, stats)."""
    return 4 * (5 * n * n + 2 * m * n + 24 * (n + m))


def _step_lane_tile(
    n: int,
    m: int,
    fused_bfgs: bool = True,
    carries_minv: bool = False,
    vmem_budget: int = _VMEM_CAP,
) -> int:
    """Lane tile for the SQP-step kernel.  With the BFGS fused in, the
    live set adds the Hessian triple (B_prev, B_new, B_out) and the rank-2
    temporaries on top of the QP solve's (measured 149.7 MB at n=128,
    TL=128 — ~18 n^2 words per lane).  Without it (BFGS at the XLA level
    in transposed layout; see sqp.solver_kernel), ~13 n^2 — which is what
    lets n=128 keep TL=128: a sub-128 lane tile forces `_chunked_lanes`
    XLA lane-slicing at ~6 GB/s, a measured 32 ms/sweep floor at B=1024."""
    words = (18 if fused_bfgs else 12) + (2 if carries_minv else 0)
    per_lane = 4 * (words * n * n + 3 * m * n + 32 * (n + m))
    tl = 128
    while tl > 8 and per_lane * tl > vmem_budget:
        tl //= 2
    return tl


def pick_lane_tile(n: int, m: int, vmem_budget: int = _VMEM_CAP) -> int:
    """Problems per program (lane tile): 128 when the kernel's live set
    fits VMEM, halved otherwise (multiples of 128 lanes are what the VPU
    wants; smaller tiles waste lanes)."""
    per_lane = _vmem_bytes_per_lane(n, m)
    tl = 128
    # stack estimate + 2x double-buffered operands must fit the chip
    while tl > 8 and per_lane * tl + 2 * 4 * (n * n + m * n) * tl > vmem_budget:
        tl //= 2
    return tl


def _chunked_lanes(call_one, args, B, tl):
    """Mosaic requires the lane (minor) block dimension to be 128 *or* the
    whole array — a lane tile below 128 therefore runs as separate
    whole-array kernel calls over batch slices (VMEM-bound large-n/large-D
    configs), concatenated back along the problem axis."""
    outs = []
    for i in range(0, B, tl):
        sl = tuple(v[..., i : i + tl] for v in args)
        outs.append(call_one(*sl))
    return tuple(jnp.concatenate(parts, axis=-1) for parts in zip(*outs))


def _mm_t(A, B_, reduce_axis=1):
    """Transposed-layout matmul helper: contract over `reduce_axis`."""
    return jnp.sum(A * B_, axis=reduce_axis)


def _t_atb(A1, A2):
    """out[i, j, :] = sum_k A1[k, i, :] * A2[k, j, :] — row loop via
    fori with masked extraction.  (A broadcast formulation would
    materialize a 4-D (k, r, c, TL) intermediate, ~17 MB at n=32 /
    TL=128: VMEM OOM; a python-unrolled loop compiles too slowly.)"""
    k, r = A1.shape[0], A1.shape[1]
    c = A2.shape[1]
    iota_mid = lax.broadcasted_iota(jnp.int32, (k, r, 1), 1)
    iota_out = lax.broadcasted_iota(jnp.int32, (r, 1, 1), 0)

    def body(i, out):
        a1i = jnp.sum(A1 * (iota_mid == i).astype(A1.dtype), axis=1)  # (k, TL)
        contrib = jnp.sum(a1i[:, None, :] * A2, axis=0)  # (c, TL)
        return out + (iota_out == i).astype(A1.dtype) * contrib[None, :, :]

    out0 = jnp.zeros((r, c, A1.shape[-1]), A1.dtype)
    return lax.fori_loop(0, r, body, out0)


def _chol_blocked(M, cb=_FACTOR_BLOCK):
    """Lane-vectorized lower Cholesky of an (n, n, TL) SPD batch.

    Proper panel algorithm per Python-unrolled block (static shapes —
    pallas TPU has no dynamic_update_slice lowering):

      1. column-loop factor of the (cb, cb) diagonal block — masked column
         extraction touches only the small block;
      2. panel forward-substitution of the (nb-cb, cb) sub-diagonal panel
         against the diagonal factor;
      3. ONE rank-cb trailing update of the (nb-cb)^2 remainder, as a fori
         of rank-1s whose columns are extracted from the narrow panel.

    Total VPU work is the textbook ~n^3/3: the previous single-loop form
    ran every rank-1 update AND a masked column extraction over the full
    (nb, nb) trailing view, ~3n^3 — measured 2.4x slower at n=128.
    Returns (L, fail) with fail (1, TL): a clamped pivot (indefinite/NaN
    input) leaves sqrt(1e-30) = 1e-15 on the diagonal; valid data has
    pivots >= sigma = 1e-6, so 1e-14 separates cleanly.
    """
    n, TL = M.shape[0], M.shape[-1]
    dtype = M.dtype
    panels = []
    T = M
    # fail carried as f32 0/1: vector bools in scf.for/scf.if carries fail
    # Mosaic legalization ("failed to legalize operation 'scf.if'")
    fail = jnp.zeros((1, TL), dtype)
    for r0 in range(0, n, cb):
        nb = n - r0
        b = min(cb, nb)
        r = nb - b  # trailing size
        cols_d = lax.broadcasted_iota(jnp.int32, (b, b, 1), 1)
        rows_d = lax.broadcasted_iota(jnp.int32, (b, 1), 0)

        # --- 1) diagonal block factor (small column loop) ---------------
        def col_step(j, carry):
            D, Ld, flag = carry
            colj = jnp.sum(D * (cols_d == j).astype(dtype), axis=1)  # (b, TL)
            dj = jnp.sum(colj * (rows_d == j).astype(dtype), axis=0, keepdims=True)
            flag = jnp.maximum(flag, ((dj <= 0.0) | jnp.isnan(dj)).astype(dtype))
            djc = jnp.maximum(dj, 1e-30)
            inv_sq = lax.rsqrt(djc)
            lcol = jnp.where(rows_d > j, colj * inv_sq, 0.0) + jnp.where(
                rows_d == j, jnp.sqrt(djc), 0.0
            )
            D = D - lcol[:, None, :] * lcol[None, :, :]
            Ld = Ld + lcol[:, None, :] * (cols_d == j).astype(dtype)
            return D, Ld, flag

        _, Ld, fail = lax.fori_loop(
            0, b, col_step,
            (T[:b, :b, :], jnp.zeros((b, b, TL), dtype), fail),
        )

        if r > 0:
            Pan = T[b:, :b, :]  # (r, b, TL)
            pcols = lax.broadcasted_iota(jnp.int32, (r, b, 1), 1)

            # --- 2) panel solve Lp = Pan Ld^-T (column loop over b) ------
            def pan_step(j, Lp):
                ldrow = jnp.sum(Ld * (rows_d[:, None, :] == j).astype(dtype), axis=0)
                # (b, TL): row j of Ld; entries k<j multiply prior columns
                ljj = jnp.sum(
                    ldrow * (rows_d == j).astype(dtype), axis=0, keepdims=True
                )
                prev = jnp.where(rows_d < j, ldrow, 0.0)  # (b, TL)
                acc = jnp.sum(Lp * prev[None, :, :], axis=1)  # (r, TL)
                colj = jnp.sum(Pan * (pcols == j).astype(dtype), axis=1)  # (r, TL)
                newc = (colj - acc) / jnp.maximum(ljj, 1e-30)
                return Lp + newc[:, None, :] * (pcols == j).astype(dtype)

            Lp = lax.fori_loop(0, b, pan_step, jnp.zeros((r, b, TL), dtype))

            # --- 3) rank-b trailing update (columns from the narrow panel)
            def upd(k, T22):
                colk = jnp.sum(Lp * (pcols == k).astype(dtype), axis=1)  # (r, TL)
                return T22 - colk[:, None, :] * colk[None, :, :]

            T = lax.fori_loop(0, b, upd, T[b:, b:, :])
            Lcol = jnp.concatenate([Ld, Lp], axis=0)  # (nb, b, TL)
        else:
            Lcol = Ld
            T = T[b:, b:, :]
        if r0 > 0:
            Lcol = jnp.concatenate([jnp.zeros((r0, b, TL), dtype), Lcol], axis=0)
        panels.append(Lcol)
    L = panels[0] if len(panels) == 1 else jnp.concatenate(panels, axis=1)
    return L, fail


def _tri_inv_blocked(L, cb=_FACTOR_BLOCK):
    """Lane-vectorized Li = L^-1 for lower-triangular (n, n, TL) L.

    Row-blocked forward substitution: the contribution of already-computed
    row blocks is contracted over a statically-sliced prefix (total ~n^3/2
    vs n^3 for the fixed-view row loop)."""
    n, TL = L.shape[0], L.shape[-1]
    dtype = L.dtype
    blocks = []  # row blocks of Li, concatenated at the end
    col_n = lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    for r0 in range(0, n, cb):
        b = min(cb, n - r0)
        Lpan = L[r0 : r0 + b, :, :]  # (b, n, TL)
        # previous-blocks contribution C[i, :] = sum_{k<r0} L[r0+i, k] Li[k, :]
        if r0 > 0:
            Lprev = Lpan[:, :r0, :]  # (b, r0, TL)
            Xprev = blocks[0] if len(blocks) == 1 else jnp.concatenate(blocks, axis=0)
            riota_prev = lax.broadcasted_iota(jnp.int32, (b, r0, 1), 0)

            def prev_row(i, C):
                lrow = jnp.sum(
                    Lprev * (riota_prev == i).astype(dtype), axis=0
                )  # (r0, TL)
                ci = jnp.sum(lrow[:, None, :] * Xprev, axis=0)  # (n, TL)
                return C + ci[None, :, :] * (
                    lax.broadcasted_iota(jnp.int32, (b, 1, 1), 0) == i
                ).astype(dtype)

            C = lax.fori_loop(0, b, prev_row, jnp.zeros((b, n, TL), dtype))
        else:
            C = jnp.zeros((b, n, TL), dtype)

        Lblk = Lpan[:, r0 : r0 + b, :]  # (b, b, TL) diagonal block
        briota = lax.broadcasted_iota(jnp.int32, (b, b, 1), 0)
        bciota = lax.broadcasted_iota(jnp.int32, (b, b, 1), 1)
        kiota = lax.broadcasted_iota(jnp.int32, (b, 1), 0)

        def row_step(i, Xb):
            # acc = C[i] + sum_{k<i} Lblk[i, k] Xb[k, :]
            ci = jnp.sum(
                C * (lax.broadcasted_iota(jnp.int32, (b, 1, 1), 0) == i).astype(dtype),
                axis=0,
            )  # (n, TL)
            lrow_blk = jnp.sum(Lblk * (briota == i).astype(dtype), axis=0)  # (b, TL)
            lrow_blk = jnp.where(kiota < i, lrow_blk, 0.0)
            acc = ci + jnp.sum(lrow_blk[:, None, :] * Xb, axis=0)
            ljj = jnp.sum(
                jnp.sum(Lblk * ((briota == i) & (bciota == i)).astype(dtype), axis=0),
                axis=0,
                keepdims=True,
            )  # (1, TL)
            e_i = (col_n == (r0 + i)).astype(dtype)  # (n, 1)
            newrow = (e_i - acc) / jnp.maximum(ljj, 1e-30)
            return Xb + newrow[None, :, :] * (
                lax.broadcasted_iota(jnp.int32, (b, 1, 1), 0) == i
            ).astype(dtype)

        Xb = lax.fori_loop(0, b, row_step, jnp.zeros((b, n, TL), dtype))
        blocks.append(Xb)
    return blocks[0] if len(blocks) == 1 else jnp.concatenate(blocks, axis=0)


def _ltl_blocked(Li, cb=_FACTOR_BLOCK):
    """Minv = Li' Li for lower-triangular (n, n, TL) Li, exploiting the
    triangular support: out[i, j] = sum_{k >= max(i,j)} Li[k,i] Li[k,j],
    so row block [r0, r0+b) only contracts over the k >= r0 suffix
    (total ~n^3/2 vs n^3 for a full contraction)."""
    n, TL = Li.shape[0], Li.shape[-1]
    dtype = Li.dtype
    out_blocks = []
    for r0 in range(0, n, cb):
        b = min(cb, n - r0)
        V = Li[r0:, :, :]  # (n-r0, n, TL)
        # extract row-block columns from the NARROW (n-r0, b) slice — a
        # full-width masked extraction per row costs an extra n^3 total
        Vblk = Li[r0:, r0 : r0 + b, :]  # (n-r0, b, TL)
        ciota_b = lax.broadcasted_iota(jnp.int32, Vblk.shape[:2] + (1,), 1)

        def row(i, Out):
            vi = jnp.sum(Vblk * (ciota_b == i).astype(dtype), axis=1)  # (n-r0, TL)
            ci = jnp.sum(vi[:, None, :] * V, axis=0)  # (n, TL)
            return Out + ci[None, :, :] * (
                lax.broadcasted_iota(jnp.int32, (b, 1, 1), 0) == i
            ).astype(dtype)

        Out = lax.fori_loop(0, b, row, jnp.zeros((b, n, TL), dtype))
        out_blocks.append(Out)
    return (
        out_blocks[0] if len(out_blocks) == 1 else jnp.concatenate(out_blocks, axis=0)
    )


def _factor_schur(P, A, rho_vec, sigma, eye_n):
    """M = P + sigma I + A' diag(rho) A; Minv via blocked in-kernel
    Cholesky + triangular inversion.  Returns (Minv, fail (1, TL) f32)."""
    SA = A * rho_vec[:, None, :]  # (m, n, TL)
    M = P + sigma * eye_n + _t_atb(A, SA)
    L, fail = _chol_blocked(M)
    Li = _tri_inv_blocked(L)
    Minv = _ltl_blocked(Li)
    return Minv, fail


def _factor_schur_refs(
    p_row, A_col, SA, sigma, w_ref, l_ref, li_ref, cb=_FACTOR_BLOCK,
    ltl=True,
):
    """Ref-based Minv construction — the fast path.

    Same math as :func:`_factor_schur` (Gram + panel-blocked Cholesky +
    row-wise triangular inverse + LᵀL), but every column/row access that
    the value-based version emulates with masked-iota extractions (a full
    array pass each) is a Mosaic dynamic ref index (free address
    arithmetic).  Measured (scripts/fbench_c.py, n=128 TL=128 B=1024):
    Gram 19.4 -> 1.9 ms, Cholesky 4.0 -> 1.7 ms, inverse+LtL 6.9 -> 3.9
    ms per sweep — ~4x overall.

    ``p_row(i) -> (n, TL)`` and ``A_col(i) -> (m, TL)`` are row/column
    sources (dynamic ref reads — the caller wires its input ref or a
    scratch stash); ``SA = A * rho`` is a value.  Scratch refs, (n, n,
    TL) each: ``w_ref`` (M during Cholesky, then Minv with the default
    ``ltl=True`` — its final content IS the result), ``l_ref`` (L),
    ``li_ref`` (L^-1; the caller may stash P here during the M build via
    ``p_row`` — it is zeroed before the inverse loop).  With
    ``ltl=False`` the LᵀL build is skipped: the result is L^-1 in
    ``li_ref`` and ``w_ref`` holds Cholesky-consumed junk (callers that
    only APPLY the inverse a few times use Li'(Li t) — see
    ``_chol_inv_ltl``).  Returns the ``fail (1, TL)`` row only; the
    factor lives in the refs.
    """
    m, n, TL = SA.shape
    dtype = SA.dtype
    iota_col = lax.broadcasted_iota(jnp.int32, (n, 1), 0)  # (n, 1)

    # ---- M = P + sigma I + A' R A, row by row --------------------------
    def m_row(i, _):
        a_i = A_col(i)  # (m, TL): column i of A
        contrib = jnp.sum(a_i[:, None, :] * SA, axis=0)  # (n, TL) FMA pass
        e_i = (iota_col == i).astype(dtype)
        w_ref[i] = p_row(i) + sigma * e_i + contrib
        return 0

    lax.fori_loop(0, n, m_row, 0)
    return _chol_inv_ltl(w_ref, l_ref, li_ref, cb, ltl=ltl)


def _chol_inv_ltl(w_ref, l_ref, li_ref, cb=_FACTOR_BLOCK, ltl=True):
    """In-place SPD inverse of the matrix in ``w_ref``: panel-blocked
    Cholesky into ``l_ref``, row-wise triangular inverse into ``li_ref``,
    LᵀL rows back into ``w_ref``.  Returns the fail row (clamped pivot).

    ``ltl=False`` stops after the triangular inverse (``li_ref`` holds
    L^-1, ``w_ref`` holds the Cholesky-consumed junk): callers that only
    APPLY the inverse a few times (the polish sweeps) use Li'(Li t) —
    two full-array passes per apply (~0.02 ms each at n=128 TL=128)
    instead of the n-trip LᵀL build loop (~1.5-2 ms).

    NOTE round-3 measurement: restricting the Gram/inverse/LtL passes to
    their triangular supports (block-sliced prefixes) REGRESSED 7.5 ->
    9.8 ms per B=1024 sweep at n=128 — narrower but choppier passes lose
    to wide regular ones on the VPU.  Keep the full-width forms.
    """
    n, _, TL = w_ref.shape
    dtype = w_ref.dtype
    iota_col = lax.broadcasted_iota(jnp.int32, (n, 1), 0)  # (n, 1)
    fail = jnp.zeros((1, TL), dtype)
    for r0 in range(0, n, cb):
        b = min(cb, n - r0)
        nb = n - r0
        Pan = w_ref[r0:n, r0 : r0 + b]  # (nb, b, TL) value
        cols_i = lax.broadcasted_iota(jnp.int32, (nb, b, 1), 1)
        rows_i = lax.broadcasted_iota(jnp.int32, (nb, 1), 0)

        def col_step(j, carry, r0=r0, b=b, cols_i=cols_i, rows_i=rows_i):
            Pan, fail = carry
            colj = jnp.sum(Pan * (cols_i == j).astype(dtype), axis=1)  # (nb, TL)
            dj = jnp.sum(colj * (rows_i == j).astype(dtype), axis=0, keepdims=True)
            fail = jnp.maximum(fail, ((dj <= 0.0) | jnp.isnan(dj)).astype(dtype))
            djc = jnp.maximum(dj, 1e-30)
            lcol = jnp.where(rows_i > j, colj * lax.rsqrt(djc), 0.0) + jnp.where(
                rows_i == j, jnp.sqrt(djc), 0.0
            )
            Pan = Pan - lcol[:, None, :] * lcol[:b][None, :, :]
            if r0:
                full = jnp.concatenate([jnp.zeros((r0, TL), dtype), lcol], axis=0)
            else:
                full = lcol
            l_ref[:, r0 + j] = full  # plain (n, n) storage: rows at [i],
            return Pan, fail         # columns at [:, j] — both dynamic

        Pan, fail = lax.fori_loop(0, b, col_step, (Pan, fail))

        r = n - r0 - b
        if r > 0:
            T22 = w_ref[r0 + b : n, r0 + b : n]  # (r, r, TL) value

            def upd(k, T22, r0=r0, b=b):
                ct = l_ref[:, r0 + k][r0 + b :]  # (r, TL)
                return T22 - ct[:, None, :] * ct[None, :, :]

            T22 = lax.fori_loop(0, b, upd, T22)
            w_ref[r0 + b : n, r0 + b : n] = T22

    # ---- Li rows into li_ref -------------------------------------------
    # stale rows k >= i are masked by the strict k < i prefix, but the
    # first use would read uninitialized VMEM (NaN x 0 = NaN) — and the
    # caller may have stashed P here: zero it
    li_ref[...] = jnp.zeros((n, n, TL), dtype)

    def inv_row(i, _):
        lrow = l_ref[i]  # (n, TL): L[i, :] (zeros beyond the diagonal)
        ljj = jnp.sum(lrow * (iota_col == i).astype(dtype), axis=0, keepdims=True)
        lrow_strict = jnp.where(iota_col < i, lrow, 0.0)
        acc = jnp.sum(lrow_strict[:, None, :] * li_ref[...], axis=0)  # (n, TL)
        e_i = (iota_col == i).astype(dtype)
        li_ref[i] = (e_i - acc) / jnp.maximum(ljj, 1e-30)
        return 0

    lax.fori_loop(0, n, inv_row, 0)

    if not ltl:
        return fail

    # ---- Minv = Li'Li, row by row, into w_ref --------------------------
    def ltl_row(i, _):
        col_i = li_ref[:, i]  # (n, TL): Li[:, i]
        w_ref[i] = jnp.sum(col_i[:, None, :] * li_ref[...], axis=0)
        return 0

    lax.fori_loop(0, n, ltl_row, 0)
    # the result LIVES in w_ref — callers read it (or FMA against it)
    # in place; materializing it as a return value would add an 8 MB
    # live array to every enclosing loop carry (measured: ~74 MB of
    # register-allocator spill slots at n=128, a VMEM OOM)
    return fail


def _spd_inverse_body(M_ref, out_ref, fail_ref, l_ref, li_ref):
    out_ref[...] = M_ref[:]
    fail_ref[...] = _chol_inv_ltl(out_ref, l_ref, li_ref)


@functools.partial(jax.jit, static_argnames=("lane_tile", "interpret"))
def _spd_inverse_call(Mt, *, lane_tile, interpret):
    n = Mt.shape[0]
    B = Mt.shape[-1]

    def spec(*lead):
        return pl.BlockSpec(
            lead + (lane_tile,),
            lambda i: (0,) * len(lead) + (i,),
            memory_space=pltpu.VMEM,
        )

    return pl.pallas_call(
        _spd_inverse_body,
        grid=(B // lane_tile,),
        in_specs=[spec(n, n)],
        out_specs=(spec(n, n), spec(1)),
        out_shape=(
            jax.ShapeDtypeStruct((n, n, B), Mt.dtype),
            jax.ShapeDtypeStruct((1, B), Mt.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((n, n, lane_tile), Mt.dtype),
            pltpu.VMEM((n, n, lane_tile), Mt.dtype),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_CAP),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * n * n * n * 2,
            bytes_accessed=B * n * n * 8,
            transcendentals=B * n,
        ),
    )(Mt)


def spd_inverse_kernel(Mt, interpret: bool = False):
    """Batched SPD inverse in transposed layout: ``Mt (n, n, B)`` ->
    ``(Minv_t (n, n, B), fail (B,))`` via the lane-vectorized ref-based
    Cholesky + triangular inverse + LᵀL (`_chol_inv_ltl`).

    Measured at n=128, B=1024: ~6 ms vs ~25 ms for XLA's batched
    ``cholesky`` + ``solve_triangular`` against I — the polish
    preconditioner's hot path (qp/polish.py).  ``fail`` is 1.0 on lanes
    whose Cholesky hit a clamped (non-positive/NaN) pivot.
    """
    if jax.default_backend() != "tpu":
        interpret = True
    n = Mt.shape[0]
    B = Mt.shape[-1]
    tl = 128
    while tl > 8 and 4 * (6 * n * n) * tl > _VMEM_CAP:
        tl //= 2
    pad = (-B) % tl
    if pad:
        Mt = jnp.concatenate(
            [Mt, jnp.broadcast_to(jnp.eye(n, dtype=Mt.dtype)[:, :, None],
                                  (n, n, pad))], axis=-1
        )
    if tl < 128 and not interpret:
        Minv, fail = _chunked_lanes(
            lambda M_: _spd_inverse_call(M_, lane_tile=tl, interpret=interpret),
            (Mt,), Mt.shape[-1], tl,
        )
    else:
        Minv, fail = _spd_inverse_call(Mt, lane_tile=tl, interpret=interpret)
    if pad:
        Minv, fail = Minv[..., :B], fail[..., :B]
    return Minv, fail[0]


def _polish_kkt_body(
    H_ref, Jm_ref, act_ref, actp_ref, li_in_ref, failp_ref, r1_ref, b_ref,
    nu0_ref, x0_ref, dx_ref, nu_ref, fail_ref, li_ref, w_ref, l_ref,
    *, delta, sweeps, warm,
):
    """One whole active-set KKT polish solve per lane (transposed layout).

    Same mathematics as qp.polish.kkt_solve_schur_refined with x0=0:
    L^-1 of M = H + delta I + (1/delta) Jm'Jm via the ref-based factor
    path, then `sweeps` ideal-operator refinement sweeps applying the
    preconditioner as Li'(Li t) — all in ONE kernel, so the (B, n, n)
    Hessian/Jacobian relayouts and the ~20 XLA-level dispatches per pass
    (each ~0.3-0.4 ms fixed cost at bench shapes) disappear.  No
    Newton-Schulz correction is needed: the in-kernel triangular inverse
    is backsolve-grade, and the sweeps absorb its O(eps) error exactly
    like the delta bias.

    Multi-pass factor reuse: ``actp_ref`` holds the PREVIOUS pass's
    active mask and ``li_in_ref`` its emitted L^-1 (``li_ref`` output).
    If no lane in the tile changed its active set, the factorization is
    skipped (scalar-core cond — the tile cost drops to the sweeps) and
    the previous Li preconditions this pass's sweeps: the sweeps iterate
    against the CURRENT ideal operator, so a slightly stale
    preconditioner (Newton steps move x by O(KKT error) between passes)
    only slows the ~delta-per-sweep contraction, never changes the fixed
    point.  Pass actp = -1 to force a factorization (first pass).
    """
    inv_d = 1.0 / delta  # python scalar: weak-typed, preserves dtype
    act = act_ref[:]   # (m, TL) f32 0/1 active mask
    r1 = r1_ref[:]     # (n, TL)
    b = b_ref[:]       # (m, TL) active-row targets (zero on inactive)
    # active-row masking happens HERE, in VMEM: callers pass the raw
    # Jacobian and skip the XLA-level (m, n, B) mask pass (~134 MB of
    # HBM traffic per polish pass at bench shapes).  Pre-masked input is
    # harmless (act is idempotent).
    Jm = Jm_ref[:] * act[:, None, :]   # (m, n, TL) active-masked Jacobian
    TL = r1.shape[-1]
    dtype = r1.dtype

    changed = jnp.any(jnp.abs(act - actp_ref[:]) > 0.5)

    def do_factor(_):
        # L^-1 of M = H + delta I + (1/delta) Jm'Jm -> li_ref; the
        # 1/delta Gram scaling and the active-row mask ride the A_col
        # reads so Jm*inv_d is never materialized.  ltl=False: the
        # sweeps apply Minv as Li'(Li t) — two full-array passes per
        # sweep beat the n-trip LtL build loop
        return _factor_schur_refs(
            lambda r: H_ref[r],
            lambda c: Jm_ref[:, c] * (act * inv_d),
            Jm,
            delta, w_ref, l_ref, li_ref, ltl=False,
        )

    def do_reuse(_):
        # inherit the previous call's fail row: a clamped-pivot factor
        # stays broken when reused — reporting 0 here would let accept
        # guards trust a solve preconditioned by junk
        li_ref[...] = li_in_ref[:]
        return failp_ref[:]

    fail = lax.cond(changed, do_factor, do_reuse, 0)

    H = H_ref[:]
    # carries derived from input data, never jnp.full: Mosaic pins
    # replicated layouts on full-init carries (round-2 gotcha)
    nu = nu0_ref[:] * act
    if warm:
        # warm start from x0: seed the running w = S x carries
        x = x0_ref[:]
        w_n = jnp.sum(H * x[None, :, :], axis=1)
        w_m = jnp.sum(Jm * x[None, :, :], axis=1)
    else:
        x = 0.0 * r1
        w_n = 0.0 * r1   # running H x
        w_m = 0.0 * b    # running Jm x

    def sweep(_, carry):
        x, nu, w_n, w_m = carry
        res2 = act * (b - w_m)
        t = r1 - w_n - jnp.sum(Jm * (nu - inv_d * res2)[:, None, :], axis=0)
        v = jnp.sum(li_ref[...] * t[None, :, :], axis=1)   # Li t
        dx = jnp.sum(li_ref[...] * v[:, None, :], axis=0)  # Li' v = Minv t
        dw_n = jnp.sum(H * dx[None, :, :], axis=1)
        dw_m = jnp.sum(Jm * dx[None, :, :], axis=1)
        nu = nu + act * inv_d * (dw_m - res2)
        return x + dx, nu, w_n + dw_n, w_m + dw_m

    x, nu, w_n, w_m = lax.fori_loop(0, sweeps, sweep, (x, nu, w_n, w_m))
    dx_ref[:] = x
    nu_ref[:] = nu
    fail_ref[:] = fail


@functools.partial(
    jax.jit,
    static_argnames=("delta", "sweeps", "lane_tile", "interpret", "warm"),
)
def _polish_kkt_call(Ht, Jmt, actt, actpt, li_in, failp, r1t, bt, nu0t, x0t,
                     *, delta, sweeps, lane_tile, interpret, warm):
    n = Ht.shape[0]
    m = Jmt.shape[0]
    B = Ht.shape[-1]

    def spec(*lead):
        return pl.BlockSpec(
            lead + (lane_tile,),
            lambda i: (0,) * len(lead) + (i,),
            memory_space=pltpu.VMEM,
        )

    return pl.pallas_call(
        functools.partial(
            _polish_kkt_body, delta=delta, sweeps=sweeps, warm=warm
        ),
        grid=(B // lane_tile,),
        in_specs=[spec(n, n), spec(m, n), spec(m), spec(m), spec(n, n),
                  spec(1), spec(n), spec(m), spec(m), spec(n)],
        out_specs=(spec(n), spec(m), spec(1), spec(n, n)),
        out_shape=(
            jax.ShapeDtypeStruct((n, B), Ht.dtype),
            jax.ShapeDtypeStruct((m, B), Ht.dtype),
            jax.ShapeDtypeStruct((1, B), Ht.dtype),
            jax.ShapeDtypeStruct((n, n, B), Ht.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((n, n, lane_tile), Ht.dtype),
            pltpu.VMEM((n, n, lane_tile), Ht.dtype),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_CAP),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * (n * n * n * 2 + m * n * n + sweeps * 4 * n * n),
            bytes_accessed=B * (3 * n * n + m * n) * 4,
            transcendentals=B * n,
        ),
    )(Ht, Jmt, actt, actpt, li_in, failp, r1t, bt, nu0t, x0t)


def polish_kkt_kernel(
    Ht, Jmt, actt, r1t, bt, nu0t,
    delta: float = 1e-2,
    sweeps: int = 6,
    interpret: bool = False,
    actt_prev=None,
    li_prev=None,
    x0t=None,
    fail_prev=None,
):
    """Batched active-set KKT polish solve in kernel layout.

    Inputs: ``Ht (n, n, B)`` Lagrangian Hessian, ``Jmt (m, n, B)``
    Jacobian (masking by ``actt`` happens IN-KERNEL — pre-masked input
    is accepted, the mask is idempotent), ``actt (m, B)`` 0/1 active
    mask, ``r1t (n,
    B)`` stationarity rhs (``-grad_f``), ``bt (m, B)`` active-row
    targets, ``nu0t (m, B)`` multiplier warm start, optional ``x0t (n,
    B)`` primal warm start (the sweeps then return the ABSOLUTE x, not a
    step).  Returns ``(x_t (n, B), nu_t (m, B), fail (B,), li (n, n,
    B))`` — the solution (a step from 0 when ``x0t`` is None), the
    polished multipliers on active rows, the clamped-pivot flag, and the
    L^-1 preconditioner for reuse.
    Semantics match
    ``qp.polish.kkt_solve_schur_refined(H, Jm, act, r1, b, nu0=nu0)``
    (parity-tested by tests/test_polish.py).

    ``actt_prev``/``li_prev`` (a previous call's mask and emitted ``li``;
    pass ``fail_prev`` — its fail row — too, so a clamped-pivot factor
    stays flagged when reused) enable per-tile factorization reuse: a
    lane tile whose active set is unchanged skips the factor phase
    entirely and preconditions this pass's sweeps with the previous L^-1
    (see ``_polish_kkt_body``).
    SOUNDNESS: reuse requires the SAME (H, Jm) operator — i.e. repeat
    solves of one QP with different rhs/active guesses (J fixed).  Under
    re-linearization (NLP polish) the (1/delta)-scaled Gram amplifies
    Jacobian drift ~1/delta x and the stale-preconditioned sweeps stall
    (measured: err_p99 1.1e-7 -> 5.7e-5 on the round-3 bench) — which is
    why ``sqp.common.polish_nlp_t`` does not use it.
    """
    if jax.default_backend() != "tpu":
        interpret = True
    n = Ht.shape[0]
    m = Jmt.shape[0]
    B = Ht.shape[-1]
    warm = x0t is not None
    if x0t is None:
        x0t = jnp.zeros_like(r1t)
    if actt_prev is None:
        actt_prev = -jnp.ones_like(actt)  # force the factorization
        li_prev = jnp.zeros_like(Ht)
        fail_prev = None
    elif li_prev is None:
        raise ValueError(
            "polish_kkt_kernel: actt_prev requires li_prev (the previous "
            "call's emitted L^-1) — factorization reuse needs both"
        )
    failp = (
        jnp.zeros((1, Ht.shape[-1]), Ht.dtype)
        if fail_prev is None
        else fail_prev.reshape(1, -1).astype(Ht.dtype)
    )
    # live set: H/Jm/li_in operands (double-buffered), li output, 2
    # factor scratch, H/Jm values during sweeps
    itemsize = jnp.dtype(Ht.dtype).itemsize
    per_lane = itemsize * (8 * n * n + 3 * m * n + 24 * (n + m))
    tl = 128
    while tl > 8 and per_lane * tl > _VMEM_CAP:
        tl //= 2
    pad = (-B) % tl
    if pad:
        eye_pad = jnp.broadcast_to(jnp.eye(n, dtype=Ht.dtype)[:, :, None],
                                   (n, n, pad))
        Ht = jnp.concatenate([Ht, eye_pad], axis=-1)
        Jmt = jnp.concatenate([Jmt, jnp.zeros((m, n, pad), Ht.dtype)], axis=-1)
        actt = jnp.concatenate([actt, jnp.zeros((m, pad), Ht.dtype)], axis=-1)
        # pad lanes: act == actp == 0, so they never force a tail-tile
        # refactor by themselves (their results are discarded anyway)
        actt_prev = jnp.concatenate(
            [actt_prev, jnp.zeros((m, pad), Ht.dtype)], axis=-1
        )
        li_prev = jnp.concatenate([li_prev, eye_pad], axis=-1)
        r1t = jnp.concatenate([r1t, jnp.zeros((n, pad), Ht.dtype)], axis=-1)
        bt = jnp.concatenate([bt, jnp.zeros((m, pad), Ht.dtype)], axis=-1)
        nu0t = jnp.concatenate([nu0t, jnp.zeros((m, pad), Ht.dtype)], axis=-1)
        x0t = jnp.concatenate([x0t, jnp.zeros((n, pad), Ht.dtype)], axis=-1)
        failp = jnp.concatenate([failp, jnp.zeros((1, pad), Ht.dtype)], axis=-1)
    call = functools.partial(
        _polish_kkt_call, delta=delta, sweeps=sweeps, lane_tile=tl,
        interpret=interpret, warm=warm,
    )
    args = (Ht, Jmt, actt, actt_prev, li_prev, failp, r1t, bt, nu0t, x0t)
    if tl < 128 and not interpret:
        dx_t, nu_t, fail, li = _chunked_lanes(
            lambda *a: call(*a), args, Ht.shape[-1], tl
        )
    else:
        dx_t, nu_t, fail, li = call(*args)
    if pad:
        dx_t, nu_t, fail, li = (
            dx_t[..., :B], nu_t[..., :B], fail[..., :B], li[..., :B]
        )
    return dx_t, nu_t, fail[0], li


def _rho_from(rho_scalar, loose, equality):
    """Per-constraint rho from classification masks (src/qp.cpp:284-314)."""
    return jnp.where(
        loose, RHO_MIN, jnp.where(equality, RHO_EQ_FACTOR * rho_scalar, rho_scalar)
    )


def _admm_core(
    P, A, q, l, u, x, z, y, done, failv, rho, minv_ref, pending,
    *, sigma, alpha, eps_abs, eps_rel, n_epochs, chunks_per_epoch, seg,
    adaptive_rho, adaptive_rho_tolerance, eye_n, loose, equality,
    factor_fn, check_infeas=False, eps_pinf=1e-4, eps_dinf=1e-4,
    use_aa=False, aa_mem=4, pmv=None, apply_minv=None, amv=None, atmv=None,
):
    """The whole ADMM solve for one lane tile, in transposed layout.

    Nested while_loops over rho epochs and termination chunks (on the TPU
    scalar core — no host sync): exact early exit, and code size
    independent of max_iter (an unrolled-chunks variant compiled in
    minutes at n=128).  All per-lane flags are f32 0/1 rows, never bool:
    vector i1 carries through scf.if/scf.for fail Mosaic legalization.

    Entry state lets callers compose: `done` pre-set to 1 freezes a lane
    (SQP-level inactivity), `pending`/`Minv` control whether the first
    epoch factors (the SQP step kernel factors outside for its posdef
    fallback; SOC re-solves reuse the factor entirely).

    Structured-KKT hooks: ``pmv(v) -> P v`` and ``apply_minv(b) ->
    M^-1 b`` replace the dense Hessian matvec / explicit-inverse apply.
    When given, ``P`` / ``minv_ref`` may be None — everything else in the
    core (termination, rho epochs, Anderson, infeasibility certificates)
    is representation-agnostic.  ``factor_fn`` keeps its contract: build
    whatever factor ``apply_minv`` consumes, return the (1, TL) fail row.
    """
    dtype = q.dtype
    TL = q.shape[-1]
    if pmv is None:
        pmv = lambda v: jnp.sum(P * v[None, :, :], axis=1)  # (n, TL)
    if apply_minv is None:
        # Minv is read from its scratch ref in place — never a loop-
        # carried value (see _factor_schur_refs return-value note)
        apply_minv = lambda bv: jnp.sum(minv_ref[...] * bv[None, :, :], axis=1)
    if amv is None:
        amv = lambda v: _mm_t(A, v[None, :, :])  # A v -> (m, TL)
    if atmv is None:
        atmv = lambda w: jnp.sum(A * w[:, None, :], axis=0)  # A' w -> (n, TL)
    itc = jnp.zeros((1, TL), dtype)
    # reference counts the setup rho_vec_update (src/qp.cpp:34): starts at 1
    rho_upd = jnp.ones((1, TL), dtype)
    # rho_est doubles as the pending-rho slot for factor-time adoption:
    # it MUST start at the entry rho (a first epoch entered with pending=1
    # — the whole-QP kernel's setup factorization — adopts from it)
    rho_est = rho * jnp.ones((1, TL), dtype)
    rp = jnp.zeros((1, TL), dtype)
    rd = jnp.zeros((1, TL), dtype)
    mz = jnp.zeros((1, TL), dtype)
    mq = jnp.zeros((1, TL), dtype)
    # infeasibility certificate row: 0 none, 1 primal, 2 dual (f32 — bool
    # carries fail Mosaic legalization)
    infs = jnp.zeros((1, TL), dtype)
    if check_infeas:
        # per-side loose masks for the support/ray tests (OSQP §3.4; see
        # qp.infeasibility for the scheme — this is its transposed-layout
        # in-kernel form)
        lo_l = l < -LOOSE_BOUNDS_THRESH
        lo_u = u > LOOSE_BOUNDS_THRESH
        u_eff = jnp.where(lo_u, 1e20, u)
        l_eff = jnp.where(lo_l, -1e20, l)

    def certificates(dx, dy):
        """(1, TL) f32 certificate code from the chunk's iterate deltas."""
        linf0 = lambda v: jnp.max(jnp.abs(v), axis=0, keepdims=True)
        norm_dy = linf0(dy)
        ATdy = atmv(dy)  # (n, TL)
        sup = jnp.sum(
            u_eff * jnp.maximum(dy, 0.0) + l_eff * jnp.minimum(dy, 0.0),
            axis=0,
            keepdims=True,
        )
        prim = (
            (norm_dy > 0.0)
            & (linf0(ATdy) <= eps_pinf * norm_dy)
            & (sup <= -eps_pinf * norm_dy)
        )
        norm_dx = linf0(dx)
        Pdx = pmv(dx)  # (n, TL)
        Adx = amv(dx)  # (m, TL)
        qdx = jnp.sum(q * dx, axis=0, keepdims=True)
        tol = eps_dinf * norm_dx
        ray_ok = jnp.all(
            (lo_u | (Adx <= tol)) & (lo_l | (Adx >= -tol)), axis=0, keepdims=True
        )
        dual = (
            (norm_dx > 0.0)
            & (linf0(Pdx) <= eps_dinf * norm_dx)
            & (qdx <= -eps_dinf * norm_dx)
            & ray_ok
        )
        return jnp.where(prim, 1.0, jnp.where(dual, 2.0, 0.0))

    def stats(x, z, y):
        Ax = amv(x)  # (m, TL)
        Px = pmv(x)  # (n, TL)
        ATy = atmv(y)  # (n, TL)
        linf = lambda v: jnp.max(jnp.abs(v), axis=0, keepdims=True)  # (1, TL)
        res_prim = linf(Ax - z)
        res_dual = linf(Px + q + ATy)
        max_Ax_z = jnp.maximum(linf(Ax), linf(z))
        max_Px_ATy_q = jnp.maximum(linf(Px), jnp.maximum(linf(ATy), linf(q)))
        return res_prim, res_dual, max_Ax_z, max_Px_ATy_q

    def admm_iter(x, z, y, rho_vec):
        rho_inv = 1.0 / rho_vec
        rhs2 = rho_vec * z - y  # (m, TL)
        b = sigma * x - q + atmv(rhs2)  # (n, TL)
        xt = apply_minv(b)  # (n, TL)
        zt = amv(xt)  # (m, TL)
        xn = alpha * xt + (1.0 - alpha) * x
        z_pre = alpha * zt + (1.0 - alpha) * z
        zn = jnp.clip(z_pre + rho_inv * y, l, u)
        yn = y + rho_vec * (z_pre - zn)
        return xn, zn, yn

    nfact = jnp.zeros((1, TL), dtype)

    n = q.shape[0]
    m = l.shape[0]
    D2 = n + 2 * m
    if use_aa:
        # ---- in-kernel safeguarded type-II Anderson acceleration ------
        # Same scheme as qp/anderson.py (difference ring buffers,
        # Levenberg-regularized k x k normal equations, termination-
        # aligned accept guard), per lane, at chunk granularity.  The
        # k x k solve is a statically-unrolled Gauss-Jordan on (k, k, TL)
        # slabs; everything else is elementwise rows.  Overhead per chunk
        # ~ one extra stats evaluation + O(k^2 D2 / 8) cycles — small
        # against seg ADMM iterations.
        zrow_d2 = 0.0 * jnp.concatenate([q, l, u], axis=0)  # lane-varying 0s
        iota_k3 = lax.broadcasted_iota(jnp.int32, (aa_mem, 1, 1), 0)
        iota_k2 = lax.broadcasted_iota(jnp.int32, (aa_mem, 1), 0)
        eye_k3 = (
            lax.broadcasted_iota(jnp.int32, (aa_mem, aa_mem, 1), 0)
            == lax.broadcasted_iota(jnp.int32, (aa_mem, aa_mem, 1), 1)
        ).astype(dtype)
        k_f = jnp.asarray(float(aa_mem), dtype)

        def aa_init():
            return (
                zrow_d2[None] * jnp.ones((aa_mem, 1, 1), dtype),  # dU
                zrow_d2[None] * jnp.ones((aa_mem, 1, 1), dtype),  # dF
                zrow_d2,  # uT_prev
                zrow_d2,  # f_prev
                jnp.zeros((1, TL), dtype),  # prev_ok (0/1)
                jnp.zeros((1, TL), dtype),  # pairs
            )

        def aa_step(aa, x, z, y, xn, zn, yn):
            dU, dF, uT_prev, f_prev, prev_ok, pairs = aa
            u_in = jnp.concatenate([x, z, y], axis=0)
            u_T = jnp.concatenate([xn, zn, yn], axis=0)
            f = u_T - u_in
            gate = prev_ok[None, :, :]  # (1, 1, TL)
            # roll-and-append via slice+concat: .at[-1].set lowers to a
            # SCATTER, which Mosaic does not implement (interpret mode
            # hides this — it only shows up on real TPU compiles)
            rolledU = jnp.concatenate([dU[1:], (u_T - uT_prev)[None]], axis=0)
            rolledF = jnp.concatenate([dF[1:], (f - f_prev)[None]], axis=0)
            dU = gate * rolledU + (1.0 - gate) * dU
            dF = gate * rolledF + (1.0 - gate) * dF
            pairs = jnp.minimum(pairs + prev_ok, k_f)
            # newest pairs at the end of the ring
            valid = (
                iota_k3.astype(dtype) + pairs[None, :, :] >= k_f
            ).astype(dtype)  # (k, 1, TL)
            dFm = dF * valid
            dUm = dU * valid
            G = jnp.sum(dFm[:, None, :, :] * dFm[None, :, :, :], axis=2)
            trace = jnp.sum(
                jnp.sum(G * eye_k3, axis=1), axis=0, keepdims=True
            )  # (1, TL)
            reg = 1e-8 * (trace + 1.0)
            G = G + eye_k3 * (reg[None, :, :] + (1.0 - valid))
            rhs = jnp.sum(dFm * f[None, :, :], axis=1)  # (k, TL)
            # statically-unrolled Gauss-Jordan: G becomes I, rhs -> gamma
            for i in range(aa_mem):
                piv = G[i : i + 1, i : i + 1, :]  # (1, 1, TL)
                inv_piv = 1.0 / piv  # diagonal >= reg > 0
                row_i = G[i : i + 1, :, :] * inv_piv  # (1, k, TL)
                r_i = rhs[i : i + 1, :] * inv_piv[0]  # (1, TL)
                not_i3 = (iota_k3 != i).astype(dtype)  # (k, 1, 1)
                not_i2 = (iota_k2 != i).astype(dtype)  # (k, 1)
                fac = G[:, i : i + 1, :] * not_i3
                G = G - fac * row_i
                rhs = rhs - fac[:, 0, :] * r_i
                G = G * not_i3 + row_i * (1.0 - not_i3)
                rhs = rhs * not_i2 + r_i * (1.0 - not_i2)
            gamma = rhs  # (k, TL)
            u_aa = u_T - jnp.sum(dUm * gamma[:, None, :], axis=0)
            x_a = u_aa[:n]
            z_a = jnp.clip(u_aa[n : n + m], l, u)  # keep the box invariant
            y_a = u_aa[n + m :]
            has_pairs = jnp.minimum(pairs, 1.0)  # (1, TL)
            aa_new = (dU, dF, u_T, f, jnp.ones((1, TL), dtype), pairs)
            return x_a, z_a, y_a, has_pairs, aa_new

    def epoch_body(ec):
        (x, z, y, done, failv, itc, rho, rho_upd, rho_est, rp, rd, mz, mq,
         pending, nfact, infs, aa, e) = ec

        # ADOPT a pending rho change only here, together with its
        # factorization: `rho` and `Minv` are then paired BY CONSTRUCTION
        # at every point (an adaptive update firing on the final epoch
        # leaves rho at the factored value — essential for factor reuse,
        # where a mismatched (Minv, rho) pair would iterate inconsistently)
        adopt = pending * (1.0 - done) * (1.0 - failv)  # exact 0/1 rows
        # arithmetic select (adopt is exactly 0 or 1): a select_n between
        # the replicated-initialized rho carry and the lane-varying rho_est
        # trips Mosaic relayout legalization; mul/add does not
        rho = rho + adopt * (rho_est - rho)

        # factorize only if some still-active lane changed rho — skipped
        # epochs (converged tile / stable rho) cost one scalar predicate.
        # NOTE: the refactor overwrites minv_ref for the WHOLE tile, so a
        # done/failed lane's Minv changes too — harmless, its iterates
        # are frozen and never consume Minv again.
        def do_factor(args):
            fail_old, cnt = args
            rv = _rho_from(rho, loose, equality)
            f = factor_fn(rv)
            act_f = (1.0 - done) * (1.0 - fail_old)
            return jnp.maximum(fail_old, f * act_f), cnt + 1.0

        failv, nfact = lax.cond(
            jnp.any(adopt > 0.0),
            do_factor,
            lambda args: args,
            (failv, nfact),
        )
        rho_vec_e = _rho_from(rho, loose, equality)

        def chunk_body(cc):
            x, z, y, done, itc, rp, rd, mz, mq, infs, aa, ci = cc

            def it(_, xzy):
                return admm_iter(*xzy, rho_vec_e)

            xn, zn, yn = lax.fori_loop(0, seg, it, (x, z, y))
            x_pre, y_pre = x, y  # pre-chunk iterates for certificate deltas
            act = (done == 0.0) & (failv == 0.0) & (infs == 0.0)
            if use_aa:
                x_a, z_a, y_a, has_pairs, aa = aa_step(aa, x, z, y, xn, zn, yn)
                sp = stats(xn, zn, yn)
                sa = stats(x_a, z_a, y_a)
                tiny_aa = 1e-30
                comb = lambda s: s[0] / (s[2] + tiny_aa) + s[1] / (s[3] + tiny_aa)
                term = lambda s: (s[0] <= eps_abs + eps_rel * s[2]) & (
                    s[1] <= eps_abs + eps_rel * s[3]
                )
                comb_a = comb(sa)
                accept = (
                    (has_pairs > 0.0)
                    & jnp.isfinite(comb_a)
                    & (comb_a < comb(sp))
                    & (term(sa) | ~term(sp))
                )
                xn = jnp.where(accept, x_a, xn)
                zn = jnp.where(accept, z_a, zn)
                yn = jnp.where(accept, y_a, yn)
                sel = tuple(jnp.where(accept, a, p) for a, p in zip(sa, sp))
                x = jnp.where(act, xn, x)
                z = jnp.where(act, zn, z)
                y = jnp.where(act, yn, y)
                res_prim, res_dual, max_Ax_z, max_Px_ATy_q = (
                    jnp.where(act, s_new, s_old)
                    for s_new, s_old in zip(sel, (rp, rd, mz, mq))
                )
            else:
                x = jnp.where(act, xn, x)
                z = jnp.where(act, zn, z)
                y = jnp.where(act, yn, y)
                res_prim, res_dual, max_Ax_z, max_Px_ATy_q = stats(x, z, y)
            if check_infeas:
                # certificates evaluate the POST-Anderson-accepted deltas
                # (matching the XLA tiers, which run _anderson_step before
                # the certificate check); certified lanes still commit
                # this chunk — only future chunks are masked off
                cert = certificates(xn - x_pre, yn - y_pre)
                infs = jnp.where(act & (cert > 0.0), cert, infs)
            conv = (res_prim <= eps_abs + eps_rel * max_Ax_z) & (
                res_dual <= eps_abs + eps_rel * max_Px_ATy_q
            )
            itc = jnp.where(act, itc + seg, itc)
            rp = jnp.where(act, res_prim, rp)
            rd = jnp.where(act, res_dual, rd)
            mz = jnp.where(act, max_Ax_z, mz)
            mq = jnp.where(act, max_Px_ATy_q, mq)
            done = jnp.maximum(done, (act & conv).astype(x.dtype))
            return x, z, y, done, itc, rp, rd, mz, mq, infs, aa, ci + 1

        def chunk_cond(cc):
            done_c, infs_c = cc[3], cc[9]
            return (cc[-1] < chunks_per_epoch) & jnp.any(
                (1.0 - done_c) * (1.0 - failv) * (1.0 - jnp.minimum(infs_c, 1.0))
                > 0.0
            )

        x, z, y, done, itc, rp, rd, mz, mq, infs, aa, _ = lax.while_loop(
            chunk_cond,
            chunk_body,
            (x, z, y, done, itc, rp, rd, mz, mq, infs, aa,
             jnp.zeros((), jnp.int32)),
        )

        if adaptive_rho:
            tinyv = 1e-30
            nrp = rp / (mz + tinyv)
            nrd = rd / (mq + tinyv)
            new_rho = jnp.clip(rho * jnp.sqrt(nrp / (nrd + tinyv)), RHO_MIN, RHO_MAX)
            act = (done == 0.0) & (failv == 0.0) & (infs == 0.0)
            changed = (
                (new_rho < rho / adaptive_rho_tolerance)
                | (new_rho > rho * adaptive_rho_tolerance)
            ) & act
            # NOTE: rho itself is NOT updated here — the pending value
            # (carried via rho_est + the pending mask) is adopted at the
            # next epoch's factorization so (rho, Minv) stay paired
            rho_upd = rho_upd + changed.astype(dtype)
            rho_est = jnp.where(act, new_rho, rho_est)
            pending = changed.astype(dtype)
            if use_aa:
                # the chunk map changes with rho: stale AA pairs would
                # extrapolate through a different fixed point.  The reset
                # fires at ADOPTION time next epoch; resetting on the
                # pending signal is equivalent (no chunk runs in between)
                keep = 1.0 - pending
                dU, dF, uT_prev, f_prev, prev_ok, pairs = aa
                aa = (dU, dF, uT_prev, f_prev, prev_ok * keep, pairs * keep)
        return (
            x, z, y, done, failv, itc, rho, rho_upd, rho_est, rp, rd, mz, mq,
            pending, nfact, infs, aa, e + 1,
        )

    def epoch_cond(ec):
        done_c, failv_c, infs_c, e = ec[3], ec[4], ec[15], ec[-1]
        return (e < n_epochs) & jnp.any(
            (1.0 - done_c) * (1.0 - failv_c) * (1.0 - jnp.minimum(infs_c, 1.0))
            > 0.0
        )

    ec = (
        x, z, y, done, failv, itc, rho, rho_upd, rho_est, rp, rd, mz, mq,
        pending, nfact, infs, aa_init() if use_aa else (),
        jnp.zeros((), jnp.int32),
    )
    ec = lax.while_loop(epoch_cond, epoch_body, ec)
    # x, z, y, done, failv, itc, rho, rho_upd, rho_est, rp, rd
    # (+ nfact at 14, infeas row at 15); the final Minv lives in
    # minv_ref; rho at index 6 is ALWAYS the rho that Minv was factored
    # under (pending updates adopt at factor time)
    return ec


def _qp_kernel(
    P_ref, A_ref, q_ref, l_ref, u_ref, x_ref, z_ref, y_ref,
    xo_ref, zo_ref, yo_ref, st_ref, fw_ref, fl_ref, fi_ref,
    *, n, m, sigma, alpha, rho0, eps_abs, eps_rel,
    n_epochs, chunks_per_epoch, seg, adaptive_rho, adaptive_rho_tolerance,
    check_infeas, eps_pinf, eps_dinf, use_aa, aa_mem,
):
    dtype = P_ref.dtype
    P = P_ref[:]          # (n, n, TL)
    A = A_ref[:]          # (m, n, TL)
    q = q_ref[:]          # (n, TL)
    l = l_ref[:]          # (m, TL)
    u = u_ref[:]          # (m, TL)
    TL = q.shape[-1]

    def factor_fn(rho_vec):
        # ref-based factorization (see _factor_schur_refs: ~4x the
        # masked-iota path); P rows and A columns read from the input
        # refs; the result lives in fw_ref
        return _factor_schur_refs(
            lambda r: P_ref[r],
            lambda c: A_ref[:, c],
            A * rho_vec[:, None, :],
            sigma, fw_ref, fl_ref, fi_ref,
        )

    row_i = lax.broadcasted_iota(jnp.int32, (n, n, 1), 0)
    col_i = lax.broadcasted_iota(jnp.int32, (n, n, 1), 1)
    eye_n = (row_i == col_i).astype(dtype)  # (n, n, 1)

    # constraint classification (reference src/qp.cpp:284-314)
    loose = (l < -LOOSE_BOUNDS_THRESH) & (u > LOOSE_BOUNDS_THRESH)
    equality = (u - l) < RHO_TOL

    x, z, y = x_ref[:], z_ref[:], y_ref[:]
    zero_row = jnp.zeros((1, TL), dtype)
    # rho derives from an input row so its loop-carry layout is
    # lane-varying from the start: a replicated jnp.full init pins the
    # carry slot replicated and the factor-time rho adoption (a
    # lane-varying add in _admm_core) then fails Mosaic relayout
    # legalization.  0*q is exact for finite q; a NaN-poisoned lane
    # NaNs its rho, which the factorization fail flag reports anyway.
    rho_row = rho0 + 0.0 * q[0:1, :]
    ec = _admm_core(
        P, A, q, l, u, x, z, y,
        done=zero_row,
        failv=zero_row,
        rho=rho_row,
        minv_ref=fw_ref,
        pending=jnp.ones((1, TL), dtype),
        sigma=sigma, alpha=alpha, eps_abs=eps_abs, eps_rel=eps_rel,
        n_epochs=n_epochs, chunks_per_epoch=chunks_per_epoch, seg=seg,
        adaptive_rho=adaptive_rho,
        adaptive_rho_tolerance=adaptive_rho_tolerance,
        eye_n=eye_n, loose=loose, equality=equality,
        check_infeas=check_infeas, eps_pinf=eps_pinf, eps_dinf=eps_dinf,
        factor_fn=factor_fn, use_aa=use_aa, aa_mem=aa_mem,
    )
    x, z, y, done, failv, itc, rho, rho_upd, rho_est, rp, rd = ec[:11]

    xo_ref[:] = x
    zo_ref[:] = z
    yo_ref[:] = y
    st_ref[:] = jnp.concatenate(
        [done, itc, rp, rd, failv, rho_upd, rho_est, ec[15]],
        axis=0,
    )


def _sqp_step_kernel(
    *refs,
    n, m, sigma, alpha, rho0, eps_abs, eps_rel,
    n_epochs, chunks_per_epoch, seg, adaptive_rho, adaptive_rho_tolerance,
    do_bfgs, in_minv, out_minv, use_aa, aa_mem,
):
    """One fused SQP subproblem step for a tile of problems:

        damped BFGS update (Procedure 18.2, reference bfgs.hpp:14-41)
        -> posdef fallback (reset-to-identity on factor failure; the
           fixed-schedule analog of the reference's escalating-shift
           repair, src/sqp.cpp:172-181)
        -> whole ADMM QP solve (warm-started)

    all in one kernel, transposed layout — the (B, n, n) Hessian never
    round-trips through XLA between outer iterations.  msk rows:
    0 = reset (k==1 or failed line search -> B := I), 1 = update allowed
    (not a tiny step), 2 = SQP-active (inactive lanes are frozen
    throughout and pass their warm state through), 3 = carried-in rho
    (with in_minv).

    ``in_minv`` reuses a factorization from a previous solve of the same
    (B, J) with different bounds — the SOC re-solve skips its setup
    factorization entirely (the reference TODO at src/sqp.cpp:273: "only
    l and u change").  ``out_minv`` emits the final factor for such reuse.
    """
    if in_minv:
        (B_ref, J_ref, g_ref, l_ref, u_ref, s_ref, dgl_ref, msk_ref,
         x_ref, z_ref, y_ref, mi_ref) = refs[: 12]
        out_refs = refs[12:]
    else:
        (B_ref, J_ref, g_ref, l_ref, u_ref, s_ref, dgl_ref, msk_ref,
         x_ref, z_ref, y_ref) = refs[: 11]
        out_refs = refs[11:]
    # 3 factor scratch refs trail the positional outputs
    fw_ref, fl_ref, fi_ref = out_refs[-3:]
    out_refs = out_refs[:-3]
    if out_minv:
        po_ref, zo_ref, yo_ref, Bo_ref, st_ref, mo_ref = out_refs
    else:
        po_ref, zo_ref, yo_ref, Bo_ref, st_ref = out_refs

    dtype = B_ref.dtype
    Bp = B_ref[:]         # (n, n, TL) current BFGS Hessian estimate
    A = J_ref[:]          # (m, n, TL) constraint Jacobian
    q = g_ref[:]          # (n, TL) objective gradient
    l = l_ref[:]          # (m, TL) shifted bounds l - c(x)
    u = u_ref[:]          # (m, TL)
    TL = q.shape[-1]

    row_i = lax.broadcasted_iota(jnp.int32, (n, n, 1), 0)
    col_i = lax.broadcasted_iota(jnp.int32, (n, n, 1), 1)
    eye_n = (row_i == col_i).astype(dtype)

    msk = msk_ref[:]      # (8, TL) f32 0/1 rows
    reset = msk[0:1]
    upd = msk[1:2]
    act0 = msk[2:3]

    if do_bfgs:
        eps_m = jnp.asarray(jnp.finfo(dtype).eps, dtype)
        tiny_pos = jnp.asarray(jnp.finfo(dtype).tiny, dtype)
        s = s_ref[:]       # (n, TL) x_k - x_{k-1}
        yv = dgl_ref[:]    # (n, TL) grad_L_k - grad_L_{k-1}
        Bs = jnp.sum(Bp * s[None, :, :], axis=1)  # (n, TL)
        sBs = jnp.sum(s * Bs, axis=0, keepdims=True)  # (1, TL)
        sy = jnp.sum(s * yv, axis=0, keepdims=True)
        damped = sy < 0.2 * sBs
        theta = 0.8 * sBs / jnp.maximum(sBs - sy, tiny_pos)
        r = jnp.where(damped, theta * yv + (1.0 - theta) * Bs, yv)
        sr = jnp.where(damped, theta * sy + (1.0 - theta) * sBs, sy)
        Bupd = (
            Bp
            - (Bs[:, None, :] * Bs[None, :, :]) / jnp.maximum(sBs, tiny_pos)
            + (r[:, None, :] * r[None, :, :]) / jnp.maximum(sr, tiny_pos)
        )
        keep = ((sr < eps_m) | (upd == 0.0))[:, None, :]  # (1, 1, TL)
        Bn = jnp.where(keep, Bp, Bupd)
        Bn = jnp.where((reset > 0.0)[:, None, :], eye_n, Bn)
    else:
        Bn = Bp

    loose = (l < -LOOSE_BOUNDS_THRESH) & (u > LOOSE_BOUNDS_THRESH)
    equality = (u - l) < RHO_TOL
    done0 = 1.0 - act0
    zero_row = jnp.zeros((1, TL), dtype)
    nfact0 = zero_row

    def sqp_factor(Bc, rho_vec):
        # stash the Hessian in the Li scratch for dynamic row reads (it
        # is zeroed by _factor_schur_refs only AFTER the M build read it)
        fi_ref[...] = Bc
        return _factor_schur_refs(
            lambda r: fi_ref[r],
            lambda c: J_ref[:, c],
            A * rho_vec[:, None, :],
            sigma, fw_ref, fl_ref, fi_ref,
        )

    if in_minv:
        # SOC re-solve: same (B, J), new bounds — reuse the carried-in
        # factor and rho (reference TODO src/sqp.cpp:273); the factor is
        # staged into the scratch the iterations read from
        fw_ref[...] = mi_ref[:]
        rho_in = msk[3:4]
        rho = jnp.where(rho_in > 0.0, rho_in, rho0)
        failv = zero_row
    else:
        rho = jnp.full((1, TL), rho0, dtype)
        rho_vec0 = _rho_from(rho, loose, equality)

        # initial factor (outside the core, so a pivot failure can repair
        # B before the solve) — skipped when the whole tile is inactive;
        # attempt 2 re-factors with B := I on failed lanes (the posdef
        # fallback).  One fori over attempts keeps a SINGLE factorization
        # instance in the kernel body — a second inlined instance raised
        # the Mosaic compile time ~50% at n=128.
        def attempt(i, carry):
            f, nfact, Bc, need = carry

            def do(args):
                f_old, cnt = args
                fn = sqp_factor(Bc, rho_vec0)
                return fn, cnt + 1.0

            f, nfact = lax.cond(need, do, lambda a: a, (f, nfact))
            bad = f * act0  # (1, TL): posdef fallback lanes
            Bc = jnp.where((bad > 0.0)[:, None, :], eye_n, Bc)
            need2 = (i < 1) & jnp.any(bad > 0.0)
            return f, nfact, Bc, need2

        f, nfact0, Bn, _ = lax.fori_loop(
            0, 2, attempt,
            (zero_row, nfact0, Bn, jnp.any(act0 > 0.0)),
        )
        failv = f * act0

    ec = _admm_core(
        Bn, A, q, l, u, x_ref[:], z_ref[:], y_ref[:],
        done=done0, failv=failv, rho=rho, minv_ref=fw_ref, pending=zero_row,
        sigma=sigma, alpha=alpha, eps_abs=eps_abs, eps_rel=eps_rel,
        n_epochs=n_epochs, chunks_per_epoch=chunks_per_epoch, seg=seg,
        adaptive_rho=adaptive_rho,
        adaptive_rho_tolerance=adaptive_rho_tolerance,
        eye_n=eye_n, loose=loose, equality=equality,
        factor_fn=lambda rv: sqp_factor(Bn, rv),
        use_aa=use_aa, aa_mem=aa_mem,
    )
    x, z, y, done, failv, itc, rho_f, rho_upd, rho_est, rp, rd = ec[:11]
    nfact = nfact0 + ec[14]
    # rho_f is ALWAYS the rho the emitted factor (left in fw_ref) was
    # computed under: pending adaptive updates adopt only at
    # factorization time, so a factor-reusing re-solve (SOC) stays
    # consistent

    po_ref[:] = x
    zo_ref[:] = z
    yo_ref[:] = y
    Bo_ref[:] = Bn
    st_ref[:] = jnp.concatenate(
        [done, itc, rp, rd, failv, rho_upd, rho_est, rho_f, nfact], axis=0
    )
    if out_minv:
        mo_ref[:] = fw_ref[...]


@functools.partial(
    jax.jit,
    static_argnames=(
        "n", "m", "sigma", "alpha", "rho0", "eps_abs", "eps_rel", "n_epochs",
        "chunks_per_epoch", "seg", "adaptive_rho", "adaptive_rho_tolerance",
        "lane_tile", "interpret", "do_bfgs", "in_minv", "out_minv",
        "use_aa", "aa_mem",
    ),
)
def _sqp_step_call(
    *args, n, m, sigma, alpha, rho0, eps_abs, eps_rel, n_epochs,
    chunks_per_epoch, seg, adaptive_rho, adaptive_rho_tolerance,
    lane_tile, interpret, do_bfgs, in_minv, out_minv, use_aa, aa_mem,
):
    gt = args[2]
    B = gt.shape[-1]
    grid = (B // lane_tile,)

    def spec(*lead):
        return pl.BlockSpec(
            lead + (lane_tile,),
            lambda i: (0,) * len(lead) + (i,),
            memory_space=pltpu.VMEM,
        )

    kernel = functools.partial(
        _sqp_step_kernel, n=n, m=m, sigma=sigma, alpha=alpha, rho0=rho0,
        eps_abs=eps_abs, eps_rel=eps_rel, n_epochs=n_epochs,
        chunks_per_epoch=chunks_per_epoch, seg=seg, adaptive_rho=adaptive_rho,
        adaptive_rho_tolerance=adaptive_rho_tolerance, do_bfgs=do_bfgs,
        in_minv=in_minv, out_minv=out_minv, use_aa=use_aa, aa_mem=aa_mem,
    )
    total_iters = n_epochs * chunks_per_epoch * seg
    in_specs = [spec(n, n), spec(m, n), spec(n), spec(m), spec(m),
                spec(n), spec(n), spec(8), spec(n), spec(m), spec(m)]
    if in_minv:
        in_specs.append(spec(n, n))
    out_specs = [spec(n), spec(m), spec(m), spec(n, n), spec(9)]
    out_shape = [
        jax.ShapeDtypeStruct((n, B), gt.dtype),
        jax.ShapeDtypeStruct((m, B), gt.dtype),
        jax.ShapeDtypeStruct((m, B), gt.dtype),
        jax.ShapeDtypeStruct((n, n, B), gt.dtype),
        jax.ShapeDtypeStruct((9, B), gt.dtype),
    ]
    if out_minv:
        out_specs.append(spec(n, n))
        out_shape.append(jax.ShapeDtypeStruct((n, n, B), gt.dtype))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[
            pltpu.VMEM((n, n, lane_tile), gt.dtype),  # factor work/Minv
            pltpu.VMEM((n, n, lane_tile), gt.dtype),  # L
            pltpu.VMEM((n, n, lane_tile), gt.dtype),  # L^-1 / B stash
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_CAP),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * (n * n + 2 * m * n) * total_iters
            + 2 * B * n * n * n * 3 * n_epochs,
            bytes_accessed=B * (2 * n * n + m * n) * 4,
            transcendentals=B * n * n_epochs,
        ),
    )(*args)


def sqp_step_kernel(
    Bt, Jt, gt, lt, ut, st_, dglt, mskt, xt, zt, yt,
    settings: QPSettings,
    do_bfgs: bool = True,
    minv_in=None,
    want_minv: bool = False,
    interpret: bool = False,
):
    """Fused BFGS + posdef fallback + warm-started QP solve, transposed
    layout (problems on the last axis).

    Inputs: Bt (n,n,B) Hessian, Jt (m,n,B) Jacobian, gt (n,B) gradient,
    lt/ut (m,B) shifted bounds, st_ (n,B) step, dglt (n,B) Lagrangian
    gradient delta, mskt (8,B) f32 rows [reset, update-allowed, active,
    rho-in, 0...], xt/zt/yt warm-start iterates.  Returns (p, z, lam,
    B_new, st[, Minv]) with st rows [done, iter, res_prim, res_dual,
    fail, rho_updates, rho_estimate, rho_of_emitted_factor,
    n_factorizations].  Row 7 is the rho the emitted Minv was factored
    under (NOT necessarily the final rho): feed it back as msk row 3 when
    reusing the factor.

    ``minv_in`` (n,n,B) reuses a previous solve's factor (put its final
    rho in msk row 3) — the SOC re-solve path where only l, u change
    skips the setup factorization entirely.  ``want_minv`` emits the
    final factor for such reuse.  B is padded to the lane tile internally.
    """
    if jax.default_backend() != "tpu":
        interpret = True
    n = gt.shape[0]
    m = lt.shape[0]
    B = gt.shape[-1]

    seg = settings.check_termination if settings.check_termination > 0 else settings.max_iter
    interval = settings.adaptive_rho_interval if settings.adaptive_rho else settings.max_iter
    chunks_per_epoch = max(1, -(-min(interval, settings.max_iter) // seg))
    n_epochs = max(1, -(-settings.max_iter // (chunks_per_epoch * seg)))

    lane_tile = _step_lane_tile(
        n, m, fused_bfgs=do_bfgs,
        carries_minv=(minv_in is not None) or want_minv,
    )
    pad = (-B) % lane_tile
    args = (Bt, Jt, gt, lt, ut, st_, dglt, mskt, xt, zt, yt)
    if minv_in is not None:
        args = args + (minv_in,)
    if pad:
        # pad problems on the last axis; padded lanes are inactive (msk=0)
        args = tuple(
            jnp.concatenate(
                [v, jnp.zeros(v.shape[:-1] + (pad,), v.dtype)], axis=-1
            )
            for v in args
        )
    def call_one(*a):
        return _sqp_step_call(
            *a,
            n=n, m=m, sigma=float(settings.sigma), alpha=float(settings.alpha),
            rho0=float(settings.rho), eps_abs=float(settings.eps_abs),
            eps_rel=float(settings.eps_rel), n_epochs=n_epochs,
            chunks_per_epoch=chunks_per_epoch, seg=seg,
            adaptive_rho=bool(settings.adaptive_rho),
            adaptive_rho_tolerance=float(settings.adaptive_rho_tolerance),
            lane_tile=lane_tile, interpret=interpret, do_bfgs=do_bfgs,
            in_minv=minv_in is not None, out_minv=want_minv,
            use_aa=settings.acceleration == "anderson",
            aa_mem=int(settings.anderson_memory),
        )

    Bp = args[2].shape[-1]  # padded batch
    if lane_tile < 128 and not interpret:
        out = _chunked_lanes(call_one, args, Bp, lane_tile)
    else:
        out = call_one(*args)
    if pad:
        out = tuple(v[..., :B] for v in out)
    return out


@functools.partial(
    jax.jit,
    static_argnames=(
        "n", "m", "sigma", "alpha", "rho0", "eps_abs", "eps_rel", "n_epochs",
        "chunks_per_epoch", "seg", "adaptive_rho", "adaptive_rho_tolerance",
        "lane_tile", "interpret", "check_infeas", "eps_pinf", "eps_dinf",
        "use_aa", "aa_mem",
    ),
)
def _qp_kernel_call(
    Pt, At, qt, lt, ut, xt, zt, yt, *, n, m, sigma, alpha, rho0, eps_abs,
    eps_rel, n_epochs, chunks_per_epoch, seg, adaptive_rho,
    adaptive_rho_tolerance, lane_tile, interpret, check_infeas, eps_pinf,
    eps_dinf, use_aa, aa_mem,
):
    B = qt.shape[-1]
    grid = (B // lane_tile,)

    def spec(*lead):
        return pl.BlockSpec(
            lead + (lane_tile,),
            lambda i: (0,) * len(lead) + (i,),
            memory_space=pltpu.VMEM,
        )

    kernel = functools.partial(
        _qp_kernel, n=n, m=m, sigma=sigma, alpha=alpha, rho0=rho0,
        eps_abs=eps_abs, eps_rel=eps_rel, n_epochs=n_epochs,
        chunks_per_epoch=chunks_per_epoch, seg=seg, adaptive_rho=adaptive_rho,
        adaptive_rho_tolerance=adaptive_rho_tolerance,
        check_infeas=check_infeas, eps_pinf=eps_pinf, eps_dinf=eps_dinf,
        use_aa=use_aa, aa_mem=aa_mem,
    )
    total_iters = n_epochs * chunks_per_epoch * seg
    x, z, y, st = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec(n, n), spec(m, n), spec(n), spec(m), spec(m),
                  spec(n), spec(m), spec(m)],
        out_specs=(spec(n), spec(m), spec(m), spec(8)),
        out_shape=(
            jax.ShapeDtypeStruct((n, B), qt.dtype),
            jax.ShapeDtypeStruct((m, B), qt.dtype),
            jax.ShapeDtypeStruct((m, B), qt.dtype),
            jax.ShapeDtypeStruct((8, B), qt.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((n, n, lane_tile), qt.dtype),  # factor work/Minv
            pltpu.VMEM((n, n, lane_tile), qt.dtype),  # L
            pltpu.VMEM((n, n, lane_tile), qt.dtype),  # L^-1
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_CAP),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * (n * n + 2 * m * n) * total_iters
            + 2 * B * n * n * n * 3 * n_epochs,
            bytes_accessed=B * (n * n + m * n) * 4,
            transcendentals=B * n * n_epochs,
        ),
    )(Pt, At, qt, lt, ut, xt, zt, yt)
    return x, z, y, st


def qp_solve_kernel(
    qp: QuadraticProblem,
    settings: QPSettings = QPSettings(),
    state: Optional[QPState] = None,
    interpret: bool = False,
) -> QPResult:
    """Solve a batch of QPs with the whole-solve kernel.

    Fixed schedule with on-device early exit; schur_cholesky solve;
    rho epochs = adaptive_rho_interval.  Leaves of ``qp`` carry leading
    batch dim B.  ``linear_solver="schur_block_tridiag"`` routes to the
    structured whole-solve kernel (ops/qp_kernel_btd.py — block-Thomas
    factorization + band sweeps inside the same epoch/chunk machinery).
    """
    settings.validate()
    if settings.check_comp_slack:
        raise ValueError(
            "check_comp_slack is not supported on the whole-solve kernel "
            "tiers (termination is evaluated in-kernel); use the fused or "
            "per-problem tier"
        )
    if settings.linear_solver == "schur_block_tridiag":
        from sqp_solver_tpu.ops.qp_kernel_btd import qp_solve_kernel_btd

        return qp_solve_kernel_btd(qp, settings, state, interpret)
    if jax.default_backend() != "tpu":
        interpret = True  # pallas TPU kernels only compile for TPU
    P, q, A, l, u = qp.P, qp.q, qp.A, qp.l, qp.u
    dtype = P.dtype
    B, n = q.shape
    m = A.shape[-2]

    seg = settings.check_termination if settings.check_termination > 0 else settings.max_iter
    interval = settings.adaptive_rho_interval if settings.adaptive_rho else settings.max_iter
    chunks_per_epoch = max(1, -(-min(interval, settings.max_iter) // seg))
    n_epochs = max(1, -(-settings.max_iter // (chunks_per_epoch * seg)))

    lane_tile = pick_lane_tile(n, m)
    pad = (-B) % lane_tile
    if pad:
        qp_p = QuadraticProblem(
            *(jnp.concatenate([v, jnp.repeat(v[:1], pad, axis=0)]) for v in (P, q, A, l, u))
        )
        if state is not None:
            state = jax.tree.map(
                lambda v: jnp.concatenate([v, jnp.repeat(v[:1], pad, axis=0)]), state
            )
        return jax.tree.map(lambda v: v[:B], qp_solve_kernel(qp_p, settings, state, interpret))

    if state is None:
        x0 = jnp.zeros((B, n), dtype)
        z0 = jnp.zeros((B, m), dtype)
        y0 = jnp.zeros((B, m), dtype)
    else:
        x0, z0, y0 = state.x, state.z, state.y

    # transpose to problems-last layout
    Pt = jnp.moveaxis(P, 0, -1)
    At = jnp.moveaxis(A, 0, -1)
    qt, lt, ut, xt, zt, yt = (jnp.moveaxis(v, 0, -1) for v in (q, l, u, x0, z0, y0))

    def call_one(*a):
        return _qp_kernel_call(
            *a,
            n=n, m=m, sigma=float(settings.sigma), alpha=float(settings.alpha),
            rho0=float(settings.rho), eps_abs=float(settings.eps_abs),
            eps_rel=float(settings.eps_rel), n_epochs=n_epochs,
            chunks_per_epoch=chunks_per_epoch, seg=seg,
            adaptive_rho=bool(settings.adaptive_rho),
            adaptive_rho_tolerance=float(settings.adaptive_rho_tolerance),
            lane_tile=lane_tile, interpret=interpret,
            check_infeas=bool(settings.check_infeasibility),
            eps_pinf=float(settings.eps_pinf),
            eps_dinf=float(settings.eps_dinf),
            use_aa=settings.acceleration == "anderson",
            aa_mem=int(settings.anderson_memory),
        )

    args = (Pt, At, qt, lt, ut, xt, zt, yt)
    if lane_tile < 128 and not interpret:
        x, z, y, st = _chunked_lanes(call_one, args, B, lane_tile)
    else:
        x, z, y, st = call_one(*args)
    x, z, y, st = (jnp.moveaxis(v, -1, 0) for v in (x, z, y, st))
    done = st[:, 0] > 0.5
    failed = st[:, 4] > 0.5
    infeas = st[:, 7]
    status = jnp.where(
        failed,
        QPStatus.NUMERICAL_ISSUES,
        jnp.where(
            done,
            QPStatus.SOLVED,
            jnp.where(
                infeas > 1.5,
                QPStatus.DUAL_INFEASIBLE,
                jnp.where(
                    infeas > 0.5,
                    QPStatus.PRIMAL_INFEASIBLE,
                    QPStatus.MAX_ITER_EXCEEDED,
                ),
            ),
        ),
    ).astype(jnp.int32)
    info = QPInfo(
        status=status,
        iter=jnp.minimum(st[:, 1].astype(jnp.int32), settings.max_iter),
        rho_updates=st[:, 5].astype(jnp.int32),
        rho_estimate=st[:, 6],
        res_prim=st[:, 2],
        res_dual=st[:, 3],
    )
    result = QPResult(x=x, y=y, z=z, info=info)
    if settings.polish:
        from sqp_solver_tpu.qp.polish import polish_qp

        result = polish_qp(qp, result, settings)
    return result
