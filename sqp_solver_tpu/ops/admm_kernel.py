"""Pallas TPU kernel for the ADMM inner loop.

The hot loop of the batched QP solver is `seg` iterations of

    rhs  = [sigma*x - q ; z - y/rho]
    xz   = W @ rhs                      # W = fused iteration operator
    pre  = alpha*xz + (1-alpha)*[x; z]
    s'   = clip(pre + [0; y/rho], [-inf; l], [+inf; u])
    y'   = y + rho * (pre - s')[n:]

Everything is expressed on padded D = n+m vectors (state s = [x; z],
y_pad = [0; y], bounds [-inf; l] / [+inf; u], rho_pad = [0; rho]), so the
x-update and the box projection are literally the same clip and the kernel
contains no per-iteration slicing.

Why a kernel: under ``lax`` loops each XLA op pays ~0.3ms of loop-step
overhead at these sizes (measured), and the batched GEMV re-streams the
(B, D, D) operator from HBM every iteration.  This kernel loads each
problem tile's operator into VMEM ONCE per chunk and runs all `seg`
iterations locally (measured: 61us/iter for B=4096, D=65 vs 328us/iter for
the best XLA formulation).  The chunk-end termination residuals
(reference ``src/qp.cpp:317-331``) are also computed in-kernel — P and A
tiles are loaded once per chunk instead of three extra XLA matvecs + ten
reduction dispatches.

This is the ``linear_solver="schur_cholesky"`` fast path; the same padded
math has an XLA fallback used off-TPU (also exercised against the kernel
in interpret mode by CPU tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["admm_chunk", "admm_chunk_xla", "admm_chunk_pallas", "pick_tile"]


def pick_tile(D: int, vmem_budget: int = 12 * 1024 * 1024) -> int:
    """Problems per pallas program: multiple of 8 (f32 sublane tile), capped
    so the tile's VMEM footprint fits.  Callers pad B to a multiple.

    Footprint model (empirical, from Mosaic's scoped-vmem accounting): every
    operand row is lane-padded to 128 and input blocks are double-buffered,
    so per problem it's roughly 2 buffers * 4 B * 128 lanes * (D rows of W
    + n rows of P + m rows of A + ~24 rows of vectors/outputs) — with
    n + m = D that is ~8 * 128 * (2D + 24) bytes."""
    per_problem = 16 * 128 * (3 * D + 24)  # + the A' operand (see _stats)
    return max(8, min(64, vmem_budget // max(per_problem, 1) // 8 * 8))


def _iteration(W, qv, scale1, rhoip, rhop, ysel, lp, up, alpha, s, yp, batched):
    # rhs = [sigma*x - q ; rho.*z - y]: the rho-free fused operator W takes
    # the well-scaled dual form (see linear_solver._schur_factor)
    rhs = scale1 * s - qv - ysel * yp
    if batched:
        xz = jnp.einsum("bij,bj->bi", W, rhs, precision=lax.Precision.HIGHEST)
    else:
        xz = jnp.sum(W * rhs[..., None, :], axis=-1)
    pre = alpha * xz + (1.0 - alpha) * s
    s_new = jnp.clip(pre + rhoip * yp, lp, up)
    yp_new = yp + rhop * (pre - s_new)
    return s_new, yp_new


def _stats(P, A, At, q, x, z, y):
    """Residuals + norm caches, per problem: returns (T, 4) =
    [res_prim, res_dual, max_Ax_z, max_Px_ATy_q].  Takes BOTH A (T, m, n)
    and its transpose At (T, n, m): computing A'y from A in-kernel needs
    y broadcast across a NEW minor axis (lane->sublane), which Mosaic
    rejects as an unsupported reshape for general (m, n) — with At the
    contraction keeps y on the lanes."""
    Ax = jnp.sum(A * x[:, None, :], axis=-1)  # (T, m)
    Px = jnp.sum(P * x[:, None, :], axis=-1)  # (T, n)
    ATy = jnp.sum(At * y[:, None, :], axis=-1)  # (T, n)
    linf = lambda v: jnp.max(jnp.abs(v), axis=-1)
    res_prim = linf(Ax - z)
    res_dual = linf(Px + q + ATy)
    max_Ax_z = jnp.maximum(linf(Ax), linf(z))
    max_Px_ATy_q = jnp.maximum(linf(Px), jnp.maximum(linf(ATy), linf(q)))
    return jnp.stack([res_prim, res_dual, max_Ax_z, max_Px_ATy_q], axis=-1)


def admm_chunk_xla(W, P, A, qv, scale1, rhoip, rhop, lp, up, s, yp, *, alpha, seg,
                   unroll=8):
    """Fallback chunk: `seg` padded ADMM iterations via lax.scan + stats."""
    n = P.shape[-1]

    ysel = rhoip * rhop  # [0_n; 1_m]

    def body(carry, _):
        s, yp = carry
        return _iteration(W, qv, scale1, rhoip, rhop, ysel, lp, up, alpha, s, yp, True), None

    (s, yp), _ = lax.scan(body, (s, yp), None, length=seg, unroll=min(unroll, seg))
    stats = _stats(P, A, A.mT, qv[:, :n], s[:, :n], s[:, n:], yp[:, n:])
    return s, yp, stats


def _chunk_kernel(W_ref, P_ref, A_ref, At_ref, qv_ref, sc_ref, ri_ref, rp_ref,
                  lp_ref, up_ref, s_ref, yp_ref, so_ref, yo_ref, st_ref, *,
                  alpha, seg, n):
    W = W_ref[:]
    qv = qv_ref[:]
    sc = sc_ref[:]
    ri = ri_ref[:]
    rp = rp_ref[:]
    lp = lp_ref[:]
    up = up_ref[:]

    ysel = ri * rp  # [0_n; 1_m], hoisted out of the loop

    def body(_, st):
        s, yp = st
        # multiply+reduce on the VPU: (T, D, D) * (T, 1, D) -> sum_j -> (T, D)
        return _iteration(W, qv, sc, ri, rp, ysel, lp, up, alpha, s, yp, False)

    s, yp = lax.fori_loop(0, seg, body, (s_ref[:], yp_ref[:]))
    so_ref[:] = s
    yo_ref[:] = yp
    st_ref[:] = _stats(
        P_ref[:], A_ref[:], At_ref[:], qv[:, :n], s[:, :n], s[:, n:], yp[:, n:]
    )


@functools.partial(jax.jit, static_argnames=("alpha", "seg", "tile", "interpret"))
def admm_chunk_pallas(
    W, P, A, qv, scale1, rhoip, rhop, lp, up, s, yp, *, alpha, seg, tile=None,
    interpret=False,
):
    """Run `seg` ADMM iterations + chunk-end residuals for a batched
    problem set.  B must be a multiple of `tile` (callers pad)."""
    B, D = s.shape
    n = P.shape[-1]
    m = A.shape[-2]
    tile = tile or pick_tile(D)
    assert B % tile == 0, (B, tile)
    grid = (B // tile,)

    def tile_spec(*dims):
        return pl.BlockSpec(
            (tile,) + dims, lambda i: (i,) + (0,) * len(dims), memory_space=pltpu.VMEM
        )

    kernel = functools.partial(_chunk_kernel, alpha=alpha, seg=seg, n=n)
    s_out, yp_out, stats = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            tile_spec(D, D),  # W
            tile_spec(n, n),  # P
            tile_spec(m, n),  # A
            tile_spec(n, m),  # A' (see _stats)
        ]
        + [tile_spec(D)] * 8,
        out_specs=(tile_spec(D), tile_spec(D), tile_spec(4)),
        out_shape=(
            jax.ShapeDtypeStruct((B, D), s.dtype),
            jax.ShapeDtypeStruct((B, D), yp.dtype),
            jax.ShapeDtypeStruct((B, 4), s.dtype),
        ),
        interpret=interpret,
        # large-D configs (e.g. the n=192 MPC family, D=512) need more
        # than Mosaic's default 16 MB scoped window even at the minimum
        # 8-problem tile (measured 23.7 MB)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * D * D * (seg + 2),
            bytes_accessed=B * D * D * 4,
            transcendentals=0,
        ),
    )(W, P, A, A.mT, qv, scale1, rhoip, rhop, lp, up, s, yp)
    return s_out, yp_out, stats


def admm_chunk(W, P, A, qv, scale1, rhoip, rhop, lp, up, s, yp, *, alpha, seg,
               backend="auto", tile=None):
    """Dispatch to the pallas kernel (TPU) or the XLA fallback."""
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    args = (W, P, A, qv, scale1, rhoip, rhop, lp, up, s, yp)
    if backend == "pallas":
        return admm_chunk_pallas(*args, alpha=alpha, seg=seg, tile=tile)
    if backend == "pallas_interpret":
        return admm_chunk_pallas(*args, alpha=alpha, seg=seg, tile=tile, interpret=True)
    return admm_chunk_xla(*args, alpha=alpha, seg=seg)
