"""Shared type-II Anderson-acceleration core.

The safeguarded AA scheme (difference buffers, Levenberg-regularized k x k
normal equations, monotone accept guard) runs on the per-problem tier
(``qp/admm.py``) and the fused tier (``qp/admm_batched.py``).  Round-2
maintained the ~80-line extrapolation step as two parallel texts; this
module holds the ONE shape-agnostic text (leading batch dims optional).
The tier-specific parts stay with the tiers: how the iterate vector is
packed, how the candidate is projected back onto the box, and how the
safeguard's true residuals are evaluated.

Algorithm notes (see qp/admm.py:_anderson_step for the solver-level
rationale): the chunk map T is a fixed-point map for u = (x, z, y); AA
extrapolates through the last ``memory`` chunk outputs.  Difference-based
buffers keep the bookkeeping consistent whether the mixed or the plain
point was taken.  Buffers reset on rho re-factorization (the map
changes) — the tiers handle that via ``prev_ok``/``pairs``.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

__all__ = ["anderson_init", "anderson_extrapolate"]


def anderson_init(batch_shape, memory, dim, dtype):
    """Fresh AA state: ``batch_shape`` is () for the per-problem tier or
    (B,) for the fused tier; ``dim`` is the packed iterate length."""
    return dict(
        dU=jnp.zeros(batch_shape + (memory, dim), dtype),
        dF=jnp.zeros(batch_shape + (memory, dim), dtype),
        uT_prev=jnp.zeros(batch_shape + (dim,), dtype),
        f_prev=jnp.zeros(batch_shape + (dim,), dtype),
        prev_ok=jnp.zeros(batch_shape, jnp.bool_),
        pairs=jnp.zeros(batch_shape, jnp.int32),
    )


def anderson_extrapolate(aa, u_in, u_T, memory):
    """One AA-II step: push the newest (u_T, f) differences into the ring
    buffers and solve the regularized normal equations.

    Returns ``(u_aa, pairs, aa_new)`` — the raw extrapolated candidate
    (caller projects/safeguards it), the pair count (0 means no history:
    the caller must not accept), and the updated state.
    """
    dtype = u_T.dtype
    f = u_T - u_in
    have_prev = aa["prev_ok"]
    roll = lambda buf, col: jnp.where(
        have_prev[..., None, None],
        jnp.roll(buf, -1, axis=-2).at[..., -1, :].set(col),
        buf,
    )
    dU = roll(aa["dU"], u_T - aa["uT_prev"])
    dF = roll(aa["dF"], f - aa["f_prev"])
    pairs = jnp.minimum(aa["pairs"] + have_prev.astype(jnp.int32), memory)
    # newest pairs live at the end of the ring
    valid = jnp.arange(memory) >= (memory - pairs)[..., None]
    dFm = jnp.where(valid[..., None], dF, 0.0)
    dUm = jnp.where(valid[..., None], dU, 0.0)
    hp = lax.Precision.HIGHEST
    G = jnp.einsum("...kd,...ld->...kl", dFm, dFm, precision=hp)
    # Levenberg regularization + identity on unused rows (their rhs is
    # zero, so their gamma is exactly zero)
    reg = 1e-8 * (jnp.trace(G, axis1=-2, axis2=-1) + 1.0)
    eye_k = jnp.eye(memory, dtype=dtype)
    G = G + (reg[..., None, None] + (~valid).astype(dtype)[..., None] * eye_k) * eye_k
    rhs = jnp.einsum("...kd,...d->...k", dFm, f, precision=hp)
    gamma = jnp.linalg.solve(G, rhs[..., None])[..., 0]
    u_aa = u_T - jnp.einsum("...kd,...k->...d", dUm, gamma, precision=hp)
    aa_new = dict(
        dU=dU,
        dF=dF,
        uT_prev=u_T,
        f_prev=f,
        prev_ok=jnp.ones(have_prev.shape, jnp.bool_),
        pairs=pairs,
    )
    return u_aa, pairs, aa_new
