"""Damped BFGS update — Procedure 18.2 (Nocedal & Wright).

Functional equivalent of the reference header (C14,
``include/solvers/bfgs.hpp:14-41``): damping when ``s'y < 0.2 s'Bs``
keeps B positive definite; the update is skipped when ``s'r`` falls below
machine epsilon.  Pure jnp — vmaps over batched Hessians for free.
"""

from __future__ import annotations

import jax.numpy as jnp

from sqp_solver_tpu.utils.precision import hdot

__all__ = ["bfgs_update"]


def bfgs_update(B: jnp.ndarray, s: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Rank-2 damped BFGS update of ``B`` with step ``s`` and gradient
    change ``y``.  NaN-safe for s = 0 (returns B unchanged), so it can sit
    on the untaken branch of a ``lax.cond`` under vmap."""
    dtype = B.dtype
    eps = jnp.finfo(dtype).eps
    tiny = jnp.asarray(jnp.finfo(dtype).tiny, dtype)

    Bs = hdot(B, s)
    sBs = hdot(s, Bs)
    sy = hdot(s, y)

    damped = sy < 0.2 * sBs
    # Safe denominators: when `damped` holds, sBs - sy > 0.8*sBs >= 0.
    theta = 0.8 * sBs / jnp.maximum(sBs - sy, tiny)
    r = jnp.where(damped, theta * y + (1.0 - theta) * Bs, y)
    sr = jnp.where(damped, theta * sy + (1.0 - theta) * sBs, sy)

    B_new = (
        B
        - jnp.outer(Bs, Bs) / jnp.maximum(sBs, tiny)
        + jnp.outer(r, r) / jnp.maximum(sr, tiny)
    )
    skip = sr < eps
    return jnp.where(skip, B, B_new)
