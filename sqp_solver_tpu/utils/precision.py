"""Precision-pinned matmul helpers + the solver-wide precision decorator.

On TPU, XLA's default matmul precision decomposes f32 contractions into
bf16 passes — fine for neural nets, fatal for a linear-system solver (the
Cholesky/Schur pipeline loses ~3 decimal digits and ADMM stops
converging; measured: batch solved-fraction 0.42 -> 0.76 and median SQP
iterations 15 -> 7 just from pinning precision).  Every contraction on the
solver's critical path goes through these helpers so library accuracy
doesn't depend on global config.

``pin_precision`` wraps a whole solver entry point in
``jax.default_matmul_precision("highest")`` — it must cover USER
callables too (objective/constraint autodiff at default precision
poisons the QP data and line-search merit values; measured round 1:
batch err_p99 7.9e-2 -> 1.8e-3), which is why entry points pin the whole
trace rather than only their own contractions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["hdot", "hmat", "pin_precision"]


def hmat(a, b):
    """matmul at HIGHEST precision (full f32 on MXU)."""
    return jnp.matmul(a, b, precision=lax.Precision.HIGHEST)


def hdot(a, b):
    """dot at HIGHEST precision (vector-vector / matrix-vector)."""
    return jnp.dot(a, b, precision=lax.Precision.HIGHEST)


def pin_precision(fn):
    """Trace ``fn`` entirely at HIGHEST matmul precision (see module docs)."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped
