"""Decompose the structured whole-solve kernel's wall time at the bench
config (n=192, m=320, B=256): XLA prologue (band extraction + layout
transposes) vs the Pallas kernel call, via in-program repetition slopes
(standalone timings are useless through the relay — ROADMAP fact r3-1).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from sqp_solver_tpu.models.mpc import mpc_qp_stagewise_batch
from sqp_solver_tpu.ops.qp_kernel_btd import (
    _btd_lane_tile,
    _extract_band,
    _qp_btd_call,
    btd_internal_block,
)
from sqp_solver_tpu.qp.types import QPSettings

salt = int(time.time_ns() % 100000)
B, H = 256, 64
qp, blk = mpc_qp_stagewise_batch(B, horizon=H, seed=salt % 97, dtype=jnp.float32)
n = qp.P.shape[-1]
m = qp.A.shape[-2]
bb = btd_internal_block(blk)
s = QPSettings(adaptive_rho=True, max_iter=100)
print(f"n={n} m={m} bb={bb} B={B}")


def prologue(qp, salt_v):
    pdt, pet = _extract_band(qp.P, bb)
    At = jnp.moveaxis(qp.A, 0, -1)
    qt = jnp.moveaxis(qp.q + salt_v, 0, -1)
    lt = jnp.moveaxis(qp.l, 0, -1)
    ut = jnp.moveaxis(qp.u, 0, -1)
    return pdt, pet, At, qt, lt, ut


def timed(fn, args, reps=3):
    ts = []
    for r in range(reps):
        t0 = time.perf_counter()
        out = fn(*args, float(salt + r))
        _ = np.asarray(jax.tree.leaves(out)[0].ravel()[:4])
        ts.append(time.perf_counter() - t0)
    return min(ts)


# ---- prologue cost: 1x vs 3x in one program --------------------------------
@jax.jit
def prol1(qp, sv):
    outs = prologue(qp, sv)
    return sum(jnp.sum(o[..., :1]) for o in outs)


@jax.jit
def prol3(qp, sv):
    acc = 0.0
    for i in range(3):
        outs = prologue(qp, sv + i)
        acc = acc + sum(jnp.sum(o[..., :1]) for o in outs)
    return acc


t1 = timed(prol1, (qp,))
t3 = timed(prol3, (qp,))
print(f"prologue: 1x={t1*1e3:.1f}ms 3x={t3*1e3:.1f}ms -> slope {(t3-t1)/2*1e3:.1f}ms/prologue")


# ---- kernel cost: 1x vs 2x chained solves in one program -------------------
def kern_args(qp, sv):
    pdt, pet, At, qt, lt, ut = prologue(qp, sv)
    zt = jnp.zeros((m, B), jnp.float32)
    xt = jnp.zeros((n, B), jnp.float32)
    mskt = jnp.zeros((8, B), jnp.float32).at[2].set(1.0)
    return pdt, pet, At, qt, lt, ut, mskt, xt, zt, zt


kw = dict(
    n=n, m=m, bb=bb, sigma=float(s.sigma), alpha=float(s.alpha),
    rho0=float(s.rho), eps_abs=float(s.eps_abs), eps_rel=float(s.eps_rel),
    n_epochs=2, chunks_per_epoch=2, seg=25, adaptive_rho=True,
    adaptive_rho_tolerance=float(s.adaptive_rho_tolerance),
    lane_tile=_btd_lane_tile(n, m, bb), interpret=False,
    check_infeas=False, eps_pinf=1e-4, eps_dinf=1e-4,
    use_aa=False, aa_mem=4,
)


@jax.jit
def k1(qp, sv):
    a = kern_args(qp, sv)
    x, z, y, st = _qp_btd_call(*a, **kw)
    return jnp.sum(st[:, :1])


@jax.jit
def k2(qp, sv):
    a = kern_args(qp, sv)
    x, z, y, st = _qp_btd_call(*a, **kw)
    # chain: second solve warm-started from the first (data dependency
    # forces sequential execution; same operator work)
    x2, z2, y2, st2 = _qp_btd_call(a[0], a[1], a[2], a[3] + 1e-6, a[4], a[5],
                                   a[6], x, z, y, **kw)
    return jnp.sum(st[:, :1]) + jnp.sum(st2[:, :1])


tk1 = timed(k1, (qp,))
tk2 = timed(k2, (qp,))
print(f"kernel(+prologue): 1x={tk1*1e3:.1f}ms 2x={tk2*1e3:.1f}ms -> "
      f"slope {(tk2-tk1)*1e3:.1f}ms/solve (warm-started 2nd: lower bound "
      f"on cold kernel)")
print(f"decomposition: dispatch+prologue+kernel = {tk1*1e3:.1f}; "
      f"prologue slope = {(t3-t1)/2*1e3:.1f}; kernel >= {(tk2-tk1)*1e3:.1f}")
