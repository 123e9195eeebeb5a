"""Measure the strip-formulation BSR matvec vs dense on the real TPU
(VERDICT r4 ask #4).

Two measurements:
1. operator cost via in-program repetition: chain R dependent matvecs
   inside one jit program, slope = per-matvec cost (the ~30 ms relay
   dispatch floor cancels).
2. end-to-end sparse-cg vs dense-cg vs dense blocked-Cholesky at the
   bench config (n=4096, density 0.03, fixed pattern across reps).

Run on the real TPU: python scripts/bsrprobe.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from sqp_solver_tpu.models.sparse import sparse_qp_pair
from sqp_solver_tpu.qp import qp_solve as qp_solve_one
from sqp_solver_tpu.qp.types import QPSettings

N = 4096
salt = int(time.time() * 1e3) % 100000
CROSSOVER_ONLY = len(sys.argv) > 1 and sys.argv[1] == "crossover"
psd = salt % 97
d0, s0 = sparse_qp_pair(n=N, m=N, bs=128, density=0.03, seed=psd,
                        dtype=jnp.float32)
print(f"P blocks {s0.P.nblocks}/{(N//128)**2}, A blocks {s0.A.nblocks}",
      flush=True)


def chain(op, R):
    def run(x):
        def body(i, v):
            w = op(v)
            return w / (1.0 + jnp.max(jnp.abs(w)))  # keep finite, dependent
        return jax.lax.fori_loop(0, R, body, x)
    return jax.jit(run)


Pd = d0.P
Ps = s0.P
prepared = jax.jit(lambda: Ps.prepare(False))()

x0 = jax.random.normal(jax.random.PRNGKey(salt), (N,), jnp.float32)
for label, op in () if CROSSOVER_ONLY else (
    ("dense mv", lambda v: Pd @ v),
    ("bsr mv (derive in loop)", lambda v: Ps.mv(v)),
    ("bsr mv (prepared)", lambda v: Ps.mv(v, prepared=prepared)),
):
    for R in (8, 64):
        f = chain(op, R)
        _ = np.asarray(f(x0))  # compile+warm
        t0 = time.perf_counter()
        _ = np.asarray(f(x0 * (1.0 + 1e-6 * (salt % 7))))
        dt = time.perf_counter() - t0
        if R == 8:
            t8 = dt
    slope = (dt - t8) / (64 - 8)
    print(f"{label}: R8={t8*1e3:.1f}ms R64={dt*1e3:.1f}ms "
          f"slope={slope*1e6:.0f}us/matvec", flush=True)

# ---- end-to-end CG rows ----------------------------------------------------
import dataclasses as _dc

cg_cfg = QPSettings(linear_solver="cg", eps_abs=1e-4, eps_rel=1e-4,
                    max_iter=2000, check_termination=25, adaptive_rho=True)
chol_cfg = _dc.replace(cg_cfg, linear_solver="schur_cholesky_blocked")
rows = () if CROSSOVER_ONLY else (
    ("sparse-cg", cg_cfg, True), ("dense-cg", cg_cfg, False),
    ("dense-chol-blocked", chol_cfg, False))
for label, cfg, use_sparse in rows:
    sol = jax.jit(lambda p, c=cfg: qp_solve_one(p, c))
    p0 = s0 if use_sparse else d0
    _ = np.asarray(sol(p0).info.status)
    ts = []
    for rep in (1, 2):
        d2, s2 = sparse_qp_pair(n=N, m=N, bs=128, density=0.03,
                                seed=psd + rep, dtype=jnp.float32,
                                pattern_seed=psd)
        p2 = s2 if use_sparse else d2
        jax.block_until_ready(jax.tree.leaves(p2))
        t0 = time.perf_counter()
        r2 = sol(p2)
        st = int(np.asarray(r2.info.status))
        ts.append(time.perf_counter() - t0)
    print(f"{label}: {min(ts)*1e3:.0f}ms status={st} "
          f"iters={int(np.asarray(r2.info.iter))}", flush=True)

# ---- crossover sweep: larger n, lower density ------------------------------
if len(sys.argv) > 1 and sys.argv[1] == "crossover":
    for N2, dens in ((8192, 0.015), (8192, 0.03)):
        d3, s3 = sparse_qp_pair(n=N2, m=N2, bs=128, density=dens,
                                seed=psd + 7, dtype=jnp.float32)
        print(f"n={N2} density={dens}: P blocks {s3.P.nblocks}/{(N2//128)**2}",
              flush=True)
        for label, cfg, use_sparse in (
            ("sparse-cg", cg_cfg, True),
            ("dense-chol-blocked", chol_cfg, False),
        ):
            sol = jax.jit(lambda p, c=cfg: qp_solve_one(p, c))
            p0 = s3 if use_sparse else d3
            t0 = time.perf_counter()
            _ = np.asarray(sol(p0).info.status)
            print(f"  {label} compile+first: {time.perf_counter()-t0:.0f}s",
                  flush=True)
            ts = []
            for rep in (1, 2):
                d4, s4 = sparse_qp_pair(n=N2, m=N2, bs=128, density=dens,
                                        seed=psd + 8 + rep, dtype=jnp.float32,
                                        pattern_seed=psd + 7)
                p4 = s4 if use_sparse else d4
                jax.block_until_ready(jax.tree.leaves(p4))
                t0 = time.perf_counter()
                r4 = sol(p4)
                st = int(np.asarray(r4.info.status))
                ts.append(time.perf_counter() - t0)
            print(f"  {label}: {min(ts)*1e3:.0f}ms status={st} "
                  f"iters={int(np.asarray(r4.info.iter))}", flush=True)
