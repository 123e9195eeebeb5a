"""Validate the redesigned btd-nlp bench leg on the real TPU.

T=32 (n=128 m=224) B=64, 120 outers, qpit=300, ls=16: btd kernel tier
vs dense kernel tier — same outer algorithm, same instances.

Run: python scripts/btdnlpprobe.py
"""

import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from sqp_solver_tpu.models.mpc import (
    mpc_nlp_kkt_residuals,
    mpc_nlp_stagewise_batch,
)
from sqp_solver_tpu.parallel.batch import sqp_solve_batch
from sqp_solver_tpu.qp.types import QPSettings
from sqp_solver_tpu.sqp.types import SQPSettings

Bn_, Tn_ = 64, 32
salt = int(time.time() * 1e3) % 100000
base_n = SQPSettings(
    max_iter=120, eps_prim=1e-4, eps_dual=1e-4, termination="kkt",
    schedule="fixed", polish=True, polish_passes=3,
    line_search_max_iter=16, qp_impl="kernel_btd",
    qp=QPSettings(
        alpha=1.6, eps_abs=1e-5, eps_rel=1e-5, max_iter=300,
        check_termination=25, warm_start=True, adaptive_rho=True,
        adaptive_rho_interval=50, block_size=4,
    ),
)
for label, s_n in (
    ("btd kernel tier", base_n),
    ("dense kernel tier", dataclasses.replace(base_n, qp_impl="kernel")),
):
    sol_n = jax.jit(
        lambda pr, xx, s_n=s_n: sqp_solve_batch(pr, xx, None, s_n, impl="fused")
    )
    prob_w, x0_w, _ = mpc_nlp_stagewise_batch(
        Bn_, horizon=Tn_, seed=0, dtype=jnp.float32
    )
    t0 = time.perf_counter()
    _ = np.asarray(sol_n(prob_w, x0_w).info.status)
    print(f"{label} compile+first: {time.perf_counter()-t0:.0f}s", flush=True)
    ts_n = []
    for seed in (salt % 9973 + 1, salt % 9973 + 2):
        prob_i, x0_i, _ = mpc_nlp_stagewise_batch(
            Bn_, horizon=Tn_, seed=seed, dtype=jnp.float32
        )
        jax.block_until_ready(x0_i)
        t0 = time.perf_counter()
        rn = sol_n(prob_i, x0_i)
        _ = np.asarray(rn.info.status)
        ts_n.append(time.perf_counter() - t0)
    pv_n, dr_n = mpc_nlp_kkt_residuals(prob_i, rn.x, rn.lam, horizon=Tn_)
    cert_n = float(np.mean((pv_n <= 1e-4) & (dr_n <= 1e-4)))
    solved_n = float(np.mean(np.asarray(rn.info.status) == 0))
    print(
        f"{label}: time={min(ts_n)*1e3:.0f}ms solved={solved_n:.3f} "
        f"cert={cert_n:.3f} dr_p99={np.percentile(dr_n,99):.1e} "
        f"pv_p99={np.percentile(pv_n,99):.1e}", flush=True,
    )
