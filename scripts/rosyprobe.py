"""Budget sweep for the Rosenbrock bench leg (VERDICT r4 ask #7).

Ball-constrained n-D Rosenbrock (the reference's own autodiff fixture
family, tests/sqp_test_autodiff.cpp:122-163, scaled to a batch) at
B=1024 n=32 f32 on the fused/kernel tiers.  Sweeps outer budget and
polish passes; reports wall time and independent f64 KKT certification
at 1e-4 so the bench leg can bake an honest config.

Run on the real TPU: python scripts/rosyprobe.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from sqp_solver_tpu.models.benchmark import (
    rosenbrock_kkt_residuals,
    rosenbrock_nlp_batch_device,
)
from sqp_solver_tpu.parallel.batch import sqp_solve_batch
from sqp_solver_tpu.qp.types import QPSettings
from sqp_solver_tpu.sqp.types import SQPSettings

B, N = 1024, 32
salt = int(time.time() * 1e3) % 100000


def run_cfg(outers, passes, qp_iters, label, ls=10):
    s = SQPSettings(
        max_iter=outers, eps_prim=1e-4, eps_dual=1e-4, termination="kkt",
        schedule="fixed", qp_impl="kernel", polish=True,
        polish_passes=passes, line_search_max_iter=ls,
        qp=QPSettings(
            alpha=1.6, eps_abs=1e-5, eps_rel=1e-5, max_iter=qp_iters,
            check_termination=10, warm_start=True, adaptive_rho=True,
            adaptive_rho_interval=50, schedule="fixed",
        ),
    )

    def run(key):
        problem, x0 = rosenbrock_nlp_batch_device(key, B, N, jnp.float32)
        return sqp_solve_batch(problem, x0, None, s, impl="fused")

    solve = jax.jit(run)
    t0 = time.perf_counter()
    _ = np.asarray(solve(jax.random.PRNGKey(0)).info.status)
    tc = time.perf_counter() - t0
    ts = []
    for rep in (1, 2):
        key = jax.random.PRNGKey(salt + 10 * outers + rep)
        jax.block_until_ready(key)
        t0 = time.perf_counter()
        r = solve(key)
        _ = np.asarray(r.info.status)
        ts.append(time.perf_counter() - t0)
    key_c = jax.random.PRNGKey(salt + 10 * outers + 7)
    prob_c, _ = jax.jit(
        lambda k: rosenbrock_nlp_batch_device(k, B, N, jnp.float32)
    )(key_c)
    rc = solve(key_c)
    pv, dr = rosenbrock_kkt_residuals(prob_c, rc.x, rc.lam)
    cert = float(np.mean((pv <= 1e-4) & (dr <= 1e-4)))
    solved = float(np.mean(np.asarray(rc.info.status) == 0))
    it = np.asarray(rc.info.iter)
    print(
        f"{label}: outers={outers} passes={passes} qpit={qp_iters} "
        f"compile={tc:.0f}s time={min(ts)*1e3:.0f}ms -> {B/min(ts):.0f}/s "
        f"solved={solved:.3f} cert@1e-4={cert:.3f} "
        f"dr_p50={np.percentile(dr,50):.1e} dr_p99={np.percentile(dr,99):.1e} "
        f"pv_p99={np.percentile(pv,99):.1e} it_p99={np.percentile(it,99):.0f}",
        flush=True,
    )


if __name__ == "__main__":
    import sys as _s

    cfgs = ((300, 3, 200, 16),)
    if len(_s.argv) > 1:
        cfgs = tuple(tuple(int(v) for v in a.split(",")) for a in _s.argv[1:])
    for outers, passes, qpit, ls in cfgs:
        run_cfg(outers, passes, qpit, "rosy", ls=ls)
