"""Probe the qp-batch bench leg config (VERDICT r4 weak #3).

BENCH_r03 recorded 25.6 ms / 160k qp/s at B=4096 n=32 m=33 on the kernel
tier; BENCH_r04 recorded 38.0 ms / 108k qp/s at the identical config —
beyond the documented ±20% relay variance.  Round 4 edited
ops/qp_kernel.py (in-kernel J masking, BFGS passthrough, btd hooks), so
this probe re-measures the leg standalone with many reps spread over
time to separate relay drift from a real kernel regression.

Run on the real TPU: python scripts/qpbatch_probe.py [reps]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir", "/root/repo/.jax_cache"
)

from sqp_solver_tpu.models.mpc import random_qp_batch
from sqp_solver_tpu.parallel.batch import qp_solve_batch
from sqp_solver_tpu.qp.types import QPSettings


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    B = 4096
    qp_settings = QPSettings(
        alpha=1.6, eps_abs=1e-4, eps_rel=1e-4, max_iter=200,
        check_termination=25, adaptive_rho=True, adaptive_rho_interval=50,
        schedule="fixed",
    )
    qsolve = jax.jit(lambda p: qp_solve_batch(p, qp_settings, impl="kernel"))
    qp0 = random_qp_batch(batch=B, n=32, m=33, seed=0, dtype=jnp.float32)
    jax.block_until_ready(qp0)
    t0 = time.perf_counter()
    _ = np.asarray(qsolve(qp0).x)
    print(f"warm compile: {time.perf_counter()-t0:.1f}s", flush=True)

    salt = int(time.time() * 1e3) % 100000
    times = []
    for rep in range(reps):
        qp = random_qp_batch(
            batch=B, n=32, m=33, seed=salt + rep, dtype=jnp.float32
        )
        jax.block_until_ready(qp)
        t0 = time.perf_counter()
        qres = qsolve(qp)
        _ = np.asarray(qres.info.status)
        dt = time.perf_counter() - t0
        times.append(dt)
        print(
            f"rep {rep}: {dt*1e3:.1f} ms -> {B/dt:.0f} qp/s  "
            f"solved={float(np.mean(np.asarray(qres.info.status)==0)):.3f} "
            f"mean_iter={float(np.mean(np.asarray(qres.info.iter))):.1f}",
            flush=True,
        )
        time.sleep(2.0)
    tmin = min(times)
    print(
        f"min over {reps}: {tmin*1e3:.1f} ms -> {B/tmin:.0f} qp/s "
        f"(r3: 25.6 ms / 160k; r4: 38.0 ms / 108k)",
        flush=True,
    )


if __name__ == "__main__":
    main()
