#!/usr/bin/env python
"""Benchmark harness: batched SQP throughput on one TPU chip.

Prints exactly ONE JSON line to stdout:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The headline metric is the north-star config (BASELINE.md): batched SQP
solves/sec at n <= 128 on one chip, vs the 1e4 solves/sec target.
Supplementary metrics (QP throughput, accuracy, iteration stats) go to
stderr.

Methodology notes: problem instances are generated ON DEVICE from a PRNG
key (host->device transfer of a 4096-problem batch costs ~50 ms on a
tunneled chip and would dominate), each timing rep uses a fresh key (the
runtime memoizes repeated identical dispatches), and completion is
forced by fetching the TINY per-problem status vector (4-64 KB, ~2-3 ms)
inside the timed region — it depends on the whole solve, so the fetch
cannot return early, and it avoids billing the D2H download of the full
solution through the ~30 MB/s debug tunnel (np.asarray(res.x) adds ~12
ms at B=1024 n=128 of pure transfer).  A bare jax.block_until_ready is
NOT used for timing: it was observed returning in ~0 ms on dispatches
the relay had not flushed (a silent artifact that would corrupt the
min-over-reps).  Accuracy fetches happen OUTSIDE the timed region.
"""

import contextlib
import json
import sys
import time
import traceback

import numpy as np


def log(*args):
    print(*args, file=sys.stderr, flush=True)


# Compact end-of-run recap (round-4 postmortem): the driver records only
# the LAST ~2000 chars of combined output, and round 4's early-emitted
# headline JSON scrolled out of that window — losing the round's entire
# north-star record.  Every leg now appends a terse entry here; main()
# prints the recap AND re-emits the headline JSON as the final stdout
# line, so the tail window always contains the proof.
RECAP = []


def recap(entry: str):
    RECAP.append(entry)


@contextlib.contextmanager
def leg(name: str):
    """Fault isolation per supplementary leg: one failing leg must not
    take down the rest of the run or the final recap/JSON emission."""
    try:
        yield
    except Exception:
        log(f"LEG FAILED ({name}):")
        traceback.print_exc(file=sys.stderr)
        RECAP.append(f"{name}:FAIL")


def emit_recap(headline_payload):
    txt = " | ".join(RECAP)
    if len(txt) > 1500:  # keep recap + JSON inside the 2000-char tail
        txt = txt[:1490] + "..."
    log("==RECAP== " + txt)
    # the headline JSON again, as the LAST stdout line (also emitted right
    # after the headline leg as a timeout hedge — both lines are identical)
    print(json.dumps(headline_payload), flush=True)


def make_problem_generator(B, N, dtype):
    """On-device sphere-cap NLP batch generator (see models/benchmark.py)."""
    import jax
    import jax.numpy as jnp

    from sqp_solver_tpu.sqp.types import NonlinearProblem

    def gen(key):
        k1, k2, k3 = jax.random.split(key, 3)
        sqn = jnp.sqrt(jnp.asarray(N, dtype))
        # non-degenerate sphere-active regime (see models/benchmark.py)
        r = jax.random.uniform(k1, (B,), dtype, 0.55 * sqn, 0.9 * sqn)
        l = jnp.zeros((B, N + 1), dtype)
        u = jnp.concatenate([(r**2)[:, None], jnp.ones((B, N), dtype)], axis=1)
        x0 = 0.25 + jax.random.uniform(k2, (B, N), dtype, 0.0, 0.05)
        return l, u, r, x0

    def objective(x, params):
        del params
        return -jnp.sum(x)

    def constraint(x, params):
        del params
        return jnp.concatenate([jnp.array([x @ x]), x])

    # layout-native linearizations (NonlinearProblem docs): build J / H_L
    # directly in the kernel's (.., B)-minor layout — the autodiff default
    # pays a ~2-6 GB/s minor-axis relayout per outer iteration instead
    def constraint_linearized_t(x, params):
        del params
        Bx, nx = x.shape
        cv = jnp.concatenate([jnp.sum(x * x, axis=1, keepdims=True), x], axis=1)
        eye_t = jnp.broadcast_to(jnp.eye(nx, dtype=x.dtype)[:, :, None], (nx, nx, Bx))
        return cv, jnp.concatenate([2.0 * x.T[None, :, :], eye_t], axis=0)

    def lagrangian_hessian_t(x, lam, params):
        del params
        nx = x.shape[1]
        return jnp.eye(nx, dtype=x.dtype)[:, :, None] * (2.0 * lam[:, 0])[None, None, :]

    def build(key):
        l, u, r, x0 = gen(key)
        return NonlinearProblem(
            l=l, u=u, params=r, objective=objective, constraint=constraint,
            constraint_linearized_t=constraint_linearized_t,
            lagrangian_hessian_t=lagrangian_hessian_t,
        ), x0

    return build


def solution(problem):
    from sqp_solver_tpu.models.benchmark import sphere_cap_solution

    return sphere_cap_solution(problem)


def sqp_flops_model(n, m, outer_iters, qp_iters, n_factor_per_outer=1.5,
                    polish_passes=2):
    """Algorithmic (useful) FLOPs per SQP solve — the roofline numerator.

    Counts textbook costs only (no masking/extraction overhead): per outer
    iteration one Schur factorization (gram m*n^2 + chol n^3/3 + inverse
    n^3/2 + L'L n^3/2), per ADMM iteration 2(n^2 + 2mn), BFGS 4n^2,
    and per polish pass one LDL' of the (n+m) KKT system.
    """
    D = n + m
    factor = 2 * (m * n * n + n**3 // 3 + n**3 // 2 + n**3 // 2)
    admm_iter = 2 * (n * n + 2 * m * n)
    bfgs = 4 * n * n
    polish = polish_passes * 2 * (D**3 // 3 + 2 * D * D)
    return outer_iters * (n_factor_per_outer * factor + bfgs) + qp_iters * admm_iter + polish


# empirical VPU ceiling for this chip (measured: a full-array rank-1
# update pass runs ~1 TFLOP/s FMA in f32; see memory notes) and the MXU
# f32 peak for reference
VPU_CEILING_FLOPS = 2.0e12  # FMA counted as 2 flops
MXU_F32_PEAK_FLOPS = 4.9e13


def sphere_cert_1e4(problem, res, log, label):
    """Independent f64 KKT certification of a sphere-cap batch at the
    reference SQP's own default tolerance (eps 1e-4, src/sqp.cpp:19-20):
    exact stationarity ∇f + J'λ = −1 + 2λ₀x + λ_rest and primal
    feasibility of ||x||² ≤ r², 0 ≤ x ≤ 1, evaluated in numpy float64
    with no solver code on the path."""
    xs = np.asarray(res.x, np.float64)
    lam = np.asarray(res.lam, np.float64)
    r2 = np.asarray(problem.u[:, 0], np.float64)
    st = -1.0 + 2.0 * lam[:, 0:1] * xs + lam[:, 1:]
    dr = np.abs(st).max(axis=1)
    pv = np.maximum(np.sum(xs * xs, axis=1) - r2, 0.0)
    pv = np.maximum(pv, np.maximum(xs - 1.0, -xs).max(axis=1))
    frac = float(np.mean((dr <= 1e-4) & (pv <= 1e-4)))
    log(
        f"  {label} 1e-4 certification (independent f64 KKT, the reference's "
        f"own bar src/sqp.cpp:19-20): {frac:.3f} of batch has stationarity "
        f"AND primal violation <= 1e-4 (dr_p99={np.percentile(dr,99):.1e} "
        f"pv_p99={np.percentile(pv,99):.1e})"
    )
    return frac


def main():
    import jax
    import jax.numpy as jnp

    # persistent compilation cache: works with the remote compiler; the
    # traced programs are identical across bench runs
    # one shared persistent compile cache with the measurement probes
    # (scripts/*.py), so a driver bench run right after a probe session
    # hits warm compiles for every shape the probes already built
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from sqp_solver_tpu.models.mpc import random_qp_batch
    from sqp_solver_tpu.parallel.batch import qp_solve_batch, sqp_solve_batch
    from sqp_solver_tpu.qp import QPSettings
    from sqp_solver_tpu.sqp import SQPSettings, SQPStatus

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev.device_kind}")

    # ---- headline: batched SQP, n=32, B=4096, f32 --------------------------
    B, N = 4096, 32
    build = make_problem_generator(B, N, jnp.float32)
    # Two-phase budget (round-3 sweep): 3 damped SQP outer iterations for
    # globalization + 2 Newton-KKT polish passes (true-Hessian active-set
    # refinement; statuses certified against re-linearized KKT residuals,
    # accuracy against the closed form; with 3 outers the second pass
    # already reaches the f32 floor — sweep: 3 passes only cost time).
    # Inner QPs warm-start and check every 10 (the reference's own inner
    # default, src/sqp.cpp:17).
    settings = SQPSettings(
        max_iter=3,
        eps_prim=2e-3,
        eps_dual=2e-3,
        termination="kkt",
        schedule="fixed",
        qp_impl="kernel",
        polish=True,
        polish_passes=2,
        # 5 backtracking candidates: the damped Newton steps accept at
        # alpha=1 on this family (sweep: 10 -> 5 saved ~6 ms at n=128
        # B=1024 with identical solved/accuracy)
        line_search_max_iter=5,
        qp=QPSettings(
            alpha=1.6,
            eps_abs=1e-4,
            eps_rel=1e-4,
            max_iter=50,
            check_termination=10,
            warm_start=True,
            adaptive_rho=True,
            adaptive_rho_interval=50,
            schedule="fixed",
        ),
    )

    def run(key):
        problem, x0 = build(key)
        return sqp_solve_batch(problem, x0, None, settings, impl="fused")

    solve = jax.jit(run)

    t0 = time.perf_counter()
    res = solve(jax.random.PRNGKey(0))
    _ = np.asarray(res.x)
    log(f"sqp compile+first run: {time.perf_counter() - t0:.2f}s")

    # min over 6 reps: the tunneled chip's throughput varies ~±20% between
    # runs on an hour scale (measured 2026-08-17: same HEAD, 48-67k range);
    # more reps tighten the min toward the machine's true capability.
    # Timing keys are salted with wall-clock entropy: the relay memoizes
    # (program, inputs) pairs ACROSS processes (observed: a repeated
    # key+program dispatch returning in 0.1 ms), so fixed keys could time
    # a cached replay instead of the solve.
    salt = int(time.time_ns()) % (2**30)
    times = []
    for rep in range(1, 7):
        key = jax.random.PRNGKey(salt + rep)
        jax.block_until_ready(key)
        t0 = time.perf_counter()
        res = solve(key)
        _ = np.asarray(res.info.status)  # tiny fetch: forced completion
        times.append(time.perf_counter() - t0)
    t_solve = min(times)

    status = np.asarray(res.info.status)
    solved_frac = float(np.mean(status == SQPStatus.SOLVED))
    problem, _ = build(jax.random.PRNGKey(3))
    # accuracy vs closed form on a fresh solve of the same distribution
    res_acc = solve(jax.random.PRNGKey(3))
    prob_acc, _ = jax.jit(build)(jax.random.PRNGKey(3))
    err = float(
        np.percentile(
            np.abs(np.asarray(res_acc.x, np.float64) - solution(prob_acc)), 99
        )
    )
    cert_h = sphere_cert_1e4(prob_acc, res_acc, log, f"headline n={N} B={B}")
    iters = np.asarray(res.info.iter)
    qp_iters = np.asarray(res.info.qp_solver_iter)
    sqp_per_sec = B / t_solve
    log(
        f"sqp batch: B={B} n={N} time={t_solve*1e3:.1f}ms -> {sqp_per_sec:.0f} solves/s; "
        f"solved={solved_frac:.3f} err_p99={err:.2e} iters p50={np.percentile(iters,50):.0f} "
        f"p99={np.percentile(iters,99):.0f}"
    )
    # Emit the ONE stdout JSON line NOW, before the supplementary legs:
    # on a cold compile cache the full run takes ~20+ min, and a driver
    # timeout mid-way must not lose the headline (stderr keeps flowing).
    # The SAME line is re-emitted at the very end (emit_recap) so the
    # driver's tail window also contains it on a full run.
    headline_payload = {
        "metric": "batched_sqp_solves_per_sec_n32_b4096",
        "value": round(sqp_per_sec, 1),
        "unit": "solves/s",
        "vs_baseline": round(sqp_per_sec / 1e4, 4),
    }
    print(json.dumps(headline_payload), flush=True)
    recap(
        f"headline n32 B4096 {sqp_per_sec:.0f}/s solved={solved_frac:.2f} "
        f"err={err:.0e} cert={cert_h:.2f}"
    )

    # roofline accounting: useful FLOPs vs the chip's VPU ceiling (the
    # workload is batched small-matrix algebra — elementwise lanes, no
    # MXU data reuse), plus the MXU-f32 number for reference
    flops = sqp_flops_model(
        N, N + 1, float(np.mean(iters)), float(np.mean(qp_iters))
    )
    achieved = flops * B / t_solve
    log(
        f"roofline: ~{flops/1e6:.1f} MFLOP/solve useful -> {achieved/1e9:.0f} GFLOP/s "
        f"achieved = {achieved/VPU_CEILING_FLOPS*100:.0f}% of VPU ceiling "
        f"({achieved/MXU_F32_PEAK_FLOPS*100:.1f}% of MXU f32 peak; "
        f"per-problem matrices have no cross-problem reuse, so the MXU is "
        f"not reachable for this shape)"
    )

    with leg("scaleout"):
        # ---- supplementary: n=32 scale-out (dispatch-floor amortization) -------
        # the ~15-25 ms per-dispatch relay floor is ~half the B=4096 time;
        # 4x the batch shows the per-solve cost the architecture actually has
        B_big = 16384
        build_big = make_problem_generator(B_big, N, jnp.float32)

        def run_big(key):
            problem, x0 = build_big(key)
            return sqp_solve_batch(problem, x0, None, settings, impl="fused")

        solve_big = jax.jit(run_big)
        jax.block_until_ready(solve_big(jax.random.PRNGKey(0)).x)
        tb = []
        for rep in (1, 2, 3):
            key = jax.random.PRNGKey(salt + 128 + rep)
            jax.block_until_ready(key)
            t0 = time.perf_counter()
            rb = solve_big(key)
            _ = np.asarray(rb.info.status)
            tb.append(time.perf_counter() - t0)
        log(
            f"sqp batch scale-out: B={B_big} n={N} time={min(tb)*1e3:.1f}ms -> "
            f"{B_big/min(tb):.0f} solves/s; "
            f"solved={float(np.mean(np.asarray(rb.info.status)==0)):.3f}"
        )
        recap(f"scaleout B16384 {B_big/min(tb):.0f}/s")

    with leg("n128"):
        # ---- n=128 SQP config (north-star "n <= 128, >= 1e4 solves/s") ---------
        # Two-phase configuration (budget sweep, scripts/n128bench.py round 3):
        # 2 damped SQP outer iterations for globalization + 3 Newton-KKT
        # polish passes (true-Hessian active-set refinement with per-problem
        # accept guards and true-residual status certification) — solved is
        # judged by re-linearized KKT error, accuracy by the closed form.
        N2 = 128
        settings128 = SQPSettings(
            max_iter=2,
            eps_prim=2e-3,
            eps_dual=2e-3,
            termination="kkt",
            schedule="fixed",
            qp_impl="kernel",
            polish=True,
            polish_passes=3,
            # 4 refinement sweeps per pass (default 6): each sweep contracts
            # the KKT error by ~polish_delta; at n=128 the f32 floor is
            # reached by sweep 4 (round-4 sweep: err_p99 1.4e-7 at sw4 vs
            # 1.2e-7 at sw6, ~9 ms cheaper; 2 passes instead of 3 degrades
            # to 5.6e-5 — keep 3)
            polish_sweeps=4,
            line_search_max_iter=5,
            qp=settings.qp,
        )

        for B2 in (1024, 4096):
            build128 = make_problem_generator(B2, N2, jnp.float32)

            def run128(key, build128=build128):
                problem, x0 = build128(key)
                return sqp_solve_batch(problem, x0, None, settings128, impl="fused")

            solve128 = jax.jit(run128)
            _ = np.asarray(solve128(jax.random.PRNGKey(0)).x)
            t128s = []
            for rep in (1, 2, 3, 4, 5):
                key = jax.random.PRNGKey(salt + 64 + rep)
                jax.block_until_ready(key)
                t0 = time.perf_counter()
                r128 = solve128(key)
                _ = np.asarray(r128.info.status)
                t128s.append(time.perf_counter() - t0)
            t128 = min(t128s)
            prob128, _ = jax.jit(build128)(jax.random.PRNGKey(9))
            r128a = solve128(jax.random.PRNGKey(9))
            err128 = float(
                np.percentile(
                    np.abs(np.asarray(r128a.x, np.float64) - solution(prob128)), 99
                )
            )
            log(
                f"sqp batch n=128: B={B2} time={t128*1e3:.0f}ms -> "
                f"{B2/t128:.0f} solves/s; "
                f"solved={float(np.mean(np.asarray(r128.info.status)==0)):.3f} "
                f"err_p99={err128:.2e}"
                + ("  [north star: >= 1e4 at n=128]" if B2 == 1024 else "")
            )
            recap(f"n128 B{B2} {B2/t128:.0f}/s err={err128:.0e}")
            if B2 == 1024:
                cert_128 = sphere_cert_1e4(prob128, r128a, log, f"n={N2} B={B2}")
                recap(f"n128cert1e-4={cert_128:.2f}")
                # dispatch-floor decomposition (VERDICT r3 item 5): time a
                # program that chains K independent full solves (fresh
                # on-device problems each); the K-slope is the true compute
                # cost per batch, the intercept is the per-dispatch relay
                # floor no solver change can shave
                def runK(key, K, build128=build128):
                    acc = jnp.zeros((), jnp.int32)
                    for i in range(K):
                        pk, xk = build128(jax.random.fold_in(key, i))
                        rk = sqp_solve_batch(pk, xk, None, settings128, impl="fused")
                        acc = acc + jnp.sum(rk.info.status)
                    return acc

                tK = {}
                for K in (1, 3):
                    fK = jax.jit(lambda key, K=K: runK(key, K))
                    _ = np.asarray(fK(jax.random.PRNGKey(0)))
                    best = 1e9
                    for rep in (1, 2):
                        key = jax.random.PRNGKey(salt + 300 + 7 * K + rep)
                        jax.block_until_ready(key)
                        t0 = time.perf_counter()
                        _ = np.asarray(fK(key))
                        best = min(best, time.perf_counter() - t0)
                    tK[K] = best
                slope = (tK[3] - tK[1]) / 2
                floor = max(tK[1] - slope, 0.0)
                log(
                    f"  n=128 B=1024 decomposition: compute slope "
                    f"{slope*1e3:.1f}ms/solve-batch (in-program ceiling "
                    f"{B2/slope:.0f} solves/s), relay dispatch floor "
                    f"{floor*1e3:.1f}ms/dispatch ({floor/tK[1]*100:.0f}% of "
                    f"wall — amortize with B, demonstrated at B=4096)"
                )
                recap(
                    f"n128 slope={slope*1e3:.0f}ms floor={floor*1e3:.0f}ms"
                )

    with leg("large-n"):
        # ---- supplementary: large-n single NLP (BASELINE configs[4], n~4096) ----
        # blocked MXU Cholesky backend (SURVEY C6 north-star kernel): round-1
        # baseline was 1.8 s/solve via schur_cholesky_tri
        import dataclasses as _dc

        from sqp_solver_tpu.models.benchmark import (
            sphere_cap_nlp_batch,
            sphere_cap_solution,
        )
        from sqp_solver_tpu.sqp import sqp_solve

        NL = 4096
        prob_l_b, x0_l_b = sphere_cap_nlp_batch(1, NL, seed=0, dtype=jnp.float32)
        prob_l = _dc.replace(
            prob_l_b, l=prob_l_b.l[0], u=prob_l_b.u[0], params=prob_l_b.params[0],
            constraint_linearized_t=None, lagrangian_hessian_t=None,
        )
        x0_l = x0_l_b[0]
        settings_l = SQPSettings(
            max_iter=10, eps_prim=1e-3, eps_dual=1e-3, termination="kkt",
            schedule="fixed", line_search_max_iter=8, polish=True,
            qp=QPSettings(alpha=1.6, eps_abs=1e-4, eps_rel=1e-4, max_iter=50,
                          check_termination=10, adaptive_rho=True,
                          adaptive_rho_interval=50, schedule="fixed",
                          linear_solver="schur_cholesky_blocked", refine_steps=1),
        )
        solve_l = jax.jit(lambda p, x: sqp_solve(p, x, None, settings_l))
        _ = np.asarray(solve_l(prob_l, x0_l).x)
        tl = []
        for rep in (1, 2):
            prob_r_b, x0_r_b = sphere_cap_nlp_batch(
                1, NL, seed=salt % 9973 + rep, dtype=jnp.float32
            )
            # swap only the ARRAY leaves into prob_l's structure: fresh
            # callable objects would retrace/recompile the jit per rep
            prob_r = _dc.replace(
                prob_l, l=prob_r_b.l[0], u=prob_r_b.u[0], params=prob_r_b.params[0],
            )
            x0_r = x0_r_b[0]
            jax.block_until_ready(x0_r)
            t0 = time.perf_counter()
            rl = solve_l(prob_r, x0_r)
            _ = np.asarray(rl.info.status)
            tl.append(time.perf_counter() - t0)
        err_l = float(
            np.max(np.abs(np.asarray(rl.x, np.float64) - sphere_cap_solution(prob_r_b)[0]))
        )
        log(
            f"large-n NLP: n={NL} time={min(tl)*1e3:.0f}ms status={int(rl.info.status)} "
            f"err={err_l:.2e} (round-1: 1800ms via schur_cholesky_tri; blocked "
            f"MXU Cholesky + refinement)"
        )
        recap(f"n4096NLP {min(tl)*1e3:.0f}ms err={err_l:.0e}")

    with leg("btd-mpc"):
        # ---- supplementary: structured (block-tridiagonal) MPC vs dense ---------
        from sqp_solver_tpu.models.mpc import mpc_qp_stagewise_batch

        # three configurations: the blocktri backend's O(T b^3) factorization
        # vs dense O((Tb)^3) on the vmap tier (fastest on this shape), plus
        # the fixed-schedule fused path (zero dynamic loop conditions — the
        # right tier when relay/host-sync costs dominate)
        Bs, Ts = 256, 64
        qp_s, blk = mpc_qp_stagewise_batch(Bs, horizon=Ts, dtype=jnp.float32)
        jax.block_until_ready(qp_s)
        mpc_rows = (
            ("dense, vmap", QPSettings(adaptive_rho=True, max_iter=100), "vmap"),
            ("blocktri, vmap", QPSettings(
                adaptive_rho=True, max_iter=100,
                linear_solver="schur_block_tridiag", block_size=blk), "vmap"),
            ("blocktri, fused fixed-schedule", QPSettings(
                adaptive_rho=True, max_iter=100, schedule="fixed",
                linear_solver="schur_block_tridiag", block_size=blk), "fused"),
            # round-4 structured whole-solve kernel (ops/qp_kernel_btd.py):
            # block-Thomas factor + band sweeps + scalar-core early exit in
            # ONE Pallas call — no dense n^3, no full fixed budget
            ("blocktri, whole-solve kernel", QPSettings(
                adaptive_rho=True, max_iter=100, schedule="fixed",
                linear_solver="schur_block_tridiag", block_size=blk), "kernel"),
        )
        mpc_short = {"dense, vmap": "dense", "blocktri, vmap": "btdV",
                     "blocktri, fused fixed-schedule": "btdF",
                     "blocktri, whole-solve kernel": "btdK"}
        mpc_rc = []
        for label, s_cfg, impl in mpc_rows:
            sol_fn = jax.jit(
                lambda p, s_cfg=s_cfg, impl=impl: qp_solve_batch(p, s_cfg, impl=impl)
            )
            _ = np.asarray(sol_fn(qp_s).x)
            ts = []
            for seed in (salt % 9973 + 1, salt % 9973 + 2):
                qp2, _ = mpc_qp_stagewise_batch(Bs, horizon=Ts, seed=seed, dtype=jnp.float32)
                jax.block_until_ready(qp2)
                t0 = time.perf_counter()
                rs = sol_fn(qp2)
                _ = np.asarray(rs.info.status)
                ts.append(time.perf_counter() - t0)
            note = (
                "  [fixed schedule: executes the FULL max_iter budget (XLA "
                "conds don't skip work on this runtime) yet lands within "
                "~15% of the early-exiting vmap row with ZERO host-synced "
                "loop conditions — the right tier when dispatch latency "
                "matters]"
                if impl == "fused" else ""
            )
            log(
                f"structured MPC ({label}): n={qp_s.P.shape[-1]} B={Bs} "
                f"time={min(ts)*1e3:.0f}ms solved={float(np.mean(np.asarray(rs.info.status)==0)):.3f}"
                + note
            )
            mpc_rc.append(f"{mpc_short[label]}={min(ts)*1e3:.0f}ms")
        recap("mpc " + " ".join(mpc_rc))

    with leg("btd-nlp"):
        # ---- supplementary: NONLINEAR stage-wise MPC — structured SQP tier -------
        # Round-5 ask: the btd whole-solve kernel as the inner QP of an SQP
        # tier.  Unicycle chain, T=32 stages -> n=128 m=224 block size 4
        # (models/mpc.py:mpc_nlp_stagewise_batch).  Both rows run the SAME
        # outer algorithm (fixed 120-outer budget, l1 merit, Newton-KKT
        # polish epilogue) and the SAME instances; the inner QP is the only
        # difference: dense whole-solve kernel (O(n^3) panel Cholesky, dense
        # BFGS) vs block-Thomas btd kernel (O(T bb^3), per-stage
        # block-diagonal BFGS — sqp/solver_btd.py).  Certification is an
        # independent hand-derived f64 KKT evaluation (models/mpc.py:
        # mpc_nlp_kkt_residuals), reference bar eps=1e-4 (src/sqp.cpp:19-20).
        # T=32 is the largest horizon where the DENSE comparator exists:
        # at T=48 (n=192) the dense whole-step kernel cannot compile —
        # Mosaic register spills put the call 2x over the 127 MB VMEM cap
        # (measured r5) — while the btd tier runs fine; and this f32
        # family is budget-hard: ~50% of lanes certify at ANY tier at the
        # 120-outer budget (CPU f64 and the dense tier saturate at the
        # same fraction — statuses stay honest, solved == certified).
        import dataclasses

        from sqp_solver_tpu.models.mpc import (
            mpc_nlp_kkt_residuals,
            mpc_nlp_stagewise_batch,
        )

        Bn_, Tn_ = 64, 32
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
        nlp_rows = (
            ("btd kernel tier", base_n),
            ("dense kernel tier", dataclasses.replace(base_n, qp_impl="kernel")),
        )
        nlp_times = {}
        nlp_rc = []
        for label, s_n in nlp_rows:
            sol_n = jax.jit(
                lambda pr, xx, s_n=s_n: sqp_solve_batch(
                    pr, xx, None, s_n, impl="fused"
                )
            )
            prob_w, x0_w, _ = mpc_nlp_stagewise_batch(
                Bn_, horizon=Tn_, seed=0, dtype=jnp.float32
            )
            _ = np.asarray(sol_n(prob_w, x0_w).info.status)  # warm compile
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
            nlp_times[label] = min(ts_n)
            log(
                f"nonlinear MPC SQP ({label}): n={4*Tn_} m={7*Tn_} B={Bn_} "
                f"120 outers fixed, time={min(ts_n)*1e3:.0f}ms -> "
                f"{Bn_/min(ts_n):.0f} solves/s; f64 KKT cert @1e-4: {cert_n:.3f} "
                f"(dr_p99={np.percentile(dr_n,99):.1e} pv_p99={np.percentile(pv_n,99):.1e})"
            )
            nlp_rc.append(
                f"{'btd' if 'btd' in label else 'dense'}={min(ts_n)*1e3:.0f}ms"
                + f" cert={cert_n:.2f}"
            )
        ratio_n = nlp_times["dense kernel tier"] / nlp_times["btd kernel tier"]
        log(
            f"  structured-vs-dense inner QP at n={4*Tn_}: {ratio_n:.2f}x "
            f"(round-5 target >= 1.5x; at n=192 the dense kernel tier does "
            f"not compile at all — 257 MB VMEM vs the 127 MB cap, r5 fact — "
            f"so the btd tier is the ONLY whole-solve kernel tier there)"
        )
        recap("nlpmpc " + " ".join(nlp_rc) + f" x{ratio_n:.1f}")

    with leg("arrow"):
        # ---- supplementary: arrow-structured (bordered) coupled MPC -------------
        # multi-agent rendezvous: block-diagonal Schur (one block per agent)
        # bordered by the shared meet-point columns — the border-coupled
        # structure block-tridiag cannot express.  O(T b^3 + c^3) vs dense
        # O((Tb + c)^3).
        #
        # HONEST CAVEAT (measured round 4, scripts/arrowprobe2/3.py): these
        # are CAPABILITY rows, not perf wins, on this chip.  (a) Every
        # benchable ADMM config is solve-dominated, and both backends run the
        # identical dense fused per-iteration operator (the block-form solve
        # chain loses outright: lane-starved b-sized ops — see
        # _arrow_factor_factory docstring).  (b) Even the ISOLATED factor
        # phase only wins ~13% (45 vs 53 ms/factor at B=64 n=770; 95 vs 106
        # at n=1026, b=128): f32 robustness of the composed bordered inverse
        # requires a final dense Newton-Schulz correction (two n^3 MXU
        # matmuls) that swamps the O(T b^3) structural savings.  The
        # asymptotic payoff is real only where dense n^3 beats the MXU's
        # ~20 TFLOP/s — far beyond relay-benchable shapes.  A factor-
        # dominated regime was probed (eps 1e-6 + adaptive rho): f32 ADMM
        # does not converge there at all, so no realistic winning config
        # exists on this hardware.  The backend's value is the CAPABILITY
        # (the reference's sparse ambition, qp_solver_sparse_test.cpp:51-98)
        # and the reduced sequential factor depth (n -> b), not throughput.
        from sqp_solver_tpu.models.mpc import mpc_qp_coupled_batch

        # shape probed on-device (scripts/arrowprobe.py): the structure pays in
        # the factor phase, so many small blocks (48 agents, b=16) on a large n
        # is where arrow beats dense; at small n the MXU-dense default wins and
        # is the recommended backend (see _arrow_factor_factory docstring)
        Ba, Ag, Hz = 64, 48, 16
        qp_a, blk_a, cw = mpc_qp_coupled_batch(Ba, agents=Ag, horizon=Hz, dtype=jnp.float32)
        jax.block_until_ready(qp_a)
        arrow_rows = (
            ("dense, vmap", QPSettings(adaptive_rho=True, max_iter=100), "vmap"),
            ("arrow, vmap", QPSettings(
                adaptive_rho=True, max_iter=100,
                linear_solver="schur_arrow", block_size=blk_a, arrow_width=cw), "vmap"),
            ("arrow, fused fixed-schedule", QPSettings(
                adaptive_rho=True, max_iter=100, schedule="fixed",
                linear_solver="schur_arrow", block_size=blk_a, arrow_width=cw), "fused"),
        )
        arrow_short = {"dense, vmap": "dense", "arrow, vmap": "arwV",
                       "arrow, fused fixed-schedule": "arwF"}
        arrow_rc = []
        for label, s_cfg, impl in arrow_rows:
            sol_fn = jax.jit(
                lambda p, s_cfg=s_cfg, impl=impl: qp_solve_batch(p, s_cfg, impl=impl)
            )
            _ = np.asarray(sol_fn(qp_a).x)
            ts = []
            for seed in (salt % 9973 + 1, salt % 9973 + 2):
                qp2, _, _ = mpc_qp_coupled_batch(
                    Ba, agents=Ag, horizon=Hz, seed=seed, dtype=jnp.float32
                )
                jax.block_until_ready(qp2)
                t0 = time.perf_counter()
                rs = sol_fn(qp2)
                _ = np.asarray(rs.info.status)
                ts.append(time.perf_counter() - t0)
            log(
                f"coupled MPC arrow ({label}): n={qp_a.P.shape[-1]} B={Ba} "
                f"time={min(ts)*1e3:.0f}ms solved={float(np.mean(np.asarray(rs.info.status)==0)):.3f}"
                + ("  [fixed schedule: full budget, zero host syncs, see above]"
                   if impl == "fused" else "")
            )
            arrow_rc.append(f"{arrow_short[label]}={min(ts)*1e3:.0f}ms")
        recap("arrow(capability) " + " ".join(arrow_rc))

    with leg("sparse"):
        # ---- supplementary: arbitrary unstructured sparsity (BlockSparse + CG) --
        # The capability the reference reserves for Eigen::SimplicialLDLT
        # (include/solvers/qp.hpp:126-129): a RANDOM block pattern no banded/
        # bordered backend can express.  TPU-native representation: dense
        # MXU-granular tiles + matrix-free Jacobi-CG (ops/block_sparse.py) —
        # no Gram, no factorization, no fill-in.  Dense twin solved with the
        # same CG (operator cost isolation) and with the blocked-MXU Cholesky
        # (the best dense backend at this n).
        from sqp_solver_tpu.models.sparse import sparse_qp_pair
        from sqp_solver_tpu.qp import qp_solve as qp_solve_one

        Nsp = 4096
        # the block PATTERN is static pytree aux data (a new pattern is a
        # new compile): keep pattern_seed FIXED across the timed reps and
        # salt only the VALUES, so the timed region never retraces
        # (round-4 advice: per-rep patterns made the sparse rows
        # compile-dominated and the sparse-vs-dense comparison misleading)
        psd = salt % 97
        d0, s0 = sparse_qp_pair(
            n=Nsp, m=Nsp, bs=128, density=0.03, seed=psd, dtype=jnp.float32
        )
        cg_cfg = QPSettings(
            linear_solver="cg", eps_abs=1e-4, eps_rel=1e-4, max_iter=2000,
            check_termination=25, adaptive_rho=True,
        )
        chol_cfg = _dc.replace(cg_cfg, linear_solver="schur_cholesky_blocked")
        sp_rows = (
            ("sparse-cg", lambda p: qp_solve_one(p, cg_cfg), True),
            ("dense-cg", lambda p: qp_solve_one(p, cg_cfg), False),
            ("dense-chol-blocked", lambda p: qp_solve_one(p, chol_cfg), False),
        )
        sp_rc = []
        for label, fn, use_sparse in sp_rows:
            sol_fn = jax.jit(fn)
            prob0 = s0 if use_sparse else d0
            _ = np.asarray(sol_fn(prob0).info.status)
            ts = []
            for rep in (1, 2):
                d2, s2 = sparse_qp_pair(
                    n=Nsp, m=Nsp, bs=128, density=0.03,
                    seed=psd + rep, dtype=jnp.float32, pattern_seed=psd,
                )
                p2 = s2 if use_sparse else d2
                jax.block_until_ready(jax.tree.leaves(p2))
                t0 = time.perf_counter()
                r2 = sol_fn(p2)
                st2 = int(np.asarray(r2.info.status))
                ts.append(time.perf_counter() - t0)
            log(
                f"unstructured sparse QP ({label}): n={Nsp} "
                f"(P {s0.P.nblocks}/{(Nsp//128)**2} blocks) time={min(ts)*1e3:.0f}ms "
                f"status={st2} iters={int(np.asarray(r2.info.iter))}"
            )
            sp_rc.append(f"{label}={min(ts)*1e3:.0f}ms")
        recap("sparse n4096 " + " ".join(sp_rc))

    with leg("sparse-crossover"):
        # ---- crossover: where arbitrary sparsity BEATS the best dense backend ---
        # At n=4096 the strip-formulation sparse-cg roughly ties blocked
        # dense Cholesky; at n=8192 the O(n^3) factor loses to the
        # bandwidth-bound sparse operator (probe: 170 vs 465 ms at 1.5%
        # density, 216 vs 465 at 3% — and the sparse program compiles in
        # ~3 s vs ~340 s).  Both rows self-measured here.
        sx_rc = []
        for N2, dens in ((8192, 0.015), (8192, 0.03)):
            d3, s3 = sparse_qp_pair(
                n=N2, m=N2, bs=128, density=dens, seed=psd + 7,
                dtype=jnp.float32,
            )
            for label, cfg, use_sparse in (
                (f"sparse-cg d={dens}", cg_cfg, True),
                ("dense-chol-blocked", chol_cfg, False),
            ):
                if not use_sparse and dens != 0.015:
                    continue  # the dense baseline is density-independent
                sol = jax.jit(lambda p, c=cfg: qp_solve_one(p, c))
                p0 = s3 if use_sparse else d3
                _ = np.asarray(sol(p0).info.status)
                ts = []
                for rep in (1, 2):
                    d4, s4 = sparse_qp_pair(
                        n=N2, m=N2, bs=128, density=dens, seed=psd + 8 + rep,
                        dtype=jnp.float32, pattern_seed=psd + 7,
                    )
                    p4 = s4 if use_sparse else d4
                    jax.block_until_ready(jax.tree.leaves(p4))
                    t0 = time.perf_counter()
                    r4 = sol(p4)
                    st = int(np.asarray(r4.info.status))
                    ts.append(time.perf_counter() - t0)
                log(
                    f"sparse crossover (n={N2}, {label}): {min(ts)*1e3:.0f}ms "
                    f"status={st} iters={int(np.asarray(r4.info.iter))}"
                )
                short = f"sp{dens}" if use_sparse else "chol"
                sx_rc.append(f"{short}={min(ts)*1e3:.0f}ms")
        recap("crossover n8192 " + " ".join(sx_rc))

    with leg("qp-batch"):
        # ---- supplementary: batched QP throughput -------------------------------
        qp_settings = QPSettings(
            alpha=1.6, eps_abs=1e-4, eps_rel=1e-4, max_iter=200,
            check_termination=25, adaptive_rho=True, adaptive_rho_interval=50,
            schedule="fixed",
        )
        qp0 = random_qp_batch(batch=B, n=32, m=33, seed=0, dtype=jnp.float32)
        qsolve = jax.jit(lambda p: qp_solve_batch(p, qp_settings, impl="kernel"))
        jax.block_until_ready(qp0)
        _ = np.asarray(qsolve(qp0).x)
        qtimes = []
        for seed in (salt % 9973 + 1, salt % 9973 + 2):
            qp = random_qp_batch(batch=B, n=32, m=33, seed=seed, dtype=jnp.float32)
            jax.block_until_ready(qp)
            t0 = time.perf_counter()
            qres = qsolve(qp)
            _ = np.asarray(qres.info.status)
            qtimes.append(time.perf_counter() - t0)
        t_qp = min(qtimes)
        log(
            f"qp batch: B={B} n=32 m=33 time={t_qp*1e3:.1f}ms -> {B/t_qp:.0f} qp/s; "
            f"solved={float(np.mean(np.asarray(qres.info.status)==0)):.3f}"
        )
        recap(f"qp n32 B4096 {B/t_qp:.0f}/s")

    with leg("sustained-mpc"):
        # ---- supplementary: SUSTAINED receding-horizon MPC throughput -----------
        # The realistic embedded-fleet workload (BASELINE configs[3] run
        # the way production runs it): K=10 control steps of a
        # B=4096-plant double-integrator fleet inside ONE lax.scan — each
        # step rebuilds q/l/u from the plant state, solves the batch
        # warm-started from the previous step (kernel tier), applies the
        # first input and steps the plants.  The ~25 ms relay dispatch
        # floor is paid once per K solves, and warm-started steps
        # converge in a single 25-iteration chunk — together worth ~10x
        # over the one-shot qp-batch row.  Validation inside the timed
        # program: per-step solved fraction and the fleet's position RMS
        # (the controller must actually regulate the plants).
        from sqp_solver_tpu.models.mpc import _double_integrator_condensed
        from sqp_solver_tpu.qp.types import QuadraticProblem

        Bs_, Hs_, Ks_ = 4096, 16, 10
        dts = 0.1
        Sx_s, Su_s = _double_integrator_condensed(Hs_, dts)
        Pm = jnp.asarray(
            Su_s[:, 0, :].T @ Su_s[:, 0, :] + 0.1 * np.eye(Hs_), jnp.float32
        )
        Am = jnp.asarray(
            np.concatenate([np.eye(Hs_), Su_s[:, 1, :]], axis=0), jnp.float32
        )
        Spx_x = jnp.asarray(Sx_s[:, 0, :].T, jnp.float32)
        Spx_u = jnp.asarray(Su_s[:, 0, :], jnp.float32)
        Svx_x = jnp.asarray(Sx_s[:, 1, :].T, jnp.float32)
        Ad_s = jnp.asarray([[1.0, dts], [0.0, 1.0]], jnp.float32)
        Bd_s = jnp.asarray([[0.5 * dts * dts], [dts]], jnp.float32)
        mpc_settings = QPSettings(
            alpha=1.6, eps_abs=1e-4, eps_rel=1e-4, max_iter=200,
            check_termination=25, adaptive_rho=True,
            adaptive_rho_interval=50, schedule="fixed",
        )

        # the library serving API (qp.sequence.qp_solve_sequence) IS the
        # measured path — the bench dogfoods it rather than hand-rolling
        # the scan (semantics pinned equal in tests/test_sequence.py)
        from sqp_solver_tpu.qp import qp_solve_sequence

        def rollout_s(x0):
            def make_qp(st_):
                qv_ = (st_ @ Spx_x) @ Spx_u
                voff = st_ @ Svx_x
                lv = jnp.concatenate(
                    [jnp.full((Bs_, Hs_), -2.0), -1.5 - voff], axis=1)
                uv = jnp.concatenate(
                    [jnp.full((Bs_, Hs_), 2.0), 1.5 - voff], axis=1)
                return QuadraticProblem(
                    P=jnp.broadcast_to(Pm, (Bs_, Hs_, Hs_)), q=qv_,
                    A=jnp.broadcast_to(Am, (Bs_, 2 * Hs_, Hs_)), l=lv, u=uv,
                )

            def advance(st_, r_):
                nxt = st_ @ Ad_s.T + r_.x[:, 0][:, None] * Bd_s[:, 0]
                return nxt, (
                    jnp.mean((r_.info.status == 0).astype(jnp.float32)),
                    jnp.sqrt(jnp.mean(nxt[:, 0] ** 2)),
                )

            ys_, _, _ = qp_solve_sequence(
                make_qp, advance, x0, Ks_, mpc_settings, impl="kernel"
            )
            return ys_

        run_s = jax.jit(rollout_s)
        _ = np.asarray(run_s(
            jax.random.uniform(jax.random.PRNGKey(0), (Bs_, 2), jnp.float32,
                               -1.0, 1.0))[0])
        ts_s = []
        for rep in (1, 2, 3):
            key = jax.random.PRNGKey(salt + 8192 + rep)
            x0_ = jax.random.uniform(key, (Bs_, 2), jnp.float32, -1.0, 1.0)
            jax.block_until_ready(x0_)
            t0 = time.perf_counter()
            ys_ = run_s(x0_)
            solved_s = np.asarray(ys_[0])
            ts_s.append(time.perf_counter() - t0)
        pos_s = np.asarray(ys_[1])
        rate_s = Ks_ * Bs_ / min(ts_s)
        log(
            f"sustained receding-horizon MPC: {Ks_} steps x B={Bs_} n={Hs_} "
            f"in ONE program, warm-started: {min(ts_s)*1e3:.1f}ms -> "
            f"{rate_s:.0f} solves/s sustained; solved_min="
            f"{solved_s.min():.3f} per step; fleet pos_rms "
            f"{pos_s[0]:.3f}->{pos_s[-1]:.3f} (the controller regulates); "
            f"dispatch floor amortized over K steps + warm starts converge "
            f"in one 25-iteration chunk"
        )
        recap(f"sustainedMPC {rate_s/1e6:.2f}M/s K{Ks_}")

    with leg("sustained-nlp"):
        # ---- supplementary: SUSTAINED NONLINEAR serving (sqp_solve_sequence) ----
        # The nonlinear twin of the sustained-mpc row, through the library
        # serving API sqp.sequence.sqp_solve_sequence (semantics pinned in
        # tests/test_sqp_sequence.py): ONE cold 3-outer solve of the
        # headline's sphere-cap batch, then K warm steps at 1 outer +
        # 2 polish passes each, every problem's cap radius shrinking 2%
        # per step (small perturbations — the receding-horizon regime;
        # reference serving = one host-side solve() per step,
        # src/sqp.cpp:13-41).  ALL inside one compiled program, so the
        # relay dispatch floor is paid once per K+1 solves.  Validation:
        # per-warm-step solved fraction inside the timed program, plus an
        # independent f64 KKT certification of the LAST warm step (its
        # problem rebuilt from the final carry) at the reference's own
        # eps 1e-4 — no solver code on the scoring path.
        import dataclasses as _dcn

        from sqp_solver_tpu.sqp import sqp_solve_sequence
        from sqp_solver_tpu.sqp.types import NonlinearProblem as _NLP

        Kn_ = 8
        warm_settings = _dcn.replace(settings, max_iter=1)

        def nlp_objective(x, params):
            del params
            return -jnp.sum(x)

        def nlp_constraint(x, params):
            del params
            return jnp.concatenate([jnp.array([x @ x]), x])

        def nlp_constraint_linearized_t(x, params):
            del params
            Bx, nx = x.shape
            cv = jnp.concatenate(
                [jnp.sum(x * x, axis=1, keepdims=True), x], axis=1)
            eye_t = jnp.broadcast_to(
                jnp.eye(nx, dtype=x.dtype)[:, :, None], (nx, nx, Bx))
            return cv, jnp.concatenate([2.0 * x.T[None, :, :], eye_t], axis=0)

        def nlp_lagrangian_hessian_t(x, lam, params):
            del params
            nx = x.shape[1]
            return jnp.eye(nx, dtype=x.dtype)[:, :, None] * (
                2.0 * lam[:, 0])[None, None, :]

        def nlp_make(r):
            lv = jnp.zeros((B, N + 1), jnp.float32)
            uv = jnp.concatenate(
                [(r**2)[:, None], jnp.ones((B, N), jnp.float32)], axis=1)
            prob = _NLP(
                l=lv, u=uv, params=r,
                objective=nlp_objective, constraint=nlp_constraint,
                constraint_linearized_t=nlp_constraint_linearized_t,
                lagrangian_hessian_t=nlp_lagrangian_hessian_t,
            )
            return prob, jnp.full((B, N), 0.25, jnp.float32)

        def nlp_advance(r, res_):
            return 0.98 * r, jnp.mean(
                (res_.info.status == 0).astype(jnp.float32))

        def nlp_serve(r0):
            prob0, x00 = nlp_make(r0)
            res0 = sqp_solve_batch(prob0, x00, None, settings, impl="fused")
            r1, _ = nlp_advance(r0, res0)
            fr, carry_f, warm_f = sqp_solve_sequence(
                nlp_make, nlp_advance, r1, Kn_, warm_settings, impl="fused",
                warm0=(res0.x, res0.lam),
            )
            return fr, carry_f, warm_f

        run_nseq = jax.jit(nlp_serve)
        sqn_ = float(np.sqrt(N))

        def nlp_r0(key):
            return jax.random.uniform(
                key, (B,), jnp.float32, 0.55 * sqn_, 0.9 * sqn_)

        _ = np.asarray(run_nseq(nlp_r0(jax.random.PRNGKey(salt % 65521)))[0])
        ts_nq = []
        for rep in (1, 2, 3):
            r0_ = nlp_r0(jax.random.PRNGKey(salt + 16384 + rep))
            jax.block_until_ready(r0_)
            t0 = time.perf_counter()
            fr_nq, carry_nq, warm_nq = run_nseq(r0_)
            sf_nq = np.asarray(fr_nq)
            ts_nq.append(time.perf_counter() - t0)
        t_nq = min(ts_nq)

        r_last = np.asarray(carry_nq, np.float64) / 0.98
        xs_nq = np.asarray(warm_nq[0], np.float64)
        lam_nq = np.asarray(warm_nq[1], np.float64)
        st_nq = -1.0 + 2.0 * lam_nq[:, 0:1] * xs_nq + lam_nq[:, 1:]
        dr_nq = np.abs(st_nq).max(axis=1)
        pv_nq = np.maximum(np.sum(xs_nq * xs_nq, axis=1) - r_last**2, 0.0)
        pv_nq = np.maximum(
            pv_nq, np.maximum(xs_nq - 1.0, -xs_nq).max(axis=1))
        cert_nq = float(np.mean((dr_nq <= 1e-4) & (pv_nq <= 1e-4)))
        rate_nq = (Kn_ + 1) * B / t_nq
        log(
            f"sustained NLP serving (sqp_solve_sequence): 1 cold + {Kn_} "
            f"warm steps x B={B} n={N} in ONE program: {t_nq*1e3:.1f}ms -> "
            f"{rate_nq:.0f} solves/s sustained; solved_min="
            f"{sf_nq.min():.3f} per warm step; last-step independent f64 "
            f"KKT cert@1e-4={cert_nq:.3f} (dr_p99={np.percentile(dr_nq,99):.1e} "
            f"pv_p99={np.percentile(pv_nq,99):.1e})"
        )
        recap(f"sustainedNLP {rate_nq/1e3:.0f}k/s K{Kn_} cert={cert_nq:.2f}")

    with leg("families"):
        # ---- supplementary: OSQP-paper families (untuned breadth) ---------------
        # The five problem classes the reference re-implements OSQP for
        # (reference README.md:6; OSQP paper §5): random QP, lasso, huber,
        # SVM, portfolio — generated ON DEVICE (models/families.py device
        # twins), solved on the flagship kernel tier at the reference's own
        # 1e-4 tolerance, statuses certified against TRUE residuals
        # (polish-refreshed), accuracy against the long-double C++ oracle
        # (runtime/native.py) on a 128-problem subsample.  One shared,
        # UNTUNED config for every row: Ruiz scaling=10 (the OSQP capability
        # the reference dropped; without it huber/portfolio stall at any
        # budget — measured round 4), max_iter=300 fixed schedule (the
        # slowest class, portfolio, certifies 1.000 at 300 vs 0.988 at 250),
        # polish.
        from sqp_solver_tpu.models import families as fam
        from sqp_solver_tpu.runtime.native import (
            native_available,
            native_qp_solve_batch,
        )

        Bf = 1024
        fam_settings = QPSettings(
            alpha=1.6, eps_abs=1e-4, eps_rel=1e-4, max_iter=300,
            check_termination=25, adaptive_rho=True, adaptive_rho_interval=50,
            polish=True, scaling=10, schedule="fixed",
        )
        fam_rows = (
            ("random n=32 m=48", lambda k: fam.random_qp_batch_device(k, Bf, 32, 48)),
            ("lasso nf=8 ns=16", lambda k: fam.lasso_qp_batch_device(k, Bf, 8, 16)),
            ("huber nf=8 ns=16", lambda k: fam.huber_qp_batch_device(k, Bf, 8, 16)),
            ("svm nf=8 ns=16", lambda k: fam.svm_qp_batch_device(k, Bf, 8, 16)),
            ("portfolio na=16 nk=4", lambda k: fam.portfolio_qp_batch_device(k, Bf, 16, 4)),
        )
        oracle_settings = QPSettings(
            eps_abs=1e-10, eps_rel=1e-10, max_iter=20000, adaptive_rho=True
        )
        fam_rc = []
        for fname, build_f in fam_rows:
            solve_f = jax.jit(
                lambda key, b=build_f: qp_solve_batch(b(key), fam_settings, impl="kernel")
            )
            _ = np.asarray(solve_f(jax.random.PRNGKey(0)).info.status)
            tf = []
            for rep in (1, 2, 3):
                key = jax.random.PRNGKey(salt + 512 + rep)
                jax.block_until_ready(key)
                t0 = time.perf_counter()
                rf = solve_f(key)
                _ = np.asarray(rf.info.status)
                tf.append(time.perf_counter() - t0)
            solved_f = float(np.mean(np.asarray(rf.info.status) == 0))
            if native_available():
                key_a = jax.random.PRNGKey(salt + 999)
                prob_f = jax.jit(
                    lambda k, b=build_f: jax.tree_util.tree_map(
                        lambda x: x[:128], b(k)
                    )
                )(key_a)
                rf_a = solve_f(key_a)
                x_or, _, st_or, _ = native_qp_solve_batch(
                    np.asarray(prob_f.P, np.float64), np.asarray(prob_f.q, np.float64),
                    np.asarray(prob_f.A, np.float64), np.asarray(prob_f.l, np.float64),
                    np.asarray(prob_f.u, np.float64), oracle_settings,
                )
                ok_or = st_or == 0
                err_f = float(
                    np.percentile(
                        np.abs(np.asarray(rf_a.x, np.float64)[:128][ok_or] - x_or[ok_or]),
                        99,
                    )
                )
                acc = f"err_p99_vs_long_double_oracle={err_f:.2e} (oracle solved {int(ok_or.sum())}/128)"
            else:
                acc = "long-double oracle unavailable on this host"
            log(
                f"family {fname}: B={Bf} time={min(tf)*1e3:.1f}ms -> "
                f"{Bf/min(tf):.0f} qp/s; solved={solved_f:.3f} @eps=1e-4; {acc}"
            )
            short = fname.split()[0]
            err_txt = f" e={err_f:.0e}" if native_available() else ""
            fam_rc.append(f"{short}:s={solved_f:.2f}{err_txt}")
        recap("fam " + " ".join(fam_rc))

    with leg("exp-chain"):
        # ---- supplementary: multi-outer NLP (exp-chain, ~25 outers) -------------
        # The sphere-cap headline converges in 2-3 damped Newton outers; this
        # row is the honest multi-outer complement: a strictly-convex
        # exponential-chain NLP (models/benchmark.py) whose damped-BFGS path
        # needs ~20-35 outer iterations from the cold start.  Full fixed
        # budget of 36 outers, statuses from the solver, certification from
        # an INDEPENDENT f64 evaluation of the exact KKT residuals.
        from sqp_solver_tpu.models.benchmark import (
            exp_chain_kkt_residuals,
            exp_chain_nlp_batch_device,
        )

        Be, Ne = 1024, 32
        settings_exp = SQPSettings(
            max_iter=36, eps_prim=1e-3, eps_dual=1e-3, termination="kkt",
            schedule="fixed", qp_impl="kernel", polish=True, polish_passes=3,
            line_search_max_iter=6,
            qp=QPSettings(
                alpha=1.6, eps_abs=1e-4, eps_rel=1e-4, max_iter=50,
                check_termination=10, warm_start=True, adaptive_rho=True,
                adaptive_rho_interval=50, schedule="fixed",
            ),
        )

        def run_exp(key):
            problem, x0 = exp_chain_nlp_batch_device(key, Be, Ne, jnp.float32)
            return sqp_solve_batch(problem, x0, None, settings_exp, impl="fused")

        solve_exp = jax.jit(run_exp)
        _ = np.asarray(solve_exp(jax.random.PRNGKey(0)).info.status)
        te = []
        for rep in (1, 2, 3):
            key = jax.random.PRNGKey(salt + 2048 + rep)
            jax.block_until_ready(key)
            t0 = time.perf_counter()
            re_ = solve_exp(key)
            _ = np.asarray(re_.info.status)
            te.append(time.perf_counter() - t0)
        key_e = jax.random.PRNGKey(salt + 2060)
        prob_e, _ = jax.jit(
            lambda k: exp_chain_nlp_batch_device(k, Be, Ne, jnp.float32)
        )(key_e)
        re_a = solve_exp(key_e)
        pv_e, dr_e = exp_chain_kkt_residuals(prob_e, re_a.x, re_a.lam)
        it_e = np.asarray(re_.info.iter)
        cert_e = float(np.mean((pv_e <= 1e-4) & (dr_e <= 1e-4)))
        log(
            f"multi-outer NLP (exp-chain): n={Ne} B={Be} time={min(te)*1e3:.0f}ms -> "
            f"{Be/min(te):.0f} solves/s; solved={float(np.mean(np.asarray(re_.info.status)==0)):.3f} "
            f"iters p50={np.percentile(it_e,50):.0f} p99={np.percentile(it_e,99):.0f}; "
            f"f64 KKT cert @1e-4: {cert_e:.3f} (dr_p99={np.percentile(dr_e,99):.1e})"
            f"  [the >=8-outer row: full 36-outer fixed budget, no per-family tuning]"
        )
        recap(f"expchain36out {Be/min(te):.0f}/s cert={cert_e:.2f}")

    with leg("qp-diff"):
        # ---- supplementary: differentiable QP layer (fwd + bwd on TPU) ----------
        # OptNet-style implicit differentiation THROUGH the solver
        # (qp/diff.py) — the adjoint KKT solve rides the whole-pass Pallas
        # polish kernel on TPU batches.  Timed: forward solve alone vs
        # forward + backward (gradients to every problem leaf P, q, A, l, u).
        from sqp_solver_tpu.qp.diff import qp_solve_diff

        Bd, Nd = 1024, 128
        diff_settings = QPSettings(
            alpha=1.6, eps_abs=1e-5, eps_rel=1e-5, max_iter=200,
            check_termination=25, adaptive_rho=True, adaptive_rho_interval=50,
            polish=True, schedule="fixed",
        )
        build_d = lambda k: fam.random_qp_batch_device(k, Bd, Nd, Nd)

        def fwd_only(key):
            x = qp_solve_diff(build_d(key), diff_settings, "fused")
            return jnp.sum(x * x)

        def fwd_bwd(key):
            qp_d = build_d(key)
            loss, grads = jax.value_and_grad(
                lambda q: jnp.sum(qp_solve_diff(q, diff_settings, "fused") ** 2)
            )(qp_d)
            # tiny scalar that depends on EVERY gradient leaf: forces the
            # backward pass inside the timed region
            gsum = (
                jnp.sum(jnp.abs(grads.q)) + jnp.sum(jnp.abs(grads.P))
                + jnp.sum(jnp.abs(grads.A)) + jnp.sum(jnp.abs(grads.l))
                + jnp.sum(jnp.abs(grads.u))
            )
            return loss, gsum

        f_fwd = jax.jit(fwd_only)
        f_fb = jax.jit(fwd_bwd)
        _ = np.asarray(f_fwd(jax.random.PRNGKey(0)))
        _ = np.asarray(f_fb(jax.random.PRNGKey(0))[1])
        td_f, td_b = [], []
        for rep in (1, 2, 3):
            key = jax.random.PRNGKey(salt + 4096 + rep)
            jax.block_until_ready(key)
            t0 = time.perf_counter()
            _ = np.asarray(f_fwd(key))
            td_f.append(time.perf_counter() - t0)
            key2 = jax.random.PRNGKey(salt + 4200 + rep)
            jax.block_until_ready(key2)
            t0 = time.perf_counter()
            lo_, gs_ = f_fb(key2)
            _ = np.asarray(gs_)
            td_b.append(time.perf_counter() - t0)
        gs_f = float(np.asarray(gs_))
        # relay wall time varies ~20% between dispatches; a small backward
        # increment can be swamped by that noise (negative deltas are noise)
        bwd_ms = (min(td_b) - min(td_f)) * 1e3
        bwd_note = (
            f"backward adds {bwd_ms:.0f}ms"
            if bwd_ms >= 0
            else "backward cost below relay timing noise (~20%)"
        )
        log(
            f"differentiable QP (qp_solve_diff): B={Bd} n={Nd} forward={min(td_f)*1e3:.0f}ms, "
            f"forward+backward={min(td_b)*1e3:.0f}ms ({bwd_note}; adjoint rides "
            f"the Pallas polish kernel); grad-magnitude sum={gs_f:.3e} (finite)"
        )
        recap(
            f"qpdiff fwd={min(td_f)*1e3:.0f}ms f+b={min(td_b)*1e3:.0f}ms"
        )

    with leg("rosenbrock"):
        # ---- supplementary: ball-constrained Rosenbrock (stress family) ---------
        # The reference's own autodiff fixture family
        # (tests/sqp_test_autodiff.cpp:122-163) scaled to a batch: n=32
        # f32 from the classic staggered start, ball ACTIVE at the
        # optimum.  A problem the builder did NOT design (round-4 verdict
        # ask #7).  Budget matters enormously here (ROADMAP r5 fact 5):
        # qpit=50/ls=10 certifies 1.6%; this full budget (300 outers,
        # 200-iter inner QPs, 16-step line search) certifies ~0.67 on
        # TPU f32 (f64 reference at the same budget: 0.92).  Statuses
        # are honest at every budget probed: solved == certified.
        from sqp_solver_tpu.models.benchmark import (
            rosenbrock_kkt_residuals,
            rosenbrock_nlp_batch_device,
        )

        Br, Nr = 1024, 32
        settings_rb = SQPSettings(
            max_iter=300, eps_prim=1e-4, eps_dual=1e-4, termination="kkt",
            schedule="fixed", qp_impl="kernel", polish=True, polish_passes=3,
            line_search_max_iter=16,
            qp=QPSettings(
                alpha=1.6, eps_abs=1e-5, eps_rel=1e-5, max_iter=200,
                check_termination=10, warm_start=True, adaptive_rho=True,
                adaptive_rho_interval=50, schedule="fixed",
            ),
        )

        def run_rb(key):
            problem, x0 = rosenbrock_nlp_batch_device(key, Br, Nr, jnp.float32)
            return sqp_solve_batch(problem, x0, None, settings_rb, impl="fused")

        solve_rb = jax.jit(run_rb)
        _ = np.asarray(solve_rb(jax.random.PRNGKey(0)).info.status)
        trb = []
        for rep in (1, 2):
            key = jax.random.PRNGKey(salt + 3072 + rep)
            jax.block_until_ready(key)
            t0 = time.perf_counter()
            rb_ = solve_rb(key)
            _ = np.asarray(rb_.info.status)
            trb.append(time.perf_counter() - t0)
        key_r = jax.random.PRNGKey(salt + 3090)
        prob_r, _ = jax.jit(
            lambda k: rosenbrock_nlp_batch_device(k, Br, Nr, jnp.float32)
        )(key_r)
        rb_a = solve_rb(key_r)
        pv_r, dr_r = rosenbrock_kkt_residuals(prob_r, rb_a.x, rb_a.lam)
        cert_r = float(np.mean((pv_r <= 1e-4) & (dr_r <= 1e-4)))
        solved_r = float(np.mean(np.asarray(rb_a.info.status) == 0))
        log(
            f"rosenbrock stress family (ball-constrained, n={Nr} B={Br} f32): "
            f"time={min(trb)*1e3:.0f}ms -> {Br/min(trb):.0f} solves/s; "
            f"solved={solved_r:.3f}, independent f64 KKT cert @1e-4: {cert_r:.3f} "
            f"(honest: solved==certified; f64 same-budget reference 0.92; "
            f"BFGS valley crawl needs the full 300-outer budget)"
        )
        recap(f"rosy300out {Br/min(trb):.0f}/s cert={cert_r:.2f}")

    with leg("sqp-diff"):
        # ---- supplementary: differentiable SQP layer (fwd + bwd on TPU) ---------
        # jax.grad THROUGH the batched NLP solver (sqp/diff.py): the
        # backward pass relinearizes the KKT system at the converged
        # active set and rides the same Schur-refined adjoint solve (the
        # Pallas polish kernel on TPU batches).  Fixture: the exp-chain
        # family (multi-outer, ball active at the optimum) at B=1024 —
        # gradients flow to l, u and the per-problem params (b, c, r).
        from sqp_solver_tpu.models.benchmark import (
            exp_chain_nlp_batch_device as _expgen,
        )
        from sqp_solver_tpu.sqp.diff import sqp_solve_diff

        Bsd, Nsd = 1024, 32
        sd_settings = SQPSettings(
            max_iter=24, eps_prim=1e-3, eps_dual=1e-3, termination="kkt",
            schedule="fixed", qp_impl="kernel", polish=True, polish_passes=2,
            line_search_max_iter=6,
            qp=QPSettings(
                alpha=1.6, eps_abs=1e-4, eps_rel=1e-4, max_iter=50,
                check_termination=10, warm_start=True, adaptive_rho=True,
                adaptive_rho_interval=50, schedule="fixed",
            ),
        )

        def sd_fwd(key):
            problem, x0 = _expgen(key, Bsd, Nsd, jnp.float32)
            xs = sqp_solve_diff(problem, x0, None, sd_settings, "fused")
            return jnp.sum(xs * xs)

        def sd_fwd_bwd(key):
            problem, x0 = _expgen(key, Bsd, Nsd, jnp.float32)
            loss, grads = jax.value_and_grad(
                lambda p: jnp.sum(
                    sqp_solve_diff(p, x0, None, sd_settings, "fused") ** 2
                )
            )(problem)
            gsum = (
                jnp.sum(jnp.abs(grads.l)) + jnp.sum(jnp.abs(grads.u))
                + sum(jnp.sum(jnp.abs(g)) for g in jax.tree.leaves(grads.params))
            )
            return loss, gsum

        f_sdf = jax.jit(sd_fwd)
        f_sdb = jax.jit(sd_fwd_bwd)
        _ = np.asarray(f_sdf(jax.random.PRNGKey(0)))
        _ = np.asarray(f_sdb(jax.random.PRNGKey(0))[1])
        tsd_f, tsd_b = [], []
        for rep in (1, 2, 3):
            key = jax.random.PRNGKey(salt + 6144 + rep)
            jax.block_until_ready(key)
            t0 = time.perf_counter()
            _ = np.asarray(f_sdf(key))
            tsd_f.append(time.perf_counter() - t0)
            key2 = jax.random.PRNGKey(salt + 6300 + rep)
            jax.block_until_ready(key2)
            t0 = time.perf_counter()
            _, gs_sd = f_sdb(key2)
            gs_sd = np.asarray(gs_sd)
            tsd_b.append(time.perf_counter() - t0)
        gs_sdf = float(gs_sd)
        sd_ms = (min(tsd_b) - min(tsd_f)) * 1e3
        sd_note = (
            f"backward adds {sd_ms:.0f}ms" if sd_ms >= 0
            else "backward cost below relay timing noise (~20%)"
        )
        assert np.isfinite(gs_sdf), "sqp_solve_diff gradients must be finite"
        log(
            f"differentiable SQP (sqp_solve_diff): B={Bsd} n={Nsd} exp-chain "
            f"forward={min(tsd_f)*1e3:.0f}ms, forward+backward={min(tsd_b)*1e3:.0f}ms "
            f"({sd_note}); grad-magnitude sum over l,u,params={gs_sdf:.3e} (finite)"
        )
        recap(
            f"sqpdiff fwd={min(tsd_f)*1e3:.0f}ms f+b={min(tsd_b)*1e3:.0f}ms"
        )

    with leg("anderson"):
        # ---- supplementary: Anderson acceleration (fused tier) ------------------
        # demonstrated where it matters: tight tolerances at fixed rho, where
        # plain ADMM's linear tail is long (at loose eps the solve finishes in
        # ~3 chunks and AA has no room to build its extrapolation window)
        qp_tight = QPSettings(
            alpha=1.6, eps_abs=1e-6, eps_rel=1e-6, max_iter=2000,
            check_termination=25, schedule="fixed",
        )
        import dataclasses as _dc2

        # in-kernel AA on the flagship whole-solve kernel tier (round 3)
        qp_aa = _dc2.replace(qp_tight, acceleration="anderson")
        asolve = jax.jit(lambda p: qp_solve_batch(p, qp_aa, impl="kernel"))
        psolve = jax.jit(lambda p: qp_solve_batch(p, qp_tight, impl="kernel"))
        _ = np.asarray(asolve(qp0).x)
        _ = np.asarray(psolve(qp0).x)
        qp2 = random_qp_batch(batch=B, n=32, m=33, seed=3, dtype=jnp.float32)
        jax.block_until_ready(qp2)
        ra = asolve(qp2)
        rp = psolve(qp2)
        it_a = float(np.mean(np.asarray(ra.info.iter)))
        it_p = float(np.mean(np.asarray(rp.info.iter)))
        log(
            f"anderson acceleration (kernel tier, in-kernel AA): mean iters "
            f"{it_p:.0f} -> {it_a:.0f} ({it_p/max(it_a,1e-9):.2f}x); solved "
            f"{float(np.mean(np.asarray(ra.info.status)==0)):.3f}"
        )
        recap(f"AA iters {it_p:.0f}->{it_a:.0f}")

    emit_recap(headline_payload)


if __name__ == "__main__":
    main()
