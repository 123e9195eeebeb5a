"""qp_solve_sequence: K warm-started batch solves in one compiled program.

Contract: semantics identical to calling qp_solve_batch K times with the
warm-start state threaded by hand (the library call is just that loop
under lax.scan), plus resume-by-state and warm-start effectiveness.
Productizes the bench's sustained receding-horizon MPC leg (ROADMAP
round-5 fact 5a; reference serving loop is one host-side solve() per
step, tests/qp_solver_test.cpp).
"""

import jax
import jax.numpy as jnp
import numpy as np

from sqp_solver_tpu.parallel.batch import qp_solve_batch
from sqp_solver_tpu.qp import QPSettings, QPStatus, qp_solve_sequence
from sqp_solver_tpu.qp.types import QuadraticProblem

B, N = 4, 3
M = N + 1

SETTINGS = QPSettings(
    eps_abs=1e-7, eps_rel=1e-7, max_iter=400, check_termination=25,
    adaptive_rho=True, adaptive_rho_interval=50, schedule="fixed",
)


def _fixed_operator(dtype=jnp.float64):
    rng = np.random.RandomState(7)
    # eigenvalue spread 1e-3..30: hard enough that a cold solve needs
    # ~275 iterations and a warm one ~200 — without it every step (cold
    # or warm) converges inside the same check_termination quantum and
    # the warm-start effectiveness assertion is vacuous
    Q1, _ = np.linalg.qr(rng.randn(N, N))
    P1 = jnp.asarray(Q1 @ np.diag([1e-3, 0.3, 30.0]) @ Q1.T, dtype)
    A1 = jnp.asarray(np.concatenate([np.eye(N), np.ones((1, N))], axis=0), dtype)
    l1 = jnp.asarray(np.concatenate([-np.ones(N), [-2.0]]), dtype)
    u1 = jnp.asarray(np.concatenate([np.ones(N), [2.0]]), dtype)
    return P1, A1, l1, u1


def _make_qp_fn(dtype=jnp.float64):
    P1, A1, l1, u1 = _fixed_operator(dtype)

    def make_qp(carry):
        return QuadraticProblem(
            P=jnp.broadcast_to(P1, (B, N, N)),
            q=carry,
            A=jnp.broadcast_to(A1, (B, M, N)),
            l=jnp.broadcast_to(l1, (B, M)),
            u=jnp.broadcast_to(u1, (B, M)),
        )

    return make_qp


def _advance(carry, res):
    # slowly drifting linear term: the next problem is a perturbation of
    # the previous one (the regime warm starts exist for)
    return carry + 0.01 * res.x, (res.x, res.info.iter, res.info.status)


def _carry0(dtype=jnp.float64):
    return jax.random.uniform(
        jax.random.PRNGKey(11), (B, N), dtype, -1.0, 1.0
    )


class TestSequenceSemantics:
    def test_matches_hand_threaded_loop(self):
        """scan-chained == eager loop with state threaded by hand."""
        make_qp = _make_qp_fn()
        K = 4
        xs, iters, sts = qp_solve_sequence(
            make_qp, _advance, _carry0(), K, SETTINGS, impl="fused"
        )[0]

        carry, state = _carry0(), None
        for k in range(K):
            res = qp_solve_batch(make_qp(carry), SETTINGS, state=state,
                                 impl="fused")
            carry, (xk, itk, stk) = _advance(carry, res)
            state = res.state
            np.testing.assert_allclose(
                np.asarray(xs[k]), np.asarray(xk), atol=1e-9, rtol=0.0
            )
            np.testing.assert_array_equal(np.asarray(iters[k]), np.asarray(itk))
            np.testing.assert_array_equal(np.asarray(sts[k]), np.asarray(stk))

    def test_every_step_solves(self):
        make_qp = _make_qp_fn()
        (xs, iters, sts), carry_f, state_f = qp_solve_sequence(
            make_qp, _advance, _carry0(), 3, SETTINGS, impl="fused"
        )
        assert np.all(np.asarray(sts) == int(QPStatus.SOLVED))
        assert np.all(np.isfinite(np.asarray(xs)))
        assert carry_f.shape == (B, N)
        assert state_f.x.shape == (B, N) and state_f.y.shape == (B, M)

    def test_resume_by_state_equals_one_long_horizon(self):
        """sequence(K) == sequence(K1) then sequence(K2, state0=..) — the
        returned (carry, state) resume a longer horizon exactly."""
        make_qp = _make_qp_fn()
        full, _, _ = qp_solve_sequence(
            make_qp, _advance, _carry0(), 5, SETTINGS, impl="fused"
        )
        head, carry_m, state_m = qp_solve_sequence(
            make_qp, _advance, _carry0(), 2, SETTINGS, impl="fused"
        )
        tail, _, _ = qp_solve_sequence(
            make_qp, _advance, carry_m, 3, SETTINGS, impl="fused",
            state0=state_m,
        )
        np.testing.assert_allclose(
            np.asarray(full[0][:2]), np.asarray(head[0]), atol=1e-9, rtol=0.0
        )
        np.testing.assert_allclose(
            np.asarray(full[0][2:]), np.asarray(tail[0]), atol=1e-9, rtol=0.0
        )

    def test_vmap_tier(self):
        """The semantics-defining tier runs under the same scan."""
        make_qp = _make_qp_fn()
        (xs, _, sts), _, _ = qp_solve_sequence(
            make_qp, _advance, _carry0(), 2, SETTINGS, impl="vmap"
        )
        assert np.all(np.asarray(sts) == int(QPStatus.SOLVED))
        (xf, _, _), _, _ = qp_solve_sequence(
            make_qp, _advance, _carry0(), 2, SETTINGS, impl="fused"
        )
        np.testing.assert_allclose(
            np.asarray(xs), np.asarray(xf), atol=1e-6, rtol=0.0
        )


class TestWarmStartEffectiveness:
    def test_warm_steps_cheaper_than_cold(self):
        """Steps 2..K (warm) must use fewer iterations than solving the
        same problems cold — the property the sustained-MPC throughput
        comes from (fact 5a: warm steps converge in one chunk)."""
        make_qp = _make_qp_fn()
        K = 4
        (_, iters, _), _, _ = qp_solve_sequence(
            make_qp, _advance, _carry0(), K, SETTINGS, impl="fused"
        )
        warm_total = int(np.asarray(iters[1:]).sum())

        carry, state = _carry0(), None
        cold_total = 0
        for k in range(K):
            res = qp_solve_batch(make_qp(carry), SETTINGS, impl="fused")
            if k > 0:
                cold_total += int(np.asarray(res.info.iter).sum())
            res_w = qp_solve_batch(make_qp(carry), SETTINGS, state=state,
                                   impl="fused")
            carry, _ = _advance(carry, res_w)
            state = res_w.state
        assert warm_total < cold_total, (warm_total, cold_total)
