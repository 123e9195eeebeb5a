"""sqp_solve_sequence: K warm-started batch NLP solves in one program.

Same contract battery as tests/test_sequence.py, on the nonlinear twin:
scan == hand-threaded loop, resume-by-warm-pair, and warm steps cheaper
than cold re-solves of the same shrinking-radius sphere-cap family.
"""

import jax
import jax.numpy as jnp
import numpy as np

from sqp_solver_tpu.parallel.batch import sqp_solve_batch
from sqp_solver_tpu.sqp import SQPSettings, sqp_solve_sequence
from sqp_solver_tpu.sqp.types import NonlinearProblem

B, N = 4, 4
M = N + 1

SETTINGS = SQPSettings(
    max_iter=25, termination="kkt", eps_prim=1e-6, eps_dual=1e-6,
)


def _objective(x, params):
    del params
    return -jnp.sum(x)


def _constraint(x, params):
    del params
    return jnp.concatenate([jnp.array([x @ x]), x])


def _make_nlp(r):
    """Sphere-cap NLP batch parameterized by the cap radius carry r (B,)."""
    l = jnp.zeros((B, M), r.dtype)
    u = jnp.concatenate([(r**2)[:, None], jnp.ones((B, N), r.dtype)], axis=1)
    prob = NonlinearProblem(
        l=l, u=u, params=r, objective=_objective, constraint=_constraint
    )
    x0 = jnp.full((B, N), 0.25, r.dtype)
    return prob, x0


def _advance(r, res):
    # shrink the cap 5% per control step: consecutive problems are small
    # perturbations (the receding-horizon regime)
    return 0.95 * r, (res.x, res.info.iter, res.info.status)


def _r0(dtype=jnp.float64):
    sqn = float(np.sqrt(N))
    return jax.random.uniform(
        jax.random.PRNGKey(5), (B,), dtype, 0.6 * sqn, 0.85 * sqn
    )


class TestSQPSequenceSemantics:
    def test_matches_hand_threaded_loop(self):
        K = 3
        (xs, iters, sts), _, _ = sqp_solve_sequence(
            _make_nlp, _advance, _r0(), K, SETTINGS, impl="fused"
        )

        r = _r0()
        prob0, x00 = _make_nlp(r)
        warm = (x00, jnp.zeros((B, M), x00.dtype))
        for k in range(K):
            prob, _ = _make_nlp(r)
            res = sqp_solve_batch(prob, warm[0], warm[1], SETTINGS,
                                  impl="fused")
            r, (xk, itk, stk) = _advance(r, res)
            warm = (res.x, res.lam)
            np.testing.assert_allclose(
                np.asarray(xs[k]), np.asarray(xk), atol=1e-9, rtol=0.0
            )
            np.testing.assert_array_equal(np.asarray(iters[k]), np.asarray(itk))
            np.testing.assert_array_equal(np.asarray(sts[k]), np.asarray(stk))

    def test_every_step_solves_and_resumes(self):
        full, _, _ = sqp_solve_sequence(
            _make_nlp, _advance, _r0(), 4, SETTINGS, impl="fused"
        )
        assert np.all(np.asarray(full[2]) == 0), np.asarray(full[2])

        head, carry_m, warm_m = sqp_solve_sequence(
            _make_nlp, _advance, _r0(), 2, SETTINGS, impl="fused"
        )
        tail, _, _ = sqp_solve_sequence(
            _make_nlp, _advance, carry_m, 2, SETTINGS, impl="fused",
            warm0=warm_m,
        )
        np.testing.assert_allclose(
            np.asarray(full[0][:2]), np.asarray(head[0]), atol=1e-9, rtol=0.0
        )
        np.testing.assert_allclose(
            np.asarray(full[0][2:]), np.asarray(tail[0]), atol=1e-9, rtol=0.0
        )

    def test_solution_tracks_the_shrinking_cap(self):
        """On the active sphere cap the solution norm equals the radius —
        each warm-started step must track the 5%-shrunk cap, not stay on
        the previous one."""
        K = 3
        (xs, _, _), carry_f, _ = sqp_solve_sequence(
            _make_nlp, _advance, _r0(), K, SETTINGS, impl="fused"
        )
        r = np.asarray(_r0())
        for k in range(K):
            norms = np.linalg.norm(np.asarray(xs[k]), axis=1)
            np.testing.assert_allclose(norms, r, rtol=1e-5)
            r = 0.95 * r
        np.testing.assert_allclose(np.asarray(carry_f), r, rtol=1e-12)


class TestSQPWarmStartEffectiveness:
    def test_warm_steps_cheaper_than_cold(self):
        K = 4
        (_, iters, _), _, _ = sqp_solve_sequence(
            _make_nlp, _advance, _r0(), K, SETTINGS, impl="fused"
        )
        warm_total = int(np.asarray(iters[1:]).sum())

        r = _r0()
        cold_total = 0
        warm = None
        for k in range(K):
            prob, x00 = _make_nlp(r)
            if warm is None:
                res = sqp_solve_batch(prob, x00, None, SETTINGS, impl="fused")
            else:
                cold = sqp_solve_batch(prob, x00, None, SETTINGS, impl="fused")
                cold_total += int(np.asarray(cold.info.iter).sum())
                res = sqp_solve_batch(prob, warm[0], warm[1], SETTINGS,
                                      impl="fused")
            r, _ = _advance(r, res)
            warm = (res.x, res.lam)
        assert warm_total < cold_total, (warm_total, cold_total)
