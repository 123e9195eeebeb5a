"""SQP solver tests — reference parity (tests/sqp_test.cpp and
tests/sqp_test_autodiff.cpp) plus batched coverage."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sqp_solver_tpu.models.problems import (
    CONSTRAINED_ROSENBROCK_2D_SOLUTION,
    SIMPLE_NLP2_SOLUTION,
    SIMPLE_NLP_SOLUTION,
    SIMPLE_QP_SOLUTION,
    constrained_rosenbrock_2d,
    rosenbrock_box,
    simple_nlp,
    simple_nlp2,
    simple_qp_nlp,
)
from sqp_solver_tpu.sqp import SQP, SQPSettings, SQPStatus, sqp_solve


def _solved(res):
    assert int(res.info.status) == SQPStatus.SOLVED, (
        f"status={int(res.info.status)} iter={int(res.info.iter)}"
    )


class TestSimpleNLP:
    """Reference: SQPTestCase.TestSimpleNLP + InfeasibleStart
    (tests/sqp_test.cpp:46-90), second_order_correction on."""

    SETTINGS = SQPSettings(max_iter=100, second_order_correction=True)

    def test_feasible_start(self):
        res = jax.jit(sqp_solve)(
            simple_nlp(), jnp.array([1.2, 0.1]), jnp.zeros(3), self.SETTINGS
        )
        _solved(res)
        np.testing.assert_allclose(np.asarray(res.x), SIMPLE_NLP_SOLUTION, atol=1e-2)
        assert int(res.info.iter) < 100

    def test_infeasible_start(self):
        res = sqp_solve(
            simple_nlp(), jnp.array([2.0, -1.0]), jnp.ones(3), self.SETTINGS
        )
        _solved(res)
        np.testing.assert_allclose(np.asarray(res.x), SIMPLE_NLP_SOLUTION, atol=1e-2)


class TestSimpleQPAsNLP:
    """Reference: SQPTestCase.TestSimpleQP (tests/sqp_test.cpp:126-141),
    hand-coded linearizations exercise the closed-form override path."""

    def test_solves(self):
        res = sqp_solve(
            simple_qp_nlp(),
            jnp.zeros(2),
            jnp.zeros(3),
            SQPSettings(second_order_correction=True),
        )
        _solved(res)
        np.testing.assert_allclose(np.asarray(res.x), SIMPLE_QP_SOLUTION, atol=1e-2)


class TestAutodiff:
    """Reference: sqp_test_autodiff.cpp — autodiff is our default path."""

    def test_constrained_rosenbrock_2d(self):
        res = sqp_solve(constrained_rosenbrock_2d(), jnp.zeros(2), jnp.zeros(2))
        _solved(res)
        np.testing.assert_allclose(
            np.asarray(res.x), CONSTRAINED_ROSENBROCK_2D_SOLUTION, atol=1e-2
        )

    @pytest.mark.parametrize("n", [2, 3])
    def test_rosenbrock_box(self, n):
        """Reference TestRosenbrock (tests/sqp_test_autodiff.cpp:146-163)."""
        res = sqp_solve(rosenbrock_box(n), jnp.zeros(n))
        _solved(res)
        np.testing.assert_allclose(np.asarray(res.x), np.ones(n), atol=1e-2)

    def test_simple_nlp_no_soc(self):
        """Reference TestSimpleNLP (tests/sqp_test_autodiff.cpp:196-218)."""
        res = sqp_solve(
            simple_nlp(),
            jnp.array([1.2, 0.1]),
            jnp.zeros(3),
            SQPSettings(second_order_correction=False),
        )
        _solved(res)
        np.testing.assert_allclose(np.asarray(res.x), SIMPLE_NLP_SOLUTION, atol=1e-2)

    def test_simple_nlp_soc(self):
        """Reference TestSimpleNLP_SOC (tests/sqp_test_autodiff.cpp:220-242)."""
        res = sqp_solve(
            simple_nlp(),
            jnp.array([1.2, 0.1]),
            jnp.zeros(3),
            SQPSettings(second_order_correction=True),
        )
        _solved(res)
        np.testing.assert_allclose(np.asarray(res.x), SIMPLE_NLP_SOLUTION, atol=1e-2)

    def test_simple_nlp2_equality(self):
        """Reference TestSimpleNLP2, Nocedal Ex. 12.1
        (tests/sqp_test_autodiff.cpp:267-282)."""
        res = sqp_solve(simple_nlp2(), jnp.array([1.2, 0.1]), jnp.zeros(1))
        _solved(res)
        np.testing.assert_allclose(np.asarray(res.x), SIMPLE_NLP2_SOLUTION, atol=1e-2)

    def test_jacrev_mode(self):
        res = sqp_solve(
            simple_nlp(),
            jnp.array([1.2, 0.1]),
            jnp.zeros(3),
            SQPSettings(jacobian_mode="rev"),
        )
        _solved(res)
        np.testing.assert_allclose(np.asarray(res.x), SIMPLE_NLP_SOLUTION, atol=1e-2)


class TestWrapperAPI:
    def test_oo_workflow(self):
        solver = SQP()
        res = solver.solve(simple_nlp(), jnp.array([1.2, 0.1]))
        np.testing.assert_allclose(
            np.asarray(solver.primal_solution()), SIMPLE_NLP_SOLUTION, atol=1e-2
        )
        assert solver.dual_solution().shape == (3,)
        assert int(solver.info.iter) >= 1
        assert int(res.info.qp_solver_iter) > 0

    def test_zero_init_overload(self):
        solver = SQP()
        solver.solve(simple_qp_nlp(), num_var=2)
        np.testing.assert_allclose(
            np.asarray(solver.primal_solution()), SIMPLE_QP_SOLUTION, atol=1e-2
        )

    def test_invalid_settings_raise(self):
        with pytest.raises(ValueError):
            SQPSettings(tau=1.5).validate()
        with pytest.raises(ValueError):
            SQPSettings(eps_prim=-1.0).validate()


class TestIterationCallback:
    """Reference settings.iteration_callback (sqp.hpp:23, demo at
    tests/sqp_test_autodiff.cpp:165-169) via jax.debug.callback."""

    def test_callback_fires(self):
        seen = []

        def cb(x, lam, it):
            seen.append(int(it))

        sqp_solve(
            simple_nlp(),
            jnp.array([1.2, 0.1]),
            jnp.zeros(3),
            SQPSettings(iteration_callback=cb),
        )
        jax.effects_barrier()
        assert seen and seen[0] == 0 and len(seen) >= 2


class TestBatchedSQP:
    """vmap over starting points and over problem parameters."""

    def test_vmap_over_x0(self):
        prob = simple_nlp()
        x0s = jnp.array([[1.2, 0.1], [2.0, -1.0], [0.5, 0.5], [1.0, 1.5]])
        settings = SQPSettings()
        res = jax.jit(
            jax.vmap(lambda x0: sqp_solve(prob, x0, jnp.zeros(3), settings))
        )(x0s)
        assert res.x.shape == (4, 2)
        assert np.all(np.asarray(res.info.status) == SQPStatus.SOLVED)
        np.testing.assert_allclose(
            np.asarray(res.x), np.tile(SIMPLE_NLP_SOLUTION, (4, 1)), atol=1e-2
        )

    def test_vmap_over_params(self):
        """Problem family parameterized by a target vector: min ||x - t||^2
        s.t. 0 <= x <= 1, batched over t."""
        B = 8
        targets = jnp.linspace(-0.5, 1.5, 2 * B).reshape(B, 2)

        def make(t):
            from sqp_solver_tpu.sqp.types import NonlinearProblem

            nb = t.shape[0] if t.ndim == 2 else None
            l = jnp.zeros(2, dtype=jnp.float64)
            u = jnp.ones(2, dtype=jnp.float64)
            if nb is not None:  # batch the data leaves alongside params
                l = jnp.broadcast_to(l, (nb, 2))
                u = jnp.broadcast_to(u, (nb, 2))
            return NonlinearProblem(
                l=l,
                u=u,
                params=t,
                objective=lambda x, p: jnp.sum((x - p) ** 2),
                constraint=lambda x, p: x,
            )

        prob = make(targets)  # batched params
        settings = SQPSettings()
        res = jax.vmap(
            lambda pr: sqp_solve(pr, jnp.full((2,), 0.5, jnp.float64), None, settings)
        )(prob)
        expect = np.clip(np.asarray(targets), 0.0, 1.0)
        np.testing.assert_allclose(np.asarray(res.x), expect, atol=1e-2)
