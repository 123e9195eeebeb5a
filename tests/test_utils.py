"""Utility modules: debug printers, profiling summaries, precision helpers."""

import io
import contextlib

import jax.numpy as jnp
import numpy as np

from sqp_solver_tpu.models.problems import simple_qp
from sqp_solver_tpu.qp import QPSettings, qp_solve
from sqp_solver_tpu.utils import hdot, hmat, is_psd, print_qp
from sqp_solver_tpu.utils.profiling import summarize_info, time_solve


def test_print_qp_and_is_psd():
    qp = simple_qp()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        print_qp(qp)
    out = buf.getvalue()
    assert "P =" in out and "u =" in out
    assert is_psd(qp.P)
    assert not is_psd(jnp.array([[1.0, 0.0], [0.0, -1.0]]))


def test_precision_helpers():
    a = jnp.ones((3, 4))
    b = jnp.ones((4, 2))
    np.testing.assert_allclose(np.asarray(hmat(a, b)), 4.0)
    np.testing.assert_allclose(float(hdot(jnp.ones(4), jnp.ones(4))), 4.0)


def test_summarize_info():
    res = qp_solve(simple_qp(), QPSettings())
    s = summarize_info(res.info)
    assert s["solved_frac"] == 1.0
    assert s["iter_p50"] > 0
    assert 0 in s["status_counts"]


def test_time_solve():
    import jax

    f = jax.jit(lambda qp: qp_solve(qp, QPSettings()))
    dt, out = time_solve(f, simple_qp(), reps=2)
    assert dt > 0
    assert int(out.info.status) == 0
def test_verbose_runs():
    """QPSettings.verbose prints the reference-format iteration table via
    jax.debug.print without breaking the solve."""
    import jax

    from sqp_solver_tpu.models.problems import simple_qp
    from sqp_solver_tpu.qp import QPSettings, qp_solve

    res = qp_solve(simple_qp(), QPSettings(verbose=True))
    jax.effects_barrier()
    assert int(res.info.status) == 0
