"""Smoke-run every file in examples/: each must exit 0 in quick mode.

The examples are user-facing documentation (diff layer, infeasibility
certificates, ML QP families, batched MPC, portfolio NLP); without these
tests they can rot silently when an API they demo changes.  Each runs as
a subprocess (own jax config: some enable x64) on CPU with
SQP_EXAMPLE_QUICK=1 shrinking descent budgets, and with the shared
compilation cache so re-runs are cheap.
"""

import os
import subprocess
import sys

import pytest

_EXAMPLES_DIR = os.path.join(os.path.dirname(__file__), os.pardir, "examples")
_EXAMPLES = sorted(
    f for f in os.listdir(_EXAMPLES_DIR)
    if f.endswith(".py") and not f.startswith("_")  # _common.py is a helper
)


def test_examples_dir_is_covered():
    """A new example file automatically joins the parametrization below."""
    assert len(_EXAMPLES) >= 5


@pytest.mark.parametrize("fname", _EXAMPLES)
def test_example_runs(fname):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["SQP_EXAMPLE_QUICK"] = "1"
    env.setdefault(
        "JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_bench_cache"
    )
    # the conftest's 8-device flag is harmless here but not needed
    proc = subprocess.run(
        [sys.executable, os.path.join(_EXAMPLES_DIR, fname)],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, (
        f"{fname} failed (rc={proc.returncode})\n"
        f"--- stdout ---\n{proc.stdout[-2000:]}\n"
        f"--- stderr ---\n{proc.stderr[-2000:]}"
    )
