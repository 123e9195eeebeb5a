"""Shared example bootstrap.

``example_setup()`` does two things every example needs:

1. **Re-assert the platform after importing jax.**  On hosts with an
   ambient TPU PJRT plugin the plugin forces the platform at interpreter
   start, so ``JAX_PLATFORMS=cpu`` in the environment is silently
   ignored — the exact failure mode ``tests/conftest.py`` and
   ``__graft_entry__.py`` already work around.  Without this, the test
   suite's example subprocesses land on the TPU relay and time out
   (round-4 postmortem: ``mpc_batch.py`` burned 600 s of per-step
   host-synced dispatches).
2. **Read ``SQP_EXAMPLE_QUICK``** — the test-suite smoke mode.  Every
   example must shrink its budget (batch, steps, iterations) when this
   returns True so the suite's smoke runs stay cheap.
"""

import os


def example_setup() -> bool:
    """Honor JAX_PLATFORMS even under an ambient PJRT plugin; return
    whether SQP_EXAMPLE_QUICK smoke mode is on."""
    platforms = os.environ.get("JAX_PLATFORMS")
    if platforms:
        import jax

        jax.config.update("jax_platforms", platforms)
    return os.environ.get("SQP_EXAMPLE_QUICK") == "1"
