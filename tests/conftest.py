"""Test configuration: run everything on a virtual 8-device CPU mesh.

The driver benches on real TPU; tests use CPU with
``--xla_force_host_platform_device_count=8`` as the multi-device fake
backend (the analog of the reference's single-binary GTest setup, with
sharding coverage the reference couldn't have).  f64 is enabled so
conformance tests can hit the 1e-6 agreement bar against the Eigen
reference goldens.
"""

import os
import sys

# The full suite compiles/deserializes ~hundreds of XLA CPU executables in
# one process; each load adds JIT-code mappings, and the process crosses
# the default vm.max_map_count (65530) right at the suite's tail — XLA then
# SEGFAULTS on the failed mmap inside executable (de)serialization
# (measured: ~50k maps at minute 6, ~100 maps/s growth; crash always in
# compilation_cache get/put on the final test).  Raise the sysctl when
# possible (container runs as root); harmless no-op otherwise.
try:
    with open("/proc/sys/vm/max_map_count") as _f:
        if int(_f.read()) < 262144:
            with open("/proc/sys/vm/max_map_count", "w") as _g:
                _g.write("1048576")
except (OSError, PermissionError, ValueError):
    pass

os.environ["JAX_PLATFORMS"] = "cpu"  # hard override: the ambient env may point at TPU
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The ambient environment may register a TPU PJRT plugin that forces
# jax_platforms at interpreter start; override it after import so tests run
# on the virtual CPU mesh regardless.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the suite is compile-bound on CPU, and the
# traced programs are identical across runs.
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_test_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


# ---------------------------------------------------------------------------
# Tiering: the full suite is ~22 min on the 1-core reference host (XLA CPU
# compiles dominate).  Tests measured >= ~7 s there are marked `slow` at
# collection (list from `pytest --durations=0`, re-measured round 5), giving
# a fast tier for the edit loop:   python -m pytest tests/ -m "not slow" -q
# Everything still runs in the full suite (the default).
# ---------------------------------------------------------------------------
import pytest  # noqa: E402

_SLOW_TESTS = {
    "test_diff.py::TestSQPDiff::test_sqp_grads_match_finite_differences",
    "test_diff.py::test_qp_grads_match_finite_differences",
    "test_diff.py::test_kernel_and_xla_adjoint_routes_agree",
    "test_diff.py::test_inactive_bounds_zero_gradient",
    "test_diff.py::TestSQPDiff::test_x0_gradient_is_zero",
    "test_examples.py",  # every example subprocess
    "test_structured.py::TestArrow",
    "test_structured.py::TestBlockTridiagonal",
    "test_structured.py::TestStructuredFusedTier",
    "test_fused_sqp.py::TestSOCFactorReuse",
    "test_fused_sqp.py::TestLayoutNativeHooks",
    "test_fused_sqp.py::TestFusedSQP::test_polish_rescues_stress_family",
    "test_utils.py::TestBatchedIterationCallback",
    "test_scaling.py::TestClassificationInvariance",
    "test_scaling.py::TestF32Rescue",
    "test_scaling.py::TestTransposedLayout",
    "test_scaling.py::TestSQPInnerScaling",
    "test_scaling.py::TestEquilibration",
    "test_sharding.py",  # 8-device mesh solves
    "test_polish.py::test_sqp_polish_parity_per_problem_vs_batched",
    "test_polish.py::test_polish_nlp_t_matches_polish_nlp",
    "test_polish.py::test_polish_improves_accuracy",
    "test_sqp_btd.py::TestStructuredSQPTier",
    "test_qp_kernel_btd.py::TestStructuredWholeSolveKernel::test_matches_structured_fused_tier",
    "test_edge_cases.py::TestMixedBounds::test_all_paths_agree",
    "test_edge_cases.py::TestLargeN",
    "test_infeasibility.py::TestCertificates::test_feasible_families_never_flagged",
    "test_infeasibility.py::TestSQPSubproblemCertificates",
    "test_fused_qp.py::TestFusedMatchesVmap::test_batch_padding",
    "test_fused_qp.py::TestFusedMatchesVmap::test_mpc_batch",
    "test_sparse.py::TestSparseQPSolve",
    "test_families_device.py",  # long-budget device twins + oracle
    "test_qp.py::TestLinearSolverHardening::test_kkt_ldlt_solves_equality_heavy_f32",
    "test_scaling.py::TestCompSlackRescore::test_flag_eliminates_false_solved",
    "test_sparse.py::TestStripPreparation::test_cg_factor_carries_strips",
}

_DEVICE_TESTS = {
    "test_sharding.py",
    "test_qp_kernel.py",
    "test_qp_kernel_btd.py",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        nodeid = item.nodeid.replace("tests/", "")
        for pat in _SLOW_TESTS:
            if nodeid.startswith(pat) or ("::" in pat and pat in nodeid):
                item.add_marker(pytest.mark.slow)
                break
        for pat in _DEVICE_TESTS:
            if nodeid.startswith(pat):
                item.add_marker(pytest.mark.device)
                break
