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
