"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip behavior (sharded CD statistics, psum reductions) is tested
with XLA's host-platform device-count trick — the standard way to test
pjit/shard_map programs without real TPU hardware (SURVEY.md §4).

Must run before the first ``import jax`` anywhere in the test session.
"""

import os

# IDBN_TESTS_ON_TPU=1 keeps the ambient (real TPU) platform — used once
# per round to run the TPU-only Mosaic sampling-kernel tests compiled:
#   IDBN_TESTS_ON_TPU=1 python -m pytest tests/test_pallas.py \
#       tests/test_pallas_chain.py -q
_ON_TPU = os.environ.get("IDBN_TESTS_ON_TPU") == "1"

if not _ON_TPU:
    # Force CPU: the ambient environment pins JAX_PLATFORMS=axon (the real
    # TPU tunnel), which is slow and single-device; tests need the virtual
    # 8-CPU mesh.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment's axon bootstrap rewrites jax_platforms to "axon,cpu"
# even when JAX_PLATFORMS=cpu is set; force CPU before backend init.
if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_threefry_partitionable", True)
# Persistent compilation cache: chain ops compile once across test runs.
# Tests get their OWN cache dir: /tmp/jax_cache is shared with long TPU
# jobs whose processes sometimes die mid-write (axon drops), and a
# truncated entry aborts the whole pytest process inside
# compilation_cache.get_executable_and_time (observed r4).
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
# Full-precision f32 matmuls so golden tests compare against the NumPy
# oracle exactly; production TPU runs use the faster default precision.
jax.config.update("jax_default_matmul_precision", "highest")
