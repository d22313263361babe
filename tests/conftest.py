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

# Quarantine the test cache if a previous pytest session died mid-run:
# a process killed mid-write leaves a truncated cache entry that ABORTS
# (uncatchable Fatal Python error in compilation_cache
# .get_executable_and_time) the next reader. The marker is written at
# session start and removed at clean session end, so a marker whose PID
# is DEAD means the last session was killed and the cache may hold a
# torn entry. A marker whose PID is still ALIVE means another pytest
# session is running right now — quarantining would yank the live cache
# from under it (observed r5: a quick side pytest cold-started a
# 25-minute full-suite run), so this session sidesteps into its own
# per-PID cache dir instead and leaves the running session alone.
# (Cost of a dead-PID false positive — a session killed outside a
# write — is one cold-cache rebuild.)
import pathlib  # noqa: E402

_TEST_CACHE = pathlib.Path("/tmp/jax_cache_tests")
_INFLIGHT_MARK = _TEST_CACHE / ".pytest_inflight"
_OWN_MARK = True


def _pid_alive(pid_text: str) -> bool:
    try:
        os.kill(int(pid_text), 0)
        return True
    except (ValueError, ProcessLookupError):
        return False
    except PermissionError:
        return True  # signal refused => the process EXISTS (other user)


def _sidestep_to_private_cache():
    global _TEST_CACHE, _OWN_MARK
    _TEST_CACHE = pathlib.Path(
        f"/tmp/jax_cache_tests.concurrent.{os.getpid()}")
    _OWN_MARK = False  # the running session owns the shared marker


# Every step below races against concurrently starting/finishing
# sessions (the marker can vanish between exists() and read, two
# sessions can both see a dead marker, ...) — so each step tolerates
# losing its race instead of aborting pytest during conftest import.
def _read_marker():
    try:
        return _INFLIGHT_MARK.read_text().strip()
    except FileNotFoundError:
        return None  # no live session
    except OSError:
        return ""  # unreadable marker: treat as a dead session


def _marker_stale() -> bool:
    # A liveness bound: no legitimate pytest session runs 6 h. Without
    # it, a killed session's pid recycled by a long-lived process we
    # can't signal (PermissionError => "alive") would lock every future
    # session into cold per-pid caches forever.
    import time
    try:
        return time.time() - _INFLIGHT_MARK.stat().st_mtime > 6 * 3600
    except OSError:
        return True


_marker_pid = _read_marker()
if _marker_pid is not None:
    if _pid_alive(_marker_pid) and not _marker_stale():
        _sidestep_to_private_cache()
    # Re-read immediately before acting: a racing session may already
    # have quarantined the dir, recreated it, and claimed it (its new
    # LIVE pid must not be renamed away with the old dead one).
    elif _read_marker() == _marker_pid:
        try:
            _TEST_CACHE.rename(
                f"/tmp/jax_cache_tests.quarantined.{os.getpid()}")
        except OSError:
            pass  # a racing session quarantined it first
_TEST_CACHE.mkdir(parents=True, exist_ok=True)
if _OWN_MARK:
    try:  # 'x' = atomic claim; exactly one racing session wins
        with open(_INFLIGHT_MARK, "x") as _f:
            _f.write(str(os.getpid()))
    except FileExistsError:
        _sidestep_to_private_cache()
        _TEST_CACHE.mkdir(parents=True, exist_ok=True)


def pytest_sessionfinish(session, exitstatus):
    if _OWN_MARK:
        _INFLIGHT_MARK.unlink(missing_ok=True)


import jax  # noqa: E402
import pytest  # noqa: E402

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
jax.config.update("jax_compilation_cache_dir", str(_TEST_CACHE))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
# Full-precision f32 matmuls so golden tests compare against the NumPy
# oracle exactly; production training CLIs pin "highest" too (config
# .set_matmul_precision default) — only bench.py's headline number stays
# at the faster XLA default precision.
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture(autouse=True, scope="module")
def _drop_live_executables_per_module():
    """Clear jit caches at every module teardown.

    Too many live compiled executables in one CPU pytest process make a
    LATER unrelated compile SEGFAULT inside backend_compile_and_load
    (r4: 3/3 full-suite runs died in test_fuzz_configs, which passes in
    isolation — the accumulation from the ~9 modules before it crossed
    the cliff). Per-module clear_caches bounds the live-executable count
    by the heaviest single module instead of the whole suite; persistent
    cache hits (/tmp/jax_cache_tests) keep the re-compiles cheap.
    """
    yield
    jax.clear_caches()
