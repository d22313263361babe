"""Multi-host (multi-process) initialization entry point.

The reference is single-process single-device (SURVEY.md §2 rows 20-21);
this module is the TPU-native extension hook for multi-host slices. The
model sizes in this framework (largest tensor 10000×1500 fp32 ≈ 60 MB)
fit one chip, so multi-host is about DATA scale: each process sees its
local chips, ``jax.distributed.initialize`` wires the global runtime, and
the same 1-D data mesh (``make_mesh``) then spans every chip in the
slice — the dp_* entry points in :mod:`data_parallel` work unchanged
because GSPMD handles ICI vs DCN placement from the mesh's device order.

Usage (one call per process, before any other JAX API)::

    from multimodal_idbn_tpu.parallel import initialize_distributed
    initialize_distributed()                      # TPU pods: auto-detect
    initialize_distributed("host0:8476", 4, 0)    # explicit (CPU/GPU)
"""

from __future__ import annotations

from typing import Optional

_initialized = False


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None,
                           timeout_s: Optional[float] = None) -> bool:
    """Idempotent wrapper around ``jax.distributed.initialize``.

    On TPU pods all three arguments are auto-detected from the metadata
    server and may be omitted. Returns True if the distributed runtime is
    active after the call, False when auto-detect finds nothing to join
    (the common local case). With an explicit ``coordinator_address``,
    initialization failure raises — the caller asserted multi-process
    membership, so silently degrading to a standalone run would diverge
    from the rest of the job.

    With an EXPLICIT ``coordinator_address``, processes BLOCK until the
    whole job joins — that is the join protocol, not an error. Only pass
    explicit arguments when this process really is part of an N-process
    job: if the peers never arrive, jax's distributed service terminates
    the process from C++ (LOG(FATAL)) once the deadline expires — that is
    not catchable here. ``timeout_s`` bounds that wait (default ~5 min).
    The no-argument auto-detect path is always safe: off-pod it returns
    False immediately.
    """
    global _initialized
    if _initialized:
        return True
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = int(num_processes)
    if process_id is not None:
        kwargs["process_id"] = int(process_id)
    if timeout_s is not None:
        kwargs["initialization_timeout"] = int(timeout_s)
    try:
        jax.distributed.initialize(**kwargs)
        _initialized = True
    except Exception:
        # Already-active runtime (e.g. another component initialized it):
        # honor the "True if active after the call" contract.
        try:
            if jax.process_count() > 1:
                _initialized = True
                return True
        except Exception:
            pass
        if coordinator_address is not None:
            # Explicit args mean the caller asserted multi-process
            # membership — misconfiguration must surface, not silently
            # degrade into a standalone run that diverges from the job.
            raise
        # Auto-detect off-pod: single-process run, every mesh helper
        # works on the process-local devices.
        return False
    return True


def is_multi_process() -> bool:
    import jax
    return jax.process_count() > 1


def local_batch_slice(global_batch: int) -> slice:
    """The [start, stop) rows of a globally-ordered batch this process
    should feed ``jax.make_array_from_process_local_data`` with (equal
    split by process index; global_batch must divide evenly)."""
    import jax
    n, i = jax.process_count(), jax.process_index()
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"{n} processes")
    per = global_batch // n
    return slice(i * per, (i + 1) * per)
