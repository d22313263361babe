"""ctypes binding for the native dot-pattern generator.

Compiles ``dotgen.cpp`` on first use (g++, OpenMP when available) and
exposes :func:`generate_dot_dataset_native`. The Python generator in
``data/numerosity.py`` is the permanent fallback — this is a runtime
acceleration of the framework's only host-bound pipeline stage, not a
correctness dependency.
"""

from __future__ import annotations

import ctypes
import subprocess
import sys
import tempfile
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "dotgen.cpp"
_LIB_NAME = "_dotgen.so"

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _compile_library() -> Optional[Path]:
    """Build the shared library next to the source (fallback: tempdir)."""
    for out_dir in (_HERE, Path(tempfile.gettempdir())):
        out = out_dir / _LIB_NAME
        for extra in (["-fopenmp"], []):
            cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                   *extra, "-o", str(out), str(_SRC)]
            try:
                res = subprocess.run(cmd, capture_output=True, text=True,
                                     timeout=120)
            except Exception:
                return None
            if res.returncode == 0:
                return out
        # compilation itself failed in this dir for both flag sets; a
        # permission error would raise above, so don't retry elsewhere
    return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        lib_path = _HERE / _LIB_NAME
        if not lib_path.exists():
            built = _compile_library()
            if built is None:
                _build_failed = True
                print("[dotgen] native build failed; using Python "
                      "generator", file=sys.stderr)
                return None
            lib_path = built
        try:
            lib = ctypes.CDLL(str(lib_path))
        except OSError:
            _build_failed = True
            return None
        lib.generate_dot_dataset.argtypes = [
            ctypes.c_uint64, ctypes.c_int,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ]
        lib.generate_dot_dataset.restype = None
        lib.dotgen_version.restype = ctypes.c_int
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def generate_dot_dataset_native(seed: int, numerosities: np.ndarray,
                                side: int = 100, r_min: int = 2,
                                r_max: int = 6, max_tries: int = 200):
    """Generate images + geometry features for per-sample dot counts.

    Returns (images [N, side, side] f32, cumArea, CH, density, N_placed).
    Deterministic per (seed, index); parallel over samples.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native dotgen unavailable")
    nums = np.ascontiguousarray(numerosities, np.int32)
    n = len(nums)
    images = np.zeros((n, side, side), np.float32)
    cum_area = np.zeros(n, np.float32)
    ch = np.zeros(n, np.float32)
    density = np.zeros(n, np.float32)
    n_placed = np.zeros(n, np.int32)
    lib.generate_dot_dataset(
        ctypes.c_uint64(seed & 0xFFFFFFFFFFFFFFFF), n, nums, side, r_min,
        r_max, max_tries, images.reshape(-1), cum_area, ch, density,
        n_placed)
    return images, cum_area, ch, density, n_placed
