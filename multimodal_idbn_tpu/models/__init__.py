"""Model shells mirroring the reference's public API.

The reference package exports ``RBM, iDBN, iMDBN`` from a monolith file
and ``iMDBN_BiModal`` separately, plus fake ``src.classes.*`` module
aliases so old Groundeep pickles unpickle (reference
imdbn/models/__init__.py:5-35). Here every class has a single clean
implementation; pickle compatibility with old payloads is handled by the
import path in :mod:`multimodal_idbn_tpu.checkpoint` instead of
``sys.modules`` pollution.
"""

from multimodal_idbn_tpu.models.rbm import RBM, set_global_seed  # noqa: F401


def __getattr__(name):
    if name == "iDBN":
        from multimodal_idbn_tpu.models.idbn import iDBN
        return iDBN
    if name == "iMDBN":
        from multimodal_idbn_tpu.models.imdbn import iMDBN
        return iMDBN
    if name == "iMDBN_BiModal":
        from multimodal_idbn_tpu.models.imdbn_bimodal import iMDBN_BiModal
        return iMDBN_BiModal
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = ["RBM", "iDBN", "iMDBN", "iMDBN_BiModal", "set_global_seed"]
