"""Checkpointing: native npz pytree checkpoints + reference pickle compat.

The reference only pickles live torch objects at phase boundaries
(SURVEY.md §5.4). Here:

- :func:`save_checkpoint` / :func:`load_checkpoint` — native, portable
  npz checkpoints of any model (RBM / iDBN / iMDBN / iMDBN_BiModal),
  including momentum buffers (the reference drops optimizer state).
- :func:`export_reference_pickle` / :func:`import_reference_pickle` —
  the reference's dual-format pickle payload with torch-free numpy shims
  (export) and tolerant unpickling of reference/Groundeep payloads
  (import) so DBNAdapter-style consumers interoperate.
"""

from __future__ import annotations

import json
from typing import Dict

import numpy as np

from multimodal_idbn_tpu.checkpoint.reference_pickle import (  # noqa: F401
    NumpyDBN,
    NumpyRBM,
    export_reference_pickle,
    import_reference_pickle,
)

_STATE_FIELDS = ("w", "hb", "vb", "w_m", "hb_m", "vb_m")


def _collect_rbms(model) -> Dict[str, "object"]:
    """Name every RBM in a model with a stable flat key."""
    from multimodal_idbn_tpu.models.rbm import RBM

    if isinstance(model, RBM):
        return {"rbm": model}
    out = {}
    if hasattr(model, "image_idbn"):  # iMDBN
        for i, r in enumerate(model.image_idbn.layers):
            out[f"image_idbn/layer{i}"] = r
        out["joint_rbm"] = model.joint_rbm
    elif hasattr(model, "mod1_dbn"):  # iMDBN_BiModal
        for i, r in enumerate(model.mod1_dbn.layers):
            out[f"mod1_dbn/layer{i}"] = r
        for i, r in enumerate(model.mod2_dbn.layers):
            out[f"mod2_dbn/layer{i}"] = r
        for i, r in enumerate(model.joint_layers):
            out[f"joint/layer{i}"] = r
    elif hasattr(model, "layers"):  # iDBN
        for i, r in enumerate(model.layers):
            out[f"layer{i}"] = r
    else:
        raise TypeError(f"don't know how to checkpoint {type(model)}")
    return out


def save_checkpoint(model, path: str, extra: Dict | None = None) -> None:
    """Save all RBM states (including momentum buffers) plus optional
    extras (e.g. z_class_mean) to one npz file."""
    arrays = {}
    meta = {"format": "multimodal_idbn_tpu.ckpt.v1", "rbms": {}}
    for name, rbm in _collect_rbms(model).items():
        st = rbm.state
        for field, arr in zip(_STATE_FIELDS, st):
            arrays[f"{name}/{field}"] = np.asarray(arr)
        meta["rbms"][name] = {
            "softmax_groups": [list(g) for g in rbm.softmax_groups],
        }
    if getattr(model, "z_class_mean", None) is not None:
        arrays["z_class_mean"] = np.asarray(model.z_class_mean)
    for k, v in (extra or {}).items():
        arrays[f"extra/{k}"] = np.asarray(v)
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    np.savez(path, **arrays)


def save_checkpoint_orbax(model, path: str) -> None:
    """Orbax-backed checkpoint (async-capable, production path). Same
    content as the npz format: every RBM state + z_class_mean."""
    import orbax.checkpoint as ocp

    tree: Dict = {}
    for name, rbm in _collect_rbms(model).items():
        tree[name.replace("/", ".")] = {
            field: np.asarray(arr)
            for field, arr in zip(_STATE_FIELDS, rbm.state)}
    if getattr(model, "z_class_mean", None) is not None:
        tree["z_class_mean"] = np.asarray(model.z_class_mean)

    import os
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()


def load_checkpoint_orbax(model, path: str) -> None:
    """Restore an orbax checkpoint written by :func:`save_checkpoint_orbax`."""
    import os

    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from multimodal_idbn_tpu.ops.rbm_ops import RBMState

    ckptr = ocp.StandardCheckpointer()
    tree = ckptr.restore(os.path.abspath(path))
    for name, rbm in _collect_rbms(model).items():
        sub = tree[name.replace("/", ".")]
        rbm.state = RBMState(*(jnp.asarray(sub[f]) for f in _STATE_FIELDS))
    if "z_class_mean" in tree and hasattr(model, "z_class_mean"):
        model.z_class_mean = jnp.asarray(tree["z_class_mean"])


def load_checkpoint(model, path: str) -> Dict[str, np.ndarray]:
    """Restore RBM states into ``model`` from an npz checkpoint; returns
    any ``extra/*`` arrays."""
    import jax.numpy as jnp

    from multimodal_idbn_tpu.ops.rbm_ops import RBMState

    p = str(path)
    if not p.endswith(".npz"):
        p = p + ".npz"
    with np.load(p, allow_pickle=False) as f:
        files = dict(f)

    rbms = _collect_rbms(model)
    for name, rbm in rbms.items():
        vals = [jnp.asarray(files[f"{name}/{field}"])
                for field in _STATE_FIELDS]
        rbm.state = RBMState(*vals)
    if "z_class_mean" in files and hasattr(model, "z_class_mean"):
        model.z_class_mean = jnp.asarray(files["z_class_mean"])
    return {k[len("extra/"):]: v for k, v in files.items()
            if k.startswith("extra/")}
