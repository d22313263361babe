"""Checkpointing: native npz pytree checkpoints + reference pickle compat.

The reference only pickles live torch objects at phase boundaries
(SURVEY.md §5.4). Here:

- :func:`save_checkpoint` / :func:`load_checkpoint` — native, portable
  npz checkpoints of any model (RBM / iDBN / iMDBN / iMDBN_BiModal),
  including momentum buffers (the reference drops optimizer state).
- :func:`save_train_checkpoint` / :func:`load_train_checkpoint` —
  mid-training checkpoints (framework extension; the reference only
  saves at phase boundaries, SURVEY.md §5.4). Because every epoch's RNG
  derives from ``fold_in(epoch_key, epoch)`` — and the DataLoader
  shuffle counters travel with the checkpoint for the per-batch paths —
  a run resumed from epoch k is bit-identical to the uninterrupted run
  (tests/test_resume.py). bfloat16 states round-trip (uint16 bit-views
  + a dtype map in the meta). Writes are atomic (tmp + rename), so a
  crash mid-save never corrupts the latest checkpoint.
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
    import jax

    arrays = {}
    meta = {"format": "multimodal_idbn_tpu.ckpt.v1", "rbms": {}}
    for name, rbm in _collect_rbms(model).items():
        st = rbm.state
        for field, arr in zip(_STATE_FIELDS, st):
            arrays[f"{name}/{field}"] = np.asarray(arr)
        # RNG stream position: the per-batch (non-fused) training paths
        # draw from each RBM's stateful key stream, so resuming a run
        # needs the stream restored, not restarted (tests/test_resume.py).
        arrays[f"{name}/key"] = np.asarray(
            jax.random.key_data(rbm._key))
        meta["rbms"][name] = {
            "softmax_groups": [list(g) for g in rbm.softmax_groups],
        }
    if getattr(model, "z_class_mean", None) is not None:
        arrays["z_class_mean"] = np.asarray(model.z_class_mean)
    for k, v in (extra or {}).items():
        arrays[f"extra/{k}"] = np.asarray(v)
    # npz cannot round-trip ml_dtypes extension dtypes (bfloat16 comes
    # back as raw void "|V2"): store them as uint16 bit-views and record
    # the true dtype in the JSON meta for load_checkpoint to restore.
    # Only bfloat16 is supported — any other extension/void dtype (e.g.
    # a float8 state) would be silently corrupted by the uint16 view, so
    # refuse loudly instead (r3 advisor finding).
    import ml_dtypes
    dtypes = {}
    for k, arr in arrays.items():
        if arr.dtype == ml_dtypes.bfloat16:
            dtypes[k] = "bfloat16"
            arrays[k] = arr.view(np.uint16)
        elif arr.dtype.kind == "V" or arr.dtype.names is not None:
            raise TypeError(
                f"checkpoint array {k!r} has unsupported dtype "
                f"{arr.dtype!r}: only numeric numpy dtypes and bfloat16 "
                f"round-trip through the npz format")
    if dtypes:
        meta["dtypes"] = dtypes
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    # Atomic: a crash mid-write must never clobber the previous
    # checkpoint (np.savez appends .npz, so normalize first).
    import os
    p = str(path)
    if not p.endswith(".npz"):
        p = p + ".npz"
    tmp = p + ".tmp.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, p)


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
    if "__meta__" in files:
        meta = json.loads(bytes(files["__meta__"]).decode())
        if meta.get("dtypes"):
            import ml_dtypes
            for k, dt in meta["dtypes"].items():
                files[k] = files[k].view(getattr(ml_dtypes, dt))

    import jax

    rbms = _collect_rbms(model)
    missing = [name for name in rbms if f"{name}/w" not in files]
    if missing:
        have = sorted({k.split("/w")[0] for k in files if k.endswith("/w")})
        raise ValueError(
            f"checkpoint {p!r} does not match this model: no saved state "
            f"for {missing} (checkpoint contains {have}). Wrong "
            f"checkpoint_dir, or a checkpoint from a different model "
            f"family/architecture?")
    for name, rbm in rbms.items():
        vals = [jnp.asarray(files[f"{name}/{field}"])
                for field in _STATE_FIELDS]
        rbm.state = RBMState(*vals)
        if f"{name}/key" in files:  # absent in pre-resume checkpoints
            rbm._key = jax.random.wrap_key_data(
                jnp.asarray(files[f"{name}/key"]))
    if "z_class_mean" in files and hasattr(model, "z_class_mean"):
        model.z_class_mean = jnp.asarray(files["z_class_mean"])
    return {k[len("extra/"):]: v for k, v in files.items()
            if k.startswith("extra/")}


# ---------------------------------------------------------------------------
# Mid-training checkpoints (framework extension — SURVEY.md §5.4: the
# reference has "no mid-training checkpointing, no retries"). A checkpoint
# records every RBM state (weights + momentum), z_class_mean when present,
# PCD fantasy chains when the opt-in PCD trainer is active, the phase
# name, and the next epoch to run. Since all training RNG derives from
# fold_in(epoch_key, absolute_epoch), resuming from (states, next_epoch)
# reproduces the uninterrupted run bit-for-bit (tests/test_resume.py).
# ---------------------------------------------------------------------------

def config_fingerprint(params: Dict, **extra_fields) -> str:
    """Canonical JSON of the training-relevant configuration.

    Stored in mid-training checkpoints and compared at resume so that
    editing hyperparameters (seed, lr, epochs, layer widths, ...) and
    rerunning with the same ``save_dir`` refuses to silently resume the
    OLD run under the NEW schedule (r3 advisor finding). Keys that are
    legitimate to change across a resume (checkpoint cadence, logging)
    are excluded; ``extra_fields`` carries architecture (layer lists,
    num_labels) that lives outside the params dict.
    """
    # cadence/placement knobs that do NOT change the trained result:
    # checkpoint cadence, metrics-logging cadence, and the data-parallel
    # device count (1-vs-N weight parity is asserted by the dryrun and
    # tests/test_parallel_shell.py), so changing them across a resume is
    # legitimate and must not refuse.
    skip = {"CHECKPOINT_EVERY", "CROSS_METRICS_EVERY", "DP_DEVICES"}
    payload = {k: v for k, v in params.items() if k not in skip}
    payload.update(extra_fields)
    return json.dumps(payload, sort_keys=True, default=str)


def _fingerprint_mismatch_keys(loaded: str, current: str):
    """Human-readable list of differing fields between two fingerprints
    (falls back to a generic marker if either fails to parse)."""
    try:
        a, b = json.loads(loaded), json.loads(current)
        keys = sorted(k for k in set(a) | set(b)
                      if a.get(k, "<absent>") != b.get(k, "<absent>"))
        return [f"{k}: checkpoint={a.get(k, '<absent>')!r} "
                f"run={b.get(k, '<absent>')!r}" for k in keys]
    except Exception:  # pragma: no cover - non-JSON fingerprints
        return ["<fingerprints differ>"]


def save_train_checkpoint(model, path: str, phase: str, next_epoch: int,
                          loss_history=None) -> None:
    """Checkpoint ``model`` mid-training: resumable at ``next_epoch``.

    ``phase`` is a free-form tag ("image", "joint", "mod1", ...) the
    caller uses to route the resume; ``loss_history`` (optional list of
    floats) is restored by :func:`load_train_checkpoint` so resumed runs
    keep a complete loss curve.
    """
    extra = {
        "phase": np.frombuffer(str(phase).encode(), dtype=np.uint8),
        "next_epoch": np.asarray(int(next_epoch), np.int64),
    }
    fp = getattr(model, "_ckpt_fingerprint", None)
    if fp:  # set by the CLI entry points (config_fingerprint)
        extra["config_fingerprint"] = np.frombuffer(
            str(fp).encode(), dtype=np.uint8)
    # The non-fused epoch loops draw batch order from the DataLoader's
    # internal shuffle counter, which does NOT equal epochs-trained in
    # general (e.g. init_joint_bias_from_data consumes one shuffle), so
    # save the live counters rather than letting resume guess.
    for attr in ("dataloader", "val_loader"):
        ld = getattr(model, attr, None)
        if ld is not None and hasattr(ld, "_epoch"):
            extra[f"loader_epoch/{attr}"] = np.asarray(
                int(ld._epoch), np.int64)
    if loss_history is not None:
        extra["loss_history"] = np.asarray(loss_history, np.float64)
    chains = getattr(model, "_pcd_chains", None)
    if chains is not None:
        for i, c in enumerate(chains):
            extra[f"pcd_chain{i}"] = np.asarray(c)
    metrics = getattr(model, "joint_metrics_history", None)
    if metrics is not None:
        extra["joint_metrics_history"] = np.frombuffer(
            json.dumps(metrics).encode(), dtype=np.uint8)
    save_checkpoint(model, path, extra=extra)


def load_train_checkpoint(model, path: str):
    """Restore a :func:`save_train_checkpoint` file into ``model``.

    Returns ``(phase, next_epoch)``. Also restores ``loss_history``
    (onto ``model.loss_history`` when the model keeps one) and PCD
    fantasy chains when the checkpoint carries them.
    """
    import jax.numpy as jnp

    extras = load_checkpoint(model, path)
    phase = bytes(extras["phase"]).decode()
    next_epoch = int(extras["next_epoch"])
    # Drop any stale stash first: a previous load whose consumer raised
    # (phase mismatch) or that was called directly would otherwise leak
    # its fingerprint into THIS load of a pre-fingerprint checkpoint,
    # producing a spurious config-mismatch refusal (r4 advisor finding).
    model.__dict__.pop("_ckpt_loaded_fingerprint", None)
    if "config_fingerprint" in extras:
        # one-shot stash consumed by load_train_checkpoint_expecting
        model._ckpt_loaded_fingerprint = bytes(
            extras["config_fingerprint"]).decode()
    if "loss_history" in extras and hasattr(model, "loss_history"):
        model.loss_history = [float(x) for x in extras["loss_history"]]
    if "joint_metrics_history" in extras:
        model.joint_metrics_history = json.loads(
            bytes(extras["joint_metrics_history"]).decode())
    # numeric sort: "pcd_chain10" must come after "pcd_chain2"
    chain_keys = sorted(
        (k for k in extras if k.startswith("pcd_chain")),
        key=lambda k: int(k[len("pcd_chain"):]))
    if chain_keys and hasattr(model, "_pcd_chains"):
        model._pcd_chains = tuple(jnp.asarray(extras[k])
                                  for k in chain_keys)
    # Restore loader shuffle counters. The counter VALUES are stashed on
    # the model (not only applied to the live loader) because some
    # callers attach the training loader after loading the checkpoint —
    # scripts/train_bimodal.py loads the mod1/mod2 checkpoints before
    # _train_mod_dbn builds the modality dataloader (r3 advisor finding).
    # align_loader_for_resume applies the stash to whichever loader is
    # attached at train() time.
    restored = {}
    for attr in ("dataloader", "val_loader"):
        k = f"loader_epoch/{attr}"
        if k in extras:
            restored[attr] = int(extras[k])
            ld = getattr(model, attr, None)
            if ld is not None and hasattr(ld, "_epoch"):
                ld._epoch = restored[attr]
    if restored:
        model._restored_loader_epochs = restored
    return phase, next_epoch


def align_loader_for_resume(model, start_epoch: int) -> None:
    """Align the DataLoader shuffle counter for a resumed non-fused run.

    When the checkpoint carried the loader's true counters,
    :func:`load_train_checkpoint` stashed their VALUES on the model —
    and the epochs-trained guess below would be wrong whenever
    iterations and epochs diverge (init_joint_bias_from_data consumes
    one shuffle, a train_with_retry attempt inherits earlier attempts'
    iterations) — so the stash wins, applied here to whichever loader is
    attached NOW (a loader may be attached after checkpoint load, e.g.
    scripts/train_bimodal.py's modality loaders). Without a stash
    (manual ``start_epoch``, pre-r3 checkpoints) fall back to
    one-iteration-per-epoch-trained.
    """
    restored = model.__dict__.pop("_restored_loader_epochs", None)
    if restored is not None:
        for attr, val in restored.items():
            ld = getattr(model, attr, None)
            if ld is not None and hasattr(ld, "_epoch"):
                ld._epoch = int(val)
        return
    ld = getattr(model, "dataloader", None)
    if start_epoch and ld is not None and hasattr(ld, "_epoch"):
        ld._epoch = int(start_epoch)


def maybe_save_train_checkpoint(model, path, every: int, phase: str,
                                next_epoch: int, total_epochs: int,
                                loss_history=None,
                                cadence_only: bool = False) -> bool:
    """Periodic mid-training save used by every trainer's epoch loop.

    No-op (returns False) unless checkpointing is configured (``path``
    and ``every`` truthy) and the run isn't finished
    (``next_epoch < total_epochs``). ``cadence_only=True`` additionally
    requires ``next_epoch`` to land on a multiple of ``every`` — the
    per-epoch loops use it; the blocked paths save at every block edge
    (block edges already follow :func:`checkpoint_epochs`, plus free
    extra edges like the warmup boundary)."""
    if not (path and every and int(next_epoch) < int(total_epochs)):
        return False
    if cadence_only and int(next_epoch) % int(every) != 0:
        return False
    save_train_checkpoint(model, path, phase=phase,
                          next_epoch=int(next_epoch),
                          loss_history=loss_history)
    return True


def cli_checkpoint_paths(cfg: Dict, names):
    """Resolve the crash-recovery checkpoint paths for a CLI run.

    Shared by scripts/train_multimodal.py and scripts/train_bimodal.py:
    ``paths.checkpoint_dir`` (default ``<paths.save_dir>/checkpoints``)
    is created and a dict ``{name: Path(<dir>/<name>.ckpt.npz)}`` is
    returned for the given phase ``names``."""
    from pathlib import Path

    paths_cfg = cfg.get("paths", {})
    ckpt_dir = Path(paths_cfg.get(
        "checkpoint_dir",
        str(Path(paths_cfg.get("save_dir", "./networks"))
            / "checkpoints"))).expanduser()
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    return {n: ckpt_dir / f"{n}.ckpt.npz" for n in names}


def remove_checkpoints(paths) -> None:
    """Delete crash-recovery checkpoints after a completed run (so a
    later fresh run with the same config actually trains)."""
    for p in paths:
        if p is not None and p.exists():
            p.unlink()


def load_train_checkpoint_expecting(model, path, expected_phase: str,
                                    ignore_config: bool = False):
    """:func:`load_train_checkpoint` + a clear error when the file's
    phase tag doesn't match what the caller is resuming, or when the
    checkpoint's config fingerprint differs from the current run's
    (hyperparameters were edited since the checkpoint was written —
    resuming would produce a model that follows neither schedule;
    r3 advisor finding). ``ignore_config=True`` (YAML
    ``training.resume_ignore_config``) skips the fingerprint check for
    deliberate schedule changes (e.g. extending epochs)."""
    phase, next_epoch = load_train_checkpoint(model, str(path))
    # Pop the one-shot stash BEFORE the phase check so a phase-mismatch
    # raise cannot leave it behind for a later load to mis-consume.
    loaded_fp = model.__dict__.pop("_ckpt_loaded_fingerprint", None)
    if phase != expected_phase:
        raise ValueError(
            f"checkpoint {str(path)!r} is a {phase!r}-phase checkpoint "
            f"but this run expected {expected_phase!r} — wrong "
            f"checkpoint_dir, or leftovers from a different config?")
    current_fp = getattr(model, "_ckpt_fingerprint", None)
    if (not ignore_config and loaded_fp and current_fp
            and loaded_fp != current_fp):
        diffs = _fingerprint_mismatch_keys(loaded_fp, current_fp)
        raise ValueError(
            f"checkpoint {str(path)!r} was written by a run with "
            f"different training configuration ({'; '.join(diffs)}). "
            f"Resuming it under the new config would produce a model "
            f"that follows neither schedule. Delete the checkpoint "
            f"directory to start fresh, or set "
            f"training.resume_ignore_config: true to resume anyway.")
    return next_epoch


def checkpoint_epochs(start_epoch: int, end_epoch: int,
                      checkpoint_every: int, *extra_edges: int):
    """Split ``[start_epoch, end_epoch)`` into contiguous blocks whose
    edges land on multiples of ``checkpoint_every`` plus any
    ``extra_edges`` (e.g. a warmup boundary). ``checkpoint_every <= 0``
    yields blocks split only at ``extra_edges``. Returns a list of
    ``(block_start, block_end)`` tuples."""
    edges = {start_epoch, end_epoch}
    edges.update(e for e in extra_edges if start_epoch < e < end_epoch)
    if checkpoint_every and checkpoint_every > 0:
        e = (start_epoch // checkpoint_every + 1) * checkpoint_every
        while e < end_epoch:
            edges.add(e)
            e += checkpoint_every
    seq = sorted(edges)
    return list(zip(seq[:-1], seq[1:]))
