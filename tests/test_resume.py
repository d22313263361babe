"""Crash-safe resume tests (framework extension — SURVEY.md §5.4: the
reference only pickles at phase boundaries and cannot resume mid-phase).

The contract under test: every epoch's RNG derives from
``fold_in(epoch_key, absolute_epoch)``, so a run checkpointed at epoch k
and resumed with ``start_epoch=k`` is bit-identical to the uninterrupted
run — weights, momentum buffers, loss history, and (for PCD) fantasy
chains. Covered here for iDBN (blocked, per-epoch, PCD), iMDBN joint,
iMDBN_BiModal joint, and end-to-end through the train_multimodal.py CLI
with an injected mid-joint crash.
"""

import os
import pickle
import subprocess
import sys
from pathlib import Path

import jax
import numpy as np
import pytest

from multimodal_idbn_tpu.checkpoint import (
    checkpoint_epochs,
    load_train_checkpoint,
    save_checkpoint,
    save_train_checkpoint,
)
from multimodal_idbn_tpu.data import create_dataloaders_uniform
from multimodal_idbn_tpu.models import iDBN, iMDBN, iMDBN_BiModal

ROOT = Path(__file__).resolve().parent.parent

PARAMS = {
    "LEARNING_RATE": 0.1,
    "WEIGHT_PENALTY": 1e-4,
    "INIT_MOMENTUM": 0.5,
    "FINAL_MOMENTUM": 0.9,
    "LEARNING_RATE_DYNAMIC": True,
    "CD": 1,
    "JOINT_CD": 1,
    "JOINT_LEARNING_RATE": 0.04,
    "CROSS_GIBBS_STEPS": 3,
    "JOINT_AUX_COND_STEPS": 2,
}
# side=12 is the smallest canvas where dot placement spreads labels over
# all K=4 classes (side=8 fits exactly one radius-2 dot, collapsing every
# label to class 0 and hiding shuffle-order resume bugs).
SIDE = 12
K = 4


@pytest.fixture(scope="module", autouse=True)
def _clear_caches_after_module():
    # Heavy module: drop compiled executables at teardown (see the
    # backend_compile_and_load segfault note in CLAUDE.md).
    yield
    jax.clear_caches()


def assert_states_equal(sa, sb):
    fa = jax.tree_util.tree_leaves(sa)
    fb = jax.tree_util.tree_leaves(sb)
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


# ---------------------------------------------------------------------------
# checkpoint_epochs block splitting
# ---------------------------------------------------------------------------

def test_checkpoint_epochs_no_every():
    assert checkpoint_epochs(0, 10, 0) == [(0, 10)]


def test_checkpoint_epochs_every():
    assert checkpoint_epochs(0, 10, 4) == [(0, 4), (4, 8), (8, 10)]


def test_checkpoint_epochs_resume_start():
    # resuming at 3: first edge is the next multiple of 4
    assert checkpoint_epochs(3, 10, 4) == [(3, 4), (4, 8), (8, 10)]


def test_checkpoint_epochs_extra_edges():
    # a warmup boundary at 8 splits a block even off-cadence
    assert checkpoint_epochs(0, 10, 3, 8) == [
        (0, 3), (3, 6), (6, 8), (8, 9), (9, 10)]
    assert checkpoint_epochs(0, 10, 0, 8) == [(0, 8), (8, 10)]
    # edges at/outside the range are ignored
    assert checkpoint_epochs(2, 10, 0, 2, 10, 15) == [(2, 10)]


def test_checkpoint_epochs_empty_and_contiguous():
    assert checkpoint_epochs(5, 5, 2) == []
    blocks = checkpoint_epochs(1, 23, 5, 8)
    assert blocks[0][0] == 1 and blocks[-1][1] == 23
    for (a, b), (c, d) in zip(blocks, blocks[1:]):
        assert b == c and a < b


# ---------------------------------------------------------------------------
# save/load_train_checkpoint round trip
# ---------------------------------------------------------------------------

def _fresh_loaders(**kw):
    kw.setdefault("batch_size", 16)
    kw.setdefault("n_samples", 64)
    kw.setdefault("num_classes", K)
    kw.setdefault("side", SIDE)
    kw.setdefault("seed", 0)
    return create_dataloaders_uniform(**kw)


def _make_idbn(extra=None):
    train, val, _ = _fresh_loaders()
    params = dict(PARAMS, **(extra or {}))
    return iDBN([SIDE * SIDE, 16, 8], params, train, val, seed=0)


def test_train_checkpoint_roundtrip(tmp_path):
    m = _make_idbn()
    m.loss_history = [1.5, 0.75]
    p = str(tmp_path / "ck")
    save_train_checkpoint(m, p, phase="image", next_epoch=2,
                          loss_history=m.loss_history)
    assert (tmp_path / "ck.npz").exists()  # suffix normalized
    m2 = _make_idbn()
    phase, nxt = load_train_checkpoint(m2, p)
    assert (phase, nxt) == ("image", 2)
    assert m2.loss_history == [1.5, 0.75]
    assert_states_equal(m._states(), m2._states())


def test_save_checkpoint_atomic(tmp_path):
    m = _make_idbn()
    p = str(tmp_path / "atomic")
    save_checkpoint(m, p)
    save_checkpoint(m, p)  # overwrite via os.replace, no stale tmp
    names = sorted(f.name for f in tmp_path.iterdir())
    assert names == ["atomic.npz"]


def test_train_arg_validation(tmp_path):
    m = _make_idbn()
    with pytest.raises(ValueError, match="start_epoch"):
        m.train(2, start_epoch=3)
    with pytest.raises(ValueError, match="checkpoint_path"):
        m.train(2, checkpoint_every=1)


def test_wrong_model_checkpoint_is_a_clear_error(tmp_path):
    """Loading a checkpoint from a different model family must raise a
    readable mismatch error, not a KeyError mid-restore."""
    m = _make_idbn()
    p = str(tmp_path / "idbn_ck")
    save_train_checkpoint(m, p, phase="image", next_epoch=1)
    other = _make_imdbn()
    with pytest.raises(ValueError, match="does not match this model"):
        load_train_checkpoint(other, p)


def test_phase_mismatch_is_a_clear_error(tmp_path):
    from multimodal_idbn_tpu.checkpoint import (
        load_train_checkpoint_expecting)

    m = _make_idbn()
    p = tmp_path / "mod1_ck.npz"
    save_train_checkpoint(m, str(p), phase="mod1", next_epoch=1)
    m2 = _make_idbn()
    assert load_train_checkpoint_expecting(m2, p, "mod1") == 1
    with pytest.raises(ValueError, match="'mod1'-phase checkpoint"):
        load_train_checkpoint_expecting(m2, p, "image")


def test_pcd_chains_restore_in_numeric_order(tmp_path):
    """10+ chains must restore by index, not lexicographically
    ("pcd_chain10" < "pcd_chain2" as strings)."""
    train, val, _ = _fresh_loaders()
    m = iDBN([SIDE * SIDE] + [8] * 11, dict(PARAMS, PCD=True), train, val,
             seed=0)
    rng = np.random.RandomState(0)
    m._pcd_chains = tuple(jax.numpy.asarray(rng.rand(4, 8).astype(np.float32))
                          for _ in range(11))
    p = str(tmp_path / "pcd_ck")
    save_train_checkpoint(m, p, phase="image", next_epoch=1)
    m2 = iDBN([SIDE * SIDE] + [8] * 11, dict(PARAMS, PCD=True), train, val,
              seed=1)
    load_train_checkpoint(m2, p)
    assert len(m2._pcd_chains) == 11
    for a, b in zip(m._pcd_chains, m2._pcd_chains):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_joint_metrics_history_survives_resume(tmp_path):
    m = _make_imdbn()
    m.joint_metrics_history = [{"epoch": 0, "cross/top1": 0.25}]
    p = str(tmp_path / "jm_ck")
    save_train_checkpoint(m, p, phase="joint", next_epoch=1)
    m2 = _make_imdbn()
    load_train_checkpoint(m2, p)
    assert m2.joint_metrics_history == [{"epoch": 0, "cross/top1": 0.25}]


def test_train_with_retry_checks_collapse_on_resume(monkeypatch):
    """A resumed train_with_retry (start_epoch > 0) must still run the
    collapse check and retry — a crash+resume can't ship a collapsed
    model the uninterrupted run would have retrained."""
    import jax.numpy as jnp

    m = _make_idbn()
    calls = {"n": 0}
    real_reconstruct = m.reconstruct

    def fake_reconstruct(x):
        calls["n"] += 1
        if calls["n"] == 1:  # pretend the resumed run ends collapsed
            return jnp.zeros_like(jnp.asarray(x))
        return real_reconstruct(x)

    monkeypatch.setattr(m, "reconstruct", fake_reconstruct)
    starts = []
    real_train = m.train

    def recording_train(epochs, *a, start_epoch=0, **k):
        starts.append(start_epoch)
        return real_train(epochs, *a, start_epoch=start_epoch, **k)

    monkeypatch.setattr(m, "train", recording_train)
    retries = m.train_with_retry(epochs=3, max_retries=2, start_epoch=2)
    assert retries == 1
    # first attempt continues at 2; the retry restarts from scratch
    assert starts == [2, 0]


# ---------------------------------------------------------------------------
# iDBN: blocked (fused) path
# ---------------------------------------------------------------------------

def test_idbn_blocked_resume_bit_identical(tmp_path):
    ck = str(tmp_path / "idbn.ckpt")

    a = _make_idbn()
    a.train(6)

    # checkpointing splits 6 epochs into three E=2 blocks — results must
    # not change vs the single E=6 dispatch
    b = _make_idbn()
    b.train(6, checkpoint_every=2, checkpoint_path=ck)
    assert_states_equal(a._states(), b._states())
    np.testing.assert_array_equal(a.loss_history, b.loss_history)

    # the last mid-run checkpoint (next_epoch=4) resumes bit-identically
    c = _make_idbn()
    phase, nxt = load_train_checkpoint(c, ck)
    assert (phase, nxt) == ("image", 4)
    c.train(6, start_epoch=4)
    assert_states_equal(a._states(), c._states())
    np.testing.assert_array_equal(a.loss_history, c.loss_history)


def test_idbn_per_epoch_resume_bit_identical(tmp_path):
    ck = str(tmp_path / "idbn_pe.ckpt")

    a = _make_idbn()
    a.train(4, fused=False)

    b = _make_idbn()
    b.train(4, fused=False, checkpoint_every=2, checkpoint_path=ck)
    assert_states_equal(a._states(), b._states())

    # fresh model + fresh loader (DataLoader._epoch starts at 0; resume
    # must pin it to start_epoch for identical shuffles)
    c = _make_idbn()
    phase, nxt = load_train_checkpoint(c, ck)
    assert nxt == 2
    c.train(4, fused=False, start_epoch=2)
    assert_states_equal(a._states(), c._states())
    np.testing.assert_array_equal(a.loss_history, c.loss_history)


def test_idbn_pcd_resume_restores_chains(tmp_path):
    ck = str(tmp_path / "idbn_pcd.ckpt")
    extra = {"PCD": True}

    a = _make_idbn(extra)
    a.train(4)

    b = _make_idbn(extra)
    b.train(4, checkpoint_every=2, checkpoint_path=ck)
    assert_states_equal(a._states(), b._states())
    assert_states_equal(a._pcd_chains, b._pcd_chains)

    c = _make_idbn(extra)
    _, nxt = load_train_checkpoint(c, ck)
    assert nxt == 2
    assert c._pcd_chains is not None  # fantasy chains restored
    c.train(4, start_epoch=2)
    assert_states_equal(a._states(), c._states())
    assert_states_equal(a._pcd_chains, c._pcd_chains)


def test_idbn_dp_resume_bit_identical(tmp_path):
    """Resume composes with shell-level data parallelism: a blocked-DP
    run over the 8-device mesh, checkpointed and resumed, matches the
    uninterrupted blocked-DP run bit-for-bit (same fold_in key
    derivation; block edges don't change per-epoch reduction order)."""
    ck = str(tmp_path / "idbn_dp.ckpt")
    extra = {"DP_DEVICES": 8}

    a = _make_idbn(extra)
    a.train(6)
    assert a.mesh is not None and a.mesh.devices.size == 8

    b = _make_idbn(extra)
    b.train(6, checkpoint_every=2, checkpoint_path=ck)
    assert_states_equal(a._states(), b._states())

    c = _make_idbn(extra)
    _, nxt = load_train_checkpoint(c, ck)
    assert nxt == 4
    c.train(6, start_epoch=4)
    assert_states_equal(a._states(), c._states())
    np.testing.assert_array_equal(a.loss_history, c.loss_history)


# ---------------------------------------------------------------------------
# iMDBN joint (blocked path)
# ---------------------------------------------------------------------------

def _make_imdbn():
    train, val, _ = _fresh_loaders()
    return iMDBN([SIDE * SIDE, 16], 12, params=dict(PARAMS),
                 dataloader=train, val_loader=val, num_labels=K, seed=0)


def test_imdbn_joint_resume_bit_identical(tmp_path):
    ck = str(tmp_path / "joint.ckpt")

    a = _make_imdbn()
    a.train_joint(epochs=6)

    b = _make_imdbn()
    b.train_joint(epochs=6, checkpoint_every=2, checkpoint_path=ck)
    assert_states_equal(a.joint_rbm.state, b.joint_rbm.state)

    c = _make_imdbn()
    phase, nxt = load_train_checkpoint(c, ck)
    assert (phase, nxt) == ("joint", 4)
    # z_class_mean travels with the checkpoint (init_joint_bias_from_data
    # is skipped on resume)
    np.testing.assert_array_equal(np.asarray(a.z_class_mean),
                                  np.asarray(c.z_class_mean))
    c.train_joint(epochs=6, start_epoch=4)
    assert_states_equal(a.joint_rbm.state, c.joint_rbm.state)


class _PerBatchLoader:
    """Reference-style shuffling loader WITHOUT ``materialize()``: iMDBN
    falls back to batch iteration, so init_joint_bias_from_data consumes
    one shuffle and the counter runs ahead of epochs-trained."""

    def __init__(self, inner):
        self.inner = inner

    def __iter__(self):
        return iter(self.inner)

    def __len__(self):
        return len(self.inner)

    @property
    def batch_size(self):
        return self.inner.batch_size

    @property
    def dataset(self):
        return self.inner.dataset

    @property
    def _epoch(self):
        return self.inner._epoch

    @_epoch.setter
    def _epoch(self, v):
        self.inner._epoch = v


def _make_imdbn_per_batch():
    m = _make_imdbn()
    m.dataloader = _PerBatchLoader(m.dataloader)
    return m


def test_imdbn_joint_nonfused_resume_bit_identical(tmp_path):
    """Non-fused epochs draw batch order from the DataLoader's shuffle
    counter, which runs AHEAD of epochs-trained when the loader can't
    materialize (init_joint_bias_from_data consumes one shuffle) — resume
    must restore the saved counter rather than guess it from start_epoch
    (r3 review finding)."""
    ck = str(tmp_path / "joint_nf.ckpt")

    a = _make_imdbn_per_batch()
    a.train_joint(epochs=6, fused=False)

    b = _make_imdbn_per_batch()
    b.train_joint(epochs=6, fused=False, checkpoint_every=2,
                  checkpoint_path=ck)
    assert_states_equal(a.joint_rbm.state, b.joint_rbm.state)

    c = _make_imdbn_per_batch()
    phase, nxt = load_train_checkpoint(c, ck)
    assert (phase, nxt) == ("joint", 4)
    # the restored counter is AHEAD of epochs-trained — exactly the case
    # where the old `_epoch = start_epoch` guess trained on the previous
    # epoch's permutations
    assert c.dataloader._epoch == nxt + 1
    c.train_joint(epochs=6, start_epoch=4, fused=False)
    assert_states_equal(a.joint_rbm.state, c.joint_rbm.state)


def test_pre_r3_checkpoint_falls_back_to_epoch_guess(tmp_path):
    """Checkpoints written before loader counters were saved must still
    resume: align_loader_for_resume falls back to the one-iteration-per-
    epoch guess when no counter was restored."""
    import numpy as np

    from multimodal_idbn_tpu.checkpoint import align_loader_for_resume

    m = _make_idbn()
    p = str(tmp_path / "old_ck")
    save_train_checkpoint(m, p, phase="image", next_epoch=2)
    # simulate a pre-r3 file: strip the loader_epoch/* extras
    f = p + ".npz"
    data = dict(np.load(f, allow_pickle=False))
    stripped = {k: v for k, v in data.items()
                if not k.startswith("extra/loader_epoch/")}
    np.savez(f, **stripped)

    m2 = _make_idbn()
    phase, nxt = load_train_checkpoint(m2, p)
    assert (phase, nxt) == ("image", 2)
    assert "_restored_loader_epochs" not in m2.__dict__
    align_loader_for_resume(m2, nxt)
    assert m2.dataloader._epoch == 2  # legacy guess applied


def test_loader_counter_survives_late_loader_attach(tmp_path):
    """The restored shuffle counter must apply to a loader attached
    AFTER checkpoint load: scripts/train_bimodal.py loads the mod1/mod2
    checkpoints before _train_mod_dbn builds the modality dataloader
    (r3 advisor finding). load_train_checkpoint stashes the counter
    values on the model; align_loader_for_resume applies them to
    whichever loader train() sees."""
    from multimodal_idbn_tpu.checkpoint import align_loader_for_resume

    m = _make_idbn()
    m.dataloader._epoch = 7  # diverged from epochs-trained (e.g. retry)
    p = str(tmp_path / "late_ck")
    save_train_checkpoint(m, p, phase="image", next_epoch=3)

    m2 = _make_idbn()
    saved_loader = m2.dataloader
    m2.dataloader = None  # the bimodal script's state at load time
    phase, nxt = load_train_checkpoint(m2, p)
    assert (phase, nxt) == ("image", 3)
    assert m2._restored_loader_epochs["dataloader"] == 7
    m2.dataloader = saved_loader  # attached later by the caller
    align_loader_for_resume(m2, nxt)
    assert m2.dataloader._epoch == 7  # restored value, not the guess (3)
    assert "_restored_loader_epochs" not in m2.__dict__


def test_config_fingerprint_mismatch_refuses_resume(tmp_path):
    """Editing training hyperparameters and rerunning with the same
    save_dir must refuse to resume the old checkpoint (r3 advisor
    finding), naming the differing keys; resume_ignore_config
    (ignore_config=True) overrides for deliberate schedule changes."""
    from multimodal_idbn_tpu.checkpoint import (
        config_fingerprint, load_train_checkpoint_expecting)

    m = _make_idbn()
    m._ckpt_fingerprint = config_fingerprint(PARAMS, layers=[16, 8])
    p = str(tmp_path / "fp_ck")
    save_train_checkpoint(m, p, phase="image", next_epoch=2)

    # same config resumes fine
    m2 = _make_idbn()
    m2._ckpt_fingerprint = config_fingerprint(PARAMS, layers=[16, 8])
    assert load_train_checkpoint_expecting(m2, p, "image") == 2

    # edited lr refuses, and the error names the edited key
    m3 = _make_idbn()
    edited = dict(PARAMS, LEARNING_RATE=0.05)
    m3._ckpt_fingerprint = config_fingerprint(edited, layers=[16, 8])
    with pytest.raises(ValueError, match="LEARNING_RATE"):
        load_train_checkpoint_expecting(m3, p, "image")
    # ... unless the user opts out
    assert load_train_checkpoint_expecting(
        m3, p, "image", ignore_config=True) == 2

    # CHECKPOINT_EVERY is cadence, not schedule: excluded from the print
    m4 = _make_idbn()
    m4._ckpt_fingerprint = config_fingerprint(
        dict(PARAMS, CHECKPOINT_EVERY=7), layers=[16, 8])
    assert load_train_checkpoint_expecting(m4, p, "image") == 2

    # pre-fingerprint checkpoints (no stored fp) still resume
    m5 = _make_idbn()
    save_train_checkpoint(m5, str(tmp_path / "nofp_ck"), phase="image",
                          next_epoch=1)
    m6 = _make_idbn()
    m6._ckpt_fingerprint = config_fingerprint(PARAMS, layers=[16, 8])
    assert load_train_checkpoint_expecting(
        m6, str(tmp_path / "nofp_ck"), "image") == 1


def test_save_checkpoint_rejects_non_bf16_extension_dtype(tmp_path):
    """Only bfloat16 gets the uint16 bit-view treatment; any other
    void/extension dtype must raise instead of being silently mislabeled
    as bfloat16 and corrupted on load (r3 advisor finding)."""
    import numpy as np
    import pytest

    m = _make_idbn()
    v = np.zeros(4, dtype=[("a", np.uint8)])  # structured (void-kind)
    with pytest.raises(TypeError, match="unsupported dtype"):
        save_checkpoint(m, str(tmp_path / "bad_ck"), extra={"weird": v})


def test_bf16_pcd_checkpoint_roundtrip(tmp_path):
    """bfloat16 states and PCD chains round-trip through npz: stored as
    uint16 bit-views + a dtype map in the JSON meta (raw npz would return
    them as void '|V2', which jnp.asarray rejects)."""
    import jax.numpy as jnp

    extra = {"DTYPE": "bfloat16", "PCD": True}
    m = _make_idbn(extra)
    m.train(2)
    p = str(tmp_path / "bf16_ck")
    save_train_checkpoint(m, p, phase="image", next_epoch=2)
    m2 = _make_idbn(extra)
    phase, nxt = load_train_checkpoint(m2, p)
    assert (phase, nxt) == ("image", 2)
    for rbm in m2.layers:
        assert rbm.state.w.dtype == jnp.bfloat16
    assert all(c.dtype == jnp.bfloat16 for c in m2._pcd_chains)
    assert_states_equal(m._states(), m2._states())
    assert_states_equal(m._pcd_chains, m2._pcd_chains)


# ---------------------------------------------------------------------------
# iMDBN_BiModal joint (blocked path)
# ---------------------------------------------------------------------------

def _make_bimodal():
    train, val, _ = _fresh_loaders(second_modality="mnist100")
    return iMDBN_BiModal([SIDE * SIDE, 16], [28 * 56, 24], [12, 8],
                         params=dict(PARAMS), dataloader=train,
                         val_loader=val, seed=0)


def test_bimodal_joint_resume_bit_identical(tmp_path):
    ck = str(tmp_path / "bimodal.ckpt")

    a = _make_bimodal()
    a.train_joint(epochs=6)

    b = _make_bimodal()
    b.train_joint(epochs=6, checkpoint_every=2, checkpoint_path=ck)
    assert_states_equal(a._joint_states(), b._joint_states())

    c = _make_bimodal()
    phase, nxt = load_train_checkpoint(c, ck)
    assert (phase, nxt) == ("bimodal_joint", 4)
    c.train_joint(epochs=6, start_epoch=4)
    assert_states_equal(a._joint_states(), c._joint_states())


# ---------------------------------------------------------------------------
# End-to-end: train_multimodal.py crash mid-joint → rerun resumes and
# produces the same model as an uninterrupted run
# ---------------------------------------------------------------------------

_RESUME_CFG = """\
dataset:
  path: null
  batch_size: 16
  multimodal_flag: true
  n_samples: 64
  side: 12

model:
  image_layers: [144, 16]
  joint_hidden: 12
  num_labels: 4

training:
  learning_rate: 0.1
  weight_penalty: 0.0001
  init_momentum: 0.5
  final_momentum: 0.9
  learning_rate_dynamic: true
  cd: 1
  epochs_image: 2
  joint_learning_rate: 0.04
  joint_cd: 1
  epochs_joint: 4
  cross_gibbs_steps: 3
  JOINT_AUX_COND_STEPS: 2
  seed: 0
  checkpoint_every: 1

paths:
  save_dir: "{save_dir}"
  save_name: "imdbn_resume"
  # regression guard: on joint resume the restored image stack is
  # post-finetune; re-running the hook would double-finetune and break
  # byte-equality with the uninterrupted run
  image_idbn_finetune_last_epochs: 1

wandb:
  enable: false

logging:
  log_every: 5
  log_every_pca: 100
  log_every_probe: 100
"""


def _run_cli(cfg_path, prelude="", script="train_multimodal.py"):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');\n"
        + prelude +
        f"import sys; sys.argv = [{script!r}, '--config', "
        f"{str(cfg_path)!r}]\n"
        "import runpy; runpy.run_path("
        f"{str(ROOT / 'scripts' / script)!r}, "
        "run_name='__main__')\n")
    return subprocess.run([sys.executable, "-c", code],
                          capture_output=True, text=True, env=env,
                          cwd=str(ROOT), timeout=900)


_CRASH_PRELUDE = """\
import multimodal_idbn_tpu.checkpoint as _ck
_real_save = _ck.save_train_checkpoint
def _crashing(model, path, phase, next_epoch, loss_history=None):
    _real_save(model, path, phase=phase, next_epoch=next_epoch,
               loss_history=loss_history)
    if phase == 'joint' and int(next_epoch) >= 2:
        raise SystemExit('INJECTED_CRASH')
_ck.save_train_checkpoint = _crashing
"""


def _payload_arrays(obj, prefix=""):
    """Flatten every ndarray in a nested save payload to {path: array}."""
    out = {}
    if isinstance(obj, dict):
        for k, v in obj.items():
            out.update(_payload_arrays(v, f"{prefix}/{k}"))
    elif isinstance(obj, (list, tuple)):
        for i, v in enumerate(obj):
            out.update(_payload_arrays(v, f"{prefix}[{i}]"))
    elif isinstance(obj, np.ndarray):
        out[prefix] = obj
    return out


_BIMODAL_RESUME_CFG = """\
dataset:
  path: null
  batch_size: 16
  multimodal_flag: true
  second_modality: "mnist100"
  n_samples: 64
  side: 12

model:
  mod1_layers: [144, 16]
  mod2_layers: [1568, 24]
  joint_hidden: [12]
  num_labels: 4

training:
  learning_rate: 0.1
  weight_penalty: 0.0001
  init_momentum: 0.5
  final_momentum: 0.9
  learning_rate_dynamic: true
  cd: 1
  epochs_mod1: 2
  epochs_mod2: 2
  joint_learning_rate: 0.04
  joint_cd: 1
  epochs_joint: 4
  cross_gibbs_steps: 3
  JOINT_AUX_COND_STEPS: 2
  seed: 0
  checkpoint_every: 1

paths:
  save_dir: "{save_dir}"
  save_name: "bimodal_resume"

wandb:
  enable: false

logging:
  log_every: 100
  log_every_pca: 100
  log_every_probe: 100
  log_every_trajectory: 100
"""

_BIMODAL_CRASH_PRELUDE = """\
import multimodal_idbn_tpu.checkpoint as _ck
_real_save = _ck.save_train_checkpoint
def _crashing(model, path, phase, next_epoch, loss_history=None):
    _real_save(model, path, phase=phase, next_epoch=next_epoch,
               loss_history=loss_history)
    if phase == 'bimodal_joint' and int(next_epoch) >= 2:
        raise SystemExit('INJECTED_CRASH')
_ck.save_train_checkpoint = _crashing
"""


def test_bimodal_cli_crash_resume_e2e(tmp_path):
    crash_dir = tmp_path / "crash"
    clean_dir = tmp_path / "clean"
    for d in (crash_dir, clean_dir):
        d.mkdir()
    crash_cfg = tmp_path / "crash.yaml"
    crash_cfg.write_text(_BIMODAL_RESUME_CFG.format(save_dir=crash_dir))
    clean_cfg = tmp_path / "clean.yaml"
    clean_cfg.write_text(_BIMODAL_RESUME_CFG.format(save_dir=clean_dir))

    proc = _run_cli(crash_cfg, prelude=_BIMODAL_CRASH_PRELUDE,
                    script="train_bimodal.py")
    assert proc.returncode != 0
    assert "INJECTED_CRASH" in proc.stderr, proc.stderr[-3000:]
    ckpts = crash_dir / "checkpoints"
    # named by phase, so it can't collide with train_multimodal.py's
    # joint.ckpt.npz in a shared checkpoint_dir
    assert (ckpts / "bimodal_joint.ckpt.npz").exists()
    # both modality phases were marked complete before the joint crash
    assert (ckpts / "mod1.ckpt.npz").exists()
    assert (ckpts / "mod2.ckpt.npz").exists()

    proc = _run_cli(crash_cfg, script="train_bimodal.py")
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "resuming joint training at epoch 2/4" in proc.stdout
    # the modality stacks must NOT retrain on resume
    assert "Training MOD1 iDBN" not in proc.stdout
    assert "Saved bimodal model" in proc.stdout
    assert not any(ckpts.iterdir())

    proc = _run_cli(clean_cfg, script="train_bimodal.py")
    assert proc.returncode == 0, proc.stderr[-3000:]

    with open(crash_dir / "bimodal_resume.pkl", "rb") as f:
        resumed = _payload_arrays(pickle.load(f))
    with open(clean_dir / "bimodal_resume.pkl", "rb") as f:
        clean = _payload_arrays(pickle.load(f))
    assert set(resumed) == set(clean) and resumed
    for k in resumed:
        np.testing.assert_array_equal(resumed[k], clean[k], err_msg=k)


def test_cli_crash_resume_e2e(tmp_path):
    crash_dir = tmp_path / "crash"
    clean_dir = tmp_path / "clean"
    for d in (crash_dir, clean_dir):
        d.mkdir()
    crash_cfg = tmp_path / "crash.yaml"
    crash_cfg.write_text(_RESUME_CFG.format(save_dir=crash_dir))
    clean_cfg = tmp_path / "clean.yaml"
    clean_cfg.write_text(_RESUME_CFG.format(save_dir=clean_dir))

    # 1) run with an injected crash right after the joint checkpoint at
    #    epoch 2 is written
    proc = _run_cli(crash_cfg, prelude=_CRASH_PRELUDE)
    assert proc.returncode != 0
    assert "INJECTED_CRASH" in proc.stderr, proc.stderr[-3000:]
    joint_ckpt = crash_dir / "checkpoints" / "joint.ckpt.npz"
    assert joint_ckpt.exists()
    assert not (crash_dir / "imdbn_resume.pkl").exists()

    # 2) rerun the same command: it must resume at joint epoch 2 and
    #    finish, then clean up its crash-recovery checkpoints
    proc = _run_cli(crash_cfg)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "resuming joint training at epoch 2/4" in proc.stdout
    assert "Saved multimodal model" in proc.stdout
    assert not joint_ckpt.exists()
    assert not (crash_dir / "checkpoints" / "image.ckpt.npz").exists()

    # 3) an uninterrupted run must produce the bit-identical model
    proc = _run_cli(clean_cfg)
    assert proc.returncode == 0, proc.stderr[-3000:]

    with open(crash_dir / "imdbn_resume.pkl", "rb") as f:
        resumed = _payload_arrays(pickle.load(f))
    with open(clean_dir / "imdbn_resume.pkl", "rb") as f:
        clean = _payload_arrays(pickle.load(f))
    assert set(resumed) == set(clean) and resumed
    for k in resumed:
        np.testing.assert_array_equal(resumed[k], clean[k], err_msg=k)
