"""utils/wandb_compat: the optional-W&B shim's surface (the diagnostics
modules exercise it indirectly everywhere — this pins the stub contract
directly so a regression fails here, not deep inside a probe test).

Reference guard pattern: conditional_steps.py:9-12 (try-import, silent
no-op without wandb)."""

import numpy as np

from multimodal_idbn_tpu.utils import wandb_compat


def test_stub_active_without_wandb():
    # wandb is not installed in this image; the shim must provide the
    # stub (if wandb ever appears, the real module is used instead and
    # the rest of this file still holds for the shared surface).
    w = wandb_compat.wandb
    assert hasattr(w, "Image") and hasattr(w, "Table")
    assert hasattr(w.plot, "confusion_matrix")


def test_image_holds_payload():
    img = wandb_compat.wandb.Image(np.zeros((2, 2)), caption="cap")
    if not wandb_compat.HAS_WANDB:
        assert img.caption == "cap"
        assert "cap" in repr(img)


def test_table_add_data():
    t = wandb_compat.wandb.Table(columns=["a", "b"])
    t.add_data(1, 2)
    t.add_data(3, 4)
    if not wandb_compat.HAS_WANDB:
        assert t.columns == ["a", "b"]
        assert t.data == [[1, 2], [3, 4]]


def test_confusion_matrix_payload():
    out = wandb_compat.wandb.plot.confusion_matrix(
        y_true=[0, 1], preds=[1, 1], class_names=["x", "y"])
    assert out is not None


def test_module_level_log_and_init_are_safe():
    if not wandb_compat.HAS_WANDB:
        wandb_compat.wandb.log({"k": 1})  # must not raise
        assert wandb_compat.wandb.init() is None
