"""Optional-W&B shim.

The reference guards every W&B use with ``try: import wandb``
(e.g. conditional_steps.py:9-12) and silently no-ops without it. Here the
diagnostics still run without the wandb package: a lightweight stub
provides ``Image`` / ``Table`` / ``plot.confusion_matrix`` wrappers so any
run object with a ``.log(dict)`` method (W&B run, test recorder, custom
sink) receives the same keys and payload structure.
"""

from __future__ import annotations

try:
    import wandb  # type: ignore

    HAS_WANDB = True
except Exception:  # pragma: no cover - exercised when wandb is absent
    HAS_WANDB = False

    class _Image:
        """Holds the image/figure payload in place of wandb.Image."""

        def __init__(self, obj, caption=None):
            self.obj = obj
            self.caption = caption

        def __repr__(self):
            return f"Image(caption={self.caption!r})"

    class _Table:
        def __init__(self, columns=None, dataframe=None, data=None):
            self.columns = list(columns) if columns is not None else None
            self.dataframe = dataframe
            self.data = list(data) if data is not None else []

        def add_data(self, *row):
            self.data.append(list(row))

    class _Plot:
        @staticmethod
        def confusion_matrix(y_true=None, preds=None, class_names=None,
                             **kw):
            return {"y_true": list(y_true), "preds": list(preds),
                    "class_names": list(class_names or [])}

    class _WandbStub:
        Image = _Image
        Table = _Table
        plot = _Plot()
        run = None

        @staticmethod
        def log(*a, **kw):  # global wandb.log needs a real run; no-op
            pass

        @staticmethod
        def init(*a, **kw):
            return None

    wandb = _WandbStub()  # type: ignore
