"""CLI smoke test: the full train_multimodal.py flow on the smoke config
(train image iDBN → joint training → dual-format pickle save)."""

import os
import pickle
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def test_train_multimodal_smoke(tmp_path):
    cfg = (ROOT / "configs" / "smoke_multimodal.yaml").read_text()
    cfg = cfg.replace("/tmp/imdbn_smoke", str(tmp_path))
    cfg_path = tmp_path / "smoke.yaml"
    cfg_path.write_text(cfg)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # conftest-equivalent platform forcing for the subprocess
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=1")
    proc = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu');"
         "import sys; sys.argv = ['train_multimodal.py', '--config', "
         f"{str(cfg_path)!r}];"
         "import runpy; runpy.run_path("
         f"{str(ROOT / 'scripts' / 'train_multimodal.py')!r}, "
         "run_name='__main__')"],
        capture_output=True, text=True, env=env, cwd=str(ROOT),
        timeout=900)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "Saved multimodal model" in proc.stdout

    save = tmp_path / "imdbn_smoke.pkl"
    assert save.exists()
    with open(save, "rb") as f:
        payload = pickle.load(f)
    assert "layers" in payload and "image_idbn" in payload
    assert payload["metadata"]["model_type"] == "iMDBN"


def test_train_multimodal_zipfian_init_retry_smoke(tmp_path):
    """End-to-end CLI run through the zipfian loader branch
    (scripts/train_multimodal.py dataset.distribution == "zipfian",
    BASELINE.md benchmark config #5) with the init_retry rescue knob
    enabled (training: init_retry -> iDBN.train_with_retry)."""
    cfg = (ROOT / "configs" / "smoke_multimodal.yaml").read_text()
    cfg = cfg.replace("/tmp/imdbn_smoke", str(tmp_path))
    cfg = cfg.replace("dataset:", "dataset:\n  distribution: zipfian")
    cfg = cfg.replace("  seed: 0", "  seed: 0\n  init_retry: 1")
    cfg_path = tmp_path / "smoke_zipf.yaml"
    cfg_path.write_text(cfg)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu');"
         "import sys; sys.argv = ['train_multimodal.py', '--config', "
         f"{str(cfg_path)!r}];"
         "import runpy; runpy.run_path("
         f"{str(ROOT / 'scripts' / 'train_multimodal.py')!r}, "
         "run_name='__main__')"],
        capture_output=True, text=True, env=env, cwd=str(ROOT),
        timeout=900)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "Saved multimodal model" in proc.stdout
    # the zipfian branch must actually have been selected
    assert "zipfian class distribution" in proc.stdout

    save = tmp_path / "imdbn_smoke.pkl"
    assert save.exists()
    with open(save, "rb") as f:
        payload = pickle.load(f)
    assert "layers" in payload and "image_idbn" in payload
    assert payload["metadata"]["model_type"] == "iMDBN"


def test_train_bimodal_smoke(tmp_path):
    cfg = (ROOT / "configs" / "smoke_bimodal.yaml").read_text()
    cfg = cfg.replace("/tmp/bimodal_smoke", str(tmp_path))
    cfg_path = tmp_path / "smoke_bimodal.yaml"
    cfg_path.write_text(cfg)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu');"
         "import sys; sys.argv = ['train_bimodal.py', '--config', "
         f"{str(cfg_path)!r}];"
         "import runpy; runpy.run_path("
         f"{str(ROOT / 'scripts' / 'train_bimodal.py')!r}, "
         "run_name='__main__')"],
        capture_output=True, text=True, env=env, cwd=str(ROOT),
        timeout=900)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "Saved bimodal model" in proc.stdout

    save = tmp_path / "bimodal_smoke.pkl"
    assert save.exists()
    with open(save, "rb") as f:
        payload = pickle.load(f)
    assert payload["metadata"]["model_type"] == "iMDBN_BiModal"
    assert len(payload["joint_layers"]) == 1


def test_multichip_example_smoke():
    """examples/multichip_training.py runs end-to-end on the virtual
    mesh (DP + 2-D TP ops epochs + the shell-level DP_DEVICES path;
    losses must print and be finite)."""
    import re
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    proc = subprocess.run(
        [sys.executable, str(repo / "examples" / "multichip_training.py"),
         "--virtual", "--epochs", "2"],
        capture_output=True, text=True, timeout=600, cwd=repo)
    assert proc.returncode == 0, proc.stderr[-2000:]
    losses = re.findall(r"final loss ([0-9.]+)", proc.stdout)
    assert len(losses) == 3 and all(float(x) < 1.0 for x in losses), \
        proc.stdout
