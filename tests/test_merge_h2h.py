"""Pin the head-to-head statistics (benchmarks/merge_h2h.py): the
round-4 parity claims cite these numbers (VERDICT r3 weak #2), so the
MWU + bootstrap implementation is tested like product code."""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "benchmarks"))

from merge_h2h import compare  # noqa: E402


def test_identical_distributions_not_significant():
    vals = [0.5, 0.6, 0.7, 0.8, 0.55, 0.65]
    st = compare(vals, list(vals))
    assert st["mwu_p"] > 0.9
    assert st["median_diff"] == 0.0
    assert st["diff_ci95"][0] <= 0.0 <= st["diff_ci95"][1]


def test_clearly_shifted_distributions_are_significant():
    rng = np.random.default_rng(0)
    a = rng.normal(0.5, 0.02, 10)
    b = rng.normal(0.8, 0.02, 10)
    st = compare(a, b)
    assert st["mwu_p"] < 0.001
    assert st["median_diff"] > 0.25
    assert st["diff_ci95"][0] > 0.2  # CI excludes 0


def test_compare_is_deterministic():
    a = [0.1, 0.3, 0.5, 0.7]
    b = [0.2, 0.4, 0.6, 0.9]
    assert compare(a, b) == compare(a, b)


def test_merge_cli_merges_and_reports(tmp_path):
    d1 = {"schedule": {"x": 1}, "seeds": [0, 1],
          "ref": {"0": {"top1": 0.5}, "1": {"top1": 0.6}},
          "ours": {"0": {"top1": 0.55}, "1": None}}  # failed seed -> null
    d2 = {"schedule": {"x": 1}, "seeds": [2],
          "ref": {"2": {"top1": 0.7}}, "ours": {"2": {"top1": 0.65}}}
    f1, f2 = tmp_path / "a.json", tmp_path / "b.json"
    f1.write_text(json.dumps(d1)); f2.write_text(json.dumps(d2))
    out = subprocess.run(
        [sys.executable, str(REPO / "benchmarks" / "merge_h2h.py"),
         str(f1), str(f2)], capture_output=True, text=True)
    assert out.returncode == 0, out.stderr
    merged = json.loads(out.stdout)
    assert merged["stats"]["top1"]["n_ref"] == 3
    assert merged["stats"]["top1"]["n_ours"] == 2  # null dropped
    # overlapping seeds must refuse
    out2 = subprocess.run(
        [sys.executable, str(REPO / "benchmarks" / "merge_h2h.py"),
         str(f1), str(f1)], capture_output=True, text=True)
    assert out2.returncode != 0


def test_merge_cli_null_seed_can_be_retried(tmp_path):
    """A null entry is a FAILED run, not a result: a later file with the
    retried seed fills it in (and a later null never clobbers an earlier
    result) — only two non-null results for the same seed refuse."""
    run1 = {"schedule": {"x": 1}, "seeds": [0, 1],
            "ref": {"0": {"top1": 0.5}},
            "ours": {"0": {"top1": 0.55}, "1": None}}  # seed 1 died
    retry = {"schedule": {"x": 1}, "seeds": [1],
             "ref": {}, "ours": {"1": {"top1": 0.6}, "0": None}}
    f1, f2 = tmp_path / "run1.json", tmp_path / "retry.json"
    f1.write_text(json.dumps(run1)); f2.write_text(json.dumps(retry))
    out = subprocess.run(
        [sys.executable, str(REPO / "benchmarks" / "merge_h2h.py"),
         str(f1), str(f2)], capture_output=True, text=True)
    assert out.returncode == 0, out.stderr
    merged = json.loads(out.stdout)
    assert merged["ours"]["1"]["top1"] == 0.6  # retry filled the null
    assert merged["ours"]["0"]["top1"] == 0.55  # null didn't clobber
    assert merged["seeds"]["ours"] == ["0", "1"]
    # two non-null results for the same seed still refuse
    conflict = {"schedule": {"x": 1}, "seeds": [0],
                "ref": {}, "ours": {"0": {"top1": 0.9}}}
    f3 = tmp_path / "conflict.json"
    f3.write_text(json.dumps(conflict))
    out2 = subprocess.run(
        [sys.executable, str(REPO / "benchmarks" / "merge_h2h.py"),
         str(f1), str(f3)], capture_output=True, text=True)
    assert out2.returncode != 0
    assert "seed(s) ['0']" in out2.stderr


def test_merge_cli_role_filter(tmp_path):
    """path:ref / path:ours take one side of a file, so a fresh ours
    rerun with overlapping seed numbers can replace stale entries."""
    old = {"schedule": {"x": 1}, "seeds": [0, 1],
           "ref": {"0": {"top1": 0.5}, "1": {"top1": 0.6}},
           "ours": {"0": {"top1": 0.1}, "1": {"top1": 0.2}}}  # stale
    new = {"schedule": {"x": 1}, "seeds": [0, 1],
           "ref": {}, "ours": {"0": {"top1": 0.55}, "1": {"top1": 0.62}}}
    f1, f2 = tmp_path / "old.json", tmp_path / "new.json"
    f1.write_text(json.dumps(old)); f2.write_text(json.dumps(new))
    out = subprocess.run(
        [sys.executable, str(REPO / "benchmarks" / "merge_h2h.py"),
         f"{f1}:ref", f"{f2}:ours"], capture_output=True, text=True)
    assert out.returncode == 0, out.stderr
    merged = json.loads(out.stdout)
    assert merged["ours"]["0"]["top1"] == 0.55  # from new, not stale
    assert merged["ref"]["0"]["top1"] == 0.5
    assert merged["seeds"] == {"ref": ["0", "1"], "ours": ["0", "1"]}
    # without the filter the same pair must refuse (overlapping ours)
    out2 = subprocess.run(
        [sys.executable, str(REPO / "benchmarks" / "merge_h2h.py"),
         str(f1), str(f2)], capture_output=True, text=True)
    assert out2.returncode != 0
