"""Merge two reference_head_to_head result JSONs (e.g. a seeds-0-2 run
and a seeds-3-4 extension) into one combined summary table.

Usage: python benchmarks/merge_h2h.py A.json B.json [--out merged.json]
Prints the combined JSON on stdout; a markdown table on stderr.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def summarize(vals):
    v = np.asarray(vals, np.float64)
    return f"{np.median(v):.3f} [{v.min():.3f}-{v.max():.3f}]"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("files", nargs="+")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    merged = {"ref": {}, "ours": {}, "seeds": [], "schedule": None}
    for path in args.files:
        d = json.load(open(path))
        if merged["schedule"] is None:
            merged["schedule"] = d.get("schedule")
        merged["seeds"] += list(d.get("seeds", []))
        for role in ("ref", "ours"):
            # dict.update would silently overwrite an overlapping seed
            # while the seeds list double-counts it — refuse instead
            dup = set(merged[role]) & set(d.get(role, {}))
            if dup:
                sys.exit(f"error: {path} repeats {role} seed(s) "
                         f"{sorted(dup)} already merged from an earlier "
                         f"file — merge inputs must have disjoint seeds")
            merged[role].update(d.get(role, {}))

    metrics = sorted({k for role in ("ref", "ours")
                      for r in merged[role].values() if r
                      for k in r if k != "train_s"})
    order = [m for m in ("top1", "top3", "ce", "image_mse", "recon_mse",
                         "train_top1", "train_top3", "train_ce",
                         "train_image_mse", "train_recon_mse",
                         "probe_top_labels", "probe_top_area",
                         "probe_joint_labels", "probe_joint_area")
             if m in metrics]
    table = {}
    print("\n| metric | reference (torch) | rebuild (jax) |",
          file=sys.stderr)
    print("|---|---|---|", file=sys.stderr)
    for m in order:
        row = []
        for role in ("ref", "ours"):
            vals = [r[m] for r in merged[role].values() if r and m in r]
            cell = summarize(vals) if vals else "-"
            table[f"{role}_{m}"] = cell
            row.append(cell)
        print(f"| {m} | {row[0]} | {row[1]} |", file=sys.stderr)
    merged["summary"] = table
    out = json.dumps(merged)
    if args.out:
        open(args.out, "w").write(out)
    print(out)


if __name__ == "__main__":
    main()
