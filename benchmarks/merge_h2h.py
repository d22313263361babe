"""Merge two reference_head_to_head result JSONs (e.g. a seeds-0-2 run
and a seeds-3-4 extension) into one combined summary table, with
ref-vs-ours significance tests per metric (VERDICT r3 weak #2: parity
claims must be statistical, not eyeballed ranges).

Usage: python benchmarks/merge_h2h.py A.json B.json [--out merged.json]
Prints the combined JSON on stdout; a markdown table on stderr.

A file argument may carry a role suffix — ``A.json:ref`` takes only the
reference side of that file (``:ours`` likewise). This lets a final
comparison draw its ref side from one set of runs and its ours side from
a fresh rerun whose seed numbers overlap files that also carry stale
ours entries (e.g. re-running all ours seeds at a different matmul
precision while keeping the accumulated reference seeds).

Per metric with samples on both sides, the summary carries:
- Mann-Whitney U two-sided p-value (scipy.stats.mannwhitneyu, exact
  method at these sample sizes) — p > 0.05 means the seed distributions
  are statistically indistinguishable at that n;
- a 95% bootstrap CI of median(ours) - median(ref) (10k resamples,
  fixed seed 0) — a CI containing 0 supports parity, and its width is
  the honest resolution of the comparison.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def summarize(vals):
    v = np.asarray(vals, np.float64)
    return f"{np.median(v):.3f} [{v.min():.3f}-{v.max():.3f}]"


def compare(ref_vals, ours_vals, n_boot=10_000, seed=0):
    """Mann-Whitney U p-value + bootstrap 95% CI of the median
    difference (ours - ref). Deterministic (fixed bootstrap seed)."""
    from scipy.stats import mannwhitneyu

    a = np.asarray(ref_vals, np.float64)
    b = np.asarray(ours_vals, np.float64)
    try:
        p = float(mannwhitneyu(a, b, alternative="two-sided").pvalue)
    except ValueError:  # all values identical on both sides
        p = 1.0
    rng = np.random.default_rng(seed)
    diffs = (np.median(b[rng.integers(0, len(b), (n_boot, len(b)))],
                       axis=1)
             - np.median(a[rng.integers(0, len(a), (n_boot, len(a)))],
                         axis=1))
    lo, hi = np.percentile(diffs, [2.5, 97.5])
    return {"mwu_p": round(p, 4),
            "median_diff": round(float(np.median(b) - np.median(a)), 4),
            "diff_ci95": [round(float(lo), 4), round(float(hi), 4)],
            "n_ref": len(a), "n_ours": len(b)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("files", nargs="+")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    merged = {"ref": {}, "ours": {}, "seeds": {}, "schedule": None}
    for spec in args.files:
        path, _, role_filter = spec.rpartition(":")
        if role_filter in ("ref", "ours") and path:
            roles = (role_filter,)
        else:
            path, roles = spec, ("ref", "ours")
        d = json.load(open(path))
        if merged["schedule"] is None:
            merged["schedule"] = d.get("schedule")
        for role in roles:
            # dict.update would silently overwrite an overlapping seed
            # while the seeds list double-counts it — refuse instead.
            # A null entry is a FAILED run, not a result: a later file
            # carrying the retried seed may fill it in (and a later
            # null must not clobber an earlier result).
            incoming = d.get(role, {})
            dup = {s for s in set(merged[role]) & set(incoming)
                   if merged[role][s] is not None
                   and incoming[s] is not None}
            if dup:
                sys.exit(f"error: {path} repeats {role} seed(s) "
                         f"{sorted(dup)} already merged from an earlier "
                         f"file — merge inputs must have disjoint seeds "
                         f"(or use path:ref / path:ours to pick a side)")
            for s, r in incoming.items():
                if r is not None or s not in merged[role]:
                    merged[role][s] = r
    # Only seeds with a RESULT: null entries (failed runs) would make
    # the seeds summary overstate usable sample counts vs stats
    # n_ref/n_ours (r4 advisor finding).
    merged["seeds"] = {role: sorted((s for s, r in merged[role].items()
                                     if r is not None),
                                    key=lambda s: int(s))
                       for role in ("ref", "ours")}

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
    stats = {}
    print("\n| metric | reference (torch) | rebuild (jax) | "
          "MWU p | Δmedian [95% CI] |", file=sys.stderr)
    print("|---|---|---|---|---|", file=sys.stderr)
    for m in order:
        row = []
        sides = {}
        for role in ("ref", "ours"):
            vals = [r[m] for r in merged[role].values() if r and m in r]
            sides[role] = vals
            cell = summarize(vals) if vals else "-"
            table[f"{role}_{m}"] = cell
            row.append(cell)
        if sides["ref"] and sides["ours"]:
            st = compare(sides["ref"], sides["ours"])
            stats[m] = st
            extra = (f" {st['mwu_p']:.3f} | {st['median_diff']:+.3f} "
                     f"[{st['diff_ci95'][0]:+.3f}, "
                     f"{st['diff_ci95'][1]:+.3f}] |")
        else:
            extra = " - | - |"
        print(f"| {m} | {row[0]} | {row[1]} |{extra}", file=sys.stderr)
    merged["summary"] = table
    merged["stats"] = stats
    out = json.dumps(merged)
    if args.out:
        open(args.out, "w").write(out)
    print(out)


if __name__ == "__main__":
    main()
