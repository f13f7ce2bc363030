#!/usr/bin/env python
"""Aggregate a quiet-window benchmark campaign log into the scaling
estimators BASELINE.md reports.

The sandbox host carries co-tenant load that swings identical runs
2-7x on minute timescales (round 3/4 disclosure tables), so a single
(T_N, T_4N) pair is meaningless: the campaign (see BASELINE.md round 4)
polls /proc/loadavg and fires alternating 4->16-CPU legs plus 32-CPU
samples whenever the box goes quiet, appending every bench.py JSON line
to a log. This script pools ALL samples and prints the three estimators
round 3 established, most to least conservative:

  pooled whole-run best-of   (min T_lo / min T_hi) / 4
  stage-wise best-of         each stage's quietest observation per
                             config; stages run sequentially, so
                             per-stage windows are independent
  best single iteration      the max in-iteration efficiency

Usage: python scripts/scaling_report.py [campaign.jsonl ...]
"""

from __future__ import annotations

import json
import sys


def load(paths: list[str]) -> list[dict]:
    recs = []
    for p in paths:
        with open(p) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    recs.append(json.loads(line))
                except json.JSONDecodeError:
                    pass
    return recs


def main() -> None:
    paths = sys.argv[1:] or ["/tmp/bench_campaign.jsonl"]
    recs = load(paths)
    iters = [r for r in recs if r.get("unit") == "efficiency"]
    singles = [r for r in recs if "stages" in r and "num_cpus" in r
               and r.get("unit") != "efficiency"]
    if not iters:
        print(json.dumps({"error": "no scaling iterations in log"}))
        return
    lo, hi = iters[0]["cpus"]

    # pool per-config whole-run and per-stage samples across iterations
    lo_secs, hi_secs = [], []
    lo_stages: dict[str, list[float]] = {}
    hi_stages: dict[str, list[float]] = {}
    best_iter = max(iters, key=lambda r: r["value"])
    for r in iters:
        lo_secs.extend(r.get("samples_sec_8cpu", [r["sec_8cpu"]]))
        hi_secs.extend(r.get("samples_sec_32cpu", [r["sec_32cpu"]]))
        for k, v in (r.get("stages_8cpu") or {}).items():
            lo_stages.setdefault(k, []).append(v)
        for k, v in (r.get("stages_32cpu") or {}).items():
            hi_stages.setdefault(k, []).append(v)

    # sum over the INTERSECTION of stage keys (same rule as the
    # stage_table below): a stage logged on only one side (partial leg,
    # mixed-format logs) must not bias the ratio silently — and the
    # exclusion itself must not be silent either: dropped keys are
    # surfaced as ``stages_excluded`` so a mixed-format campaign shows
    # its reduced stage coverage in the report.
    common = [k for k in lo_stages if k in hi_stages]
    excluded = sorted(set(lo_stages) ^ set(hi_stages))
    t_lo_star = sum(min(lo_stages[k]) for k in common)
    t_hi_star = sum(min(hi_stages[k]) for k in common)
    ratio = hi / lo
    out = {
        "iterations": len(iters),
        "cpus": [lo, hi],
        "n_files": best_iter.get("n_files"),
        "pooled_whole_run_best_of": round(
            (min(lo_secs) / min(hi_secs)) / ratio, 3),
        "stage_wise_best_of": round((t_lo_star / t_hi_star) / ratio, 3),
        "stages_excluded": excluded,
        "best_single_iteration": round(best_iter["value"], 3),
        "best_iteration_ceiling": best_iter.get("hw_ceiling_efficiency"),
        "t_lo_star_sec": round(t_lo_star, 3),
        "t_hi_star_sec": round(t_hi_star, 3),
        "samples_sec_lo": sorted(round(s, 1) for s in lo_secs),
        "samples_sec_hi": sorted(round(s, 1) for s in hi_secs),
        "stage_table": {
            k: {"lo_best": round(min(lo_stages[k]), 3),
                "hi_best": round(min(hi_stages[k]), 3),
                "efficiency": round(
                    (min(lo_stages[k]) / max(min(hi_stages[k]), 1e-9))
                    / ratio, 3),
                "lo_samples": sorted(round(s, 1) for s in lo_stages[k]),
                "hi_samples": sorted(round(s, 1) for s in hi_stages[k])}
            for k in lo_stages if k in hi_stages},
        "ceilings": [r.get("hw_ceiling_efficiency") for r in iters],
        "iteration_efficiencies": [round(r["value"], 3) for r in iters],
    }
    if singles:
        best32 = min(singles, key=lambda r: r["sec"])
        out["best_32cpu_sample"] = {
            "sec": best32["sec"], "files_per_sec": best32["files_per_sec"],
            "stages": best32["stages"],
            "all_samples_sec": sorted(round(r["sec"], 1) for r in singles)}
        stage32: dict[str, list[float]] = {}
        for r in singles:
            for k, v in r["stages"].items():
                stage32.setdefault(k, []).append(v)
        out["stage_wise_best_32cpu_sec"] = round(
            sum(min(v) for v in stage32.values()), 3)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
