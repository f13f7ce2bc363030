#!/usr/bin/env python
"""Quiet-window scaling campaign driver.

The sandbox host carries co-tenant load that swings identical runs
2-7x on minute timescales (BASELINE.md round 2-4 disclosure tables),
so the N->4N efficiency is estimated from a CAMPAIGN of alternating
low/high-CPU legs fired only when /proc/loadavg says the box is quiet,
every sample appended to a JSONL log that scripts/scaling_report.py
pools into the three estimators BASELINE.md reports.

Each iteration is one `bench.py --scaling` run with REPS=1 (one 4-CPU
leg + one 16-CPU leg in fresh processes + the in-run pure-CPU ceiling
probe). Interleaved 32-CPU single runs (--with-32) sample the headline
throughput number in the same windows.

Usage:
  python scripts/scaling_campaign.py [--iters N] [--rows R]
         [--cpus 4,16] [--log PATH] [--load-max L] [--with-32]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def loadavg() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def wait_quiet(load_max: float, timeout_s: float = 900.0) -> float:
    """Block until the 1-min loadavg drops below load_max (or timeout —
    then run anyway; the report's best-of estimators discard loaded
    samples, so a loaded iteration costs time, not correctness)."""
    t0 = time.time()
    while True:
        la = loadavg()
        if la <= load_max or time.time() - t0 > timeout_s:
            return la
        time.sleep(30)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--rows", type=int, default=1280000)
    ap.add_argument("--cpus", default="4,16")
    ap.add_argument("--log", default="/tmp/bench_campaign.jsonl")
    ap.add_argument("--load-max", type=float, default=3.0)
    ap.add_argument("--with-32", action="store_true",
                    help="interleave a 32-CPU single headline run")
    args = ap.parse_args()

    env = {**os.environ,
           "GRAFT_SCALING_ROWS": str(args.rows),
           "GRAFT_SCALING_CPUS": args.cpus,
           "GRAFT_SCALING_REPS": "1"}
    # resolve the corpus once up front (generation is ~16 min cold)
    sys.path.insert(0, REPO)
    from data_deduplication_service_ray.sources.corpus import corpus_path
    scale_input = f"{corpus_path(args.rows)}/corpus.parquet"

    with open(args.log, "a") as log:
        for it in range(args.iters):
            la = wait_quiet(args.load_max)
            print(f"[campaign] iter {it} loadavg={la}", file=sys.stderr)
            out = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py"),
                 "--scaling"], capture_output=True, text=True, env=env)
            line = (out.stdout.strip().splitlines() or [""])[-1]
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                print(f"[campaign] iter {it} FAILED: "
                      f"{out.stderr[-500:]}", file=sys.stderr)
                continue
            rec["loadavg_at_start"] = la
            log.write(json.dumps(rec) + "\n")
            log.flush()
            print(f"[campaign] iter {it} eff={rec.get('value')} "
                  f"ceiling={rec.get('hw_ceiling_efficiency')}",
                  file=sys.stderr)
            if args.with_32:
                la = wait_quiet(args.load_max)
                out = subprocess.run(
                    [sys.executable, os.path.join(REPO, "bench.py"),
                     "--headline-subprocess", "32"],
                    capture_output=True, text=True,
                    env={**env, "GRAFT_SCALING_INPUT": scale_input})
                line = (out.stdout.strip().splitlines() or [""])[-1]
                try:
                    rec = json.loads(line)
                    rec["loadavg_at_start"] = la
                    log.write(json.dumps(rec) + "\n")
                    log.flush()
                    print(f"[campaign] iter {it} 32cpu sec="
                          f"{rec.get('sec')}", file=sys.stderr)
                except json.JSONDecodeError:
                    print(f"[campaign] iter {it} 32cpu FAILED",
                          file=sys.stderr)


if __name__ == "__main__":
    main()
