#!/usr/bin/env python
"""Config-sweep benchmark: Hash x SegmentSize over the driver testdata.

The reference's benchmark is a cartesian sweep of 6 hash functions x 10
segment sizes with a fresh database per config and a round-trip
correctness gate per run (test/bencmark.cpp:52-194 driving
cartesianProductArr, test/testUtils.h:47-99; published as Hash x
SegmentSize timing tables, doc/benchmarks.md:11-19). This is the Ray
rebuild's equivalent: per config, segment -> refcounted store ->
reconstruct, assert byte-exact round trip, record wall seconds.

Usage:
    python scripts/sweep.py [sf_dir] [out_md]
Defaults: /root/testdata/sf0.01 -> SWEEP.md (committed artifact).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZES = [2, 4, 8, 16, 64, 256, 512, 1024, 2048, 4096]
HASHES = ["sha224", "sha256", "md5", "sha384", "sha512", "blake2b16"]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_md = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SWEEP.md")

    import logging

    import ray
    from ray.data import DataContext

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from data_deduplication_service_ray.config import PipelineConfig
    from data_deduplication_service_ray.pipelines.dedup_core import DedupCore
    from data_deduplication_service_ray.sources.readers import read_documents

    originals = {r["file_id"]: r["content"]
                 for r in read_documents(
                     sf_dir, columns=["doc_id", "text"]).take_all()
                 if r["content"]}

    wall: dict[tuple[str, int], float] = {}
    store_rows: dict[tuple[str, int], int] = {}
    errors = 0
    for h in HASHES:
        for s in SIZES:
            cfg = PipelineConfig(segment_size=s, segment_hash=h)
            core = DedupCore(read_documents(sf_dir,
                                            columns=["doc_id", "text"]),
                             cfg)
            t0 = time.perf_counter()
            store_rows[(h, s)] = core.store().count()
            rt = {r["file_id"]: r["content"]
                  for r in core.reconstructed().take_all()}
            wall[(h, s)] = round(time.perf_counter() - t0, 2)
            bad = sum(1 for k, v in originals.items() if rt.get(k) != v)
            bad += sum(1 for k in rt if k not in originals)
            if bad:
                errors += bad
                print(f"ROUNDTRIP MISMATCH {h} size={s}: {bad} files",
                      file=sys.stderr)
            print(f"{h:10s} size={s:5d}: {wall[(h, s)]:6.2f}s "
                  f"store={store_rows[(h, s)]}")

    lines = [
        "# Config sweep — Hash × SegmentSize "
        "(reference: test/bencmark.cpp:52-194)",
        "",
        f"Input: `{sf_dir}` documents table, {len(originals)} non-empty "
        "files. Per config: segment → refcounted store → reconstruct; "
        "**round-trip byte-exact for every config** "
        f"(total mismatches: {errors}).",
        "",
        "## Wall seconds (store + reconstruct round trip)",
        "",
        "| hash \\ size | " + " | ".join(str(s) for s in SIZES) + " |",
        "|---|" + "---|" * len(SIZES),
    ]
    for h in HASHES:
        lines.append(
            f"| {h} | "
            + " | ".join(f"{wall[(h, s)]:.2f}" for s in SIZES) + " |")
    lines += [
        "",
        "## Distinct stored segments (store rows)",
        "",
        "| hash \\ size | " + " | ".join(str(s) for s in SIZES) + " |",
        "|---|" + "---|" * len(SIZES),
    ]
    for h in HASHES:
        lines.append(
            f"| {h} | "
            + " | ".join(str(store_rows[(h, s)]) for s in SIZES) + " |")
    lines.append("")
    with open(out_md, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out_md}; roundtrip errors: {errors}")
    ray.shutdown()
    return 1 if errors else 0


if __name__ == "__main__":
    sys.exit(main())
