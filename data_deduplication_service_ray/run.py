"""CLI entry point — the ``ray job submit`` surface of the engine.

    python -m data_deduplication_service_ray.run \
        --input  /data/corpus/            \
        --output /out/run1                \
        --checkpoint-dir /out/run1/ckpt   \
        --jaccard-threshold 0.7 [--config-json '{"lsh_bands": 16}']

Runs the full near-duplicate pipeline over an ``input_hint``-shaped
Parquet corpus (repo, path, commit, lang, content) and writes partitioned
Parquet outputs + per-stage checkpoint manifests:

    {output}/clusters/            (file_id, cluster_id)
    {output}/pairs/               verified scored pairs
    {output}/report/              duplicate-cluster sizes
    {output}/run_manifest.json    config + row counts + wall time
    {checkpoint_dir}/{stage}/     resumable per-stage checkpoints

Re-running with the same ``--checkpoint-dir`` resumes after the last
completed stage (the reference's PreserveOld idempotent re-ingest
semantics, include/FileService.h:383-397, applied per stage). On a
cluster, submit with ``ray job submit -- python -m
data_deduplication_service_ray.run ...`` — the script only calls
``ray.init(address=...)`` when Ray is not already initialised.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True,
                    help="Parquet file/dir with (repo,path,commit,lang,"
                         "content) columns")
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--jaccard-threshold", type=float, default=0.7)
    ap.add_argument("--config-json", default=None,
                    help="JSON object of PipelineConfig overrides")
    ap.add_argument("--cluster-method", default="auto",
                    choices=["auto", "unionfind", "label_propagation"])
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"),
                 ignore_reinit_error=True)

    from data_deduplication_service_ray.config import PipelineConfig
    from data_deduplication_service_ray.pipelines.neardup import (
        NearDupPipeline)
    from data_deduplication_service_ray.sources.readers import read_corpus

    overrides = json.loads(args.config_json) if args.config_json else {}
    cfg = PipelineConfig(jaccard_threshold=args.jaccard_threshold,
                         **overrides)

    t0 = time.perf_counter()
    docs = read_corpus(args.input)
    pipe = NearDupPipeline(docs, cfg, checkpoint_dir=args.checkpoint_dir)

    clusters = pipe.clusters(method=args.cluster_method)
    pairs = pipe.verified_pairs()
    report = pipe.cluster_report()

    os.makedirs(args.output, exist_ok=True)
    clusters.write_parquet(os.path.join(args.output, "clusters"))
    pairs.write_parquet(os.path.join(args.output, "pairs"))
    report.write_parquet(os.path.join(args.output, "report"))

    manifest = {
        "input": args.input,
        "config": dataclasses.asdict(cfg),
        "rows": {
            "clusters": clusters.count(),
            "verified_pairs": pairs.count(),
            "dup_clusters": report.count(),
        },
        "wall_sec": round(time.perf_counter() - t0, 3),
        "finished_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    with open(os.path.join(args.output, "run_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    print(json.dumps(manifest["rows"]))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
