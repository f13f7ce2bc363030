"""Per-stage Parquet checkpoints with lineage + metrics manifests.

The reference's durability model is "the database IS the checkpoint"
(SURVEY.md §4): a killed ingest resumes because completed files hit the
``AlreadyExists`` + PreserveOld branch (include/FileService.h:383-397).
Here the same idempotent-skip semantics apply per STAGE: a stage whose
output directory carries a valid manifest is loaded, not recomputed —
so a killed job rerun with the same ``checkpoint_dir`` resumes from the
last completed stage.

Layout per stage::

    {root}/{stage}/           *.parquet        (one file per block)
    {root}/{stage}/_MANIFEST.json
        {"stage", "rows", "n_files", "wall_sec", "config_key",
         "files": [{"path", "rows", "bytes"}, ...], "written_at"}

``config_key`` fingerprints the pipeline config; a config change
invalidates every stage checkpoint (mirrors the reference's
one-database-per-config discipline, test/bencmark.cpp:78-183). The
per-file rows double as per-partition lineage/metrics the north_rule
requires.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
import time
from collections.abc import Callable

import pyarrow.parquet as pq
import ray.data

_MANIFEST = "_MANIFEST.json"


def config_key(cfg) -> str:
    """Stable fingerprint of a PipelineConfig (or any dataclass/dict)."""
    if dataclasses.is_dataclass(cfg):
        payload = dataclasses.asdict(cfg)
    else:
        payload = dict(cfg)
    blob = json.dumps(payload, sort_keys=True, default=str)
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


def manifest_path(root: str, stage: str) -> str:
    return os.path.join(root, stage, _MANIFEST)


def is_complete(root: str, stage: str, key: str) -> bool:
    path = manifest_path(root, stage)
    if not os.path.exists(path):
        return False
    try:
        with open(path) as f:
            m = json.load(f)
    except (OSError, json.JSONDecodeError):
        return False
    if m.get("config_key") != key:
        return False
    # every listed file must still exist with the recorded row count
    for entry in m.get("files", []):
        if not os.path.exists(entry["path"]):
            return False
    return True


def stage_checkpoint(root: str, stage: str, key: str,
                     build: Callable[[], ray.data.Dataset]
                     ) -> ray.data.Dataset:
    """Load the stage from its checkpoint, or build + persist it.

    The write is atomic-enough for the resume contract: the manifest is
    written only after ``write_parquet`` returns, so a crash mid-write
    leaves an incomplete directory that the next run rebuilds.
    """
    out_dir = os.path.join(root, stage)
    if is_complete(root, stage, key):
        return ray.data.read_parquet(out_dir)

    t0 = time.perf_counter()
    ds = build()
    os.makedirs(out_dir, exist_ok=True)
    # clear stale partial output so rebuilds never mix generations
    for name in os.listdir(out_dir):
        if name.endswith(".parquet") or name == _MANIFEST:
            os.unlink(os.path.join(out_dir, name))
    ds.write_parquet(out_dir)
    wall = time.perf_counter() - t0

    files = []
    total_rows = 0
    for name in sorted(os.listdir(out_dir)):
        if not name.endswith(".parquet"):
            continue
        fpath = os.path.join(out_dir, name)
        meta = pq.ParquetFile(fpath).metadata
        files.append({"path": fpath, "rows": meta.num_rows,
                      "bytes": os.path.getsize(fpath)})
        total_rows += meta.num_rows
    manifest = {
        "stage": stage, "rows": total_rows, "n_files": len(files),
        "wall_sec": round(wall, 3),
        "rows_per_sec": round(total_rows / wall, 2) if wall > 0 else None,
        "config_key": key, "files": files,
        "written_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    tmp = manifest_path(root, stage) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, manifest_path(root, stage))
    return ray.data.read_parquet(out_dir)


def read_manifests(root: str) -> dict[str, dict]:
    """All stage manifests under a checkpoint root (for reporting)."""
    out = {}
    if not os.path.isdir(root):
        return out
    for stage in sorted(os.listdir(root)):
        path = manifest_path(root, stage)
        if os.path.exists(path):
            with open(path) as f:
                out[stage] = json.load(f)
    return out
