"""Resumable Parquet sinks (reference export path S4/S5, scaled).

Output layout per SURVEY.md §4: a directory of block files (+ optional
hive partitioning by a key column), sealed by a ``_MANIFEST.json`` with
per-file row counts — never one giant file. A sealed directory is
skipped on re-run (``mode="skip_existing"``, the reference's
PreserveOld, include/fileUtils.h:35-40) or replaced atomically-enough
(``mode="overwrite"`` = ReplaceWithNew: clear, rewrite, re-seal).
"""

from __future__ import annotations

import json
import os
import shutil
import time

import pyarrow.parquet as pq
import ray.data

_MANIFEST = "_MANIFEST.json"


def is_sealed(out_dir: str) -> bool:
    return os.path.exists(os.path.join(out_dir, _MANIFEST))


def write_dataset(ds: ray.data.Dataset, out_dir: str,
                  partition_col: str | None = None,
                  mode: str = "overwrite") -> dict:
    """Write a dataset as partitioned Parquet + manifest; returns the
    manifest dict. ``mode``: "overwrite" | "skip_existing"."""
    if is_sealed(out_dir):
        if mode == "skip_existing":
            with open(os.path.join(out_dir, _MANIFEST)) as f:
                return json.load(f)
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)

    t0 = time.perf_counter()
    if partition_col is not None:
        ds.write_parquet(out_dir, partition_cols=[partition_col])
    else:
        ds.write_parquet(out_dir)
    wall = time.perf_counter() - t0

    files = []
    total_rows = 0
    for root, _dirs, names in os.walk(out_dir):
        for name in sorted(names):
            if not name.endswith(".parquet"):
                continue
            fpath = os.path.join(root, name)
            meta = pq.ParquetFile(fpath).metadata
            files.append({
                "path": os.path.relpath(fpath, out_dir),
                "rows": meta.num_rows,
                "bytes": os.path.getsize(fpath)})
            total_rows += meta.num_rows
    manifest = {
        "rows": total_rows, "n_files": len(files),
        "partition_col": partition_col, "wall_sec": round(wall, 3),
        "files": files,
        "written_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    tmp = os.path.join(out_dir, _MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, os.path.join(out_dir, _MANIFEST))
    return manifest


def read_dataset(out_dir: str) -> ray.data.Dataset:
    """Read back a sealed directory (ignores the manifest file)."""
    return ray.data.read_parquet(out_dir)
