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


def export_files(ds: ray.data.Dataset, root: str,
                 path_col: str = "path", content_col: str = "content",
                 on_exists: str = "overwrite",
                 retrieval: str = "persist",
                 id_col: str = "file_id") -> dict:
    """Byte-export sink: write each row's content to ``root/<path>``,
    creating parent directories.

    The reference's loadFile/loadDirectory export path (S5,
    include/FileService.h:183-312) with its parent-dir policy
    (CreateMissing) and exists policies mapped to ``on_exists``:
    "overwrite" (ReplaceWithNew, include/fileUtils.h:35-40), "skip"
    (PreserveOld), "error". ``retrieval`` maps the reference's
    dataRetrievalStrategy (include/FileService.h:237-247): "persist"
    leaves the store untouched; "remove" additionally returns the
    exported ``id_col`` values under ``"removed_ids"`` — feed them to
    ``NearDupPipeline.without_files`` / ``exact.delete_files`` (the
    store is derived lineage here, so removal IS a recompute-without).
    Runs DISTRIBUTED — each task writes its batch's files (valid on one
    node or a shared filesystem; on a multi-node cluster point ``root``
    at shared storage). Returns {"written", "skipped", "root"}
    (+ "removed_ids" for retrieval="remove").
    """
    if on_exists not in ("overwrite", "skip", "error"):
        raise ValueError(f"bad on_exists: {on_exists}")
    if retrieval not in ("persist", "remove"):
        raise ValueError(f"bad retrieval: {retrieval}")
    if retrieval == "remove":
        # ONE execution feeds both uses: a lazy input would otherwise
        # run once for the id pull and again for the export, and the
        # two runs could disagree. Ids come back as a vectorized
        # column pull, not take_all row dicts.
        ds = ds.materialize()
        # native values, not int(v): id_col is a generic parameter and
        # string/binary ids must round-trip unchanged
        ids = sorted({
            v
            for b in ds.select_columns([id_col]).iter_batches(
                batch_format="pyarrow", batch_size=None)
            for v in b[id_col].to_pylist()})
        out = export_files(ds, root, path_col, content_col, on_exists,
                           retrieval="persist")
        out["removed_ids"] = ids
        return out
    os.makedirs(root, exist_ok=True)

    def write_batch(batch):
        import pyarrow as pa

        paths = batch[path_col].to_pylist()
        texts = batch[content_col].to_pylist()
        written = skipped = 0
        for p, t in zip(paths, texts):
            norm = os.path.normpath(p).lstrip("/")
            if norm.startswith("..") or os.path.isabs(norm):
                raise ValueError(f"path escapes export root: {p!r}")
            full = os.path.join(root, norm)
            if os.path.exists(full):
                if on_exists == "skip":
                    skipped += 1
                    continue
                if on_exists == "error":
                    raise FileExistsError(full)
            parent = os.path.dirname(full)
            if parent:
                os.makedirs(parent, exist_ok=True)
            data = t.encode("utf-8") if isinstance(t, str) else bytes(t)
            with open(full, "wb") as f:
                f.write(data)
            written += 1
        return pa.table({"written": pa.array([written]),
                         "skipped": pa.array([skipped])})

    parts = ds.select_columns([path_col, content_col]).map_batches(
        write_batch, batch_format="pyarrow").take_all()
    return {"written": sum(r["written"] for r in parts),
            "skipped": sum(r["skipped"] for r in parts),
            "root": root}


def compare_directories(dir_a: str, dir_b: str) -> list[str]:
    """Byte-compare two file trees; returns sorted relative paths that
    differ or exist on one side only (empty list == identical trees).
    The reference's round-trip gate (compareDirectories,
    lib/fileUtils.cpp:6-94; benchmark correctness check
    test/bencmark.cpp:157-171)."""

    def tree(root: str) -> dict[str, str]:
        out = {}
        for r, _d, names in os.walk(root):
            for n in names:
                p = os.path.join(r, n)
                out[os.path.relpath(p, root)] = p
        return out

    ta, tb = tree(dir_a), tree(dir_b)
    bad = set(ta.keys()) ^ set(tb.keys())
    for rel in set(ta) & set(tb):
        with open(ta[rel], "rb") as fa, open(tb[rel], "rb") as fb:
            if fa.read() != fb.read():
                bad.add(rel)
    return sorted(bad)
