"""Canonical dataset readers (reference sources S1-S3, SURVEY.md §2.1).

The reference walks a filesystem and ingests files one by one
(include/FileService.h:430-475); here the "filesystem" is a Parquet corpus
and ingest is a single ``read_parquet`` with column pruning. Every reader
canonicalizes to the internal schema ``(file_id:int64, content:string, …)``.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from data_deduplication_service_ray.functions.hashing import stable_id64


def _configure() -> None:
    from data_deduplication_service_ray import configure_context

    configure_context()


def validate_parquet_input(path_or_dir: str) -> None:
    """Fail fast with a CLEAR error for missing or corrupt inputs (the
    reference's filesystem existence/readability checks, M5,
    lib/fileUtils.cpp:101-143) instead of a deep Ray-task traceback at
    first execution. Cheap: existence + one parquet FOOTER read of the
    first file. URIs (s3:// etc.) are passed through — remote stores
    surface their own errors."""
    import os

    import pyarrow.parquet as pq

    if "://" in path_or_dir:
        return
    if not os.path.exists(path_or_dir):
        raise FileNotFoundError(
            f"input path does not exist: {path_or_dir!r} "
            "(expected a parquet file or a directory of parquet files)")
    if os.path.isdir(path_or_dir):
        probe = None
        for root, _dirs, files in os.walk(path_or_dir):
            for f in sorted(files):
                if f.endswith(".parquet"):
                    probe = os.path.join(root, f)
                    break
            if probe:
                break
        if probe is None:
            raise ValueError(
                f"no *.parquet files under input directory: "
                f"{path_or_dir!r}")
    else:
        probe = path_or_dir
    try:
        pq.read_schema(probe)
    except Exception as exc:
        raise ValueError(
            f"input is not readable parquet: {probe!r}: {exc}") from exc


def read_corpus(path_or_dir: str, *, columns=None) -> ray.data.Dataset:
    """Read an input_hint-shaped corpus (repo,path,commit,lang,content)
    and derive ``file_id`` content-free from the natural key.

    Replaces the reference's serial catalog ids (lib/dbManager.cpp:572-581)
    with a deterministic, coordination-free id — safe on a multi-node
    cluster where a global counter would serialize ingest.

    Datasets capture the DataContext at creation, so the engine context
    (hash-shuffle strategy) is applied HERE, before read_parquet.
    """
    _configure()
    validate_parquet_input(path_or_dir)
    cols = columns or ["repo", "path", "commit", "lang", "content"]
    need = sorted(set(cols) | {"repo", "path", "commit"})
    # one read task per ~core-quantum: the default block sizing fuses a
    # sharded corpus into a handful of read tasks, serializing the scan
    # (override scales with the cluster the run actually has)
    try:
        import ray as _ray

        nblocks = 4 * max(int(_ray.cluster_resources().get("CPU", 8)), 2)
    except Exception:
        nblocks = 32
    ds = ray.data.read_parquet(path_or_dir, columns=need,
                               override_num_blocks=nblocks)

    def add_id(batch: pa.Table) -> pa.Table:
        ids = [stable_id64(r, p, c) for r, p, c in
               zip(batch["repo"].to_pylist(), batch["path"].to_pylist(),
                   batch["commit"].to_pylist())]
        return batch.append_column("file_id", pa.array(ids, pa.int64()))

    return ds.map_batches(add_id, batch_format="pyarrow")


def read_documents(sf_dir: str, *, columns=None) -> ray.data.Dataset:
    """Read the driver testdata ``documents`` table canonicalized to the
    internal schema: doc_id -> file_id, text -> content; lang/source kept.
    """
    _configure()
    validate_parquet_input(f"{sf_dir}/documents.parquet")
    cols = columns or ["doc_id", "text", "lang", "source"]
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=cols)

    def canon(batch: pa.Table) -> pa.Table:
        out = batch
        if "doc_id" in out.column_names:
            out = out.rename_columns(
                ["file_id" if c == "doc_id" else "content" if c == "text"
                 else c for c in out.column_names])
        return out

    return ds.map_batches(canon, batch_format="pyarrow")


def read_embeddings(sf_dir: str) -> ray.data.Dataset:
    _configure()
    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
