"""Normalization stage: identity hash + empty-content guard.

Reference parity:
- per-row content digest = the preserved invariant (BASELINE.json
  input_hint: "per-row invariant vs the reference: content sha256 equality");
- empty-content rejection = the reference's empty-file guard
  (include/FileService.h:372-377), which refuses 0-byte files at ingest.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from data_deduplication_service_ray.functions.hashing import sha256_hex


def with_sha256(ds: ray.data.Dataset,
                content_col: str = "content") -> ray.data.Dataset:
    """Append ``content_sha256`` (lowercase hex, matches DuckDB sha256()).

    Hashes straight from the Arrow value buffer (utf-8 bytes — exactly
    what ``text.encode()`` would produce) via memoryview slices: no
    Python string materialization, no re-encode; only the per-row
    hashlib call remains (the reference hashes per file too,
    lib/dbManager.cpp:212-233)."""
    import hashlib

    import numpy as np

    def add(batch: pa.Table) -> pa.Table:
        col = batch[content_col].combine_chunks()
        if len(col) and col.null_count == 0:
            off_dt = (np.int64 if pa.types.is_large_string(col.type)
                      else np.int32)
            offs = np.frombuffer(col.buffers()[1], dtype=off_dt)[
                col.offset:col.offset + len(col) + 1].tolist()
            mv = memoryview(col.buffers()[2])
            hexes = [hashlib.sha256(mv[a:b]).hexdigest()
                     for a, b in zip(offs, offs[1:])]
        else:
            # null propagates as null (DuckDB: sha256(NULL) IS NULL) —
            # hashing null as sha256("") would silently diverge from
            # the SQL oracle; ``normalize`` drops nulls before this
            # stage, so this branch only matters for direct callers
            hexes = [None if t is None else sha256_hex([t])[0]
                     for t in col.to_pylist()]
        return batch.append_column("content_sha256",
                                   pa.array(hexes, pa.string()))

    return ds.map_batches(add, batch_format="pyarrow")


def drop_empty(ds: ray.data.Dataset,
               content_col: str = "content") -> ray.data.Dataset:
    """Filter rows with NULL or zero-length content (vectorized)."""

    def keep(batch: pa.Table) -> pa.Table:
        col = batch[content_col]
        mask = pc.and_(col.is_valid(), pc.greater(pc.utf8_length(col), 0))
        return batch.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")


def normalize(ds: ray.data.Dataset,
              content_col: str = "content") -> ray.data.Dataset:
    return with_sha256(drop_empty(ds, content_col), content_col)
