"""Dedup metrics (reference aggregations A3-A5/A7, SURVEY.md §2.5).

- per-file dedup characteristics (getDedupCharacteristics,
  lib/dbCommon.cpp:204-229): total segments, distinct segments, unique %,
  stored vs original bytes;
- global dedup coefficient (FileService::getCoefficient,
  lib/FileService.cpp:55-75): unique/total segment percentage.

All percentages derive from integer aggregates with a single final
division, so Ray and the DuckDB oracle produce bit-identical doubles
regardless of parallel reduction order.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Min, Sum


def file_report(recipe: ray.data.Dataset) -> ray.data.Dataset:
    """Per-file: total_segments, unique_segments, unique_pct, stored_chars.

    ``stored_chars`` counts each distinct segment of the file once (the
    per-file storage cost in the refcounted store); ``unique_pct`` is the
    reference's unique-segment percentage.
    """
    def per_batch_distinct(batch: pa.Table) -> pa.Table:
        # local (file_id, hash) dedup with segment lengths — shrinks the
        # shuffle; global distinct still needs the groupby below.
        agg = batch.group_by(["file_id", "segment_hash"]).aggregate(
            [("pos", "count"), ("segment", "first")])
        lengths = pa.compute.utf8_length(agg["segment_first"])
        return pa.table({
            "file_id": agg["file_id"],
            "segment_hash": agg["segment_hash"],
            "n": agg["pos_count"],
            "seg_chars": lengths.cast(pa.int64()),
        })

    from data_deduplication_service_ray.stages.exact import finalize_small

    partials = recipe.map_batches(per_batch_distinct,
                                  batch_format="pyarrow")

    def final(t: pa.Table) -> pa.Table:
        # both groupby levels in one Arrow task (see finalize_small)
        per_hash = t.group_by(["file_id", "segment_hash"]).aggregate(
            [("n", "sum"), ("seg_chars", "min")])
        rep = per_hash.group_by("file_id").aggregate(
            [("n_sum", "sum"), ("segment_hash", "count"),
             ("seg_chars_min", "sum")])
        return rep.rename_columns(
            ["file_id", "total_segments", "unique_segments",
             "stored_chars"])

    def dist(p: ray.data.Dataset) -> ray.data.Dataset:
        per_hash = (p.groupby(["file_id", "segment_hash"])
                    .aggregate(Sum("n", alias_name="n"),
                               # partials of one (file,hash) all carry
                               # the same length; Min collapses them
                               Min("seg_chars", alias_name="seg_chars")))
        return (per_hash.groupby("file_id")
                .aggregate(Sum("n", alias_name="total_segments"),
                           Count(alias_name="unique_segments"),
                           Sum("seg_chars", alias_name="stored_chars")))

    report = finalize_small(partials, final, dist)

    def pct(batch: pa.Table) -> pa.Table:
        u = batch["unique_segments"].cast(pa.float64())
        t = batch["total_segments"].cast(pa.float64())
        return batch.append_column(
            "unique_pct", pa.compute.divide(
                pa.compute.multiply(u, pa.scalar(100.0)), t))

    return report.map_batches(pct, batch_format="pyarrow")


def global_coefficient(store: ray.data.Dataset) -> ray.data.Dataset:
    """Single-row dataset: unique_segments, total_segments, unique_pct.

    The reference computes sum(segment_count) and count(*) over the store
    and reports unique/total*100 (lib/FileService.cpp:55-75).
    """
    agg = store.aggregate(Sum("segment_count", alias_name="total"),
                          Count(alias_name="unique"))
    unique, total = int(agg["unique"]), int(agg["total"])
    tbl = pa.table({
        "unique_segments": pa.array([unique], pa.int64()),
        "total_segments": pa.array([total], pa.int64()),
        "unique_pct": pa.array([unique * 100.0 / total], pa.float64()),
    })
    return ray.data.from_arrow(tbl)
