"""Exact dedup: global refcounted segment store + whole-file dedup.

Reference parity (the core of the reference engine):
- per-file partial aggregate: ``GROUP BY data, hash`` into new_segments_x
  (lib/dbManager.cpp:263-265) == the combine step inside ``map_batches``;
- global upsert-merge: ``INSERT ... ON CONFLICT (segment_hash) DO UPDATE
  SET segment_count += excluded`` (lib/dbManager.cpp:274-281) == a
  ``groupby(segment_hash)`` shuffle reduce;
- refcounts are an aggregation *result* here, not mutable state (ST2);
- delete + GC (lib/dbManager.cpp:92-161, deleteUnusedSegments
  lib/dbCommon.cpp:188-190) == anti-join + recompute;
- refcount invariant check (checkSegmentCount, lib/dbCommon.cpp:192-202)
  == recompute-and-compare, exposed for pytest.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from data_deduplication_service_ray.config import gate
from ray.data.aggregate import Count, Min, Sum


#: A partial-aggregate table at or below this many rows finalizes in ONE
#: remote task (a single Arrow C++ group_by) instead of a distributed
#: sort-shuffle aggregate: Ray's aggregate operator pays seconds of
#: fixed setup regardless of input size, which dominates every
#: small-corpus query; past the limit the distributed path runs
#: unchanged. Same discipline as the neardup driver gates (parity is
#: exact — the single task computes the identical merge).
SINGLE_TASK_FINALIZE_LIMIT = gate(2_000_000, "single_task_finalize_limit")


def finalize_small(partials: ray.data.Dataset, final_fn,
                   build_distributed) -> ray.data.Dataset:
    """Route partial aggregates to a one-task Arrow finalize when small,
    else to the distributed implementation. ``final_fn`` must be a pure
    Arrow-table function producing the same rows as the distributed
    path."""
    p = partials.materialize()
    if p.count() <= SINGLE_TASK_FINALIZE_LIMIT:
        return p.repartition(1, shuffle=False).map_batches(
            final_fn, batch_format="pyarrow", batch_size=None)
    return build_distributed(p)


def segment_store(recipe: ray.data.Dataset) -> ray.data.Dataset:
    """(file_id,pos,segment_hash,segment) -> (segment_hash, segment, count).

    Two-level aggregation: a vectorized per-batch partial count (Arrow
    ``Table.group_by``) shrinks the shuffle input, then a global merge —
    the Ray-native form of the reference's temp-table-then-upsert trick
    (doc/implementationDetails.md:176-204). The merge runs as a single
    Arrow task for small partial tables (``finalize_small``) and as a
    ``groupby(segment_hash)`` shuffle past the gate.
    """
    has_data = "segment" in recipe.schema().names
    carry = ["segment"] if has_data else []

    def partial(batch: pa.Table) -> pa.Table:
        spec = [("pos", "count")] + [(c, "first") for c in carry]
        agg = batch.group_by(["segment_hash"]).aggregate(spec)
        ren = {"pos_count": "partial_count", "segment_first": "segment"}
        return agg.rename_columns(
            [ren.get(n, n) for n in agg.column_names])

    partials = recipe.map_batches(partial, batch_format="pyarrow")

    def final(t: pa.Table) -> pa.Table:
        spec = [("partial_count", "sum")] + [("segment", "min")
                                             for _ in carry]
        agg = t.group_by("segment_hash").aggregate(spec)
        ren = {"partial_count_sum": "segment_count",
               "segment_min": "segment"}
        return agg.rename_columns(
            [ren.get(n, n) for n in agg.column_names])

    def dist(p: ray.data.Dataset) -> ray.data.Dataset:
        aggs = [Sum("partial_count", alias_name="segment_count")]
        if has_data:
            aggs.append(Min("segment", alias_name="segment"))
        return p.groupby("segment_hash").aggregate(*aggs)

    return finalize_small(partials, final, dist)


def file_dedup(normalized: ray.data.Dataset) -> ray.data.Dataset:
    """Whole-file exact dedup: one representative per content_sha256.

    Keep-first with a deterministic winner (min file_id) — the analog of
    the segment-store PK keeping one payload per hash
    (lib/dbManager.cpp:551). Returns
    (content_sha256, file_id=representative, dup_count). Only the slim
    (sha, file_id) columns enter the aggregation (content stays in its
    scan blocks); per-block Arrow partials then a gated global merge.
    """
    slim = normalized.select_columns(["content_sha256", "file_id"])

    def partial(batch: pa.Table) -> pa.Table:
        agg = batch.group_by("content_sha256").aggregate(
            [("file_id", "min"), ("file_id", "count")])
        return agg.rename_columns(["content_sha256", "min_fid", "cnt"])

    partials = slim.map_batches(partial, batch_format="pyarrow")

    def final(t: pa.Table) -> pa.Table:
        agg = t.group_by("content_sha256").aggregate(
            [("min_fid", "min"), ("cnt", "sum")])
        return agg.rename_columns(
            ["content_sha256", "file_id", "dup_count"])

    def dist(p: ray.data.Dataset) -> ray.data.Dataset:
        return (p.groupby("content_sha256")
                .aggregate(Min("min_fid", alias_name="file_id"),
                           Sum("cnt", alias_name="dup_count")))

    return finalize_small(partials, final, dist)


def rep_groups(normalized: ray.data.Dataset) -> ray.data.Dataset:
    """ONE groupby(content_sha256) producing everything the near-dup
    pipeline needs from the exact layer: (content_sha256, file_id=min
    member, dup_count, members:list<int64>, content of the
    representative).

    Replaces a groupby + two joins (representatives, exact edges) with a
    single shuffle — content rides it exactly once, and the fused output
    is split into views by cheap downstream maps.
    """
    from data_deduplication_service_ray.functions.aggregates import (
        CollectList, MinBy)

    return (normalized
            .groupby("content_sha256")
            .aggregate(Min("file_id", alias_name="file_id"),
                       Count(alias_name="dup_count"),
                       CollectList("file_id", alias_name="members"),
                       MinBy("file_id", "content", alias_name="content")))


def delete_files(recipe: ray.data.Dataset,
                 delete_ids: set[int]) -> ray.data.Dataset:
    """Remove files and garbage-collect: recompute the store without them.

    The reference decrements refcounts with an aggregate-then-join UPDATE
    and deletes zero-count segments (lib/dbManager.cpp:110-121,
    lib/dbCommon.cpp:188-190). In the recompute-from-lineage world this is
    a broadcast anti-join (the deleted-id set rides into each task) plus
    the same store aggregation; count==0 rows simply never appear (D3 GC
    is free). ``delete_ids`` must be driver-small (an explicit id list, as
    in the reference's per-file/per-directory deletes); for huge deletes
    use a bucketed anti-join instead.
    """
    ids = pa.array(sorted(delete_ids), pa.int64())

    def drop(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.invert(pc.is_in(batch["file_id"], value_set=ids)))

    return segment_store(recipe.map_batches(drop, batch_format="pyarrow"))


def delete_files_antijoin(recipe: ray.data.Dataset,
                          doomed: ray.data.Dataset,
                          num_partitions: int = 8) -> ray.data.Dataset:
    """Large-delete path: recompute the store without the files named by
    the ``doomed`` dataset (column ``file_id``), via a distributed
    LEFT-OUTER anti-join on file_id.

    ``delete_files`` broadcasts a driver-small id list into every task
    (the reference's per-file/per-directory deletes); this variant
    handles delete sets that are themselves datasets (e.g. "drop every
    file matching a quality filter" at corpus scale) — the doomed side
    rides a hash shuffle once, no driver materialization. Identical
    result to ``delete_files`` on the same id set
    (test_delete_antijoin_matches_small_path)."""
    marked = doomed.select_columns(["file_id"]).map_batches(
        lambda t: t.append_column(
            "_doomed", pa.array([True] * t.num_rows, pa.bool_())),
        batch_format="pyarrow").materialize()
    if marked.count() == 0:       # empty join side crashes Ray 2.49
        return segment_store(recipe)
    joined = recipe.join(marked, join_type="left_outer",
                         num_partitions=num_partitions, on=("file_id",))

    def keep_unmarked(batch: pa.Table) -> pa.Table:
        return (batch.filter(pc.is_null(batch["_doomed"]))
                .drop_columns(["_doomed"]))

    return segment_store(joined.map_batches(keep_unmarked,
                                            batch_format="pyarrow"))


def refcount_invariant(recipe: ray.data.Dataset,
                       store: ray.data.Dataset) -> int:
    """A6 analog (lib/dbCommon.cpp:192-202): recount the recipe and compare
    with the stored counts; returns the number of mismatching hashes
    (must be 0). EXCEPT-style set difference as an outer join + filter.
    """
    recount = (recipe.groupby("segment_hash")
               .aggregate(Count(alias_name="recount")))
    stored = store.select_columns(["segment_hash", "segment_count"])
    joined = recount.join(stored, join_type="full_outer", num_partitions=8,
                          on=("segment_hash",))

    def mismatches(batch: pa.Table) -> pa.Table:
        # IS DISTINCT FROM semantics: a null on either side (hash present
        # in only one table) counts as a mismatch
        eq = pc.fill_null(pc.equal(batch["recount"],
                                   batch["segment_count"]), False)
        return batch.filter(pc.invert(eq))

    return joined.map_batches(mismatches, batch_format="pyarrow").count()
