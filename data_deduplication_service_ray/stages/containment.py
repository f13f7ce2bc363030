"""Distributed substring-containment pass (suffix-array per group).

The north-star's "suffix-array pass for exact substring containment"
as a Ray Data stage: documents are grouped by a partitioning column
(LSH-derived cluster, repo, or any user key), and each group builds ONE
generalized suffix array over its concatenated contents to find every
(inner ⊆ outer) pair — O(group_text · log² group_text) instead of
O(k²·|text|) pairwise scans.

Partitioning assumption (documented per the custom-operator contract):
containment is only detected WITHIN a group. Pair the stage with a
candidate generator that co-locates plausibly-related documents (LSH
clusters from ``NearDupPipeline``, or repo/path keys); a corpus-wide
exact pass would need a global suffix structure, which does not fit the
shuffle model at 10^12-file scale.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data

from data_deduplication_service_ray.functions.suffix import containment_pairs


def containment_within_groups(docs: ray.data.Dataset,
                              group_col: str = "cluster_id",
                              id_col: str = "file_id",
                              content_col: str = "content",
                              max_occurrences: int = 256
                              ) -> ray.data.Dataset:
    """(id, content, group) rows -> (inner:int64, outer:int64, group)."""

    def per_group(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) < 2:
            return pd.DataFrame({"inner": pd.Series([], dtype="int64"),
                                 "outer": pd.Series([], dtype="int64"),
                                 group_col: pd.Series(
                                     [], dtype=df[group_col].dtype)})
        ids = [int(x) for x in df[id_col]]
        texts = list(df[content_col])
        pairs = containment_pairs(ids, texts,
                                  max_occurrences=max_occurrences)
        gval = df[group_col].iloc[0]
        return pd.DataFrame({
            "inner": pd.Series([p[0] for p in pairs], dtype="int64"),
            "outer": pd.Series([p[1] for p in pairs], dtype="int64"),
            group_col: pd.Series([gval] * len(pairs),
                                 dtype=df[group_col].dtype)})

    slim = docs.select_columns([id_col, content_col, group_col])
    return slim.groupby(group_col).map_groups(per_group,
                                              batch_format="pandas")


def containment_in_clusters(docs_normalized: ray.data.Dataset,
                            clusters: ray.data.Dataset,
                            num_partitions: int = 8) -> ray.data.Dataset:
    """Join cluster labels onto docs, then run the per-group SA pass over
    duplicate clusters only (singletons cannot contain anything)."""
    labeled = docs_normalized.select_columns(["file_id", "content"]).join(
        clusters, join_type="inner", num_partitions=num_partitions,
        on=("file_id",))
    dup_only = _drop_singleton_groups(labeled, "cluster_id")
    return containment_within_groups(dup_only)


def _drop_singleton_groups(ds: ray.data.Dataset,
                           group_col: str) -> ray.data.Dataset:
    from ray.data.aggregate import Count

    sizes = (ds.groupby(group_col).aggregate(Count(alias_name="_gsize"))
             .filter(expr="_gsize > 1"))
    return (ds.join(sizes, join_type="inner", num_partitions=8,
                    on=(group_col,))
            .drop_columns(["_gsize"]))
