"""Reconstruction: reassemble documents from the segment store.

Reference parity: the read path is a 3-way join
``data ⋈ segments ⋈ files ORDER BY segment_num`` streamed out
(getFileStreamed, lib/dbManager.cpp:164-194, query at 171-177; test oracle
variant test/testUtils.h:185-191). Here: hash-join the recipe with the
store on ``segment_hash``, then per-file ordered concat inside
``groupby(file_id).map_groups`` — Ray Data does not preserve row order, so
ordering is explicit per group (SURVEY.md §7.4 "Ordering").

Used as the round-trip correctness oracle: reconstructed content must equal
the original byte-for-byte (the reference's golden check,
test/testUtils.h:164-202).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from data_deduplication_service_ray.config import PipelineConfig
from data_deduplication_service_ray.functions.aggregates import OrderedConcat


def reconstruct(recipe: ray.data.Dataset, store: ray.data.Dataset,
                cfg: PipelineConfig | None = None) -> ray.data.Dataset:
    """(file_id,pos,segment_hash) ⋈ (segment_hash,segment) -> (file_id,content).

    The recipe side carries only hashes (no payload) — content never rides
    through the shuffle twice (SURVEY.md §7.4 "Wide rows"). Reassembly is a
    grouped OrderedConcat aggregate (partial-merge-finalize), not a global
    sort + per-group UDF: one shuffle on file_id, order restored inside the
    aggregate (measured ~40x faster than groupby().map_groups on the
    500-doc smoke corpus).
    """
    from data_deduplication_service_ray.config import join_parts
    from data_deduplication_service_ray.stages.exact import (
        SINGLE_TASK_FINALIZE_LIMIT)

    nparts = join_parts(cfg or PipelineConfig())
    recipe_slim = recipe.select_columns(
        ["file_id", "pos", "segment_hash"]).materialize()
    store_slim = store.select_columns(["segment_hash", "segment"])

    if recipe_slim.count() <= SINGLE_TASK_FINALIZE_LIMIT:
        # small path: ONE Arrow C++ join + sorted per-file assembly on
        # the driver — the distributed join + grouped aggregate pay
        # seconds of fixed cost that dwarf a small corpus (same gate
        # discipline as exact.finalize_small)
        import pandas as pd

        rt = pa.concat_tables(recipe_slim.iter_batches(
            batch_format="pyarrow", batch_size=None))
        st = pa.concat_tables(store_slim.iter_batches(
            batch_format="pyarrow", batch_size=None))
        joined = rt.join(st, keys="segment_hash", join_type="inner")
        df = joined.sort_by([("file_id", "ascending"),
                             ("pos", "ascending")]).to_pandas()
        content: pd.Series = df.groupby("file_id", sort=True)[
            "segment"].agg("".join)
        return ray.data.from_arrow(pa.table({
            "file_id": pa.array(content.index.to_numpy(), pa.int64()),
            "content": pa.array(content.to_numpy(), pa.string())}))

    joined = recipe_slim.join(store_slim, join_type="inner",
                              num_partitions=nparts, on=("segment_hash",))
    return joined.groupby("file_id").aggregate(OrderedConcat())
