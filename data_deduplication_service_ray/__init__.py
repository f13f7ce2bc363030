"""Ray-Data-native near-duplicate detection + clustering engine.

A from-scratch rebuild of the *capabilities* of
AlexanderMeynik/data_deduplication_service (segment-level exact dedup with a
refcounted content-addressed store, reconstruction, dedup metrics) generalized
into a near-duplicate detection and clustering pipeline over Parquet tables of
source code (MinHash/LSH, SimHash, substring containment, union-find
clustering), expressed entirely as ``ray.data.Dataset`` transforms over
zero-copy Arrow batches.

Reference mapping lives in SURVEY.md; file:line citations in docstrings point
into /root/reference (read-only snapshot).
"""

from data_deduplication_service_ray.config import PipelineConfig, HASH_REGISTRY


def configure_context() -> None:
    """Engine-wide Ray Data context hook (idempotent); called by readers
    and pipeline constructors BEFORE dataset creation (datasets snapshot
    the context).

    - ``target_max_block_size`` 128 MiB -> 32 MiB: the default fuses a
      ~0.5 GiB corpus scan into a handful of read tasks, capping read +
      decode parallelism identically at 8 and 32 CPUs (measured: the
      scan floor didn't move with 4x the cores). 32 MiB keeps per-block
      overhead negligible while giving every stage per-core granularity.
    - shuffle strategy stays the default sort-based one: a global
      HASH_SHUFFLE switch — which ``repartition(keys=...)`` would
      require — regressed the aggregate stages ~2x at 32 CPUs."""
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.target_max_block_size = 32 * 1024 * 1024


__all__ = ["PipelineConfig", "HASH_REGISTRY", "configure_context"]
__version__ = "0.1.0"
