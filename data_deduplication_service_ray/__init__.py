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
    """Engine-wide Ray Data context hook (idempotent). Currently a
    no-op: the default sort-based shuffle strategy benchmarked best for
    this pipeline's aggregate mix (a global HASH_SHUFFLE switch — which
    ``repartition(keys=...)`` would require — regressed the aggregate
    stages ~2x at 32 CPUs). Kept as the central place for future
    context tuning; called by readers and pipeline constructors."""


__all__ = ["PipelineConfig", "HASH_REGISTRY", "configure_context"]
__version__ = "0.1.0"
