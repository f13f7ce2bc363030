"""Reference-parity exact-dedup pipeline over a document dataset.

Composes the stages that reproduce the reference's full capability surface
(ingest 3.1, export 3.2, delete 3.3, metrics A3-A5): segmentation ->
refcounted segment store -> recipe -> reconstruction -> reports.
"""

from __future__ import annotations

import ray.data

from data_deduplication_service_ray.config import PipelineConfig
from data_deduplication_service_ray.stages import exact, metrics, normalize
from data_deduplication_service_ray.stages import reconstruct as rec
from data_deduplication_service_ray.stages import segment


class DedupCore:
    """Lazy bundle of the exact-dedup datasets derived from one input."""

    def __init__(self, docs: ray.data.Dataset,
                 cfg: PipelineConfig | None = None):
        import data_deduplication_service_ray as _pkg

        _pkg.configure_context()
        self.cfg = cfg or PipelineConfig()
        self.docs = normalize.drop_empty(docs)

    def normalized(self) -> ray.data.Dataset:
        return normalize.with_sha256(self.docs)

    def recipe(self, keep_data: bool = True) -> ray.data.Dataset:
        return segment.segment_recipe(self.docs, self.cfg,
                                      keep_data=keep_data)

    def store(self) -> ray.data.Dataset:
        return exact.segment_store(self.recipe())

    def file_dedup(self) -> ray.data.Dataset:
        return exact.file_dedup(self.normalized())

    def reconstructed(self) -> ray.data.Dataset:
        return rec.reconstruct(self.recipe(keep_data=False), self.store(),
                               self.cfg)

    def report(self) -> ray.data.Dataset:
        return metrics.file_report(self.recipe())

    def coefficient(self) -> ray.data.Dataset:
        return metrics.global_coefficient(self.store())
