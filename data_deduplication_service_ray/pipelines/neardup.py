"""Near-duplicate detection + clustering pipeline (the north-star).

Composition (BASELINE.json north_star; stage plan SURVEY.md §7.2):

    docs ──normalize──► sha256 rows
      ├─ exact groups: groupby(content_sha256) → representatives + exact
      │  member→rep edges (the reference's whole-file dedup, D4)
      ├─ representatives ──SignatureStage──► MinHash(128)+SimHash-64
      │     ──band_rows──► LSH bucket shuffle ──► candidate pairs
      │     ──verify (exact Jaccard + Hamming + containment)──► edges
      └─ edges ∪ exact edges ──union-find──► clusters (+ singletons)

Exact duplicates are collapsed BEFORE LSH: identical contents would
otherwise form maximal hot buckets in every band (k² pair blowup for zero
information). The exact-dup members rejoin their representative's cluster
through the exact edges.

Stage boundaries are **materialized** (``Dataset.materialize()`` — blocks
live in the object store and spill to disk under pressure). This (a) gives
each wide stage the whole machine instead of stacking every actor pool of
a lazy diamond DAG at once, (b) stops the shared ``representatives``
lineage from re-executing per consumer, and (c) is the in-memory analog of
the per-stage Parquet checkpoints used for resumable runs
(``state.checkpoint``); a ``checkpoint_dir`` makes them durable.
"""

from __future__ import annotations

from collections.abc import Callable

import ray.data

from data_deduplication_service_ray.config import PipelineConfig
from data_deduplication_service_ray.stages import cluster as cl
from data_deduplication_service_ray.stages import exact, neardup, normalize


class NearDupPipeline:
    def __init__(self, docs: ray.data.Dataset,
                 cfg: PipelineConfig | None = None,
                 materialize: bool = True,
                 checkpoint_dir: str | None = None):
        self.cfg = cfg or PipelineConfig()
        self.docs = normalize.normalize(docs)
        self._materialize = materialize
        self._checkpoint_dir = checkpoint_dir
        self._memo: dict[str, ray.data.Dataset] = {}

    def _stage(self, name: str, build: Callable[[], ray.data.Dataset]
               ) -> ray.data.Dataset:
        if name not in self._memo:
            if self._checkpoint_dir is not None:
                from data_deduplication_service_ray.state.checkpoint import (
                    config_key, stage_checkpoint)

                self._memo[name] = stage_checkpoint(
                    self._checkpoint_dir, name, config_key(self.cfg),
                    build)
            else:
                ds = build()
                if self._materialize:
                    ds = ds.materialize()
                self._memo[name] = ds
        return self._memo[name]

    # -- exact layer ------------------------------------------------------

    def normalized(self) -> ray.data.Dataset:
        return self._stage("normalized", lambda: self.docs)

    def file_groups(self) -> ray.data.Dataset:
        """(content_sha256, file_id=representative, dup_count)."""
        return self._stage(
            "file_groups", lambda: exact.file_dedup(self.normalized()))

    def representatives(self) -> ray.data.Dataset:
        """One (file_id, content) row per distinct content."""

        def build() -> ray.data.Dataset:
            reps = self.file_groups().select_columns(["file_id"])
            slim = self.normalized().select_columns(["file_id", "content"])
            return reps.join(slim, join_type="inner",
                             num_partitions=self.cfg.join_num_partitions,
                             on=("file_id",))

        return self._stage("representatives", build)

    def exact_edges(self) -> ray.data.Dataset:
        """member→representative edges inside exact-dup groups."""

        def build() -> ray.data.Dataset:
            reps = (self.file_groups()
                    .select_columns(["content_sha256", "file_id"])
                    .rename_columns({"file_id": "a"}))
            members = self.normalized().select_columns(
                ["file_id", "content_sha256"])
            joined = members.join(
                reps, join_type="inner",
                num_partitions=self.cfg.join_num_partitions,
                on=("content_sha256",))
            return (joined.rename_columns({"file_id": "b"})
                    .filter(expr="a != b")
                    .select_columns(["a", "b"]))

        return self._stage("exact_edges", build)

    # -- near-dup layer ---------------------------------------------------

    def signatures(self) -> ray.data.Dataset:
        return self._stage(
            "signatures",
            lambda: neardup.signatures(self.representatives(), self.cfg))

    def candidate_pairs(self) -> ray.data.Dataset:
        def build() -> ray.data.Dataset:
            bands = neardup.band_rows(self.signatures(), self.cfg)
            return neardup.candidate_pairs(bands, self.cfg)

        return self._stage("candidate_pairs", build)

    def verified_pairs(self) -> ray.data.Dataset:
        return self._stage(
            "verified_pairs",
            lambda: neardup.verify_pairs(self.candidate_pairs(),
                                         self.representatives(), self.cfg))

    def near_edges(self) -> ray.data.Dataset:
        return neardup.duplicate_edges(self.verified_pairs(), self.cfg)

    # -- clustering layer -------------------------------------------------

    def edges(self) -> ray.data.Dataset:
        return self._stage(
            "edges",
            lambda: self.near_edges().union(self.exact_edges()))

    def clusters(self, method: str = "label_propagation"
                 ) -> ray.data.Dataset:
        """(file_id, cluster_id) for every non-empty document.

        cluster_id = min member file_id — deterministic across runs,
        partitionings, and the N-vs-4N scaling configurations.
        """
        def build() -> ray.data.Dataset:
            edges = self.edges()
            if method == "unionfind":
                labels = cl.cluster_unionfind_stream(edges)
            else:
                labels = cl.cluster_label_propagation(
                    edges, max_rounds=self.cfg.max_label_rounds,
                    num_partitions=self.cfg.join_num_partitions)
            return cl.attach_singletons(
                labels, self.normalized(),
                num_partitions=self.cfg.join_num_partitions)

        return self._stage(f"clusters_{method}", build)

    def cluster_report(self) -> ray.data.Dataset:
        return cl.cluster_sizes(self.clusters())

    def containment_pairs(self) -> ray.data.Dataset:
        """Verified pairs where one content is a substring of the other
        (the substring-containment output of the north_star)."""
        return (self.verified_pairs()
                .filter(expr="contained == True")
                .select_columns(["a", "b", "jaccard"]))
