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

Selected stage boundaries are **materialized** (``Dataset.materialize()``
— blocks live in the object store and spill to disk under pressure):
shuffle outputs and multiply-consumed stages only. This (a) keeps two
hash-aggregate operators from sharing one streaming graph (their
aggregator actors' CPU/memory reservations stack and thrash a small
machine), (b) stops shared lineage (groups/signatures) from re-executing
per consumer, and (c) is the in-memory analog of the per-stage Parquet
checkpoints used for resumable runs (``state.checkpoint``); a
``checkpoint_dir`` makes every stage durable.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pyarrow as pa
import ray.data

from data_deduplication_service_ray.config import PipelineConfig, join_parts
from data_deduplication_service_ray.stages import cluster as cl
from data_deduplication_service_ray.stages import exact, neardup, normalize


class NearDupPipeline:
    def __init__(self, docs: ray.data.Dataset,
                 cfg: PipelineConfig | None = None,
                 materialize: bool = True,
                 checkpoint_dir: str | None = None):
        import data_deduplication_service_ray as _pkg

        _pkg.configure_context()
        self.cfg = cfg or PipelineConfig()
        self.docs = normalize.normalize(docs)
        self._materialize = materialize
        self._checkpoint_dir = checkpoint_dir
        self._memo: dict[str, ray.data.Dataset] = {}

    def _stage(self, name: str, build: Callable[[], ray.data.Dataset],
               mat: bool = True) -> ray.data.Dataset:
        """Memoized stage. ``mat=False`` keeps the stage LAZY (it fuses
        into its consumer's streaming graph — no barrier, no object-store
        copy); used for cheap maps/filters with a single consumer. Every
        materialization barrier costs a fresh executor spin-up, so only
        shuffle outputs and multiply-consumed stages earn one. Checkpoint
        mode persists every stage regardless (resume granularity)."""
        if name not in self._memo:
            if self._checkpoint_dir is not None:
                from data_deduplication_service_ray.state.checkpoint import (
                    config_key, stage_checkpoint)

                self._memo[name] = stage_checkpoint(
                    self._checkpoint_dir, name, config_key(self.cfg),
                    build)
            else:
                ds = build()
                if self._materialize and mat:
                    ds = ds.materialize()
                self._memo[name] = ds
        return self._memo[name]

    # -- exact layer ------------------------------------------------------

    def normalized(self) -> ray.data.Dataset:
        return self._stage("normalized", lambda: self.docs, mat=False)

    def groups(self) -> ray.data.Dataset:
        """Fused exact layer: ONE groupby(content_sha256) carrying the
        representative id, dup count, member list, and representative
        content (exact.rep_groups) — representatives / file_groups /
        exact_edges are cheap map views of this, replacing two joins."""
        return self._stage(
            "groups", lambda: exact.rep_groups(self.normalized()))

    def file_groups(self) -> ray.data.Dataset:
        """(content_sha256, file_id=representative, dup_count)."""
        return self.groups().select_columns(
            ["content_sha256", "file_id", "dup_count"])

    def representatives(self) -> ray.data.Dataset:
        """One (file_id, content) row per distinct content."""
        return self.groups().select_columns(["file_id", "content"])

    def exact_edges(self) -> ray.data.Dataset:
        """member→representative edges inside exact-dup groups."""

        def expand(batch: pa.Table) -> pa.Table:
            col = batch["members"].combine_chunks()
            offsets = np.asarray(col.offsets, dtype=np.int64)
            values = np.asarray(col.values, dtype=np.int64)
            reps = np.asarray(batch["file_id"].to_numpy(
                zero_copy_only=False), dtype=np.int64)
            sizes = np.diff(offsets)
            aa, bb = [], []
            for i in np.flatnonzero(sizes >= 2):
                members = values[offsets[i]:offsets[i + 1]]
                others = members[members != reps[i]]
                aa.append(np.full(len(others), reps[i], dtype=np.int64))
                bb.append(others)
            if not aa:
                return pa.table({"a": pa.array([], pa.int64()),
                                 "b": pa.array([], pa.int64())})
            return pa.table({"a": pa.array(np.concatenate(aa)),
                             "b": pa.array(np.concatenate(bb))})

        return self.groups().select_columns(
            ["file_id", "members"]).map_batches(
            expand, batch_format="pyarrow")

    # -- near-dup layer ---------------------------------------------------

    def signatures(self) -> ray.data.Dataset:
        def build() -> ray.data.Dataset:
            # the join upstream leaves few (large) blocks; split them so
            # the signature pool has at least one task per actor slot
            # (repartition without shuffle = block split, no data movement)
            reps = self.representatives().repartition(
                2 * neardup._pool_max(self.cfg), shuffle=False)
            return neardup.signatures(reps, self.cfg)

        return self._stage("signatures", build)

    def candidate_pairs(self) -> ray.data.Dataset:
        """Per-band candidate-pair occurrences (see
        ``stages.neardup.candidate_pairs(distinct=False)``); the
        estimate-prefilter in ``verified_pairs`` consumes occurrences and
        dedups only the survivors."""

        def build() -> ray.data.Dataset:
            bands = neardup.band_rows(self.signatures(), self.cfg)
            return neardup.candidate_pairs(bands, self.cfg,
                                           distinct=False)

        # materialized: the bucket groupby and the survivor-dedup groupby
        # (inside verified_pairs) must not share one streaming graph —
        # two live hash-aggregate operators stack their aggregator
        # reservations and thrash on a small machine
        return self._stage("candidate_pairs", build)

    def verified_pairs(self) -> ray.data.Dataset:
        return self._stage(
            "verified_pairs",
            lambda: neardup.verify_pairs(self.candidate_pairs(),
                                         self.representatives(), self.cfg,
                                         sigs=self.signatures(),
                                         occurrences=True))

    def near_edges(self) -> ray.data.Dataset:
        return neardup.duplicate_edges(self.verified_pairs(), self.cfg)

    # -- clustering layer -------------------------------------------------

    def edges(self) -> ray.data.Dataset:
        return self._stage(
            "edges",
            lambda: self.near_edges().union(self.exact_edges()),
            mat=False)

    def clusters(self, method: str = "auto") -> ray.data.Dataset:
        """(file_id, cluster_id) for every non-empty document.

        cluster_id = min member file_id — deterministic across runs,
        partitionings, and the N-vs-4N scaling configurations (both
        methods produce identical labels, so "auto" never changes the
        answer, only the execution strategy).

        method="auto" picks the streamed union-find while the verified
        edge set is small (it is a tiny fraction of the corpus after
        verification) and distributed label propagation beyond
        ``cfg.unionfind_edge_limit`` edges.
        """
        def build() -> ray.data.Dataset:
            edges = self.edges()
            chosen = method
            if chosen == "auto":
                chosen = ("unionfind"
                          if edges.count() <= self.cfg.unionfind_edge_limit
                          else "label_propagation")
            if chosen == "unionfind":
                labels = cl.cluster_unionfind_stream(edges)
            else:
                labels = cl.cluster_label_propagation(
                    edges, max_rounds=self.cfg.max_label_rounds,
                    num_partitions=join_parts(self.cfg))

            # all node ids come from the MATERIALIZED groups stage
            # (members flattened) — attaching via normalized() would
            # re-read the corpus and re-hash content just to list ids
            def all_ids(batch: pa.Table) -> pa.Table:
                return pa.table({
                    "file_id": batch["members"].combine_chunks()
                    .flatten()})

            nodes = self.groups().select_columns(["members"]).map_batches(
                all_ids, batch_format="pyarrow")
            return cl.attach_singletons(
                labels, nodes, num_partitions=join_parts(self.cfg))

        return self._stage(f"clusters_{method}", build, mat=False)

    def cluster_report(self) -> ray.data.Dataset:
        return cl.cluster_sizes(self.clusters())

    def without_files(self, delete_ids: set[int]) -> "NearDupPipeline":
        """Incremental removal (reference delete path D1/D2,
        lib/dbManager.cpp:92-161, recompute-from-lineage style): a new
        pipeline over the corpus minus ``delete_ids``. With a
        ``checkpoint_dir`` pointing at a fresh directory the surviving
        stages rebuild; clusters not touching a removed file keep their
        labels (min-id labels are content-derived, not positional)."""
        ids = pa.array(sorted(delete_ids), pa.int64())

        def drop(batch: pa.Table) -> pa.Table:
            return batch.filter(pa.compute.invert(
                pa.compute.is_in(batch["file_id"], value_set=ids)))

        # strip the derived column: the new pipeline re-normalizes
        docs = (self.docs.map_batches(drop, batch_format="pyarrow")
                .drop_columns(["content_sha256"]))
        return NearDupPipeline(docs, self.cfg,
                               materialize=self._materialize)

    def containment_pairs(self) -> ray.data.Dataset:
        """Verified pairs where one content is a substring of the other
        (the substring-containment output of the north_star)."""
        return (self.verified_pairs()
                .filter(expr="contained == True")
                .select_columns(["a", "b", "jaccard"]))
