"""Near-duplicate detection + clustering pipeline (the north-star).

Composition (BASELINE.json north_star; stage plan SURVEY.md §7.2):

    docs ──normalize──► slim catalog (content_sha256, file_id)
      ├─ exact groups: SLIM groupby/driver-sort → (sha, rep, dup_count);
      │  representatives = broadcast id-filter over the RAW scan, exact
      │  member→rep edges = broadcast sha→rep map — content never enters
      │  a shuffle (the reference's whole-file dedup, D4)
      ├─ representatives ──SignatureStage──► MinHash(128)+SimHash-64
      │     ──band_rows──► singleton-bitmap filter ──► LSH bucket
      │     self-join ──► candidate pairs
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

from data_deduplication_service_ray.config import (PipelineConfig, gate,
                                                    join_parts)
from data_deduplication_service_ray.stages import cluster as cl
from data_deduplication_service_ray.stages import exact, neardup, normalize


#: Broadcast the exact-layer group map (content_sha256 -> representative,
#: ~72 B/row => ~1.4 GiB at the limit) while the distinct-content count
#: stays below this; past it, representatives/exact_edges fall back to
#: the fused content-carrying ``exact.rep_groups`` shuffle.
REP_BROADCAST_LIMIT = gate(20_000_000, "rep_broadcast_limit")

#: Below this many catalog rows the exact grouping is ONE np.lexsort on
#: the driver (the slim catalog is ~72 B/row, so 5M rows ≈ 360 MB);
#: Ray's sort-shuffle aggregate costs seconds of fixed setup that dwarfs
#: a driver reduce at this size. Past it, the distributed groupby runs.
DRIVER_GROUP_LIMIT = gate(5_000_000, "driver_group_limit")

#: Between this and DRIVER_GROUP_LIMIT rows, the exact grouping runs as
#: sha-prefix-partitioned Ray tasks over the catalog's block refs (each
#: task binary-searches its prefix range out of the sha-sorted blocks,
#: zero-copy) instead of one driver lexsort: the driver sort was a flat
#: ~0.7 s serial section that capped the exact-layer scaling ratio.
#: The tasks also emit the member→rep edges, so the sha→rep broadcast
#: disappears on this path. Below the limit the driver sort is cheaper
#: than task dispatch.
TASK_GROUP_LIMIT = gate(100_000, "task_group_limit")


def _sha_s64(col: pa.ChunkedArray) -> np.ndarray:
    """Arrow hex-sha string column -> numpy S64, zero-copy when every
    value is exactly 64 bytes (always true for sha256 hex — the value
    buffer then IS a packed S64 array; the to_pylist round trip this
    replaces cost 1.45 s at 1.28M rows)."""
    arr = col.combine_chunks()
    off_dt = (np.int64 if pa.types.is_large_string(arr.type)
              else np.int32)
    offs = np.frombuffer(arr.buffers()[1], dtype=off_dt)[
        arr.offset:arr.offset + len(arr) + 1]
    if len(arr) and np.all(np.diff(offs) == 64):
        # read-only view; .base holds the Arrow buffer alive
        return np.frombuffer(arr.buffers()[2], dtype="S64",
                             count=len(arr), offset=int(offs[0]))
    return np.array(arr.to_pylist(), dtype="S64")


#: hex prefix combos in ascending byte order ('0'..'9' < 'a'..'f', so
#: %02x formatting order IS S64 sort order)
_HEX2 = [f"{i:02x}" for i in range(256)]


def _sha_range_bounds(k: int, nparts: int) -> tuple[bytes, bytes | None]:
    """[lo, hi) S64 boundary strings of sha-prefix partition ``k``: the
    256 two-hex-char prefixes are split into ``nparts`` contiguous
    ranges (uniform — sha256 hex prefixes are equidistributed)."""
    lo = (_HEX2[k * 256 // nparts] + "0" * 62).encode()
    nxt = (k + 1) * 256 // nparts
    hi = None if nxt >= 256 else (_HEX2[nxt] + "0" * 62).encode()
    return lo, hi


@ray.remote
def _sort_catalog_block_task(tbl: pa.Table) -> pa.Table:
    """Sort one slim-catalog block by sha and return it as a
    SINGLE-CHUNK table. Sorting inside a Ray Data map does NOT survive:
    the executor bundles consecutive map outputs into one block by
    concatenation (observed: 2-chunk blocks, each chunk sorted, the
    block not), so range extraction must binary-search tables whose
    construction this code controls."""
    s = _sha_s64(tbl["content_sha256"])
    return tbl.take(pa.array(np.argsort(s))).combine_chunks()


@ray.remote
def _near_edge_task(tbl: pa.Table, thr: float) -> pa.Table:
    """Accepted near-dup edges (a, b) from one verified-pair block."""
    import pyarrow.compute as pc

    keep = pc.greater_equal(tbl["jaccard"], pa.scalar(thr))
    return tbl.select(["a", "b"]).filter(keep)


@ray.remote(num_returns=2)
def _exact_group_task(block_refs: list, k: int, nparts: int
                      ) -> tuple[pa.Table, pa.Table]:
    """Exact-dedup groups + member→rep edges for sha-prefix partition
    ``k`` of the slim catalog.

    Blocks are sha-sorted single-chunk tables
    (``_sort_catalog_block_task``), so the partition's rows come out of
    each block as ONE binary search + zero-copy slice — total
    extraction traffic across all tasks is one pass over the catalog,
    not nparts passes. Groups within a partition are globally exact (a
    sha lives entirely in one prefix range); concatenating task outputs
    in partition order yields a globally sha-sorted group table with no
    driver sort at all (the reference's global upsert-merge A2,
    lib/dbManager.cpp:274-281, re-expressed as range-partitioned
    reduces)."""
    lo, hi = _sha_range_bounds(k, nparts)
    lo_a = np.array([lo], dtype="S64")
    hi_a = None if hi is None else np.array([hi], dtype="S64")
    ss_l, ff_l = [], []
    # one batch get — per-ref gets cost ~0.2 ms each in-task even for
    # local objects (see _expand_range_task)
    for t in ray.get(block_refs):
        s = _sha_s64(t["content_sha256"])
        i0 = int(np.searchsorted(s, lo_a)[0])
        i1 = len(s) if hi_a is None else int(np.searchsorted(s, hi_a)[0])
        if i1 > i0:
            ss_l.append(s[i0:i1])
            ff_l.append(neardup._i64_view(t["file_id"])[i0:i1])
    empty_groups = pa.table({
        "content_sha256": pa.array([], pa.string()),
        "file_id": pa.array([], pa.int64()),
        "dup_count": pa.array([], pa.int64())})
    empty_edges = pa.table({"a": pa.array([], pa.int64()),
                            "b": pa.array([], pa.int64())})
    if not ss_l:
        return empty_groups, empty_edges
    ss = np.concatenate(ss_l)
    ff = np.concatenate(ff_l)
    order = np.lexsort((ff, ss))
    ss, ff = ss[order], ff[order]
    new = np.ones(len(ss), dtype=bool)
    if len(ss) > 1:
        new[1:] = ss[1:] != ss[:-1]
    starts = np.flatnonzero(new)
    counts = np.diff(np.append(starts, len(ss)))
    groups = pa.table({
        "content_sha256": pa.array(ss[starts].astype("U64")),
        "file_id": pa.array(ff[starts]),
        "dup_count": pa.array(counts.astype(np.int64))})
    # member→rep edges: the first fid of each run is the rep (min —
    # fid-sorted within sha); every other run member gets one edge
    reps_per_row = ff[starts][np.cumsum(new) - 1]
    member = np.ones(len(ff), dtype=bool)
    member[starts] = False
    if not member.any():
        return groups, empty_edges
    return groups, pa.table({"a": pa.array(reps_per_row[member]),
                             "b": pa.array(ff[member])})


def _edges_from_rep_groups(groups: ray.data.Dataset) -> ray.data.Dataset:
    """member→rep edge expansion from a fused rep_groups output (the
    past-the-broadcast-gate fallback)."""

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

    return groups.select_columns(["file_id", "members"]).map_batches(
        expand, batch_format="pyarrow")


class NearDupPipeline:
    def __init__(self, docs: ray.data.Dataset,
                 cfg: PipelineConfig | None = None,
                 materialize: bool = True,
                 checkpoint_dir: str | None = None):
        import data_deduplication_service_ray as _pkg

        _pkg.configure_context()
        self.cfg = cfg or PipelineConfig()
        self._raw = docs
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

    _sha_s64 = staticmethod(_sha_s64)

    def sha_fid(self) -> ray.data.Dataset:
        """Materialized slim catalog (content_sha256, file_id) — ONE
        corpus scan + hash pass, reused by the exact grouping, the edge
        expansion and the cluster node listing (~72 B/row, so it stays
        object-store-cheap even at 10^9 files)."""
        return self._stage(
            "sha_fid",
            lambda: self.normalized().select_columns(
                ["content_sha256", "file_id"]))

    def file_groups(self) -> ray.data.Dataset:
        """(content_sha256, file_id=min member, dup_count): exact
        whole-file dedup groups from the SLIM catalog — content never
        rides this shuffle (the round-1 shape shuffled ~the whole corpus
        through one groupby carrying content + member lists + Python
        per-group aggregates; the slim catalog + broadcast views below
        replace it). Below ``DRIVER_GROUP_LIMIT`` rows the grouping is a
        single driver-side np.lexsort; past it, a distributed groupby of
        native (vectorized) aggregates."""

        def build() -> ray.data.Dataset:
            sf = self.sha_fid()
            n = sf.count()
            if n <= TASK_GROUP_LIMIT:
                tbl = pa.concat_tables(sf.iter_batches(
                    batch_format="pyarrow", batch_size=None))
                shas = self._sha_s64(tbl["content_sha256"])
                fids = np.asarray(tbl["file_id"].to_numpy(
                    zero_copy_only=False), dtype=np.int64)
                order = np.lexsort((fids, shas))
                ss, ff = shas[order], fids[order]
                new = np.ones(len(ss), dtype=bool)
                if len(ss) > 1:
                    new[1:] = ss[1:] != ss[:-1]
                starts = np.flatnonzero(new)
                counts = np.diff(np.append(starts, len(ss)))
                return ray.data.from_arrow(pa.table({
                    "content_sha256": pa.array(ss[starts].astype("U64")),
                    "file_id": pa.array(ff[starts]),
                    "dup_count": pa.array(counts.astype(np.int64))}))
            if n <= DRIVER_GROUP_LIMIT:
                # sha-prefix-partitioned group+edge tasks over the
                # catalog's block refs (zero driver bytes; see
                # TASK_GROUP_LIMIT). Partition count is sized to the
                # cluster; the output row set and order are partition-
                # count independent (ranges are contiguous in sha order)
                import ray as _ray

                refs = [_sort_catalog_block_task.remote(r)
                        for r in sf.to_arrow_refs()]
                try:
                    cpus = int(_ray.cluster_resources().get("CPU", 8))
                except Exception:
                    cpus = 8
                nparts = min(64, max(8, 2 * cpus))
                outs = [_exact_group_task.remote(refs, k, nparts)
                        for k in range(nparts)]
                self._exact_group_refs = [g for g, _e in outs]
                self._exact_edge_refs = [e for _g, e in outs]
                return ray.data.from_arrow_refs(self._exact_group_refs)
            from ray.data.aggregate import Count, Min

            return sf.groupby("content_sha256").aggregate(
                Min("file_id", alias_name="file_id"),
                Count(alias_name="dup_count"))

        return self._stage("file_groups", build)

    def _rep_ids(self) -> np.ndarray | None:
        """Sorted representative file_ids for the broadcast id-filter;
        None when the group map exceeds the broadcast gate. On the
        task-partitioned path this pulls ONLY the int64 id column from
        the group tasks' outputs (zero-copy plasma reads, ~8 B/group)
        instead of the full sha→rep map."""
        self.file_groups()
        refs = getattr(self, "_exact_group_refs", None)
        if refs is not None:
            import ray as _ray

            # one batch get (one resolution pass, zero-copy views) —
            # the per-ref loop paid ~0.2 ms of driver serial time per
            # partition even for local objects
            cols = [np.asarray(t["file_id"].to_numpy(
                zero_copy_only=False), dtype=np.int64)
                for t in _ray.get(list(refs))]
            return np.sort(np.concatenate(cols)) if cols else (
                np.empty(0, dtype=np.int64))
        gm = self._group_map()
        return None if gm is None else np.sort(gm[1])

    def _group_map(self) -> tuple[np.ndarray, np.ndarray] | None:
        """Driver copy of (sorted sha:S64, rep file_id) while the group
        map fits ``REP_BROADCAST_LIMIT``; None past the gate. Memoized —
        representatives() and exact_edges() share one pull."""
        if not hasattr(self, "_gm_cache"):
            fg = self.file_groups()
            if fg.count() > REP_BROADCAST_LIMIT:
                self._gm_cache = None
            else:
                tbl = pa.concat_tables(fg.iter_batches(
                    batch_format="pyarrow", batch_size=None))
                shas = self._sha_s64(tbl["content_sha256"])
                reps = np.asarray(
                    tbl["file_id"].to_numpy(zero_copy_only=False),
                    dtype=np.int64)
                order = np.argsort(shas)
                self._gm_cache = (shas[order], reps[order])
        return self._gm_cache

    def representatives(self) -> ray.data.Dataset:
        """One (file_id, content) row per distinct content.

        Broadcast id-filter over the RAW input: the sorted rep-id array
        rides into every scan task once (``ray.put``) and content flows
        straight from the parquet scan into the signature/content
        consumers — content never enters a shuffle. A second columnar
        scan is strictly cheaper than an all-to-all shuffle of the same
        bytes. Past ``REP_BROADCAST_LIMIT`` distinct contents, falls
        back to the fused ``exact.rep_groups`` shuffle (content rides
        the groupby exactly once)."""

        def build() -> ray.data.Dataset:
            rep_ids = self._rep_ids()
            if rep_ids is None:
                return exact.rep_groups(self.normalized()).select_columns(
                    ["file_id", "content"])
            import ray as _ray

            handle = _ray.put(rep_ids)

            def keep(batch: pa.Table) -> pa.Table:
                rep = _ray.get(handle)
                if batch.num_rows == 0 or len(rep) == 0:
                    return batch.slice(0, 0)
                f = np.asarray(batch["file_id"].to_numpy(
                    zero_copy_only=False), dtype=np.int64)
                pos = np.minimum(np.searchsorted(rep, f), len(rep) - 1)
                return batch.filter(pa.array(rep[pos] == f))

            return (self._raw.select_columns(["file_id", "content"])
                    .map_batches(keep, batch_format="pyarrow"))

        return self._stage("representatives", build)

    def exact_edges(self) -> ray.data.Dataset:
        """member→representative edges inside exact-dup groups, via the
        broadcast sha→rep map over the slim catalog (no shuffle); fused
        rep_groups expansion past the broadcast gate."""

        def build() -> ray.data.Dataset:
            self.file_groups()
            edge_refs = getattr(self, "_exact_edge_refs", None)
            if edge_refs is not None:
                # edges were computed inside the exact group tasks —
                # no sha→rep broadcast, no second catalog pass
                return ray.data.from_arrow_refs(edge_refs)
            gm = self._group_map()
            if gm is None:
                return _edges_from_rep_groups(
                    exact.rep_groups(self.normalized()))
            import ray as _ray

            handle = _ray.put(gm)

            def emit(batch: pa.Table) -> pa.Table:
                rshas, rreps = _ray.get(handle)
                if batch.num_rows == 0 or len(rshas) == 0:
                    return pa.table({"a": pa.array([], pa.int64()),
                                     "b": pa.array([], pa.int64())})
                sh = np.array(batch["content_sha256"].to_pylist(),
                              dtype="S64")
                fid = np.asarray(batch["file_id"].to_numpy(
                    zero_copy_only=False), dtype=np.int64)
                reps = rreps[np.searchsorted(rshas, sh)]
                keep = reps != fid
                return pa.table({"a": pa.array(reps[keep]),
                                 "b": pa.array(fid[keep])})

            return self.sha_fid().map_batches(emit,
                                              batch_format="pyarrow")

        return self._stage("exact_edges", build, mat=False)

    # -- near-dup layer ---------------------------------------------------

    def signatures(self) -> ray.data.Dataset:
        def build() -> ray.data.Dataset:
            # split (few, large) upstream blocks so the CPU-heavy
            # signature stage gets FINE task granularity: blocks are
            # split by row count but document bytes are skewed, and at
            # 2 blocks/slot a straggler task (observed 1.7-8.8 s spread)
            # idles half the wave — 8 blocks/slot packs around the skew.
            # ONLY when blocks are genuinely coarse: Ray 2.49 funnels
            # even a shuffle=False repartition through a single serial
            # RepartitionReduce task (measured 10.2 s for a 1.56 GB
            # 128-block input that needed no splitting at all), so a
            # well-partitioned input must skip it.
            from ray.data.dataset import MaterializedDataset

            reps = self.representatives()
            target = 8 * neardup._pool_max(self.cfg)
            if isinstance(reps, MaterializedDataset):
                # tiny corpora must not be over-split: a block below
                # one signature batch (sig_batch_size rows) only adds
                # scheduling overhead (observed +0.6 s at 5k docs x 32
                # CPUs from splitting to 256 blocks of ~20 rows)
                target = min(target, max(
                    1, reps.count() // self.cfg.sig_batch_size))
            # num_blocks() only exists on materialized datasets; a lazy
            # input (checkpoint read-back) keeps the conservative split
            if target > 1 and (not isinstance(reps, MaterializedDataset)
                               or reps.num_blocks() < target // 2):
                reps = reps.repartition(target, shuffle=False)
            return neardup.signatures(reps, self.cfg)

        return self._stage("signatures", build)

    def candidate_pairs(self) -> ray.data.Dataset:
        """Estimate-filtered distinct candidate pairs when the fused
        expand+estimate gates apply (``candidate_pairs_estimated`` —
        schema a, b, n_bands, capped, est, hamming), else raw per-band
        occurrences; ``verified_pairs`` dispatches on the schema (an
        ``est`` column means prefiltered), which also survives
        checkpoint resume where the build closure never runs."""

        def build() -> ray.data.Dataset:
            ds, _estimated = neardup.candidate_pairs_estimated(
                self.signatures(), self.cfg)
            return ds

        # materialized: the bucket groupby and the survivor-dedup groupby
        # (inside verified_pairs) must not share one streaming graph —
        # two live hash-aggregate operators stack their aggregator
        # reservations and thrash on a small machine
        return self._stage("candidate_pairs", build)

    def verified_pairs(self) -> ray.data.Dataset:
        def build() -> ray.data.Dataset:
            cand = self.candidate_pairs()
            if "est" in cand.schema().names:
                return neardup.verify_pairs(
                    cand, self.representatives(), self.cfg,
                    prefiltered=True)
            return neardup.verify_pairs(
                cand, self.representatives(), self.cfg,
                sigs=self.signatures(), occurrences=True)

        return self._stage("verified_pairs", build)

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
            labels = self._raw_task_labels() if method in (
                "auto", "unionfind") else None
            if labels is not None:
                nodes = self.sha_fid().select_columns(["file_id"])
                return cl.attach_singletons(
                    labels, nodes, num_partitions=join_parts(self.cfg))
            # materialized: the auto-gate count() and the chosen
            # clustering method both consume the edge set — without the
            # barrier the lazy union would re-execute per consumer
            edges = self.edges().materialize()
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

            # all node ids come from the MATERIALIZED slim catalog —
            # attaching via normalized() would re-read the corpus and
            # re-hash content just to list ids
            nodes = self.sha_fid().select_columns(["file_id"])
            return cl.attach_singletons(
                labels, nodes, num_partitions=join_parts(self.cfg))

        return self._stage(f"clusters_{method}", build, mat=False)

    def _raw_task_labels(self) -> ray.data.Dataset | None:
        """Duplicate-cluster labels with ZERO executor spin-ups: near
        edges are filtered from the materialized verified-pair blocks by
        raw tasks, exact edges come straight from the exact group tasks'
        outputs, and the vectorized connected-components core runs on
        the pulled arrays (edges ∝ duplicate population, tiny after
        verification). Returns None when the preconditions don't hold
        (no task-path exact edges, lazy verified set, or an edge count
        past ``unionfind_edge_limit`` — the distributed label
        propagation path handles those)."""
        from ray.data.dataset import MaterializedDataset

        self.file_groups()
        exact_refs = getattr(self, "_exact_edge_refs", None)
        verified = self.verified_pairs()
        if exact_refs is None or not isinstance(verified,
                                                MaterializedDataset):
            return None
        import ray as _ray

        thr = self.cfg.jaccard_threshold
        near_tabs = _ray.get([
            _near_edge_task.remote(r, thr)
            for r in verified.to_arrow_refs()])
        exact_tabs = _ray.get(list(exact_refs))
        a_l, b_l = [], []
        for t in near_tabs + exact_tabs:
            if t.num_rows:
                a_l.append(np.asarray(t["a"].to_numpy(
                    zero_copy_only=False), dtype=np.int64))
                b_l.append(np.asarray(t["b"].to_numpy(
                    zero_copy_only=False), dtype=np.int64))
        a = np.concatenate(a_l) if a_l else np.empty(0, dtype=np.int64)
        b = np.concatenate(b_l) if b_l else np.empty(0, dtype=np.int64)
        if len(a) > self.cfg.unionfind_edge_limit:
            return None
        return ray.data.from_arrow(cl.cc_min_labels(a, b))

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

    # -- incremental delete (reference D1-D3 at the north-star layer) ----

    def delete_files_incremental(self, delete_ids
                                 ) -> dict[str, ray.data.Dataset]:
        """Propagate a deleted id set through signatures / verified
        pairs / clusters WITHOUT recomputing untouched work (the
        reference's delete path D1-D3, lib/dbManager.cpp:92-161, lifted
        to the near-dup layer; ``without_files`` remains the
        recompute-from-lineage alternative).

        Semantics (pytest-gated parity vs full recompute):
        - a deleted REPRESENTATIVE whose exact-dup group survives is
          SUCCEEDED by the group's new min member — identical content,
          so its signature row and verified pairs are the recomputed
          ones with only the id rewritten (minhash/jaccard are pure
          functions of content);
        - signatures/pairs: anti-join of dead ids + successor remap
          (pairs renormalized a < b; all score columns are symmetric);
        - clusters: ONLY clusters containing a deleted id relabel — the
          affected subgraph's surviving (remapped) edges re-run
          ``cc_min_labels``; every other row of the label table passes
          through untouched. All driver pulls are bounded by the delete
          batch + affected-cluster population, never the corpus.

        Exactness caveat (documented, mirrored by the parity test): a
        CAPPED hot bucket's window edges depend on bucket membership,
        so incremental == recompute only when no contributing bucket
        was capped (the ``capped`` flag makes violations visible).
        Returns {"signatures", "verified_pairs", "clusters"}.
        """
        import pyarrow.compute as pc

        d_sorted = sorted({int(x) for x in delete_ids})
        d_arr = pa.array(d_sorted, pa.int64())
        d_np = np.array(d_sorted, dtype=np.int64)

        def _pull(ds, empty: pa.Table | None = None) -> pa.Table:
            tabs = list(ds.iter_batches(batch_format="pyarrow",
                                        batch_size=None))
            if tabs:
                return pa.concat_tables(tabs)
            if empty is not None:   # schema() can be None for a fully-
                return empty        # filtered lazy chain (0 near edges)
            return ds.schema().base_schema.empty_table()

        def _in(col, value_set):
            return pc.is_in(col, value_set=value_set)

        # ---- successor map: deleted reps -> new min surviving member
        doomed = _pull(self.file_groups().map_batches(
            lambda t: t.filter(_in(t["file_id"], d_arr)),
            batch_format="pyarrow"))
        succ_from, succ_to = [], []
        if doomed.num_rows:
            sha_set = doomed["content_sha256"].combine_chunks()
            members = _pull(self.sha_fid().map_batches(
                lambda t: t.filter(_in(t["content_sha256"], sha_set)),
                batch_format="pyarrow"))
            by_sha: dict[str, list[int]] = {}
            for sha, fid in zip(members["content_sha256"].to_pylist(),
                                members["file_id"].to_pylist()):
                by_sha.setdefault(sha, []).append(fid)
            dset = set(d_sorted)
            for sha, rep in zip(doomed["content_sha256"].to_pylist(),
                                doomed["file_id"].to_pylist()):
                surv = sorted(m for m in by_sha.get(sha, ())
                              if m not in dset)
                if surv:
                    succ_from.append(rep)
                    succ_to.append(surv[0])
        sf_np = np.array(succ_from, dtype=np.int64)
        st_np = np.array(succ_to, dtype=np.int64)
        order = np.argsort(sf_np)
        sf_np, st_np = sf_np[order], st_np[order]

        def _remap(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
            """(mapped ids, alive mask): successors substituted, dead
            ids (deleted without successor) flagged."""
            mapped = ids.copy()
            alive = np.ones(len(ids), dtype=bool)
            if len(d_np):
                pos = np.searchsorted(d_np, ids)
                posc = np.minimum(pos, len(d_np) - 1)
                deleted = d_np[posc] == ids
                if len(sf_np):
                    sp = np.minimum(np.searchsorted(sf_np, ids),
                                    len(sf_np) - 1)
                    has_succ = (sf_np[sp] == ids) & deleted
                    mapped[has_succ] = st_np[sp[has_succ]]
                    alive &= ~(deleted & ~has_succ)
                else:
                    alive &= ~deleted
            return mapped, alive

        # ---- signatures: drop dead, remap succeeded reps ------------
        def sig_fix(batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch["file_id"].to_numpy(
                zero_copy_only=False), dtype=np.int64)
            mapped, alive = _remap(ids)
            out = batch.set_column(
                batch.schema.get_field_index("file_id"), "file_id",
                pa.array(mapped))
            return out.filter(pa.array(alive))

        new_sigs = self.signatures().map_batches(
            sig_fix, batch_format="pyarrow")

        # ---- verified pairs: remap endpoints, renormalize a < b -----
        def pair_fix(batch: pa.Table) -> pa.Table:
            a = np.asarray(batch["a"].to_numpy(zero_copy_only=False),
                           dtype=np.int64)
            b = np.asarray(batch["b"].to_numpy(zero_copy_only=False),
                           dtype=np.int64)
            ma, ka = _remap(a)
            mb, kb = _remap(b)
            keep = ka & kb & (ma != mb)
            lo = np.minimum(ma, mb)[keep]
            hi = np.maximum(ma, mb)[keep]
            out = batch.filter(pa.array(keep))
            ia = out.schema.get_field_index("a")
            out = out.set_column(ia, "a", pa.array(lo))
            ib = out.schema.get_field_index("b")
            return out.set_column(ib, "b", pa.array(hi))

        new_pairs = self.verified_pairs().map_batches(
            pair_fix, batch_format="pyarrow")

        # ---- clusters: relabel ONLY clusters touching a deleted id --
        labels = self.clusters().materialize()
        hit = _pull(labels.map_batches(
            lambda t: t.filter(_in(t["file_id"], d_arr)),
            batch_format="pyarrow"))
        aff_cids = pa.array(
            sorted(set(hit["cluster_id"].to_pylist())), pa.int64())
        aff_rows = _pull(labels.map_batches(
            lambda t: t.filter(_in(t["cluster_id"], aff_cids)),
            batch_format="pyarrow"))
        aff_nodes = np.sort(np.asarray(
            aff_rows["file_id"].to_numpy(zero_copy_only=False),
            dtype=np.int64))

        def _edge_sel(ds) -> pa.Table:
            node_arr = pa.array(aff_nodes)
            return _pull(ds.map_batches(
                lambda t: t.filter(pc.or_(_in(t["a"], node_arr),
                                          _in(t["b"], node_arr))),
                batch_format="pyarrow"),
                empty=pa.table({"a": pa.array([], pa.int64()),
                                "b": pa.array([], pa.int64())}))

        near_e = _edge_sel(self.near_edges().select_columns(["a", "b"]))
        exact_e = _edge_sel(self.exact_edges())
        etab = pa.concat_tables([near_e, exact_e])
        ea = np.asarray(etab["a"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        eb = np.asarray(etab["b"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        ma, ka = _remap(ea)
        mb, kb = _remap(eb)
        keep = ka & kb & (ma != mb)
        relabeled = cl.cc_min_labels(ma[keep], mb[keep])
        labeled_ids = set(relabeled["file_id"].to_pylist())
        # surviving affected nodes in POST-remap id space: a succeeded
        # rep contributes its successor (already a member), dead ids
        # drop out
        node_map, node_alive = _remap(aff_nodes)
        survivors = np.unique(node_map[node_alive])
        singles = [int(x) for x in survivors
                   if int(x) not in labeled_ids]
        aff_out = pa.concat_tables([relabeled, pa.table({
            "file_id": pa.array(singles, pa.int64()),
            "cluster_id": pa.array(singles, pa.int64())})])
        untouched = labels.map_batches(
            lambda t: t.filter(pc.invert(_in(t["cluster_id"],
                                             aff_cids))),
            batch_format="pyarrow")
        new_labels = untouched.union(ray.data.from_arrow(aff_out))

        return {"signatures": new_sigs, "verified_pairs": new_pairs,
                "clusters": new_labels}

    def add_files_incremental(self, new_docs: ray.data.Dataset
                              ) -> dict[str, ray.data.Dataset]:
        """Incremental INGEST at the near-dup layer — the reference's
        write path (S2 ingest + D5 idempotent re-run,
        include/FileService.h:359-427) lifted to signatures / pairs /
        clusters: a new document batch updates the three artifacts
        without recomputing the existing corpus.

        Semantics (pytest-gated full-schema parity vs recompute):
        - exact layer: a new doc whose content already exists joins its
          group; if its id undercuts the group's representative the rep
          is PROMOTED (old rep id rewritten everywhere — identical
          content, the mirror image of delete's succession);
        - signatures: computed ONLY for genuinely new contents; old
          rows pass through (promoted ids rewritten);
        - candidate pairs: only buckets CONTAINING a new doc are
          touched — new band hashes broadcast as a semi-join filter
          over ONE pass of the existing signature table (no content
          scan, no all-pairs); expansion/estimate/verify reuse the
          pipeline kernels so n_bands/est/hamming/jaccard/contained
          match the recomputed values bit-for-bit;
        - clusters: only clusters touching a new edge relabel.

        Exactness caveat (same as delete, documented + asserted absent
        in the parity fixture): a CAPPED bucket's window edges among
        OLD members can shift when new members land in it. Driver
        pulls are bounded by the new batch + touched buckets +
        affected clusters. Returns {"signatures", "verified_pairs",
        "clusters"}."""
        import pyarrow.compute as pc

        from data_deduplication_service_ray.functions import minhash as mh

        cfg = self.cfg

        def _pull(ds, empty: pa.Table | None = None) -> pa.Table:
            tabs = list(ds.iter_batches(batch_format="pyarrow",
                                        batch_size=None))
            if tabs:
                return pa.concat_tables(tabs)
            if empty is not None:   # schema() can be None for a fully-
                return empty        # filtered lazy chain (0 near edges)
            return ds.schema().base_schema.empty_table()

        # ---- 0. normalize the new batch (batch-bounded pull) --------
        newn = normalize.normalize(
            new_docs.select_columns(["file_id", "content"]))
        ntabs = [t for t in newn.iter_batches(batch_format="pyarrow",
                                              batch_size=None)
                 if t.num_rows]
        if not ntabs:      # nothing survives the empty-content guard
            return {"signatures": self.signatures(),
                    "verified_pairs": self.verified_pairs(),
                    "clusters": self.clusters()}
        ntbl = pa.concat_tables(ntabs)
        new_ids_all = np.asarray(ntbl["file_id"].to_numpy(
            zero_copy_only=False), dtype=np.int64)
        new_sha = ntbl["content_sha256"].to_pylist()
        new_content = ntbl["content"].to_pylist()
        content_by_id = dict(zip(new_ids_all.tolist(), new_content))

        by_sha: dict[str, list[int]] = {}
        for fid, sha in zip(new_ids_all.tolist(), new_sha):
            by_sha.setdefault(sha, []).append(fid)

        sha_arr = pa.array(sorted(by_sha), pa.string())
        old_groups = _pull(self.file_groups().map_batches(
            lambda t: t.filter(pc.is_in(t["content_sha256"],
                                        value_set=sha_arr)),
            batch_format="pyarrow"),
            empty=pa.table({"content_sha256": pa.array([], pa.string()),
                            "file_id": pa.array([], pa.int64()),
                            "dup_count": pa.array([], pa.int64())}))
        old_rep_of = dict(zip(old_groups["content_sha256"].to_pylist(),
                              old_groups["file_id"].to_pylist()))

        promote: dict[int, int] = {}      # old rep id -> smaller new id
        new_rep_rows: list[tuple[int, str]] = []   # content-new reps
        verify_extra_rows: list[tuple[int, str]] = []  # promoted ids
        exact_new: list[tuple[int, int]] = []
        for sha, members in by_sha.items():
            m0 = min(members)
            if sha in old_rep_of:
                r_old = old_rep_of[sha]
                rep = min(r_old, m0)
                if rep != r_old:
                    promote[r_old] = rep
                    exact_new.append((rep, r_old))
                    verify_extra_rows.append((rep, content_by_id[rep]))
            else:
                rep = m0
                new_rep_rows.append((rep, content_by_id[rep]))
            for m in members:
                if m != rep:
                    exact_new.append((rep, m))

        pf_np = np.array(sorted(promote), dtype=np.int64)
        pt_np = np.array([promote[k] for k in sorted(promote)],
                         dtype=np.int64)

        def _promote_ids(ids: np.ndarray) -> np.ndarray:
            if not len(pf_np) or not len(ids):
                return ids
            pos = np.minimum(np.searchsorted(pf_np, ids), len(pf_np) - 1)
            hit = pf_np[pos] == ids
            out = ids.copy()
            out[hit] = pt_np[pos[hit]]
            return out

        # ---- 1. signatures ------------------------------------------
        def sig_fix(batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch["file_id"].to_numpy(
                zero_copy_only=False), dtype=np.int64)
            return batch.set_column(
                batch.schema.get_field_index("file_id"), "file_id",
                pa.array(_promote_ids(ids)))

        sigs_old = self.signatures().map_batches(
            sig_fix, batch_format="pyarrow")
        new_sig_tbl = None
        content_type = ntbl.schema.field("content").type
        if new_rep_rows:
            nds = ray.data.from_arrow(pa.table({
                "file_id": pa.array([r for r, _ in new_rep_rows],
                                    pa.int64()),
                "content": pa.array([c for _, c in new_rep_rows],
                                    content_type)}))
            new_sig_tbl = _pull(neardup.signatures(nds, cfg))
            sigs_out = sigs_old.union(
                ray.data.from_arrow(new_sig_tbl))
        else:
            sigs_out = sigs_old

        # ---- 2. candidate pairs touching new contents ---------------
        ver_schema = pa.table({
            "a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
            "n_bands": pa.array([], pa.int64()),
            "capped": pa.array([], pa.bool_()),
            "est": pa.array([], pa.float64()),
            "hamming": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64()),
            "contained": pa.array([], pa.bool_())})
        new_verified: ray.data.Dataset | None = None
        if new_sig_tbl is not None and new_sig_tbl.num_rows:
            new_bands = neardup._bands_from_sigs(new_sig_tbl, cfg=cfg)
            nb_hash = np.unique(np.asarray(
                new_bands["band_hash"].to_numpy(zero_copy_only=False),
                dtype=np.int64))
            bh_handle = ray.put(nb_hash)

            def touched(batch: pa.Table) -> pa.Table:
                bt = neardup._bands_from_sigs(batch, cfg=cfg)
                hs = ray.get(bh_handle)
                h = np.asarray(bt["band_hash"].to_numpy(
                    zero_copy_only=False), dtype=np.int64)
                if not len(h) or not len(hs):
                    return bt.slice(0, 0)
                pos = np.minimum(np.searchsorted(hs, h), len(hs) - 1)
                return bt.filter(pa.array(hs[pos] == h))

            old_touched = _pull(
                self.signatures().map_batches(
                    touched, batch_format="pyarrow"),
                empty=pa.table({"band_hash": pa.array([], pa.int64()),
                                "file_id": pa.array([], pa.int64())}))
            bhs = np.concatenate([
                np.asarray(old_touched["band_hash"].to_numpy(
                    zero_copy_only=False), dtype=np.int64),
                np.asarray(new_bands["band_hash"].to_numpy(
                    zero_copy_only=False), dtype=np.int64)])
            fids = np.concatenate([
                np.asarray(old_touched["file_id"].to_numpy(
                    zero_copy_only=False), dtype=np.int64),
                np.asarray(new_bands["file_id"].to_numpy(
                    zero_copy_only=False), dtype=np.int64)])
            order = np.lexsort((fids, bhs))
            occ = neardup._expand_sorted_slice(
                bhs[order], fids[order], cfg.bucket_cap,
                cfg.bucket_window)
            a = np.asarray(occ["a"].to_numpy(zero_copy_only=False),
                           dtype=np.int64)
            b = np.asarray(occ["b"].to_numpy(zero_copy_only=False),
                           dtype=np.int64)
            cp = np.asarray(occ["capped"].to_numpy(
                zero_copy_only=False), dtype=np.int64)
            nr = np.sort(np.array([r for r, _ in new_rep_rows],
                                  dtype=np.int64))

            def _isin(x, s):
                if not len(s) or not len(x):
                    return np.zeros(len(x), dtype=bool)
                p = np.minimum(np.searchsorted(s, x), len(s) - 1)
                return s[p] == x

            keep = _isin(a, nr) | _isin(b, nr)   # old-old already known
            a, b, cp = a[keep], b[keep], cp[keep]
            # promoted content pairs carry the promoted rep id
            a = _promote_ids(a)
            b = _promote_ids(b)
            lo, hi = np.minimum(a, b), np.maximum(a, b)
            # distinct + n_bands + capped-any (ids span the full int64
            # range: structured unique over the 2-col stack)
            uniq, inv = np.unique(np.stack([lo, hi], axis=1), axis=0,
                                  return_inverse=True)
            n_bands = np.zeros(len(uniq), dtype=np.int64)
            np.add.at(n_bands, inv, 1)
            capped_any = np.zeros(len(uniq), dtype=np.int64)
            np.add.at(capped_any, inv, cp)
            ua, ub = uniq[:, 0], uniq[:, 1]
            if len(ua):
                # est/hamming from the involved signatures only
                inv_ids = np.unique(np.concatenate([ua, ub]))
                id_arr = pa.array(inv_ids)

                def keep_inv(batch: pa.Table) -> pa.Table:
                    return batch.filter(pc.is_in(batch["file_id"],
                                                 value_set=id_arr))

                inv_old = _pull(
                    self.signatures().map_batches(
                        sig_fix, batch_format="pyarrow").map_batches(
                        keep_inv, batch_format="pyarrow"),
                    empty=new_sig_tbl.schema.empty_table())
                inv_tbl = pa.concat_tables(
                    [inv_old,
                     keep_inv(new_sig_tbl)]).combine_chunks()
                sids = np.asarray(inv_tbl["file_id"].to_numpy(
                    zero_copy_only=False), dtype=np.int64)
                sorter = np.argsort(sids)
                sids = sids[sorter]
                mat = np.asarray(
                    inv_tbl["minhash"].combine_chunks().flatten()
                    .to_numpy(zero_copy_only=False),
                    dtype=np.int64).view(np.uint64).reshape(
                        inv_tbl.num_rows, cfg.num_perms)[sorter]
                nsh = np.asarray(inv_tbl["n_shingles"].to_numpy(
                    zero_copy_only=False), dtype=np.int64)[sorter]
                sim = np.asarray(inv_tbl["simhash"].to_numpy(
                    zero_copy_only=False),
                    dtype=np.int64).view(np.uint64)[sorter]
                packed = neardup._pack_nibbles(
                    mat.astype(np.uint8)).view(np.uint64)
                ia = np.searchsorted(sids, ua)
                ib = np.searchsorted(sids, ub)
                est = (neardup._nibble_eq_counts(
                    packed[ia], packed[ib], cfg.num_perms)
                    / cfg.num_perms)
                cut = neardup._pair_cut_arrays(nsh[ia], nsh[ib], cfg)
                ham = mh.hamming64(sim[ia], sim[ib])
                k2 = est >= cut
                cand_tbl = pa.table({
                    "a": pa.array(ua[k2]), "b": pa.array(ub[k2]),
                    "n_bands": pa.array(n_bands[k2]),
                    "capped": pa.array(capped_any[k2] > 0),
                    "est": pa.array(est[k2], pa.float64()),
                    "hamming": pa.array(ham[k2].astype(np.int64))})
                if cand_tbl.num_rows:
                    # attach contents directly (bounded by the
                    # candidate batch) and run the verify KERNEL — the
                    # same VerifyStage scoring the pipeline uses,
                    # without routing a batch-sized pair table through
                    # the join machinery (whose empty partitions break
                    # Ray 2.49 joins under GRAFT_FORCE_DISTRIBUTED)
                    lookup = {r: c for r, c in (new_rep_rows
                                                + verify_extra_rows)}
                    pend = np.unique(np.concatenate(
                        [np.asarray(cand_tbl["a"]),
                         np.asarray(cand_tbl["b"])]))
                    need_old = pa.array(
                        [int(x) for x in pend
                         if int(x) not in lookup], pa.int64())

                    def keep_need(batch: pa.Table) -> pa.Table:
                        return batch.filter(pc.is_in(
                            batch["file_id"], value_set=need_old))

                    got = _pull(
                        self.representatives().map_batches(
                            keep_need, batch_format="pyarrow"),
                        empty=pa.table({
                            "file_id": pa.array([], pa.int64()),
                            "content": pa.array([], content_type)}))
                    lookup.update(zip(got["file_id"].to_pylist(),
                                      got["content"].to_pylist()))
                    att = cand_tbl.append_column(
                        "content_a", pa.array(
                            [lookup[x] for x in
                             cand_tbl["a"].to_pylist()], content_type))
                    att = att.append_column(
                        "content_b", pa.array(
                            [lookup[x] for x in
                             cand_tbl["b"].to_pylist()], content_type))
                    new_verified = ray.data.from_arrow(
                        neardup.verify_batch(att, cfg=cfg))
        if new_verified is None:
            new_verified = ray.data.from_arrow(ver_schema)

        # old verified pairs: promoted rep ids rewritten (symmetric
        # score columns; a<b renormalized)
        def pair_fix(batch: pa.Table) -> pa.Table:
            a = np.asarray(batch["a"].to_numpy(zero_copy_only=False),
                           dtype=np.int64)
            b = np.asarray(batch["b"].to_numpy(zero_copy_only=False),
                           dtype=np.int64)
            ma, mb = _promote_ids(a), _promote_ids(b)
            lo, hi = np.minimum(ma, mb), np.maximum(ma, mb)
            out = batch.set_column(batch.schema.get_field_index("a"),
                                   "a", pa.array(lo))
            return out.set_column(out.schema.get_field_index("b"),
                                  "b", pa.array(hi))

        verified_out = self.verified_pairs().map_batches(
            pair_fix, batch_format="pyarrow").union(new_verified)

        # ---- 3. clusters: relabel only touched clusters -------------
        thr = cfg.jaccard_threshold
        nv = _pull(new_verified)
        near_a = np.asarray(nv["a"].to_numpy(zero_copy_only=False),
                            dtype=np.int64)
        near_b = np.asarray(nv["b"].to_numpy(zero_copy_only=False),
                            dtype=np.int64)
        jac = np.asarray(nv["jaccard"].to_numpy(zero_copy_only=False),
                         dtype=np.float64)
        ea_new = np.concatenate([near_a[jac >= thr],
                                 np.array([x for x, _ in exact_new],
                                          dtype=np.int64)])
        eb_new = np.concatenate([near_b[jac >= thr],
                                 np.array([y for _, y in exact_new],
                                          dtype=np.int64)])

        labels = self.clusters().materialize()
        endpoints = np.unique(np.concatenate([ea_new, eb_new])) \
            if len(ea_new) else np.empty(0, dtype=np.int64)
        ep_arr = pa.array(endpoints)
        hit = _pull(labels.map_batches(
            lambda t: t.filter(pc.is_in(t["file_id"],
                                        value_set=ep_arr)),
            batch_format="pyarrow"))
        aff_cids = pa.array(sorted(set(hit["cluster_id"].to_pylist())),
                            pa.int64())
        aff_rows = _pull(labels.map_batches(
            lambda t: t.filter(pc.is_in(t["cluster_id"],
                                        value_set=aff_cids)),
            batch_format="pyarrow"))
        aff_nodes = np.sort(np.asarray(aff_rows["file_id"].to_numpy(
            zero_copy_only=False), dtype=np.int64))
        node_arr = pa.array(aff_nodes)

        def _edge_sel(ds) -> pa.Table:
            return _pull(ds.map_batches(
                lambda t: t.filter(pc.or_(
                    pc.is_in(t["a"], value_set=node_arr),
                    pc.is_in(t["b"], value_set=node_arr))),
                batch_format="pyarrow"),
                empty=pa.table({"a": pa.array([], pa.int64()),
                                "b": pa.array([], pa.int64())}))

        old_near = _edge_sel(self.near_edges().select_columns(
            ["a", "b"]))
        old_exact = _edge_sel(self.exact_edges())
        ea = np.concatenate([
            np.asarray(old_near["a"].to_numpy(zero_copy_only=False),
                       dtype=np.int64),
            np.asarray(old_exact["a"].to_numpy(zero_copy_only=False),
                       dtype=np.int64), ea_new])
        eb = np.concatenate([
            np.asarray(old_near["b"].to_numpy(zero_copy_only=False),
                       dtype=np.int64),
            np.asarray(old_exact["b"].to_numpy(zero_copy_only=False),
                       dtype=np.int64), eb_new])
        relabeled = cl.cc_min_labels(ea, eb)
        labeled_ids = set(relabeled["file_id"].to_pylist())
        nodes_all = np.unique(np.concatenate([aff_nodes, new_ids_all]))
        singles = [int(x) for x in nodes_all
                   if int(x) not in labeled_ids]
        aff_out = pa.concat_tables([relabeled, pa.table({
            "file_id": pa.array(singles, pa.int64()),
            "cluster_id": pa.array(singles, pa.int64())})])
        untouched = labels.map_batches(
            lambda t: t.filter(pc.invert(pc.is_in(
                t["cluster_id"], value_set=aff_cids))),
            batch_format="pyarrow")
        clusters_out = untouched.union(ray.data.from_arrow(aff_out))

        return {"signatures": sigs_out, "verified_pairs": verified_out,
                "clusters": clusters_out}
