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

        def _pull(ds) -> pa.Table:
            tabs = list(ds.iter_batches(batch_format="pyarrow",
                                        batch_size=None))
            # all-filtered datasets yield zero batches; Ray's Schema
            # wrapper exposes the pyarrow schema as .base_schema
            return (pa.concat_tables(tabs) if tabs
                    else ds.schema().base_schema.empty_table())

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
                batch_format="pyarrow"))

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
