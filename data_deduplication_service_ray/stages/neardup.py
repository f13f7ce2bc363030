"""Near-duplicate detection stages: signatures, LSH banding, verification.

North-star pipeline (BASELINE.json): shingling -> MinHash(128)/LSH banding
-> SimHash-64 scoring -> substring containment -> pair verification. This
module holds the per-stage Ray Data transforms; ``pipelines.neardup``
composes them.

Scale notes (the parts the reference never had to solve, SURVEY.md §4):
- signatures/verification run as **task-based maps with per-process
  stage caches** (setup-once semantics; seed tables are microseconds to
  build, and tasks scale to every core with no pool ramp-up). The
  actor-pool form is kept behind ``use_actors=True`` for genuinely
  expensive per-worker state. The verifier's bounded per-process
  shingle cache re-shingles a document once per worker, not once per
  pair;
- content never rides through the LSH shuffle — bands carry
  ``(band_hash, file_id)`` only; content is attached strictly to
  estimate-surviving candidates (SURVEY.md §7.4 wide rows);
- hot buckets (boilerplate headers at 10^12-file scale) are **capped**:
  a bucket larger than ``bucket_cap`` emits a sorted-neighbor window of
  edges instead of all O(k²) pairs — connectivity for clustering is
  preserved, blowup is bounded, and the truncation is visible in the
  output (``capped`` column) rather than silent.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Max

from data_deduplication_service_ray.config import (PipelineConfig, gate,
                                                    join_parts)
from data_deduplication_service_ray.functions import minhash as mh
from data_deduplication_service_ray.functions.aggregates import CollectList
from data_deduplication_service_ray.stages.segment import shingle_array


def _as_i64(arr_u64: np.ndarray) -> pa.Array:
    """Reinterpret uint64 as int64 for Arrow/shuffle friendliness."""
    return pa.array(arr_u64.view(np.int64))


def fsb_from_matrix(mat: np.ndarray) -> pa.Array:
    """(n, w)-matrix -> FixedSizeBinaryArray built from the matrix's
    ONE contiguous buffer — no per-row ``tobytes()`` Python loop (that
    loop sat on exactly the past-the-broadcast-gate join path a big
    cluster runs). Row width = w x itemsize bytes."""
    n = mat.shape[0]
    width = int(mat.shape[1]) * mat.itemsize
    buf = pa.py_buffer(np.ascontiguousarray(mat).reshape(-1).view(
        np.uint8))
    return pa.Array.from_buffers(pa.binary(width), n, [None, buf])


def _i64_view(col) -> np.ndarray:
    """Zero-copy int64 view of a no-null column (Array or single-chunk
    ChunkedArray); copies only when it must. ``ChunkedArray.to_numpy``
    COPIES even single-chunk data — range tasks binary-searching every
    block paid nparts copies of the whole table through that (13.8 GB
    at 27M rows x 64 tasks)."""
    if isinstance(col, pa.ChunkedArray):
        if col.num_chunks == 1:
            col = col.chunk(0)
        else:
            return np.asarray(col.to_numpy(zero_copy_only=False),
                              dtype=np.int64)
    try:
        return np.asarray(col.to_numpy(zero_copy_only=True),
                          dtype=np.int64)
    except pa.ArrowInvalid:
        return np.asarray(col.to_numpy(zero_copy_only=False),
                          dtype=np.int64)


def fsb_to_matrix(col: pa.ChunkedArray, dtype) -> np.ndarray:
    """FixedSizeBinary column -> (n, w) matrix view, zero-copy."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    w = arr.type.byte_width
    raw = np.frombuffer(arr.buffers()[1], dtype=np.uint8,
                        count=n * w, offset=arr.offset * w)
    return raw.view(dtype).reshape(n, -1)


def _pool_max(cfg: PipelineConfig) -> int:
    """Actor-pool upper bound: explicit config, else every cluster CPU.

    Pools autoscale from 1 actor, so sizing to the cluster keeps the
    CPU-heavy stages from serializing on a fixed small pool (observed:
    a pool of 8 flat-lined throughput from 8→32 CPUs)."""
    if cfg.minhash_concurrency is not None:
        return cfg.minhash_concurrency
    try:
        import ray

        return max(2, int(ray.cluster_resources().get("CPU", 8)))
    except Exception:
        return 8


class SignatureStage:
    """Actor: (file_id, content) rows -> MinHash + SimHash signatures.

    Output schema: file_id:int64, minhash:list<int64>[num_perms],
    simhash:int64, n_shingles:int64. Seeds are derived in ``__init__``
    once per actor (reference analog: hash function resolved once per
    database, include/HashUtils.h:86-100).
    """

    def __init__(self, cfg: PipelineConfig):
        self.cfg = cfg
        self.seeds = mh.perm_seeds(cfg.num_perms, cfg.seed)

    def _shingle_sets(self, batch: pa.Table) -> list[np.ndarray]:
        if self.cfg.shingle_mode != "char":
            return [shingle_array(t, self.cfg)
                    for t in batch["content"].to_pylist()]
        # char mode shingles BYTES — slice the Arrow value buffer
        # directly (no Python str materialization, no re-encode; the
        # utf-8 bytes in the buffer are exactly what
        # shingle_array(text).encode() would produce)
        from data_deduplication_service_ray.functions.hashing import (
            kgram_hashes)

        arr = batch["content"].combine_chunks()
        off_buf, data_buf = arr.buffers()[1], arr.buffers()[2]
        if data_buf is None:          # all-empty column
            return [np.empty(0, dtype=np.uint64)] * len(arr)
        offs = np.frombuffer(off_buf, dtype=np.int32)[
            arr.offset:arr.offset + len(arr) + 1]
        mv = memoryview(data_buf)
        k = self.cfg.shingle_k
        return [kgram_hashes(mv[offs[i]:offs[i + 1]], k)
                for i in range(len(arr))]

    def __call__(self, batch: pa.Table) -> pa.Table:
        shingle_sets = self._shingle_sets(batch)
        if self.cfg.minhash_scheme == "oph":
            sigs = mh.oph_signatures_batch(shingle_sets,
                                           self.cfg.num_perms,
                                           self.cfg.seed)
        else:
            sigs = mh.minhash_signatures_batch(shingle_sets, self.seeds)
        simhashes = mh.simhash64_batch(shingle_sets)
        n = np.array([len(s) for s in shingle_sets], dtype=np.int64)
        flat = _as_i64(sigs.reshape(-1))
        return pa.table({
            "file_id": batch["file_id"],
            "minhash": pa.FixedSizeListArray.from_arrays(
                flat, self.cfg.num_perms),
            "simhash": _as_i64(simhashes),
            "n_shingles": pa.array(n),
        })


#: Per-worker-process stage cache for the task-based signature path:
#: worker processes are long-lived, so the (cheap) seed table is built
#: once per process — the actor-pool "setup in __init__" semantics
#: without the pool's ramp-up serialization. PipelineConfig is a frozen
#: (hashable) dataclass, so it keys the cache directly.
_SIG_STAGE_CACHE: dict[PipelineConfig, "SignatureStage"] = {}


def signature_batch(batch: pa.Table, *, cfg: PipelineConfig) -> pa.Table:
    stage = _SIG_STAGE_CACHE.get(cfg)
    if stage is None:
        stage = _SIG_STAGE_CACHE.setdefault(cfg, SignatureStage(cfg))
    return stage(batch)


def signatures(docs: ray.data.Dataset, cfg: PipelineConfig,
               concurrency: int | None = None,
               use_actors: bool = False) -> ray.data.Dataset:
    """Signature stage. Default: task-based map with a per-process stage
    cache (state here is a microsecond seed table — tasks scale to every
    core with zero pool ramp-up). ``use_actors=True`` switches to an
    autoscaling actor pool — the right shape when per-worker setup is
    genuinely expensive (model weights, big dictionaries)."""
    if use_actors:
        # autoscaling pool (min 1): a fixed-size pool would pre-reserve
        # CPUs and can deadlock a multi-pool pipeline on a small machine
        return docs.map_batches(
            SignatureStage, fn_constructor_args=(cfg,),
            batch_format="pyarrow", batch_size=cfg.sig_batch_size,
            concurrency=(1, concurrency or _pool_max(cfg)))
    import functools

    return docs.map_batches(
        functools.partial(signature_batch, cfg=cfg),
        batch_format="pyarrow", batch_size=cfg.sig_batch_size)


def _bands_from_sigs(batch: pa.Table, *, cfg: PipelineConfig) -> pa.Table:
    """One signature block -> (band_hash:int64, file_id) flat rows."""
    n = batch.num_rows
    sig_mat = np.asarray(
        batch["minhash"].combine_chunks().flatten().to_numpy(
            zero_copy_only=False),
        dtype=np.int64).view(np.uint64).reshape(n, cfg.num_perms)
    bh = mh.band_hashes_batch(sig_mat, cfg.lsh_bands)      # (n, bands)
    fid = np.asarray(batch["file_id"].to_numpy(zero_copy_only=False),
                     dtype=np.int64)
    return pa.table({
        "band_hash": _as_i64(bh.reshape(-1)),
        "file_id": pa.array(np.repeat(fid, cfg.lsh_bands)),
    })


def _bands_from_sigs_indexed(batch: pa.Table, *, cfg: PipelineConfig,
                             offset: int) -> pa.Table:
    """``_bands_from_sigs`` plus a positional sig-index column:
    fidx = global row number of the doc in the CONCAT order of the sig
    blocks (= the row order of the unsorted sig4 merge), letting the
    fused estimate gather signatures with no id lookup at all."""
    out = _bands_from_sigs(batch, cfg=cfg)
    idx = np.repeat(
        np.arange(offset, offset + batch.num_rows, dtype=np.int32),
        cfg.lsh_bands)
    return out.append_column("fidx", pa.array(idx))


def band_rows(sigs: ray.data.Dataset, cfg: PipelineConfig
              ) -> ray.data.Dataset:
    """Signatures -> (band_hash:int64, file_id) flat rows.

    The band index is already mixed INTO band_hash (band_hashes xors a
    per-band seed before the final mix), so the bucket shuffle key is a
    single int64 — no separate band_id column rides the shuffle."""
    import functools

    return sigs.map_batches(functools.partial(_bands_from_sigs, cfg=cfg),
                            batch_format="pyarrow", batch_size=None)


def detect_hot_keys(bands: ray.data.Dataset, cap: int,
                    num_blocks_hint: int = 64) -> np.ndarray:
    """Two-phase heavy-hitter detection for LSH bucket keys.

    Phase 1 (vectorized, per batch): input blocks are BUNDLED into big
    batches via ``batch_size`` (not repartition — its shuffle=False form
    funnels the whole table through one serial RepartitionReduce task in
    Ray 2.49) sized so at most B = min(num_blocks_hint, cap) batches
    exist even with one short tail batch per task; Arrow
    ``group_by.count`` per batch keeps keys whose batch-local count
    clears cap//B. With B <= cap the pigeonhole bound is exact: a key
    with global count > cap over B batches has some batch count
    >= cap//B + 1 > local_cut - 1, so NO globally-hot key can evade
    phase 1 regardless of layout — the hot set (and hence the
    emitted pair set) is layout/CPU-count independent, which the
    determinism contract requires. Phase 2: exact global count of the few
    surviving keys. Returns the sorted hot keys (exact count > cap).

    Scale note: coalescing bounds phase-1 parallelism at ``cap`` tasks;
    at cluster scale cap is sized in the hundreds-to-thousands (hot
    buckets there are boilerplate with counts >> node count), so phase 1
    still spreads across nodes while keeping the guarantee.

    Avoids any per-group Python over the full key space — a CollectList
    or Count aggregate over ~10M mostly-singleton buckets measured ~6µs
    of Python per row; this path touches only heavy candidates.
    """
    n_blocks = max(1, min(num_blocks_hint, cap))
    local_cut = max(2, cap // n_blocks)
    # bundle to at most n_blocks//2 full batches; tails (at most one
    # short batch per task) can at worst double that, keeping the
    # pigeonhole bound's B <= n_blocks <= cap
    n_rows = bands.count()
    bundle = max(1, -(-n_rows // max(1, n_blocks // 2)))

    def local_heavy(batch: pa.Table) -> pa.Table:
        agg = batch.group_by("band_hash").aggregate([("file_id", "count")])
        mask = pc.greater_equal(agg["file_id_count"],
                                pa.scalar(local_cut))
        return agg.filter(mask).rename_columns(["band_hash", "cnt"])

    heavy = bands.map_batches(local_heavy, batch_format="pyarrow",
                              batch_size=bundle)
    candidates = {r["band_hash"] for r in heavy.take_all()}
    if not candidates:
        return np.empty(0, dtype=np.int64)

    # phase 2: EXACT global counts of the candidate keys only — the hot
    # set must not depend on block layout (the 8-CPU and 32-CPU runs lay
    # blocks out differently, and a layout-dependent hot set makes the
    # emitted pair set nondeterministic). Per-block exact partials are
    # summed on the DRIVER (the candidate key set is tiny by
    # construction) — a distributed Sum groupby here costs seconds of
    # sort-shuffle setup for a few-thousand-row reduce.
    cand_arr = pa.array(sorted(candidates), pa.int64())

    def count_candidates(batch: pa.Table) -> pa.Table:
        sub = batch.filter(pc.is_in(batch["band_hash"],
                                    value_set=cand_arr))
        agg = sub.group_by("band_hash").aggregate([("file_id", "count")])
        return agg.rename_columns(["band_hash", "cnt"])

    parts = bands.map_batches(count_candidates, batch_format="pyarrow",
                              batch_size=None)
    keys_l: list[np.ndarray] = []
    cnts_l: list[np.ndarray] = []
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=None):
        keys_l.append(np.asarray(
            b["band_hash"].to_numpy(zero_copy_only=False),
            dtype=np.int64))
        cnts_l.append(np.asarray(
            b["cnt"].to_numpy(zero_copy_only=False), dtype=np.int64))
    if not keys_l:
        return np.empty(0, dtype=np.int64)
    keys = np.concatenate(keys_l)
    cnts = np.concatenate(cnts_l)
    u, inv = np.unique(keys, return_inverse=True)
    tot = np.zeros(len(u), dtype=np.int64)
    np.add.at(tot, inv, cnts)
    return np.sort(u[tot > cap])


def _multi_occurrence_bitmap(bands: ray.data.Dataset,
                             n_rows: int,
                             scan_blocks: int = 32
                             ) -> tuple[np.ndarray, int]:
    """One streaming pass -> packed bitmap of band-hash SLOTS that hold a
    key occurring >= 2 times globally (slot = low bits of the mixed
    band_hash, which is splitmix64-uniform).

    The LSH self-join's input is dominated by SINGLETON band keys —
    unique documents produce unique band hashes — and a singleton can
    never produce a pair, yet the hash join ships it through the shuffle
    twice (both sides). Filtering the join input through this bitmap is
    an exact-semantics semi-join reduction: a key seen >= 2 anywhere
    always has its bit set (no false negatives), while a bitmap
    collision merely lets a singleton through to produce one (a == a)
    row that the a < b filter drops — correctness is untouched, shuffle
    bytes drop by the singleton fraction.

    Bitmap is sized ~4 bits/row (power of two, capped at 2^30 bits =
    128 MiB) => ~20% false-positive rate; block partials are OR-combined
    on the driver with an exact cross-block once&once -> multi rule
    (order-independent, hence deterministic). Input blocks are bundled
    into ~``scan_blocks`` tasks via ``batch_size`` — bounding the
    partial bitmaps through the object store at scan_blocks x bitmap
    bytes — NOT via repartition, whose shuffle=False form funnels the
    whole table through ONE serial RepartitionReduce task in Ray 2.49.
    At 10^12-row scale a flat bitmap stops fitting — shard the pass by
    key range (the bitmap is indexed by key bits, so range shards are
    independent) or raise the per-node block size.
    """
    m_bits = max(20, min(30, int(np.ceil(np.log2(max(n_rows, 1) * 4)))))
    m = 1 << m_bits
    nbytes = m >> 3

    def block_maps(batch: pa.Table) -> pa.Table:
        h = np.asarray(batch["band_hash"].to_numpy(zero_copy_only=False),
                       dtype=np.int64).view(np.uint64)
        slots = (h & np.uint64(m - 1)).astype(np.int64)
        u, c = np.unique(slots, return_counts=True)
        once = np.zeros(nbytes, dtype=np.uint8)
        multi = np.zeros(nbytes, dtype=np.uint8)
        uo, um = u[c == 1], u[c >= 2]
        np.bitwise_or.at(once, uo >> 3,
                         (1 << (uo & 7)).astype(np.uint8))
        np.bitwise_or.at(multi, um >> 3,
                         (1 << (um & 7)).astype(np.uint8))
        return pa.table({"once": pa.array([once.tobytes()], pa.binary()),
                         "multi": pa.array([multi.tobytes()],
                                           pa.binary())})

    bundle = max(1, -(-n_rows // scan_blocks))
    parts = bands.map_batches(
        block_maps, batch_format="pyarrow", batch_size=bundle)
    acc_once = np.zeros(nbytes, dtype=np.uint8)
    acc_multi = np.zeros(nbytes, dtype=np.uint8)
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=None):
        for i in range(b.num_rows):
            # as_buffer(): zero-copy view of the 2 x bitmap-sized blobs
            # (as_py() copied ~2 GB per pass at 41M band rows)
            o = np.frombuffer(b["once"][i].as_buffer(), dtype=np.uint8)
            mlt = np.frombuffer(b["multi"][i].as_buffer(),
                                dtype=np.uint8)
            acc_multi |= mlt
            acc_multi |= acc_once & o
            acc_once |= o
    return acc_multi, m


def _bitmap_m(n_rows: int) -> int:
    """Bitmap size: ~4 bits/row, power of two, capped at 2^30 bits."""
    return 1 << max(20, min(30, int(np.ceil(np.log2(max(n_rows, 1)
                                                    * 4)))))


def _set_bits(bm: np.ndarray, idx: np.ndarray) -> None:
    np.bitwise_or.at(bm, idx >> 3, (1 << (idx & 7)).astype(np.uint8))


def _get_bits(bm: np.ndarray, idx: np.ndarray) -> np.ndarray:
    return (bm[idx >> 3] & (1 << (idx & 7)).astype(np.uint8)) != 0


@ray.remote
def _band_bitmap_task(src_refs: list, expand, m: int
                      ) -> tuple[np.ndarray, np.ndarray]:
    """(once, multi) slot bitmaps over a GROUP of source blocks,
    expanded to band rows in-task (``expand``; None = blocks already
    are band rows). The in-task cross-block merge uses the same exact
    once&once -> multi rule as the driver merge, so grouping is purely
    a fan-in knob."""
    nbytes = m >> 3
    once = np.zeros(nbytes, dtype=np.uint8)
    multi = np.zeros(nbytes, dtype=np.uint8)
    for t in ray.get(src_refs):
        bt = expand(t) if expand is not None else t
        h = _i64_view(bt["band_hash"]).view(np.uint64)
        slots = (h & np.uint64(m - 1)).astype(np.int64)
        u, c = np.unique(slots, return_counts=True)
        uo, um = u[c == 1], u[c >= 2]
        _set_bits(multi, um)
        seen = _get_bits(once, uo)
        _set_bits(multi, uo[seen])
        _set_bits(once, uo)
    return once, multi


@ray.remote
def _bitmap_merge_task(*parts, final: bool = False):
    """Associative fold of (once, multi) bitmap summaries — the same
    once&once -> multi rule as the in-task merge, so any grouping of
    parts yields the same result. ``final=True`` returns only the
    multi bitmap (the object the filter tasks read). Runs as a small
    task TREE so the driver never touches bitmap bytes: the previous
    driver-side completion-order OR merge was ~1.0 s of SERIAL time at
    m=2^28 over 32 part pairs (profiled round 4, 1.28M files) — an
    Amdahl term the low-CPU leg hides behind slower leaf tasks but the
    high-CPU leg pays in full (candidates stage 4→16 efficiency 0.62)."""
    o0, m0 = parts[0]
    once = o0.copy()
    multi = m0.copy()
    for o, mlt in parts[1:]:
        multi |= mlt
        multi |= once & o
        once |= o
    return multi if final else (once, multi)


@ray.remote(num_returns=2)
def _band_filter_sort_task(src_tbl: pa.Table, expand, bitmap: np.ndarray,
                           m: int) -> tuple[pa.Table, int]:
    """Expand one source block to band rows, drop bitmap singletons,
    sort by band_hash, return a SINGLE-CHUNK table + its row count.
    ``src_tbl`` and ``bitmap`` arrive as top-level object refs — Ray
    dereferences both zero-copy and sequences this task after the
    bitmap merge automatically."""
    bt = expand(src_tbl) if expand is not None else src_tbl
    h = _i64_view(bt["band_hash"]).view(np.uint64)
    slots = (h & np.uint64(m - 1)).astype(np.int64)
    keep = _get_bits(bitmap, slots)
    bh = h.view(np.int64)[keep]
    fid = _i64_view(bt["file_id"])[keep]
    order = np.argsort(bh)
    cols = {"band_hash": pa.array(bh[order]),
            "file_id": pa.array(fid[order])}
    if "fidx" in bt.column_names:
        fidx = np.asarray(bt["fidx"].chunk(0).to_numpy(
            zero_copy_only=True), dtype=np.int32)[keep]
        cols["fidx"] = pa.array(fidx[order])
    out = pa.table(cols)
    return out, out.num_rows


def _pairable_sorted_refs(src_refs: list, expand, n_rows: int,
                          filter_expands: list | None = None
                          ) -> tuple[list, int]:
    """Raw-task singleton pre-filter over source block refs: grouped
    bitmap tasks -> task-tree once/multi merge -> one filter+sort task
    per block. The candidates stage runs with ZERO Ray Data executor
    spin-ups on this path (the per-materialize fixed cost was a large
    share of the stage at high CPU counts), and the band table is never
    materialized — each task expands its block's bands in memory."""
    import ray as _ray

    if not src_refs:        # no blocks -> no band rows, nothing to filter
        return [], 0
    m = _bitmap_m(n_rows)
    n_groups = min(32, max(1, len(src_refs)))
    groups = [src_refs[i::n_groups] for i in range(n_groups)]
    futs = [_band_bitmap_task.remote(g, expand, m)
            for g in groups if g]
    # associative task-tree reduce (fan-in 8; see _bitmap_merge_task):
    # bm_ref is the FINAL merge task's output and is never ray.get on
    # the driver — zero driver bitmap bytes, zero serial OR time.
    fan = 8
    while len(futs) > fan:
        futs = [_bitmap_merge_task.remote(*futs[i:i + fan])
                for i in range(0, len(futs), fan)]
    bm_ref = _bitmap_merge_task.remote(*futs, final=True)
    fx = filter_expands or [expand] * len(src_refs)
    outs = [_band_filter_sort_task.remote(r, fx[i], bm_ref, m)
            for i, r in enumerate(src_refs)]
    counts = _ray.get([c for _t, c in outs])
    return [t for t, _c in outs], int(sum(counts))


#: Run bucket expansion as band_hash-range tasks over the sorted
#: pairable blocks while the FILTERED (singleton-free) band table holds
#: at most this many rows. The name is historical: above
#: _DRIVER_SORT_LIMIT the driver touches NOTHING (range tasks slice the
#: blocks straight from the object store), so this gate no longer
#: bounds a driver pull — it chooses range-task expansion vs the Arrow
#: C++ hash self-join, which pays ~10 s of shuffle fixed cost on this
#: host at any size. Identical pair multiset either way (buckets are
#: capped, so per-bucket expansion is bounded in both paths). Sizing:
#: 128M rows = 2 GB of sorted blocks resident in the object store
#: (spillable); the 32M default previously inherited the pull-path
#: rationale and cliffed a 2.56M-file corpus onto the self-join
#: (candidates 5.5 s -> 80.6 s measured round 4). On a MULTI-NODE
#: cluster each range task maps every block, so cross-node traffic is
#: ~nparts/nodes x table size per node — on such deployments lower
#: this gate (or pre-partition; see _expand_range_task's docstring for
#: why mask-scan partition tasks lost on one box's memory bus).
DRIVER_PAIR_EXPAND_LIMIT = gate(128_000_000, "driver_pair_expand_limit")


_EMPTY_PAIRS = pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64()),
                         "capped": pa.array([], pa.bool_())})


def _expand_cold_sorted(bhs: np.ndarray, fids: np.ndarray) -> pa.Table:
    """All-pairs expansion of (band_hash, file_id) rows PRE-SORTED by
    (band_hash, file_id), bucket-wise: find bucket runs, then for each
    bucket size s emit the upper triangle via one (n_buckets_s, s*(s-1)/2)
    gather — no Python per bucket, only per DISTINCT bucket size (<= cap
    distinct sizes)."""
    n = len(bhs)
    if n == 0:
        return _EMPTY_PAIRS
    new = np.ones(n, dtype=bool)
    new[1:] = bhs[1:] != bhs[:-1]
    starts = np.flatnonzero(new)
    sizes = np.diff(np.append(starts, n))
    aa, bb = [], []
    for s in np.unique(sizes):
        if s < 2:
            continue
        st = starts[sizes == s]
        ii, jj = np.triu_indices(int(s), 1)
        aa.append(fids[st[:, None] + ii[None, :]].ravel())
        bb.append(fids[st[:, None] + jj[None, :]].ravel())
    if not aa:
        return _EMPTY_PAIRS
    a_all = np.concatenate(aa)
    return pa.table({"a": pa.array(a_all),
                     "b": pa.array(np.concatenate(bb)),
                     "capped": pa.array(np.zeros(len(a_all),
                                                 dtype=bool))})


def _expand_hot_sorted(bhs: np.ndarray, fids: np.ndarray,
                       window: int) -> pa.Table:
    """Sorted-neighbor window edges for hot-bucket rows PRE-SORTED by
    (band_hash, file_id) — same semantics as the distributed
    expand_hot."""
    if len(bhs) == 0:
        return _EMPTY_PAIRS
    aa, bb = [], []
    for j in range(1, window + 1):
        if j >= len(bhs):
            break
        same = bhs[j:] == bhs[:-j]
        aa.append(fids[:-j][same])
        bb.append(fids[j:][same])
    if not aa:
        return _EMPTY_PAIRS
    a_all = np.concatenate(aa)
    return pa.table({"a": pa.array(a_all),
                     "b": pa.array(np.concatenate(bb)),
                     "capped": pa.array(np.ones(len(a_all),
                                                dtype=bool))})


def _expand_sorted_slice(bhs: np.ndarray, fids: np.ndarray, cap: int,
                         window: int,
                         emit: np.ndarray | None = None) -> pa.Table:
    """Expand one bucket-aligned sorted slice: all-pairs for bucket
    sizes 2..cap, window edges beyond cap. Slices always contain WHOLE
    buckets, so per-slice run detection is globally exact.

    ``emit`` (default: the file ids) is the value array the pairs are
    built FROM — the fused estimate path passes positional sig indices
    here while run detection and ordering still use (band_hash,
    file_id), so the emitted pair set is identical in id space (and
    smaller-id-first order is preserved: position i < j within a
    fid-sorted run implies id_i < id_j)."""
    n = len(bhs)
    if n == 0:
        return _EMPTY_PAIRS
    if emit is None:
        emit = fids
    new = np.ones(n, dtype=bool)
    new[1:] = bhs[1:] != bhs[:-1]
    sizes = np.diff(np.append(np.flatnonzero(new), n))
    row_sizes = sizes[np.cumsum(new) - 1]
    tabs = []
    cold = (row_sizes >= 2) & (row_sizes <= cap)
    if cold.any():
        tabs.append(_expand_cold_sorted(bhs[cold], emit[cold]))
    hot = row_sizes > cap
    if hot.any():
        tabs.append(_expand_hot_sorted(bhs[hot], emit[hot], window))
    if not tabs:
        return _EMPTY_PAIRS
    return pa.concat_tables(tabs)


def _expand_maybe_estimate(bhs: np.ndarray, fids: np.ndarray,
                           cap: int, window: int,
                           est: tuple | None,
                           cfg: PipelineConfig | None,
                           fidx: np.ndarray | None = None) -> pa.Table:
    """``est`` is the resolved sig4 array tuple — callers pass the
    ``_sig4_ref`` ObjectRef as a TOP-LEVEL task argument, which Ray
    dereferences zero-copy before the task body runs (and makes the
    expansion tasks wait on the merge task automatically). With
    ``fidx`` (positional sig indices aligned with the rows) the pairs
    are emitted as index pairs and the estimate gathers positionally —
    no per-occurrence binary search (which measured 2.3 s of the 2.5 s
    kernel at 2.7M occurrences)."""
    out = _expand_sorted_slice(bhs, fids, cap, window, emit=fidx)
    if est is None:
        return out
    sids, smat, snsh, ssim = est
    a = np.asarray(out["a"].to_numpy(zero_copy_only=False),
                   dtype=np.int64)
    b = np.asarray(out["b"].to_numpy(zero_copy_only=False),
                   dtype=np.int64)
    cp = np.asarray(out["capped"].to_numpy(zero_copy_only=False),
                    dtype=bool)
    return _est_unique_score(a, b, cp, sids, smat, snsh, ssim, cfg,
                             "n_bands",
                             are_indices=fidx is not None,
                             ids_sorted=fidx is None and _is_sorted(sids))


@ray.remote
def _expand_slice_task(bhs: np.ndarray, fids: np.ndarray,
                       presorted: bool, cap: int, window: int,
                       est: tuple | None = None,
                       cfg: PipelineConfig | None = None) -> pa.Table:
    """Expand one slice of (band_hash, file_id) rows into candidate-pair
    occurrences. A non-presorted slice holds WHOLE buckets, so the
    task-local lexsort makes bucket runs globally exact. With ``est``
    (callers pass the ``_sig4_ref`` ObjectRef; Ray resolves it zero-copy
    at task start) the estimate prefilter runs IN the task: occurrences
    collapse to locally-distinct surviving pairs before anything returns
    to the object store — the raw occurrence table (dozens of bytes x
    bands x corpus) never exists anywhere."""
    if not presorted:
        order = np.lexsort((fids, bhs))
        bhs, fids = bhs[order], fids[order]
    return _expand_maybe_estimate(bhs, fids, cap, window, est, cfg)


@ray.remote
def _sort_band_block_task(tbl: pa.Table) -> pa.Table:
    """Sort one pairable block by band_hash and return it as a
    SINGLE-CHUNK table (arrays built fresh from numpy). Sorting inside
    the filter map would NOT survive: the Ray Data executor bundles
    consecutive map outputs into one block by concatenation (observed:
    2-chunk blocks, each chunk sorted, the block not), silently
    splitting buckets across range tasks. Task outputs bypass the
    executor's bundling entirely."""
    bh = _i64_view(tbl["band_hash"])
    fid = _i64_view(tbl["file_id"])
    order = np.argsort(bh)
    return pa.table({"band_hash": pa.array(bh[order]),
                     "file_id": pa.array(fid[order])})


@ray.remote
def _expand_range_task(block_refs: list, lo: int, hi: int | None,
                       cap: int, window: int,
                       est: tuple | None = None,
                       cfg: PipelineConfig | None = None) -> pa.Table:
    """Extract band_hash range [lo, hi) from the band-hash-SORTED
    single-chunk pairable blocks (one binary search + zero-copy slice
    per block — total extraction traffic across all range tasks is ONE
    pass over the table, where mask-scan partition tasks paid nparts
    passes and flat-lined on the memory bus), then
    sort+expand(+estimate). band_hash is splitmix-mixed, so equal-width
    int64 ranges are uniform and buckets (equal keys) stay whole per
    range."""
    bs, fs, xs = [], [], []
    indexed = False
    # one batch get (resolves all refs in one pass; views zero-copy)
    for t in ray.get(block_refs):
        bh = _i64_view(t["band_hash"])
        i0 = int(np.searchsorted(bh, lo, side="left"))
        i1 = (len(bh) if hi is None
              else int(np.searchsorted(bh, hi, side="left")))
        if i1 > i0:
            bs.append(bh[i0:i1])
            fs.append(_i64_view(t["file_id"])[i0:i1])
            if "fidx" in t.column_names:
                indexed = True
                xs.append(np.asarray(
                    t["fidx"].chunk(0).to_numpy(zero_copy_only=True),
                    dtype=np.int32)[i0:i1])
    if not bs:
        bhs = np.empty(0, dtype=np.int64)
        fids = np.empty(0, dtype=np.int64)
        fidx = None
    else:
        bhs = np.concatenate(bs)
        fids = np.concatenate(fs)
        order = np.lexsort((fids, bhs))
        bhs, fids = bhs[order], fids[order]
        fidx = np.concatenate(xs)[order] if indexed else None
    return _expand_maybe_estimate(bhs, fids, cap, window, est, cfg,
                                  fidx=fidx)


def _expand_parts() -> int:
    """Range-task count for the parallel bucket expansion: enough tasks
    to spread bucket-size skew across the cluster, bounded so per-task
    dispatch + binary-search overhead stays negligible."""
    try:
        import ray as _ray

        cpus = int(_ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return min(128, max(8, 4 * cpus))


def _range_bounds(nparts: int) -> list[tuple[int, int | None]]:
    """Equal-width int64 [lo, hi) boundaries covering the full range
    (hi=None marks +inf for the last partition)."""
    step = (1 << 64) // nparts
    lows = [(-(1 << 63)) + k * step for k in range(nparts)]
    return [(lows[k], lows[k + 1] if k + 1 < nparts else None)
            for k in range(nparts)]


def _expand_range_refs(pairable: ray.data.Dataset, cap: int, window: int,
                       est_ref, cfg: PipelineConfig | None) -> list:
    """Per-block sort tasks, then one _expand_range_task per band_hash
    range over the sorted blocks. Driver work: collecting block refs
    (zero-copy) — no pull, no concat, no re-put of the band table."""
    sorted_refs = [_sort_band_block_task.remote(r)
                   for r in pairable.to_arrow_refs()]
    return [_expand_range_task.remote(sorted_refs, lo, hi, cap, window,
                                      est_ref, cfg)
            for lo, hi in _range_bounds(_expand_parts())]


def _merge_estimated(tables: list[pa.Table]) -> pa.Table:
    """Merge per-slice estimate survivors into globally distinct pairs.

    A pair can surface in several slices (one per colliding band, and
    bands of one pair land in different hash partitions), each carrying
    a partial ``n_bands``; est/hamming are pure functions of the pair's
    signatures so every copy agrees. Sum the partials, OR the capped
    flags, keep one est/hamming. Output sorted by (a, b) —
    deterministic regardless of slice order."""
    tbl = pa.concat_tables(tables)
    if tbl.num_rows == 0:
        return tbl
    a = np.asarray(tbl["a"].to_numpy(zero_copy_only=False),
                   dtype=np.int64)
    b = np.asarray(tbl["b"].to_numpy(zero_copy_only=False),
                   dtype=np.int64)
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    new = np.ones(len(a), dtype=bool)
    new[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    starts = np.flatnonzero(new)
    nb = np.asarray(tbl["n_bands"].to_numpy(zero_copy_only=False),
                    dtype=np.int64)[order]
    cp = np.asarray(tbl["capped"].to_numpy(zero_copy_only=False),
                    dtype=np.int64)[order]
    first = order[starts]
    return pa.table({
        "a": pa.array(a[starts]), "b": pa.array(b[starts]),
        "n_bands": pa.array(np.add.reduceat(nb, starts)),
        "capped": pa.array(np.add.reduceat(cp, starts) > 0),
        "est": tbl["est"].take(first),
        "hamming": tbl["hamming"].take(first)})


@ray.remote
def _merge_estimated_task(*tabs: pa.Table) -> pa.Table:
    return _merge_estimated(list(tabs))


def _merge_estimated_tree(refs: list, fan: int = 8) -> pa.Table:
    """Fold per-slice estimate survivors in a fan-in task tree (the
    bitmap-merge pattern): _merge_estimated is associative — n_bands
    partials SUM, capped flags OR, est/hamming are pure functions of
    the pair — so any grouping yields the same table. The driver pulls
    only the deduped root (~distinct-survivor-sized); the former
    driver-side fold was ~0.5 s of serial lexsort at 1.28M files that
    the high-CPU leg paid in full (same Amdahl shape as the bitmap OR
    merge)."""
    import ray as _ray

    while len(refs) > fan:
        refs = [_merge_estimated_task.remote(*refs[i:i + fan])
                for i in range(0, len(refs), fan)]
    return _ray.get(_merge_estimated_task.remote(*refs))


#: Above this many pairable band rows the driver never touches the
#: table at all: expansion runs as band_hash-RANGE tasks over the
#: sorted pairable blocks (``_expand_range_task`` — one binary search +
#: zero-copy slice per block per task), each lexsorting its own slice
#: in parallel. Below it, one driver pull + exact lexsort gives
#: output-weight-balanced slices (EXACT per-bucket pair counts), which
#: beats task dispatch at small sizes. Identical pair multiset either
#: way: per-bucket expansion only needs the bucket's rows contiguous
#: and fid-sorted, which both paths provide.
_DRIVER_SORT_LIMIT = gate(2_000_000, "driver_sort_limit")


def candidate_pairs(bands: ray.data.Dataset, cfg: PipelineConfig,
                    num_partitions: int | None = None,
                    distinct: bool = True,
                    n_rows_hint: int | None = None) -> ray.data.Dataset:
    """LSH buckets -> candidate pairs (a<b).

    The bucket pairing is THE near-dup shuffle (the analog of the
    reference's global upsert shuffle, lib/dbManager.cpp:274-281),
    executed as an Arrow C++ hash SELF-JOIN on ``band_hash``: all-pairs
    within each bucket, no per-group Python. Hot keys (bucket > cap,
    e.g. boilerplate at 10^12-file scale) are detected first with a
    two-phase heavy-hitter pass and EXCLUDED from the join — they would
    blow up O(k²) — and instead emit a sorted-neighbor window of edges
    (``bucket_window`` per member): connectivity for clustering is
    preserved, cost is O(k·w), truncation is explicit (``capped``).

    ``distinct=True`` adds a global groupby on (a, b) yielding one row
    per pair with the band-support count. ``distinct=False`` returns raw
    per-band occurrences (a pair colliding in B bands appears B times) —
    the fast path for the pipeline, where the cheap vectorized
    estimate-prefilter runs on occurrences and only the tiny surviving
    set pays for a distinct groupby.
    """
    cap, window = cfg.bucket_cap, cfg.bucket_window
    nparts = num_partitions or join_parts(cfg)

    import ray as _ray

    pairable, n_pairable = _pairable_bands(bands, n_rows_hint)

    # ---- driver-gated fast path -----------------------------------------
    # The gate is on the FILTERED row count: at 16 B/row, 32M rows =
    # 512 MB — the most any single process ever handles here. Above
    # _DRIVER_SORT_LIMIT the driver touches nothing: range tasks slice
    # the sorted pairable blocks directly from the object store. Below
    # it, one pull + exact lexsort gives output-weight-balanced slices.
    # Past the gate, the fully distributed path below (two-phase hot
    # detection, Arrow C++ self-join) computes the identical multiset.
    if n_pairable <= DRIVER_PAIR_EXPAND_LIMIT:
        if n_pairable == 0:
            pairs = ray.data.from_arrow(_EMPTY_PAIRS)
            return pairs if not distinct else distinct_pairs(pairs)
        if n_pairable > _DRIVER_SORT_LIMIT:
            refs = _expand_range_refs(pairable, cap, window, None, None)
            pairs = ray.data.from_arrow_refs(refs)
            return pairs if not distinct else distinct_pairs(pairs)
        tbl = pa.concat_tables(pairable.iter_batches(
            batch_format="pyarrow", batch_size=None)).combine_chunks()
        slices, total_pairs = _driver_slices(tbl, cap, window, cfg)
        if not slices:
            pairs = ray.data.from_arrow(_EMPTY_PAIRS)
            return pairs if not distinct else distinct_pairs(pairs)
        if len(slices) == 1 and slices[0][2]:
            pairs_tbl = _expand_sorted_slice(slices[0][0], slices[0][1],
                                             cap, window)
            if distinct and pairs_tbl.num_rows <= DRIVER_DISTINCT_LIMIT:
                # fuse the distinct while the pairs are still in driver
                # memory — no object-store round trip
                return ray.data.from_arrow(
                    _driver_distinct_table(pairs_tbl))
            pairs = ray.data.from_arrow(pairs_tbl)
            return pairs if not distinct else distinct_pairs(pairs)
        refs = [_expand_slice_task.remote(bh, fi, ps, cap, window)
                for bh, fi, ps in slices]
        if (distinct and total_pairs is not None
                and total_pairs <= DRIVER_DISTINCT_LIMIT):
            return ray.data.from_arrow(_driver_distinct_table(
                pa.concat_tables(_ray.get(refs))))
        pairs = ray.data.from_arrow_refs(refs)
        return pairs if not distinct else distinct_pairs(pairs)

    return _distributed_candidates(pairable, cfg, nparts, distinct)


def _pairable_bands(bands: ray.data.Dataset,
                    n_rows_hint: int | None = None
                    ) -> tuple[ray.data.Dataset, int]:
    """Apply the DISTRIBUTED singleton pre-filter to the band table:
    the "seen >= 2" bitmap drops the singleton majority (unique docs
    produce unique band hashes) in a parallel scan.

    With ``n_rows_hint`` (callers that know rows = docs x bands) the
    input stays LAZY: the cheap band expansion re-executes in the
    bitmap pass and the filter pass instead of materializing the full
    band table — two streaming passes beat one object-store round trip
    of ~16 B x bands x corpus. Without a hint the input is materialized
    once to count it (generic callers).

    Exactness: every row of a key with global count >= 2 survives (no
    false negatives), so bucket sizes computed downstream are exact for
    surviving keys; bitmap-collision singletons form size-1 runs that
    the size >= 2 cut drops anyway."""
    import ray as _ray

    if n_rows_hint is None:
        bands = bands.materialize()
        n_band_rows = bands.count()
    else:
        n_band_rows = n_rows_hint
    bitmap, m = _multi_occurrence_bitmap(bands, n_band_rows)
    bm_handle = _ray.put(bitmap)
    pre_mask = np.uint64(m - 1)

    def keep_pairable(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        bm = _ray.get(bm_handle)
        h = np.asarray(
            batch["band_hash"].to_numpy(zero_copy_only=False),
            dtype=np.int64).view(np.uint64)
        slots = (h & pre_mask).astype(np.int64)
        keep = (bm[slots >> 3]
                & (1 << (slots & 7)).astype(np.uint8)) != 0
        return pa.table({
            "band_hash": pa.array(h.view(np.int64)[keep]),
            "file_id": pa.array(np.asarray(batch["file_id"].to_numpy(
                zero_copy_only=False), dtype=np.int64)[keep])})

    pairable = bands.map_batches(keep_pairable, batch_format="pyarrow",
                                 batch_size=None).materialize()
    return pairable, pairable.count()


def _driver_slices(tbl: pa.Table, cap: int, window: int,
                   cfg: PipelineConfig
                   ) -> tuple[list[tuple[np.ndarray, np.ndarray, bool]],
                              int | None]:
    """Plan parallel expansion of a pulled pairable table.

    Returns (slices, total_pairs): each slice is (band_hashes, file_ids,
    presorted) and always contains WHOLE buckets. One exact lexsort
    gives EXACT bucket sizes; slices are cut by exact per-bucket output
    size (s(s-1)/2 cold, s·w - w(w+1)/2 hot — balanced under
    bucket-size skew) and total_pairs is exact. Callers route tables
    above _DRIVER_SORT_LIMIT to ``_partition_expand_refs`` instead
    (hash partitions, task-side sorts, no driver sort at all)."""
    tbl = tbl.sort_by([("band_hash", "ascending"),
                       ("file_id", "ascending")])
    bhs = np.asarray(tbl["band_hash"].to_numpy(zero_copy_only=False),
                     dtype=np.int64)
    fids = np.asarray(tbl["file_id"].to_numpy(zero_copy_only=False),
                      dtype=np.int64)
    n = len(bhs)
    new = np.ones(n, dtype=bool)
    new[1:] = bhs[1:] != bhs[:-1]
    starts = np.flatnonzero(new)
    sizes = np.diff(np.append(starts, n))
    w_hot = np.int64(window)
    weights = np.where(
        sizes > cap,
        sizes * w_hot - (w_hot * (w_hot + 1)) // 2,
        sizes * (sizes - 1) // 2)
    weights[sizes < 2] = 0
    total_pairs = int(weights.sum())
    if total_pairs == 0:
        return [], 0
    n_slices = min(128, 4 * _pool_max(cfg),
                   max(1, total_pairs // 200_000 + 1))
    if n_slices <= 1:
        return [(bhs, fids, True)], total_pairs
    cw = np.cumsum(weights)
    targets = (np.arange(1, n_slices)
               * (total_pairs / n_slices)).astype(np.int64)
    cut_buckets = np.unique(np.searchsorted(cw, targets,
                                            side="left") + 1)
    bucket_bounds = np.concatenate(
        ([0], cut_buckets[cut_buckets < len(starts)], [len(starts)]))
    row_bounds = np.append(starts, n)[bucket_bounds]
    return [(bhs[lo:hi], fids[lo:hi], True)
            for lo, hi in zip(row_bounds[:-1], row_bounds[1:])
            if hi > lo], total_pairs


def _est_blocks(merged: pa.Table, cfg: PipelineConfig) -> ray.data.Dataset:
    """Survivor table -> multi-block dataset sliced on the driver, so
    the content-attach + verify maps get task parallelism without a
    repartition execution (from_arrow with a table list creates the
    blocks directly; a 1-block dataset would serialize the verify map,
    and repartition costs an executor spin-up).

    The block count is a pure function of the PAIR count, not the
    cluster size: the verifier's per-process shingle cache means total
    re-shingling work grows with the number of blocks, so a
    CPU-dependent count made the same job do LESS work on fewer CPUs —
    distorting the N-vs-4N comparison and tying the layout to the
    cluster (a real cluster derives layout from data)."""
    n = merged.num_rows
    k = min(128, max(1, n // 2000 + 1))
    step = -(-n // k) if n else 1
    if n == 0 or k <= 1:
        return ray.data.from_arrow(merged)
    return ray.data.from_arrow(
        [merged.slice(i, step) for i in range(0, n, step)])


_EMPTY_EST = pa.table({
    "a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
    "n_bands": pa.array([], pa.int64()),
    "capped": pa.array([], pa.bool_()),
    "est": pa.array([], pa.float64()),
    "hamming": pa.array([], pa.int64())})


def candidate_pairs_estimated(sigs: ray.data.Dataset,
                              cfg: PipelineConfig,
                              num_partitions: int | None = None
                              ) -> tuple[ray.data.Dataset, bool]:
    """Fused LSH expansion + estimate prefilter + distinct.

    When the signature table fits the broadcast gate and the filtered
    band table fits the expansion gate, the whole stage runs as raw
    Ray tasks over the signature blocks (zero executor spin-ups): sig4
    narrow tasks + one unsorted merge task, grouped bitmap tasks,
    per-block filter+sort tasks that attach POSITIONAL sig indices,
    and band_hash-range expansion tasks in which the estimate gathers
    signatures by index (no id lookups anywhere). The raw per-band
    occurrence table — dozens of bytes x bands x corpus, the near-dup
    pipeline's single largest intermediate — never exists, and the est
    map + distinct executions disappear. Per-range survivors are merged
    on the driver (survivor volume ∝ the duplicate population, not the
    corpus). Returns (dataset, True) with distinct-pair schema
    (a, b, n_bands, capped, est, hamming).

    Outside the gates, falls back to the raw occurrence path and
    returns (occurrences, False) — the caller runs the distributed
    estimate chain (estimate_filter -> distinct_pairs) instead. The
    fused/unfused outputs are pinned identical by
    test_fused_candidates_match_distributed_chain."""
    from ray.data.dataset import MaterializedDataset

    nparts = num_partitions or join_parts(cfg)
    n_sigs = (sigs.count()
              if isinstance(sigs, MaterializedDataset) else None)
    if n_sigs is None or n_sigs > BROADCAST_SIG_LIMIT:
        # fallback consumes the band table; derived HERE (band_rows is
        # a lazy map over sigs) so no caller can hand a mismatched one
        return candidate_pairs(band_rows(sigs, cfg), cfg, nparts,
                               distinct=False), False
    import functools

    import ray as _ray

    # fire the sig4 narrow+merge FIRST: those tasks run on workers
    # while the driver dispatches the bitmap and filter tasks below
    # (the old driver-side pull+sort+put of the sig arrays was ~1 s of
    # serial time the whole candidate stage waited on). The merge keeps
    # CONCAT order and the filter tasks attach the positional sig index
    # (block offset + row) to every band row, so the estimate gathers
    # signatures with NO id lookup anywhere — the per-occurrence binary
    # search was 2.3 s of a 2.5 s kernel at 2.7M occurrences/task.
    src_refs = sigs.to_arrow_refs()
    counts = _block_row_counts(sigs)
    if counts is not None and len(counts) != len(src_refs):
        counts = None       # metadata/refs disagree: count in-task
    est_ref, offsets = _sig4_indexed(src_refs, cfg, counts)
    # pure raw-task path over the signature blocks: bands are expanded
    # in-task (never materialized), singleton-filtered, sorted — the
    # candidates stage pays ZERO Ray Data executor spin-ups.
    expand = functools.partial(_bands_from_sigs, cfg=cfg)
    filter_expands = [
        functools.partial(_bands_from_sigs_indexed, cfg=cfg,
                          offset=int(offsets[i]))
        for i in range(len(src_refs))]
    pair_refs, n_pairable = _pairable_sorted_refs(
        src_refs, expand, n_sigs * cfg.lsh_bands, filter_expands)
    if n_pairable > DRIVER_PAIR_EXPAND_LIMIT:
        return _distributed_candidates(
            ray.data.from_arrow_refs(pair_refs).drop_columns(["fidx"]),
            cfg, nparts, False), False
    cap, window = cfg.bucket_cap, cfg.bucket_window
    if n_pairable == 0:
        return ray.data.from_arrow(_EMPTY_EST), True
    if n_pairable > _DRIVER_SORT_LIMIT:
        refs = [_expand_range_task.remote(pair_refs, lo, hi, cap,
                                          window, est_ref, cfg)
                for lo, hi in _range_bounds(_expand_parts())]
        return _est_blocks(_merge_estimated_tree(refs), cfg), True
    tbl = pa.concat_tables(_ray.get(pair_refs)).drop_columns(
        ["fidx"]).combine_chunks()
    slices, _total = _driver_slices(tbl, cap, window, cfg)
    if not slices:
        return ray.data.from_arrow(_EMPTY_EST), True
    if len(slices) == 1 and slices[0][2]:
        # single slice: expand + estimate inline on the driver (ids,
        # not indices — the est tuple is unsorted, hence the sorter)
        out = _expand_sorted_slice(slices[0][0], slices[0][1], cap,
                                   window)
        a = np.asarray(out["a"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        b = np.asarray(out["b"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        cp = np.asarray(out["capped"].to_numpy(zero_copy_only=False),
                        dtype=bool)
        sids, smat, snsh, ssim = _ray.get(est_ref)
        merged = _est_unique_score(a, b, cp, sids, smat, snsh, ssim,
                                   cfg, "n_bands", ids_sorted=False)
        return _est_blocks(merged, cfg), True
    refs = [_expand_slice_task.remote(bh, fi, ps, cap, window,
                                      est_ref, cfg)
            for bh, fi, ps in slices]
    return _est_blocks(_merge_estimated_tree(refs), cfg), True


def _distributed_candidates(pairable: ray.data.Dataset,
                            cfg: PipelineConfig, nparts: int,
                            distinct: bool) -> ray.data.Dataset:
    """Fully distributed bucket pairing over the singleton-filtered
    band table (the path past every driver gate)."""
    cap, window = cfg.bucket_cap, cfg.bucket_window

    # ---- distributed fallback: pairable exceeds one driver pull ------
    # Hot detection runs on the FILTERED table: a hot key has global
    # count > cap >= 2, so the bitmap filter kept every one of its rows
    # and the exact phase-2 counts are unchanged; bitmap-collision
    # singletons have count 1 and can never test hot.
    hot_keys = detect_hot_keys(pairable, cap)
    hot_arr = pa.array(hot_keys) if len(hot_keys) else None

    def split_cold(batch: pa.Table) -> pa.Table:
        """Join input = pairable minus hot keys."""
        if batch.num_rows == 0 or hot_arr is None:
            return batch
        return batch.filter(
            pc.invert(pc.is_in(batch["band_hash"], value_set=hot_arr)))

    # materialize both splits: the empty-side join guard (Ray 2.49's
    # hash join raises ArrowInvalid on a fully EMPTY side, observed
    # under extreme skew) needs counts
    cold = pairable.map_batches(
        split_cold, batch_format="pyarrow",
        batch_size=None).materialize()
    cold_empty = cold.count() == 0
    if hot_arr is not None:
        def split_hot(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.is_in(batch["band_hash"],
                                         value_set=hot_arr))

        hot = pairable.map_batches(
            split_hot, batch_format="pyarrow",
            batch_size=None).materialize()
    else:
        hot = None

    def finish_cold(batch: pa.Table) -> pa.Table:
        keep = pc.less(batch["a"], batch["b"])
        out = batch.filter(keep)
        return pa.table({
            "a": out["a"], "b": out["b"],
            "capped": pa.array(np.zeros(out.num_rows, dtype=bool))})

    if cold_empty:
        pairs = ray.data.from_arrow(pa.table({
            "a": pa.array([], pa.int64()),
            "b": pa.array([], pa.int64()),
            "capped": pa.array([], pa.bool_())}))
    else:
        # ---- cold path: arrow hash self-join, all pairs in bucket ----
        left = cold.rename_columns({"file_id": "a"})
        right = cold.rename_columns({"file_id": "b"})
        joined = left.join(right, join_type="inner",
                           num_partitions=nparts, on=("band_hash",))
        pairs = joined.map_batches(finish_cold, batch_format="pyarrow")

    # ---- hot path: window edges from the few heavy buckets ----------
    if hot is not None:
        hot_buckets = (hot.groupby("band_hash")
                       .aggregate(CollectList("file_id",
                                              alias_name="ids")))

        def expand_hot(batch: pa.Table) -> pa.Table:
            aa, bb = [], []
            col = batch["ids"].combine_chunks()
            offsets = np.asarray(col.offsets, dtype=np.int64)
            values = np.asarray(col.values, dtype=np.int64)
            for i in range(batch.num_rows):
                ids_arr = np.sort(values[offsets[i]:offsets[i + 1]])
                for j in range(1, window + 1):
                    if j < len(ids_arr):
                        aa.append(ids_arr[:-j])
                        bb.append(ids_arr[j:])
            if not aa:
                return pa.table({"a": pa.array([], pa.int64()),
                                 "b": pa.array([], pa.int64()),
                                 "capped": pa.array([], pa.bool_())})
            a_all = np.concatenate(aa)
            return pa.table({
                "a": pa.array(a_all),
                "b": pa.array(np.concatenate(bb)),
                "capped": pa.array(np.ones(len(a_all), dtype=bool))})

        pairs = pairs.union(
            hot_buckets.map_batches(expand_hot, batch_format="pyarrow"))

    if not distinct:
        return pairs
    return distinct_pairs(pairs)


#: A MATERIALIZED occurrence set at or below this row count is distinct-
#: compressed with one vectorized np.unique on the driver instead of a
#: distributed groupby: Ray's sort-shuffle aggregate costs seconds of
#: fixed setup that dwarfs a sub-million-row reduce (measured 9 s for a
#: 426k-row distinct at 32 CPUs vs ~0.2 s driver-side). Past the limit
#: (est-surviving pairs scale with true duplicate density, not corpus
#: size, but CAN exceed it) the distributed groupby runs; both paths
#: produce identical rows.
DRIVER_DISTINCT_LIMIT = gate(2_000_000, "driver_distinct_limit")


def _driver_distinct_table(tbl: pa.Table) -> pa.Table:
    """Vectorized exact distinct of occurrence rows (driver-side path)."""
    names = tbl.column_names
    a = np.asarray(tbl["a"].to_numpy(zero_copy_only=False),
                   dtype=np.int64)
    b = np.asarray(tbl["b"].to_numpy(zero_copy_only=False),
                   dtype=np.int64)
    n_occ = (np.asarray(tbl["n_occ"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)
             if "n_occ" in names else np.ones(len(a), dtype=np.int64))
    cp = np.asarray(tbl["capped"].to_numpy(zero_copy_only=False),
                    dtype=bool)
    uniq, inv = np.unique(np.stack([a, b], axis=1), axis=0,
                          return_inverse=True)
    k = len(uniq)
    n_bands = np.zeros(k, dtype=np.int64)
    np.add.at(n_bands, inv, n_occ)
    capped = np.zeros(k, dtype=bool)
    np.logical_or.at(capped, inv, cp)
    cols = {"a": pa.array(uniq[:, 0]), "b": pa.array(uniq[:, 1]),
            "n_bands": pa.array(n_bands), "capped": pa.array(capped)}
    for c in names:
        if c in ("a", "b", "n_occ", "capped"):
            continue
        v = np.asarray(tbl[c].to_numpy(zero_copy_only=False),
                       dtype=np.float64)
        acc = np.full(k, np.inf)
        np.minimum.at(acc, inv, v)
        cols[c] = pa.array(acc).cast(tbl.schema.field(c).type)
    return pa.table(cols)


def distinct_pairs(occurrences: ray.data.Dataset) -> ray.data.Dataset:
    """Pair occurrences -> one row per (a, b) with n_bands support,
    ``capped`` if any contributing bucket was capped, and the minimum of
    any per-occurrence score columns (they are identical per pair).

    Accepts either raw occurrence rows (n_bands = Count) or block-
    compressed rows carrying exact partial counts in ``n_occ``
    (n_bands = Sum of partials — same value, far fewer rows). A
    materialized input at or below ``DRIVER_DISTINCT_LIMIT`` rows is
    compressed on the driver (see the constant's rationale)."""
    from ray.data.aggregate import Min, Sum
    from ray.data.dataset import MaterializedDataset

    names = occurrences.schema().names
    n = (occurrences.count()
         if isinstance(occurrences, MaterializedDataset) else None)
    if n is not None and n <= DRIVER_DISTINCT_LIMIT:
        batches = list(occurrences.iter_batches(batch_format="pyarrow",
                                                batch_size=None))
        if not batches:
            empty = {"a": pa.array([], pa.int64()),
                     "b": pa.array([], pa.int64()),
                     "n_bands": pa.array([], pa.int64()),
                     "capped": pa.array([], pa.bool_())}
            for c in names:
                if c not in ("a", "b", "n_occ", "capped"):
                    empty[c] = pa.array(
                        [], occurrences.schema().base_schema.field(c).type)
            return ray.data.from_arrow(pa.table(empty))
        return ray.data.from_arrow(
            _driver_distinct_table(pa.concat_tables(batches)))

    support = (Sum("n_occ", alias_name="n_bands") if "n_occ" in names
               else Count(alias_name="n_bands"))
    extra = [Min(c, alias_name=c) for c in names
             if c not in ("a", "b", "capped", "n_occ")]
    return (occurrences.groupby(["a", "b"])
            .aggregate(support,
                       Max("capped", alias_name="capped"), *extra))


class VerifyStage:
    """Actor: candidate pairs with both contents -> scored pairs.

    Computes exact k-gram Jaccard, SimHash Hamming distance, and substring
    containment per pair. Holds a bounded shingle-set cache keyed by
    file_id so repeated pair members are shingled once per actor.
    """

    _CACHE_MAX = 4096

    def __init__(self, cfg: PipelineConfig):
        self.cfg = cfg
        self.cache: dict[int, tuple[np.ndarray, np.uint64 | None]] = {}

    def _features(self, fid: int, text: str, need_sim: bool
                  ) -> tuple[np.ndarray, np.uint64 | None]:
        hit = self.cache.get(fid)
        if hit is None or (need_sim and hit[1] is None):
            sh = shingle_array(text, self.cfg)
            hit = (np.unique(sh) if hit is None else hit[0],
                   mh.simhash64(sh) if need_sim else None)
            if len(self.cache) >= self._CACHE_MAX:
                # evict the oldest half (dict preserves insertion order):
                # a clear-all made a batch straddling the boundary
                # re-shingle every cached member it was about to reuse
                for k in list(self.cache)[:self._CACHE_MAX // 2]:
                    del self.cache[k]
            self.cache[fid] = hit
        return hit

    def __call__(self, batch: pa.Table) -> pa.Table:
        a_ids = batch["a"].to_pylist()
        b_ids = batch["b"].to_pylist()
        a_txt = batch["content_a"].to_pylist()
        b_txt = batch["content_b"].to_pylist()
        # ``hamming`` may already ride the pairs — the estimate
        # prefilter emits the exact popcount from the signature-stage
        # simhashes (one vectorized pass per unique pair), in which case
        # re-deriving SimHash from shingles here would be pure waste
        need_sim = "hamming" not in batch.column_names
        jac = np.empty(len(a_ids), dtype=np.float64)
        ham = (np.empty(len(a_ids), dtype=np.int64) if need_sim
               else None)
        contained = np.empty(len(a_ids), dtype=bool)
        for i, (ai, bi, at, bt) in enumerate(
                zip(a_ids, b_ids, a_txt, b_txt)):
            set_a, sim_a = self._features(ai, at, need_sim)
            set_b, sim_b = self._features(bi, bt, need_sim)
            jac[i] = mh.exact_jaccard(set_a, set_b)
            if need_sim:
                ham[i] = (int(sim_a) ^ int(sim_b)).bit_count()
            # substring containment in either direction (the suffix-array
            # pass over grouped content covers the cross-pair case;
            # within a verified pair the two-way scan is exact and cheap)
            contained[i] = (at in bt) or (bt in at)
        out = batch.drop_columns(["content_a", "content_b"])
        out = out.append_column("jaccard", pa.array(jac))
        if need_sim:
            out = out.append_column("hamming", pa.array(ham))
        out = out.append_column("contained", pa.array(contained))
        return out


def _join_both_sides(pairs: ray.data.Dataset, table: ray.data.Dataset,
                     payload: str, out_prefix: str,
                     nparts: int) -> ray.data.Dataset:
    """pairs(a,b,...) ⋈ table(file_id, payload) on a then b."""
    left = (pairs.rename_columns({"a": "file_id"})
            .join(table, join_type="inner", num_partitions=nparts,
                  on=("file_id",))
            .rename_columns({"file_id": "a", payload: f"{out_prefix}_a"}))
    return (left.rename_columns({"b": "file_id"})
            .join(table, join_type="inner", num_partitions=nparts,
                  on=("file_id",))
            .rename_columns({"file_id": "b", payload: f"{out_prefix}_b"}))


#: Broadcast the signature table into est-filter / fused-expansion tasks
#: below this row count. The broadcast ships the packed-NIBBLE slices of
#: the signatures (128 slots x 0.5 B + n_shingles + simhash + id
#: ≈ 88 B/row — the full u64 table never leaves the workers), so 4M
#: rows ≈ 350 MB: put ONCE, mapped zero-copy by every task on the node
#: (per-node copy on a cluster). Above it, fall back to hash joins. The
#: estimate kernel's pair-key packing needs sig indices < 2^30 (ia<<33
#: in an int64), so the limit must stay below 2^30 rows. At cluster
#: scale the limit keeps the broadcast bounded regardless of corpus
#: size.
BROADCAST_SIG_LIMIT = gate(4_000_000, "broadcast_sig_limit")

#: Fuse estimate-prefilter + distinct on the DRIVER while the raw
#: occurrence set is at most this many rows (~25 B/row => ~500 MB pull):
#: one np.unique + one vectorized nibble-slab gather replaces a 100+ MB
#: object-store round trip, a broadcast put, a distributed scoring map
#: and a separate distinct — the biggest serial-vs-fixed-cost win in the
#: verify stage at sub-gate sizes. Past the limit the distributed
#: estimate + distinct run unchanged (identical rows; parity-tested).
DRIVER_EST_LIMIT = gate(20_000_000, "driver_est_limit")


def _pair_cut_arrays(nsh_a: np.ndarray, nsh_b: np.ndarray,
                     cfg: PipelineConfig) -> np.ndarray:
    """Per-pair estimate cut: threshold - adaptive 4σ margin (see
    ``estimate_filter`` docstring)."""
    m = np.minimum(np.minimum(nsh_a, nsh_b), cfg.num_perms)
    m = np.maximum(m, 1)
    return (cfg.jaccard_threshold
            - np.maximum(cfg.est_prefilter_margin, 2.0 / np.sqrt(m)))


_NIBLO = np.uint64(0x1111111111111111)


def _sig_words(num_perms: int) -> int:
    """uint64 words per packed-nibble signature row (16 slots/word)."""
    return (num_perms + 15) // 16


def _pack_nibbles(m8: np.ndarray) -> np.ndarray:
    """(n, P) uint8 slot slices -> (n, 8*W) bytes holding the LOW
    NIBBLE of each slot (slot 2i in the low half of byte i), zero-padded
    to whole little-endian uint64 words so the estimate kernel can view
    rows as (n, W) uint64 and compare 16 slots per word op."""
    n, num_perms = m8.shape
    nbytes = 8 * _sig_words(num_perms)
    m4 = np.zeros((n, 2 * nbytes), dtype=np.uint8)
    m4[:, :num_perms] = m8 & 0x0F
    return m4[:, 0::2] | (m4[:, 1::2] << 4)


def _nibble_eq_counts(wa: np.ndarray, wb: np.ndarray,
                      num_perms: int,
                      scratch: tuple | None = None) -> np.ndarray:
    """Equal-4-bit-slot count per row between two (c, W) uint64
    packed-signature slabs: XOR, collapse each nibble's 4 bits into its
    low bit, invert to an equal-flag mask, then sum the 16 flags per
    word with one multiply-shift (flags live at bits 0,4,..,60 so
    e * 0x111..1 puts their sum in the top nibble — exact for sums
    <= 15; the sum-16 case is exactly w == 0, patched after). Padding
    nibbles (num_perms % 16 != 0) are forced unequal by OR-ing their
    positions into the XOR, which also keeps w == 0 unreachable for the
    tail word.

    ``scratch`` = (w, t, z) preallocated (>=c, W) uint64/uint64/bool
    buffers: every intermediate here is chunk-sized (~4 MB at the 64Ki
    chunk), which crosses glibc's mmap threshold — per-call allocation
    page-zeroes serially ACROSS concurrent workers (the documented
    mmap trap; the est gather loop runs this tens of times per task x
    128 tasks). With scratch the kernel allocates only the (c,) output.
    Identical math/output either way (parity-tested)."""
    c = len(wa)
    if scratch is None:
        w = wa ^ wb
        t = np.empty_like(w)
        z = np.empty(w.shape, dtype=bool)
    else:
        w, t, z = (buf[:c] for buf in scratch)
        np.bitwise_xor(wa, wb, out=w)
    rem = num_perms % 16
    if rem:
        w[:, -1] |= np.uint64(((1 << (4 * (16 - rem))) - 1) << (4 * rem))
    np.equal(w, np.uint64(0), out=z)        # sum-16 words, before w dies
    np.right_shift(w, np.uint64(1), out=t)
    np.bitwise_or(t, w, out=t)              # t = w | w >> 1
    np.right_shift(t, np.uint64(2), out=w)  # w is free: reuse as temp
    np.bitwise_or(t, w, out=t)              # t |= t >> 2
    np.bitwise_not(t, out=t)
    np.bitwise_and(t, _NIBLO, out=t)        # e
    np.multiply(t, _NIBLO, out=t)
    np.right_shift(t, np.uint64(60), out=t)
    # a w == 0 word computes 16 % 16 = 0 through the multiply trick —
    # add its 16 back from the row-wise count of such words (keeps every
    # remaining temporary (c,)-sized, under the mmap threshold)
    cnt = t.sum(axis=1).astype(np.int64)
    cnt += 16 * z.sum(axis=1)
    return cnt


def _nibble_eq_counts_bytes(sa: np.ndarray, sb: np.ndarray,
                            num_perms: int) -> np.ndarray:
    """Byte-form of ``_nibble_eq_counts`` for row-aligned FSB payloads
    (the join fallback): count equal nibbles per (c, 8*W) uint8 row
    pair, then subtract the always-equal zero padding so both paths
    emit the identical ``est``."""
    x = sa ^ sb
    cnt = (((x & 0x0F) == 0).sum(axis=1, dtype=np.int64)
           + ((x & 0xF0) == 0).sum(axis=1, dtype=np.int64))
    return cnt - (16 * _sig_words(num_perms) - num_perms)


def _sig4_pack_batch(batch: pa.Table, *, num_perms: int) -> pa.Table:
    """Narrow each 64-bit minhash slot to its LOW 4 BITS, packed 2
    slots/byte (see ``_pack_nibbles``). Slice equality can only
    OVERESTIMATE the slot-match fraction (false equality is a 2^-4
    collision, bias <= +(1-J)/16, upward-only), so recall is untouched
    while the broadcast and every per-pair gather move 1/16 of the
    64-bit bytes — the candidate stage's estimate gather is memory-bus
    bound, so halving bytes vs the former low-8 slices is the scaling
    lever (VERDICT r3: candidates stage 0.636 at 4->16 CPUs)."""
    n = batch.num_rows
    m8 = (np.asarray(
        batch["minhash"].combine_chunks().flatten().to_numpy(
            zero_copy_only=False), dtype=np.int64)
        .view(np.uint64).astype(np.uint8).reshape(n, num_perms))
    packed = _pack_nibbles(m8)
    return pa.table({
        "file_id": batch["file_id"],
        "sig4": pa.FixedSizeListArray.from_arrays(
            pa.array(packed.reshape(-1), pa.uint8()), packed.shape[1]),
        "n_shingles": batch["n_shingles"],
        "simhash": batch["simhash"],
    })


@ray.remote(num_returns=2)
def _sig4_block_task(tbl: pa.Table, num_perms: int,
                     expected_rows: int | None = None
                     ) -> tuple[pa.Table, int]:
    """Narrow one signature block to its packed-nibble slices (raw-task
    form of the ``_sig4_pack_batch`` map) + its row count (the fused
    path needs per-block offsets for positional indexing).
    ``expected_rows`` validates metadata-derived offsets IN the task —
    a mismatch must fail loudly (positional indexing would silently
    misattribute signatures), and checking here keeps the driver from
    blocking on the narrow wave just to count rows."""
    if expected_rows is not None and tbl.num_rows != expected_rows:
        raise ValueError(
            f"sig block metadata num_rows {expected_rows} != actual "
            f"{tbl.num_rows}; positional sig indexing would corrupt")
    out = _sig4_pack_batch(
        tbl.select(["file_id", "minhash", "n_shingles", "simhash"]),
        num_perms=num_perms)
    return out, out.num_rows


@ray.remote
def _merge_sig4_task(block_refs: list, num_perms: int,
                     sort: bool = True
                     ) -> tuple[np.ndarray, np.ndarray,
                                np.ndarray, np.ndarray]:
    """Concat (+ optionally id-sort) the narrowed sig4 blocks in ONE
    worker task so the driver never holds (or re-puts) the signature
    arrays; the returned tuple lands in plasma as the task output and
    every consumer maps it zero-copy. The signature slab is viewed as
    (n, W) uint64 words — the estimate kernel compares 16 slots per
    word op. ``sort=False`` keeps CONCAT (block) order — the fused
    path indexes it positionally via the per-block offsets, so no sort
    and no id lookups exist anywhere."""
    tbl = pa.concat_tables(ray.get(block_refs))
    ids = np.asarray(tbl["file_id"].to_numpy(zero_copy_only=False),
                     dtype=np.int64)
    nbytes = 8 * _sig_words(num_perms)
    mat = np.ascontiguousarray(np.asarray(
        tbl["sig4"].combine_chunks().flatten().to_numpy(
            zero_copy_only=False),
        dtype=np.uint8).reshape(len(ids), nbytes)).view(np.uint64)
    nsh = np.asarray(tbl["n_shingles"].to_numpy(zero_copy_only=False),
                     dtype=np.int64)
    sim = np.asarray(tbl["simhash"].to_numpy(zero_copy_only=False),
                     dtype=np.int64).view(np.uint64)
    if not sort:
        return ids, mat, nsh, sim
    order = np.argsort(ids)
    return (ids[order], np.ascontiguousarray(mat[order]), nsh[order],
            sim[order])


def _sig4_ref(sigs: ray.data.Dataset, cfg: PipelineConfig):
    """ObjectRef of (sorted file_ids, uint64[n, W] packed-nibble slabs,
    n_shingles, simhash uint64), all aligned. Narrowing to 0.5 B/slot
    runs distributed; the concat+sort runs in a worker task (the driver
    neither pulls nor re-puts the arrays — this was ~1 s of serial
    driver time per candidate stage). Carrying the 8-byte simhash lets
    the estimate emit the exact ``hamming`` column for free (one
    vectorized popcount per UNIQUE pair) so the content verifier never
    recomputes SimHash.

    Slice-equality on low nibbles can only OVERESTIMATE the match
    fraction: a false slot equality needs a 2^-4 collision, so the est
    bias is at most +(1-J)/16 <= +0.0625 — still 3x below the >=0.2
    adaptive prefilter margin and upward-only, so recall is untouched
    (a few extra sub-threshold pairs ride to the exact content
    verifier) while the broadcast and every per-pair gather move 1/16
    of the 64-bit bytes.
    """
    import functools

    from ray.data.dataset import MaterializedDataset

    if isinstance(sigs, MaterializedDataset):
        # raw tasks over the signature blocks — no executor spin-up
        refs = [t for t, _c in
                (_sig4_block_task.remote(r, cfg.num_perms)
                 for r in sigs.to_arrow_refs())]
    else:
        refs = (sigs.select_columns(
            ["file_id", "minhash", "n_shingles", "simhash"])
            .map_batches(functools.partial(_sig4_pack_batch,
                                           num_perms=cfg.num_perms),
                         batch_format="pyarrow", batch_size=None)
            .to_arrow_refs())
    return _merge_sig4_task.remote(refs, cfg.num_perms)


def _block_row_counts(ds) -> list[int] | None:
    """Per-block row counts of a materialized dataset from BLOCK
    METADATA (no task wave, no driver blocking) in ``to_arrow_refs``
    order; None when any block's count is unknown (callers fall back
    to counting in the narrow tasks)."""
    try:
        rows: list[int] = []
        for bundle in ds.iter_internal_ref_bundles():
            for _ref, meta in bundle.blocks:
                if meta.num_rows is None:
                    return None
                rows.append(int(meta.num_rows))
        return rows
    except Exception:
        return None


def _sig4_indexed(src_refs: list, cfg: PipelineConfig,
                  counts: list[int] | None = None):
    """(unsorted est tuple ref, per-block row offsets) for the fused
    positional-index path: narrow tasks per sig block, one UNSORTED
    merge task. With metadata ``counts`` the driver never blocks here —
    the narrow wave overlaps the bitmap wave that follows (the old
    ``ray.get`` on the counts serialized the two waves: candidates'
    critical path was narrow+bitmap+filter+expand strictly in
    sequence); each narrow task validates its block's count in-task.
    Without counts (unknown metadata) the old blocking count get
    runs."""
    if counts is not None:
        outs = [_sig4_block_task.remote(r, cfg.num_perms, int(c))
                for r, c in zip(src_refs, counts)]
        offsets = np.concatenate(
            ([0], np.cumsum(np.asarray(counts, dtype=np.int64))))
    else:
        outs = [_sig4_block_task.remote(r, cfg.num_perms)
                for r in src_refs]
        got = ray.get([c for _t, c in outs])
        offsets = np.concatenate(([0], np.cumsum(got)))
    est_ref = _merge_sig4_task.remote([t for t, _c in outs],
                                      cfg.num_perms, False)
    return est_ref, offsets


def _pull_sig4(sigs: ray.data.Dataset, cfg: PipelineConfig
               ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Driver-resident copy of the sig4 arrays (see ``_sig4_ref``);
    the arrays are plasma-backed read-only views."""
    return ray.get(_sig4_ref(sigs, cfg))


def _is_sorted(x: np.ndarray) -> bool:
    return len(x) < 2 or bool(np.all(x[:-1] <= x[1:]))


#: per-process est-gather scratch keyed by (chunk, words): two uint64
#: gather slabs + the kernel's (w, t, z) intermediates. Workers run one
#: task at a time, so one set per process suffices (same pattern as
#: _SIMHASH_KEY_SCRATCH).
_EST_SCRATCH: dict[tuple, tuple] = {}


def _est_gather_scratch(step: int, words: int) -> tuple:
    got = _EST_SCRATCH.get((step, words))
    if got is None:
        got = (np.empty((step, words), dtype=np.uint64),
               np.empty((step, words), dtype=np.uint64),
               np.empty((step, words), dtype=np.uint64),
               np.empty((step, words), dtype=np.uint64),
               np.empty((step, words), dtype=bool))
        _EST_SCRATCH[(step, words)] = got
    return got


def _est_unique_score(a: np.ndarray, b: np.ndarray, cp: np.ndarray,
                      sids: np.ndarray, smat: np.ndarray,
                      snsh: np.ndarray, ssim: np.ndarray,
                      cfg: PipelineConfig, count_col: str,
                      are_indices: bool = False,
                      ids_sorted: bool = True) -> pa.Table:
    """Shared estimate core: compress occurrence rows to unique pairs
    via a PACKED dense-index key (ia<<32 | ib — both sides index the
    signature arrays positionally, so one 1-D int64 ``np.unique``
    replaces the ~5x-slower 2-column ``axis=0`` unique), then ONE uint8
    slice gather + slot compare per unique pair with the adaptive cut.
    The exact ``hamming`` rides along (popcount of the gathered
    simhashes) so the content verifier never recomputes SimHash.

    ``are_indices=True``: a/b already ARE positional indices into the
    sig arrays (the fused range path — no binary search at all; at 2.7M
    occurrences per task the per-occurrence searchsorted was 2.3 s of a
    2.5 s kernel). The emitted index pairs put the smaller FILE ID
    first (``_expand_sorted_slice``), so output order/content matches
    the id-based path exactly. ``ids_sorted=False`` handles an
    unsorted ``sids`` via a sorter argsort (the fused small path shares
    the unsorted broadcast tuple)."""
    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64()),
                      count_col: pa.array([], pa.int64()),
                      "capped": pa.array([], pa.bool_()),
                      "est": pa.array([], pa.float64()),
                      "hamming": pa.array([], pa.int64())})
    if len(a) == 0:
        return empty
    if are_indices:
        ia, ib = a, b
    elif ids_sorted:
        ia = np.searchsorted(sids, a)
        ib = np.searchsorted(sids, b)
    else:
        sorter = np.argsort(sids)
        ia = sorter[np.searchsorted(sids, a, sorter=sorter)]
        ib = sorter[np.searchsorted(sids, b, sorter=sorter)]
    # Pack the capped flag into bit 0 so ONE sort-based
    # unique(+counts) covers pair dedup, occurrence counting AND
    # capped-any in a single pass — the return_inverse variant this
    # replaces runs argsort + an inverse scatter, measured ~6x slower
    # at block scale. Both sig indices are < 2^30 (BROADCAST_SIG_LIMIT
    # stays below that by contract — see its docstring)
    # so ia<<33 | ib<<1 | cp fits int64 and the unique order is still
    # (a, b, capped) lexicographic; merging the <=2 capped variants of
    # a pair below keeps output order (a, b) lexicographic as before.
    key = (ia.astype(np.int64) << 33) | (ib.astype(np.int64) << 1) | cp
    ukey, kcounts = np.unique(key, return_counts=True)
    pkey = ukey >> 1
    starts = np.flatnonzero(np.diff(pkey, prepend=np.int64(-1)))
    counts = np.add.reduceat(kcounts, starts)
    capped_any = np.add.reduceat((ukey & 1).astype(np.int64), starts) > 0
    upkey = pkey[starts]
    uia = (upkey >> 32).astype(np.int64)
    uib = (upkey & 0xFFFFFFFF).astype(np.int64)
    # Chunked gather+compare: one whole-block smat[uia] materializes
    # hundreds of MB of temporaries — measured 9x slower than 64Ki-pair
    # chunks (page-fault bound), and the page zeroing serializes across
    # concurrent workers, which flat-lined est_filter from 4 to 16 CPUs.
    # The slab is packed nibbles in uint64 words (_nibble_eq_counts:
    # 16 slot compares per word op, half the gathered bytes of the
    # former uint8 slices — this gather is the candidate stage's
    # memory-bus bottleneck). count/num_perms equals the slot-match
    # mean bit-for-bit (integer dividend, one correctly-rounded divide).
    m_pairs = len(uia)
    est = np.empty(m_pairs, np.float64)
    keep = np.empty(m_pairs, dtype=bool)
    step = 1 << 16
    # every chunk-sized temporary (gathers + kernel intermediates,
    # ~4 MB each) reuses per-process scratch: fresh per-chunk
    # allocations cross glibc's mmap threshold and their page zeroing
    # serializes across the 128 concurrent range tasks (the documented
    # trap; measured ~1.7x on this wave at 1.28M files x 32 CPUs)
    ga, gb, kw, kt, kz = _est_gather_scratch(step, smat.shape[1])
    for off in range(0, m_pairs, step):
        sl = slice(off, min(off + step, m_pairs))
        c = sl.stop - sl.start
        np.take(smat, uia[sl], axis=0, out=ga[:c], mode="clip")
        np.take(smat, uib[sl], axis=0, out=gb[:c], mode="clip")
        e = _nibble_eq_counts(ga[:c], gb[:c], cfg.num_perms,
                              scratch=(kw, kt, kz)) / cfg.num_perms
        est[sl] = e
        keep[sl] = e >= _pair_cut_arrays(snsh[uia[sl]], snsh[uib[sl]],
                                         cfg)
    if not keep.any():
        return empty
    uia, uib = uia[keep], uib[keep]
    ham = mh.hamming64(ssim[uia], ssim[uib])
    return pa.table({
        "a": pa.array(sids[uia]),
        "b": pa.array(sids[uib]),
        count_col: pa.array(np.asarray(counts[keep], dtype=np.int64)),
        "capped": pa.array(capped_any[keep]),
        "est": pa.array(est[keep], pa.float64()),
        "hamming": pa.array(ham, pa.int64())})


def _driver_estimate_distinct(occ: pa.Table, sids: np.ndarray,
                              smat: np.ndarray, snsh: np.ndarray,
                              ssim: np.ndarray,
                              cfg: PipelineConfig) -> pa.Table:
    """Fused est-prefilter + distinct over a driver-resident occurrence
    table (see ``_est_unique_score``). Output columns match the
    distributed estimate→distinct chain exactly."""
    if occ.num_rows == 0:
        return _est_unique_score(
            np.empty(0, np.int64), np.empty(0, np.int64),
            np.empty(0, bool), sids, smat, snsh, ssim, cfg, "n_bands")
    a = np.asarray(occ["a"].to_numpy(zero_copy_only=False),
                   dtype=np.int64)
    b = np.asarray(occ["b"].to_numpy(zero_copy_only=False),
                   dtype=np.int64)
    cp = np.asarray(occ["capped"].to_numpy(zero_copy_only=False),
                    dtype=bool)
    return _est_unique_score(a, b, cp, sids, smat, snsh, ssim, cfg,
                             "n_bands")


def estimate_filter(pairs: ray.data.Dataset, sigs: ray.data.Dataset,
                    cfg: PipelineConfig,
                    num_partitions: int | None = None) -> ray.data.Dataset:
    """Signature-estimate prefilter: drop candidates whose MinHash-estimated
    Jaccard is more than ``est_prefilter_margin`` below the verification
    threshold BEFORE the (expensive) content joins.

    LSH banding admits many low-J pairs (hot boilerplate buckets); at 128
    perms the estimate is tight enough that a 4σ margin is lossless in
    practice, and the surviving candidate set — not the raw bucket
    blowup — pays for content shipping.

    The margin is ADAPTIVE per pair: the configured margin assumes ~128
    independent estimator slots, which holds for the kperm scheme but not
    for OPH on short documents — there the estimator's effective sample
    is min(n_shingles, num_perms), so a doc with tens of shingles has
    σ up to ~0.1 and a fixed 0.2 margin would drop true pairs. Each pair
    uses max(margin, 2/sqrt(min(nsh_a, nsh_b, num_perms))) (a 4σ bound at
    worst-case J=0.5); for very short docs the cut falls below 0 and the
    prefilter passes them straight to exact verification.

    Small signature tables are broadcast ONCE via ``ray.put`` and looked
    up per batch (no shuffle at all); past ``BROADCAST_SIG_LIMIT`` rows
    the filter switches to two hash joins with signatures packed as
    fixed-width binary (Arrow joins reject list payloads).
    """
    nparts = num_partitions or join_parts(cfg)

    from ray.data.dataset import MaterializedDataset

    n_sigs = (sigs.count()
              if isinstance(sigs, MaterializedDataset) else None)
    if n_sigs is not None and n_sigs <= BROADCAST_SIG_LIMIT:
        import ray

        # Ship only the LOW 4 BITS of each signature slot, packed into
        # uint64 words (see _sig4_ref: upward-only bias <= +0.0625 vs a
        # >=0.2 margin) — the broadcast and every per-batch gather move
        # 1/16 of the 64-bit bytes. The merge-task output ref IS the
        # broadcast handle (no driver pull, no second put).
        handle = _sig4_ref(sigs, cfg)

        def score_bcast(batch: pa.Table) -> pa.Table:
            # COMPRESS per block: one output row per unique (a,b) with
            # its exact in-block occurrence count (n_occ) and capped-any.
            # The same pair repeats across bands (hot windows
            # especially); compressing before the bandwidth-heavy
            # signature gather AND the global distinct groupby keeps
            # both proportional to unique pairs. Sums of exact partial
            # counts stay layout-independent.
            sids, smat, snsh, ssim = ray.get(handle)
            a = np.asarray(batch["a"].to_numpy(zero_copy_only=False),
                           dtype=np.int64)
            b = np.asarray(batch["b"].to_numpy(zero_copy_only=False),
                           dtype=np.int64)
            cp = np.asarray(batch["capped"].to_numpy(
                zero_copy_only=False), dtype=bool)
            return _est_unique_score(a, b, cp, sids, smat, snsh, ssim,
                                     cfg, "n_occ")

        # join outputs leave ~join_parts big blocks; split them so the
        # (memory-bandwidth-heavy) signature-gather map uses every core.
        # batch_size=None: the whole block per call — the default 1024-
        # row batching would re-pay the Python + unique + gather setup
        # thousands of times per block AND compress band repeats far
        # less (smaller batches see fewer repeats of the same pair).
        pairs = pairs.repartition(4 * _pool_max(cfg), shuffle=False)
        return pairs.map_batches(score_bcast, batch_format="pyarrow",
                                 batch_size=None)

    sig_w = 8 * _sig_words(cfg.num_perms)

    def pack(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        mat = _pack_nibbles(np.asarray(
            batch["minhash"].combine_chunks().flatten().to_numpy(
                zero_copy_only=False), dtype=np.int64)
            .view(np.uint64).astype(np.uint8).reshape(n, cfg.num_perms))
        nsh = np.ascontiguousarray(np.asarray(
            batch["n_shingles"].to_numpy(zero_copy_only=False),
            dtype=np.int64))
        sim = np.ascontiguousarray(np.asarray(
            batch["simhash"].to_numpy(zero_copy_only=False),
            dtype=np.int64))
        # ONE fixed-width blob per row (packed-nibble sig slots +
        # trailing int64 shingle count + int64 simhash): Arrow joins
        # reject list payloads, and a single fixed-size-binary column
        # keeps the join plumbing simple; low-4 slices cut the sig
        # payload width 16x (recall-safe — see _sig4_ref); the simhash
        # rides so this path emits the same ``hamming`` column as the
        # broadcast path. The column is built from the matrix buffer in
        # one shot (fsb_from_matrix) — no per-row Python.
        blob_mat = np.concatenate(
            [mat, nsh.view(np.uint8).reshape(n, 8),
             sim.view(np.uint8).reshape(n, 8)], axis=1)
        return pa.table({"file_id": batch["file_id"],
                         "sig": fsb_from_matrix(blob_mat)})

    packed = sigs.select_columns(
        ["file_id", "minhash", "n_shingles", "simhash"]).map_batches(
        pack, batch_format="pyarrow", batch_size=None)
    both = _join_both_sides(pairs, packed, "sig", "sig", nparts)

    def score(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return (batch.drop_columns(["sig_a", "sig_b"])
                    .append_column("est", pa.array([], pa.float64()))
                    .append_column("hamming", pa.array([], pa.int64())))
        rawa = fsb_to_matrix(batch["sig_a"], np.uint8)
        rawb = fsb_to_matrix(batch["sig_b"], np.uint8)
        sa = rawa[:, :sig_w]
        sb = rawb[:, :sig_w]
        na = (np.ascontiguousarray(rawa[:, sig_w:sig_w + 8])
              .view(np.int64).ravel())
        nb = (np.ascontiguousarray(rawb[:, sig_w:sig_w + 8])
              .view(np.int64).ravel())
        sima = (np.ascontiguousarray(rawa[:, sig_w + 8:])
                .view(np.uint64).ravel())
        simb = (np.ascontiguousarray(rawb[:, sig_w + 8:])
                .view(np.uint64).ravel())
        est = (_nibble_eq_counts_bytes(sa, sb, cfg.num_perms)
               / cfg.num_perms)
        ham = mh.hamming64(sima, simb)
        keep = est >= _pair_cut_arrays(na, nb, cfg)
        out = (batch.drop_columns(["sig_a", "sig_b"])
               .append_column("est", pa.array(est, pa.float64()))
               .append_column("hamming", pa.array(ham, pa.int64())))
        return out.filter(pa.array(keep))

    return both.map_batches(score, batch_format="pyarrow",
                            batch_size=None)


def verify_pairs(pairs: ray.data.Dataset, docs: ray.data.Dataset,
                 cfg: PipelineConfig,
                 sigs: ray.data.Dataset | None = None,
                 num_partitions: int | None = None,
                 occurrences: bool = False,
                 prefiltered: bool = False) -> ray.data.Dataset:
    """Score candidate pairs: estimate-prefilter (if signatures given),
    then attach both contents and compute exact Jaccard / Hamming /
    containment.

    Content attachment (broadcast fetch or hash joins) runs only over
    estimate-surviving pairs — the raw LSH bucket blowup never touches
    the wide content column. ``occurrences=True`` marks per-band
    pair-occurrence input (``candidate_pairs(distinct=False)``): the
    surviving occurrences are deduped after the prefilter.
    ``prefiltered=True`` marks input from ``candidate_pairs_estimated``
    — already estimate-filtered AND distinct (schema a, b, n_bands,
    capped, est, hamming), so this goes straight to content attach.
    """
    nparts = num_partitions or join_parts(cfg)
    if prefiltered:
        from ray.data.dataset import MaterializedDataset

        small = _maybe_small_verify(pairs, docs, cfg)
        if small is not None:
            return small
        target = 4 * _pool_max(cfg)
        # candidate_pairs_estimated pre-slices its survivors into
        # blocks (_est_blocks); only re-split coarse inputs (e.g. a
        # 1-block checkpoint read-back)
        if not (isinstance(pairs, MaterializedDataset)
                and pairs.num_blocks() >= min(4, target)):
            pairs = pairs.repartition(target, shuffle=False).materialize()
    elif sigs is not None:
        from ray.data.dataset import MaterializedDataset

        n_occ_rows = (pairs.count()
                      if isinstance(pairs, MaterializedDataset) else None)
        n_sigs = (sigs.count()
                  if isinstance(sigs, MaterializedDataset) else None)
        if (occurrences and n_occ_rows is not None
                and n_occ_rows <= DRIVER_EST_LIMIT
                and n_sigs is not None
                and n_sigs <= BROADCAST_SIG_LIMIT):
            # fused driver path: est + distinct in one vectorized step
            # (see DRIVER_EST_LIMIT rationale)
            batches = list(pairs.iter_batches(batch_format="pyarrow",
                                              batch_size=None))
            occ_tbl = (pa.concat_tables(batches) if batches
                       else pa.table({"a": pa.array([], pa.int64()),
                                      "b": pa.array([], pa.int64()),
                                      "capped": pa.array([],
                                                         pa.bool_())}))
            sids, smat, snsh, ssim = _pull_sig4(sigs, cfg)
            pairs = ray.data.from_arrow(_driver_estimate_distinct(
                occ_tbl, sids, smat, snsh, ssim, cfg))
        else:
            # barrier after the prefilter: separates any est-filter join
            # graph from what follows (aggregator reservations must not
            # stack) and gives the distinct/content count gates a
            # counted input
            pairs = estimate_filter(pairs, sigs, cfg,
                                    nparts).materialize()
            if occurrences:
                pairs = distinct_pairs(pairs)
        small = _maybe_small_verify(pairs, docs, cfg)
        if small is not None:
            return small
        # restore map parallelism: the driver-exact distinct yields ONE
        # block (and join/groupby outputs yield few) — split shuffle-free
        # so the content attach + verify maps use every core; 4
        # blocks/slot packs around per-pair cost skew
        pairs = pairs.repartition(4 * _pool_max(cfg),
                                  shuffle=False).materialize()

    both = _fetch_pair_contents(pairs, docs, nparts)
    import functools

    return both.map_batches(
        functools.partial(verify_batch, cfg=cfg),
        batch_format="pyarrow", batch_size=cfg.batch_size)


_VERIFY_STAGE_CACHE: dict[PipelineConfig, "VerifyStage"] = {}


def verify_batch(batch: pa.Table, *, cfg: PipelineConfig) -> pa.Table:
    """Task-based verifier with a per-process stage (and shingle) cache —
    see ``signature_batch`` for the pattern rationale."""
    stage = _VERIFY_STAGE_CACHE.get(cfg)
    if stage is None:
        stage = _VERIFY_STAGE_CACHE.setdefault(cfg, VerifyStage(cfg))
    return stage(batch)


_EMPTY_CONTENT = pa.table({"file_id": pa.array([], pa.int64()),
                           "content": pa.array([], pa.large_string())})


@ray.remote
def _slice_content_block_task(t: pa.Table, needed: np.ndarray) -> pa.Table:
    """Extract (file_id, content) rows whose id is in the sorted
    ``needed`` array, returned as ONE single-chunk table. Runs once per
    doc block BEFORE the verify chunk tasks: without this wave each of
    the ~40 chunk tasks at the top of the verify gate iterated every
    content block and paid its own combine_chunks() copy of the same
    multi-chunk blocks concurrently (the documented mmap page-zeroing
    serialization trap), and on a multi-node cluster would ship the
    whole content table per task. The sliced outputs are tiny
    (≤ 2 x pair count rows total across all blocks)."""
    fid = _i64_view(t["file_id"])
    if not len(fid) or not len(needed):
        return _EMPTY_CONTENT
    pos = np.minimum(np.searchsorted(needed, fid), len(needed) - 1)
    idx = np.flatnonzero(needed[pos] == fid)
    if not len(idx):
        return _EMPTY_CONTENT
    content = t["content"]
    if content.num_chunks != 1:
        content = content.combine_chunks()
    else:
        content = content.chunk(0)
    return pa.table({
        "file_id": pa.array(fid[idx]),
        "content": content.take(pa.array(idx))})


@ray.remote
def _verify_chunk_task(pairs_tbl: pa.Table, doc_refs: list,
                       cfg: PipelineConfig) -> pa.Table:
    """Attach + score one chunk of pairs in a single raw task.

    ``doc_refs`` is a plain list (NOT auto-dereferenced) of the
    PRE-SLICED content blocks from ``_slice_content_block_task`` —
    small, single-chunk, holding only ids some pair references; this
    chunk's own gather narrows further to its pairs' rows. Shingle
    sets are shared across pairs via the per-process ``VerifyStage``
    cache."""
    a = np.asarray(pairs_tbl["a"].to_numpy(zero_copy_only=False),
                   dtype=np.int64)
    b = np.asarray(pairs_tbl["b"].to_numpy(zero_copy_only=False),
                   dtype=np.int64)
    needed = np.unique(np.concatenate([a, b])) if len(a) else (
        np.empty(0, dtype=np.int64))
    texts: dict[int, str] = {}
    if len(needed):
        for t in ray.get(doc_refs):
            fid = _i64_view(t["file_id"])
            if not len(fid):
                continue
            pos = np.minimum(np.searchsorted(needed, fid),
                             len(needed) - 1)
            idx = np.flatnonzero(needed[pos] == fid)
            if len(idx):
                col = t["content"]
                c0 = (col.chunk(0) if col.num_chunks == 1
                      else col.combine_chunks())
                vals = c0.take(pa.array(idx)).to_pylist()
                for i, v in zip(fid[idx], vals):
                    texts[int(i)] = v
    both = (pairs_tbl
            .append_column("content_a", pa.array(
                [texts[int(x)] for x in a], pa.large_string()))
            .append_column("content_b", pa.array(
                [texts[int(x)] for x in b], pa.large_string())))
    return verify_batch(both, cfg=cfg)


def _maybe_small_verify(pairs: ray.data.Dataset, docs: ray.data.Dataset,
                        cfg: PipelineConfig) -> ray.data.Dataset | None:
    """Count-gated raw-task verify (see ``DRIVER_VERIFY_LIMIT``): when
    both the survivor-pair count and the doc table are materialized and
    the pair count is under the gate, verify in one wave of chunk tasks
    over the doc block refs. Returns None when the gate doesn't apply
    (the distributed locator/join flow handles those)."""
    from ray.data.dataset import MaterializedDataset

    if not (isinstance(pairs, MaterializedDataset)
            and isinstance(docs, MaterializedDataset)):
        return None
    n = pairs.count()
    if n > DRIVER_VERIFY_LIMIT:
        return None
    batches = list(pairs.iter_batches(batch_format="pyarrow",
                                      batch_size=None))
    tbl = (pa.concat_tables(batches).combine_chunks() if batches
           else None)
    if tbl is None:
        # run the empty table through one task anyway: the scored
        # schema (jaccard/contained appended) falls out for free
        empty = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64()),
                          "est": pa.array([], pa.float64()),
                          "hamming": pa.array([], pa.int64())})
        return ray.data.from_arrow_refs(
            [_verify_chunk_task.remote(empty, [], cfg)])
    # wave 1: slice every doc block down to the referenced ids ONCE
    # (see _slice_content_block_task); wave 2 chunk tasks read only
    # the slim slices
    needed = np.unique(np.concatenate([
        np.asarray(tbl["a"].to_numpy(zero_copy_only=False),
                   dtype=np.int64),
        np.asarray(tbl["b"].to_numpy(zero_copy_only=False),
                   dtype=np.int64)]))
    needed_ref = ray.put(needed)
    slim_refs = [_slice_content_block_task.remote(r, needed_ref)
                 for r in docs.to_arrow_refs()]
    chunk = 512
    refs = [_verify_chunk_task.remote(tbl.slice(s, chunk), slim_refs,
                                      cfg)
            for s in range(0, tbl.num_rows, chunk)]
    return ray.data.from_arrow_refs(refs)


#: Verify via driver-orchestrated raw tasks when at most this many pairs
#: survived the prefilter: the driver pulls only the slim pair table
#: (~40 B/row => <1 MB at the limit), slices it into ~512-pair chunks,
#: and ONE wave of raw tasks filters the doc blocks + attaches contents
#: + scores — zero executor spin-ups, no repartition. This exists
#: because the per-block locator flow below costs ~2.4 s of fixed
#: executor/task setup that a small survivor set can't amortize (the
#: r3→r4 sf0.1 regression: verify 0.85→2.55 s at 241 pairs); above the
#: gate the locator flow's shared filtered-content index wins because
#: chunk tasks would each rescan the doc blocks.
DRIVER_VERIFY_LIMIT = gate(20_000, "driver_verify_limit")

#: Broadcast pair contents when at most this many pairs survived the
#: prefilter; beyond it (or when the pair count is unknown because the
#: input is lazy), use hash joins. The real memory bound is
#: min(corpus content, 2 x pairs x mean content bytes) — the broadcast
#: table lives ONCE in the object store (per node on a cluster) and every
#: attach task maps it zero-copy, so ~1M pairs x ~1 KiB docs ≈ low GBs;
#: the measured alternative (two content hash joins) was 3-4x slower at
#: 146k pairs because content rides the shuffle twice.
BROADCAST_PAIR_LIMIT = gate(1_000_000, "broadcast_pair_limit")


def _fetch_pair_contents(pairs: ray.data.Dataset,
                         docs: ray.data.Dataset,
                         nparts: int) -> ray.data.Dataset:
    """Attach content_a/content_b to pairs.

    Small pair sets: collect the referenced file_ids, FILTER the doc
    table (raw tasks over a materialized table's block refs, else one
    streaming pass), and attach per batch from the filtered blocks'
    refs. Large pair sets: two hash joins (content rides each exactly
    once).
    """
    import ray

    from ray.data.dataset import MaterializedDataset

    n_pairs = (pairs.count()
               if isinstance(pairs, MaterializedDataset) else None)
    if n_pairs is not None and n_pairs <= BROADCAST_PAIR_LIMIT:
        needed_arr: list[np.ndarray] = []
        for b in pairs.select_columns(["a", "b"]).iter_batches(
                batch_format="pyarrow", batch_size=None):
            needed_arr.append(np.asarray(
                b["a"].to_numpy(zero_copy_only=False), dtype=np.int64))
            needed_arr.append(np.asarray(
                b["b"].to_numpy(zero_copy_only=False), dtype=np.int64))
        needed = (np.unique(np.concatenate(needed_arr)) if needed_arr
                  else np.empty(0, dtype=np.int64))
        id_arr = pa.array(needed)

        # the filtered content blocks never touch the driver and are
        # never merged/copied: raw tasks filter a materialized doc
        # table's blocks (no executor spin-up; lazy inputs keep the
        # executor map); the driver pulls only the ID columns (~8 B per
        # matched doc) to build a (sorted id -> block, row) locator,
        # and each attach batch gathers from the per-block content
        # columns grouped by block — zero-copy plasma views, no ~GB
        # merge task, no whole-table copies anywhere. (Earlier designs:
        # taking from a many-chunk ChunkedArray is O(total) per call,
        # and one merged flat table cost a 3.6 GB-alloc worker task.)
        from ray.data.dataset import MaterializedDataset

        if isinstance(docs, MaterializedDataset):
            needed_ref = ray.put(needed)
            content_refs = [
                _filter_content_block_task.remote(r, needed_ref)
                for r in docs.to_arrow_refs()]
        else:
            def keep(batch: pa.Table) -> pa.Table:
                return batch.filter(pc.is_in(batch["file_id"],
                                             value_set=id_arr))

            content_refs = list(docs.select_columns(
                ["file_id", "content"]).map_batches(
                keep, batch_format="pyarrow",
                batch_size=None).to_arrow_refs())
        ids_l, blk_l, row_l = [], [], []
        # the driver fetches ONLY the int64 id arrays (tiny id-
        # extraction tasks): ray.get of the content refs themselves
        # would map the full filtered blocks into the driver — zero-
        # copy on one node, but on a multi-node cluster it ships every
        # content block to the driver just to read ids
        for bi, ids in enumerate(ray.get(
                [_block_ids_task.remote(r) for r in content_refs])):
            nloc = len(ids)
            if nloc:
                ids_l.append(ids)
                blk_l.append(np.full(nloc, bi, dtype=np.int32))
                row_l.append(np.arange(nloc, dtype=np.int32))
        if ids_l:
            ids_cat = np.concatenate(ids_l)
            order = np.argsort(ids_cat)
            locator = (ids_cat[order], np.concatenate(blk_l)[order],
                       np.concatenate(row_l)[order])
        else:
            locator = (np.empty(0, dtype=np.int64),
                       np.empty(0, dtype=np.int32),
                       np.empty(0, dtype=np.int32))
        loc_ref = ray.put(locator)
        refs_tuple = tuple(content_refs)

        def attach(batch: pa.Table) -> pa.Table:
            sids, sblk, srow = ray.get(loc_ref)
            cols = _content_cols(refs_tuple)
            n = batch.num_rows
            ab = np.concatenate([
                np.asarray(batch["a"].to_numpy(zero_copy_only=False),
                           dtype=np.int64),
                np.asarray(batch["b"].to_numpy(zero_copy_only=False),
                           dtype=np.int64)])
            pos = np.searchsorted(sids, ab)
            blk, row = sblk[pos], srow[pos]
            # gather grouped by source block (each block column is one
            # flat array -> cheap takes), then un-permute
            grp = np.argsort(blk, kind="stable")
            parts = []
            gblk, grow = blk[grp], row[grp]
            bounds = np.flatnonzero(np.diff(gblk, prepend=-1))
            for s, e in zip(bounds, np.append(bounds[1:], len(gblk))):
                parts.append(cols[gblk[s]].take(pa.array(grow[s:e])))
            gathered = (pa.concat_arrays(parts) if parts
                        else pa.array([], pa.string()))
            inv = np.empty(len(grp), dtype=np.int64)
            inv[grp] = np.arange(len(grp))
            both = gathered.take(pa.array(inv))
            return (batch
                    .append_column("content_a", both.slice(0, n))
                    .append_column("content_b", both.slice(n, n)))

        return pairs.map_batches(attach, batch_format="pyarrow",
                                 batch_size=None)

    return _join_both_sides(
        pairs, docs.select_columns(["file_id", "content"]), "content",
        "content", nparts)


@ray.remote
def _block_ids_task(tbl: pa.Table) -> np.ndarray:
    """Just the int64 file_id array of one filtered content block —
    lets the locator build pull ids without shipping content."""
    return np.ascontiguousarray(_i64_view(tbl["file_id"]))


@ray.remote
def _filter_content_block_task(tbl: pa.Table,
                               needed_sorted: np.ndarray) -> pa.Table:
    """Keep the (file_id, content) rows whose id is in the sorted
    needed-id array (vectorized searchsorted membership).

    The output is COMBINED to single-chunk here, once, in this task:
    upstream map blocks arrive multi-chunk (the executor bundles map
    outputs by concatenation), and a multi-chunk filtered block would
    make every consumer worker's ``_content_cols`` pay its own
    combine_chunks copy — N workers each copying the filtered content
    concurrently serialize on mmap page-zeroing (the documented 77 s
    trap). One combine per block, in parallel tasks, keeps the
    consumers on the zero-copy ``chunk(0)`` path."""
    fid = np.asarray(tbl["file_id"].to_numpy(zero_copy_only=False),
                     dtype=np.int64)
    if len(needed_sorted) == 0 or tbl.num_rows == 0:
        return (tbl.select(["file_id", "content"]).slice(0, 0)
                .combine_chunks())
    pos = np.minimum(np.searchsorted(needed_sorted, fid),
                     len(needed_sorted) - 1)
    mask = needed_sorted[pos] == fid
    return (tbl.select(["file_id", "content"]).filter(pa.array(mask))
            .combine_chunks())


#: per-worker-process cache of the per-block content column views
#: (bounded: cleared when a new pair-set's refs arrive)
_CONTENT_REF_CACHE: dict[tuple, list] = {}


def _content_cols(content_refs: tuple) -> list:
    """Per-block flat content-column views from the filtered blocks —
    zero-copy plasma reads, cached once per worker process.

    MUST stay zero-copy: ``combine_chunks()`` copies even a
    single-chunk column, and N workers each copying ~GBs concurrently
    serialize on mmap page-zeroing (measured 77 s across 16 workers at
    1.2 GB of content vs ~0 s for ``chunk(0)`` views)."""
    key = tuple(r.hex() for r in content_refs)
    cols = _CONTENT_REF_CACHE.get(key)
    if cols is None:
        import ray as _ray

        cols = []
        for t in _ray.get(list(content_refs)):
            c = t["content"]
            cols.append(c.chunk(0) if c.num_chunks == 1
                        else c.combine_chunks())
        if len(_CONTENT_REF_CACHE) >= 2:
            _CONTENT_REF_CACHE.clear()
        _CONTENT_REF_CACHE[key] = cols
    return cols


def duplicate_edges(verified: ray.data.Dataset,
                    cfg: PipelineConfig) -> ray.data.Dataset:
    """Scored pairs -> accepted duplicate edges (a, b)."""
    thr = cfg.jaccard_threshold
    return (verified.filter(expr=f"jaccard >= {thr}")
            .select_columns(["a", "b"]))


def simhash_pairs(sigs: ray.data.Dataset, cfg: PipelineConfig,
                  band_bits: int = 16) -> ray.data.Dataset:
    """Standalone SimHash dedup: pairs with Hamming distance <=
    ``cfg.simhash_max_hamming`` found via banded fingerprints.

    Pigeonhole guarantee: a 64-bit fingerprint split into 4 x 16-bit
    bands — any pair within Hamming distance 3 shares at least one
    intact band (Charikar-style banding); larger allowed distances (up
    to simhash_max_hamming) are found when any band survives, and every
    candidate is verified by exact popcount. Band-equal buckets are
    EXACT-match groups on 16 fingerprint bits, so full pair expansion is
    the documented semantics — the hot-bucket cap is raised to a blowup
    backstop (>=4096) rather than the LSH default, and any pair that DID
    ride a capped bucket carries ``capped=True`` in the output, so recall
    is exact for d <= bands-1 *provided no bucket exceeded the cap*, and
    the truncation is visible when one did. Output: (a, b, hamming,
    capped).

    The popcount verification broadcasts the (file_id, simhash) table
    only while it is under ``BROADCAST_SIG_LIMIT`` rows (16 B/row =>
    ~64 MB at the limit); past it, fingerprints are attached via two
    hash joins on int64 payloads (no packing needed) — the same
    count-gate + join-fallback contract as ``estimate_filter``.
    """
    n_bands = 64 // band_bits
    mask = np.uint64((1 << band_bits) - 1)

    def to_bands(batch: pa.Table) -> pa.Table:
        sim = np.asarray(batch["simhash"].to_numpy(zero_copy_only=False),
                         dtype=np.int64).view(np.uint64)
        ids = np.asarray(batch["file_id"].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        shifts = (np.arange(n_bands, dtype=np.uint64)
                  * np.uint64(band_bits))
        vals = ((sim[:, None] >> shifts[None, :]) & mask)
        # mix band index in so the shuffle key is one int64. The index
        # must live in DISJOINT bits (shifted above the value), not be
        # XORed into the small value range: band values span only
        # 2**band_bits, so an xor'd index makes buckets from different
        # bands collide onto one key (observed: 128 bands collapsing to
        # ~256 merged buckets — blowup + capping with zero information)
        from data_deduplication_service_ray.functions.hashing import (
            splitmix64)

        idx = np.arange(n_bands, dtype=np.uint64)
        mixed = splitmix64((idx[None, :] << np.uint64(band_bits)) | vals)
        return pa.table({
            "band_hash": _as_i64(mixed.reshape(-1)),
            "file_id": pa.array(np.repeat(ids, n_bands)),
        })

    slim = sigs.select_columns(["file_id", "simhash"]).materialize()
    bands = slim.map_batches(to_bands, batch_format="pyarrow",
                             batch_size=None)
    sim_cfg = cfg.with_(bucket_cap=max(cfg.bucket_cap, 4096))
    pairs = candidate_pairs(
        bands, sim_cfg, distinct=True,
        n_rows_hint=slim.count() * n_bands).materialize()
    max_d = cfg.simhash_max_hamming

    def _finish(a, b, cp, ha, hb):
        d = mh.hamming64(ha.view(np.uint64), hb.view(np.uint64))
        keep = d <= max_d
        return pa.table({"a": pa.array(a[keep]),
                         "b": pa.array(b[keep]),
                         "hamming": pa.array(d[keep]),
                         "capped": pa.array(cp[keep])})

    _EMPTY = pa.table({"a": pa.array([], pa.int64()),
                       "b": pa.array([], pa.int64()),
                       "hamming": pa.array([], pa.int64()),
                       "capped": pa.array([], pa.bool_())})

    if slim.count() <= BROADCAST_SIG_LIMIT:
        import ray as _ray

        tbl = pa.concat_tables(
            [b for b in slim.iter_batches(batch_format="pyarrow",
                                          batch_size=None)])
        ids_np = np.asarray(tbl["file_id"].to_numpy(zero_copy_only=False),
                            dtype=np.int64)
        order = np.argsort(ids_np)
        handle = _ray.put((ids_np[order], np.asarray(
            tbl["simhash"].to_numpy(zero_copy_only=False),
            dtype=np.int64)[order]))

        def verify(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return _EMPTY
            sids, ssim = _ray.get(handle)
            a = np.asarray(batch["a"].to_numpy(zero_copy_only=False),
                           dtype=np.int64)
            b = np.asarray(batch["b"].to_numpy(zero_copy_only=False),
                           dtype=np.int64)
            cp = np.asarray(batch["capped"].to_numpy(
                zero_copy_only=False), dtype=bool)
            ha = ssim[np.searchsorted(sids, a)]
            hb = ssim[np.searchsorted(sids, b)]
            return _finish(a, b, cp, ha, hb)

        return pairs.map_batches(verify, batch_format="pyarrow",
                                 batch_size=None)

    # join fallback: fingerprint table too big to broadcast — attach the
    # int64 simhash to each side with hash joins
    both = _join_both_sides(
        pairs.select_columns(["a", "b", "capped"]), slim, "simhash",
        "sh", join_parts(cfg))

    def verify_joined(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _EMPTY
        a = np.asarray(batch["a"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        b = np.asarray(batch["b"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        cp = np.asarray(batch["capped"].to_numpy(zero_copy_only=False),
                        dtype=bool)
        ha = np.asarray(batch["sh_a"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        hb = np.asarray(batch["sh_b"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        return _finish(a, b, cp, ha, hb)

    return both.map_batches(verify_joined, batch_format="pyarrow",
                            batch_size=None)


# ---------------------------------------------------------------------------
# SQL-parity SimHash (the fingerprints_sql precedent applied to SimHash)
# ---------------------------------------------------------------------------

#: Per-bit affine mixers for the SQL-parity SimHash: bit b of a shingle
#: hash h (< 2^31-1) is ((h*A_b + B_b) % P) % 2 — every term < 2^62, so
#: DuckDB BIGINT arithmetic computes the identical bit. Fixed seed,
#: independent of PipelineConfig (determinism across runs/CPU counts).
_PARITY_P = 2147483647
_PARITY_AB = np.random.default_rng(0x51A4).integers(
    1, _PARITY_P, size=(2, 64), dtype=np.int64)


def simhash_parity_signatures(docs: ray.data.Dataset,
                              k: int = 8) -> ray.data.Dataset:
    """(file_id, content) -> (file_id, simhash) where the 64-bit
    fingerprint is a SimHash (per-bit majority vote over the doc's
    DISTINCT shingle hashes, Charikar 2002) built from SQL-computable
    pieces: the code-point k-gram polynomial hash mod 2^31-1 that
    ``fingerprints_sql`` already oracles, mixed per bit by the affine
    family above. The production ``simhash64`` (splitmix64 over 64-bit
    shingle hashes) keeps the SAME majority-vote structure but needs
    mod-2^64 multiplies DuckDB BIGINT cannot express — this parity
    variant gives the banding/pigeonhole/popcount PAIR MACHINERY
    (``simhash_pairs``) a value-level oracle; the splitmix kernel
    itself stays pytest-gated (see api.py next to ORACLE_SQL)."""
    from data_deduplication_service_ray.stages.text import (
        _poly_kgram_codes)

    a_mix = _PARITY_AB[0].astype(np.uint64)
    b_mix = _PARITY_AB[1].astype(np.uint64)
    p = np.uint64(_PARITY_P)
    weights = np.uint64(1) << np.arange(64, dtype=np.uint64)

    def fp(batch: pa.Table) -> pa.Table:
        fids, sims = [], []
        for fid, text in zip(batch["file_id"].to_pylist(),
                             batch["content"].to_pylist()):
            if not text:
                continue
            hs = np.unique(_poly_kgram_codes(text, k))
            bits = ((hs[:, None] * a_mix[None, :] + b_mix[None, :])
                    % p) & np.uint64(1)
            maj = (2 * bits.sum(axis=0, dtype=np.int64)
                   >= len(hs)).astype(np.uint64)
            fids.append(fid)
            sims.append(int((maj * weights).sum(dtype=np.uint64)))
        return pa.table({
            "file_id": pa.array(fids, pa.int64()),
            "simhash": _as_i64(np.array(sims, dtype=np.uint64))})

    return docs.map_batches(fp, batch_format="pyarrow")


#: Affine permutation family for the SQL-parity MinHash (32 slots —
#: enough to pin the machinery; the production signature uses 128 OPH
#: slots). Same BIGINT-safety contract as _PARITY_AB.
_MINHASH_PARITY_AB = np.random.default_rng(0x31A7).integers(
    1, _PARITY_P, size=(2, 32), dtype=np.int64)


def minhash_parity_signatures(docs: ray.data.Dataset,
                              k: int = 8) -> ray.data.Dataset:
    """(file_id, content) -> flat (file_id, slot, minhash) rows: the
    classic K-permutation MinHash (min over an affine permutation of
    the shingle-hash set per slot, Broder 1997) computed from
    SQL-expressible pieces — the ``fingerprints_sql`` pattern applied
    to the permutation-min sketch. The production 128-slot OPH kernel
    (functions/minhash.py) keeps the same min-sketch structure over
    splitmix64-mixed 64-bit hashes, which DuckDB cannot reproduce
    bit-exactly (mod-2^64 multiplies); its determinism + estimator
    accuracy stay pytest-gated while THIS query pins the sketch
    machinery to a value-level oracle."""
    from data_deduplication_service_ray.stages.text import (
        _poly_kgram_codes)

    a_mix = _MINHASH_PARITY_AB[0].astype(np.uint64)
    b_mix = _MINHASH_PARITY_AB[1].astype(np.uint64)
    p = np.uint64(_PARITY_P)
    n_slots = len(a_mix)
    slots = np.arange(n_slots, dtype=np.int64)

    def fp(batch: pa.Table) -> pa.Table:
        fids, slot_l, mins = [], [], []
        for fid, text in zip(batch["file_id"].to_pylist(),
                             batch["content"].to_pylist()):
            if not text:
                continue
            hs = np.unique(_poly_kgram_codes(text, k))
            mv = ((hs[:, None] * a_mix[None, :] + b_mix[None, :])
                  % p).min(axis=0)
            fids.append(np.full(n_slots, fid, dtype=np.int64))
            slot_l.append(slots)
            mins.append(mv.astype(np.int64))
        if not fids:
            return pa.table({"file_id": pa.array([], pa.int64()),
                             "slot": pa.array([], pa.int64()),
                             "minhash": pa.array([], pa.int64())})
        return pa.table({
            "file_id": pa.array(np.concatenate(fids)),
            "slot": pa.array(np.concatenate(slot_l)),
            "minhash": pa.array(np.concatenate(mins))})

    return docs.map_batches(fp, batch_format="pyarrow")
