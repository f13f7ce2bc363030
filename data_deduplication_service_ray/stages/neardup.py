"""Near-duplicate detection stages: signatures, LSH banding, verification.

North-star pipeline (BASELINE.json): shingling -> MinHash(128)/LSH banding
-> SimHash-64 scoring -> substring containment -> pair verification. This
module holds the per-stage Ray Data transforms; ``pipelines.neardup``
composes them.

Scale notes (the parts the reference never had to solve, SURVEY.md §4):
- signatures/verification are **actor pools** (``map_batches(Cls,
  concurrency=N)``) — permutation seeds are built once per actor in
  ``__init__``, and the verifier keeps a bounded per-actor shingle-set
  cache so a document appearing in many candidate pairs is re-shingled
  once per actor, not once per pair;
- content never rides through the LSH shuffle — bands carry
  ``(band_id, band_hash, file_id)`` only; content is re-joined strictly
  for the verification of surviving candidates (SURVEY.md §7.4 wide rows);
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

from data_deduplication_service_ray.config import PipelineConfig
from data_deduplication_service_ray.functions import minhash as mh
from data_deduplication_service_ray.functions.aggregates import CollectList
from data_deduplication_service_ray.stages.segment import shingle_array


def _as_i64(arr_u64: np.ndarray) -> pa.Array:
    """Reinterpret uint64 as int64 for Arrow/shuffle friendliness."""
    return pa.array(arr_u64.view(np.int64))


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

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["content"].to_pylist()
        shingle_sets = [shingle_array(t, self.cfg) for t in texts]
        sigs = mh.minhash_signatures_batch(shingle_sets, self.seeds)
        simhashes = np.array([mh.simhash64(s) for s in shingle_sets],
                             dtype=np.uint64)
        n = np.array([len(s) for s in shingle_sets], dtype=np.int64)
        flat = _as_i64(sigs.reshape(-1))
        return pa.table({
            "file_id": batch["file_id"],
            "minhash": pa.FixedSizeListArray.from_arrays(
                flat, self.cfg.num_perms),
            "simhash": _as_i64(simhashes),
            "n_shingles": pa.array(n),
        })


def signatures(docs: ray.data.Dataset, cfg: PipelineConfig,
               concurrency: int | None = None) -> ray.data.Dataset:
    # autoscaling pool (min 1): a fixed-size pool would pre-reserve CPUs
    # and can deadlock a multi-pool pipeline on a small machine
    return docs.map_batches(
        SignatureStage, fn_constructor_args=(cfg,),
        batch_format="pyarrow", batch_size=cfg.batch_size,
        concurrency=(1, concurrency or cfg.minhash_concurrency))


def band_rows(sigs: ray.data.Dataset, cfg: PipelineConfig
              ) -> ray.data.Dataset:
    """Signatures -> (band_id:int32, band_hash:int64, file_id) flat rows."""
    bands = cfg.lsh_bands

    def expand(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        sig_mat = np.asarray(
            batch["minhash"].combine_chunks().flatten().to_numpy(
                zero_copy_only=False),
            dtype=np.int64).view(np.uint64).reshape(n, cfg.num_perms)
        bh = mh.band_hashes_batch(sig_mat, bands)          # (n, bands)
        fid = np.asarray(batch["file_id"].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        return pa.table({
            "band_id": pa.array(
                np.tile(np.arange(bands, dtype=np.int32), n)),
            "band_hash": _as_i64(bh.reshape(-1)),
            "file_id": pa.array(np.repeat(fid, bands)),
        })

    return sigs.map_batches(expand, batch_format="pyarrow")


def candidate_pairs(bands: ray.data.Dataset, cfg: PipelineConfig,
                    num_partitions: int | None = None) -> ray.data.Dataset:
    """LSH buckets -> distinct candidate pairs (a<b).

    groupby (band_id, band_hash) is THE near-dup shuffle (the analog of
    the reference's global upsert shuffle, lib/dbManager.cpp:274-281).
    Buckets over ``bucket_cap`` emit a sorted-neighbor window
    (``bucket_window`` edges per member) instead of all pairs.
    Pair distinctness across bands via a second groupby on (a, b), which
    also yields the band-support count ``n_bands``.
    """
    cap, window = cfg.bucket_cap, cfg.bucket_window

    buckets = (bands.groupby(["band_id", "band_hash"])
               .aggregate(CollectList("file_id", alias_name="ids")))

    def expand_pairs(batch: pa.Table) -> pa.Table:
        aa: list[np.ndarray] = []
        bb: list[np.ndarray] = []
        capped: list[np.ndarray] = []
        for ids in batch["ids"].to_pylist():
            k = len(ids)
            if k < 2:
                continue
            ids_arr = np.sort(np.asarray(ids, dtype=np.int64))
            if k <= cap:
                iu = np.triu_indices(k, 1)
                aa.append(ids_arr[iu[0]])
                bb.append(ids_arr[iu[1]])
                capped.append(np.zeros(len(iu[0]), dtype=bool))
            else:
                # hot bucket: neighbor-window edges keep the component
                # connected at O(k*window) cost; truncation is explicit
                pairs_a, pairs_b = [], []
                for j in range(1, window + 1):
                    pairs_a.append(ids_arr[:-j])
                    pairs_b.append(ids_arr[j:])
                aa.append(np.concatenate(pairs_a))
                bb.append(np.concatenate(pairs_b))
                capped.append(np.ones(sum(len(p) for p in pairs_a),
                                      dtype=bool))
        if not aa:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "capped": pa.array([], pa.bool_())})
        return pa.table({"a": pa.array(np.concatenate(aa)),
                         "b": pa.array(np.concatenate(bb)),
                         "capped": pa.array(np.concatenate(capped))})

    pairs = buckets.map_batches(expand_pairs, batch_format="pyarrow")
    return (pairs.groupby(["a", "b"])
            .aggregate(Count(alias_name="n_bands"),
                       Max("capped", alias_name="capped")))


class VerifyStage:
    """Actor: candidate pairs with both contents -> scored pairs.

    Computes exact k-gram Jaccard, SimHash Hamming distance, and substring
    containment per pair. Holds a bounded shingle-set cache keyed by
    file_id so repeated pair members are shingled once per actor.
    """

    _CACHE_MAX = 4096

    def __init__(self, cfg: PipelineConfig):
        self.cfg = cfg
        self.cache: dict[int, tuple[np.ndarray, np.uint64]] = {}

    def _features(self, fid: int, text: str) -> tuple[np.ndarray, np.uint64]:
        hit = self.cache.get(fid)
        if hit is None:
            sh = shingle_array(text, self.cfg)
            hit = (np.unique(sh), mh.simhash64(sh))
            if len(self.cache) >= self._CACHE_MAX:
                self.cache.clear()
            self.cache[fid] = hit
        return hit

    def __call__(self, batch: pa.Table) -> pa.Table:
        a_ids = batch["a"].to_pylist()
        b_ids = batch["b"].to_pylist()
        a_txt = batch["content_a"].to_pylist()
        b_txt = batch["content_b"].to_pylist()
        jac = np.empty(len(a_ids), dtype=np.float64)
        ham = np.empty(len(a_ids), dtype=np.int64)
        contained = np.empty(len(a_ids), dtype=bool)
        for i, (ai, bi, at, bt) in enumerate(
                zip(a_ids, b_ids, a_txt, b_txt)):
            set_a, sim_a = self._features(ai, at)
            set_b, sim_b = self._features(bi, bt)
            jac[i] = mh.exact_jaccard(set_a, set_b)
            ham[i] = mh.hamming64(np.array([sim_a]),
                                  np.array([sim_b]))[0]
            # substring containment in either direction (the suffix-array
            # pass over grouped content covers the cross-pair case;
            # within a verified pair the two-way scan is exact and cheap)
            contained[i] = (at in bt) or (bt in at)
        out = batch.select(["a", "b", "n_bands", "capped"])
        out = out.append_column("jaccard", pa.array(jac))
        out = out.append_column("hamming", pa.array(ham))
        out = out.append_column("contained", pa.array(contained))
        return out


def verify_pairs(pairs: ray.data.Dataset, docs: ray.data.Dataset,
                 cfg: PipelineConfig,
                 num_partitions: int | None = None) -> ray.data.Dataset:
    """Join both contents onto candidate pairs and score them.

    Two hash joins on file_id (content rides each join exactly once);
    at cluster scale the docs side is the big relation and the pairs side
    is small — Ray's hash join partitions both on the key.
    """
    nparts = num_partitions or cfg.join_num_partitions
    slim = docs.select_columns(["file_id", "content"])
    left = (pairs.rename_columns({"a": "file_id"})
            .join(slim, join_type="inner", num_partitions=nparts,
                  on=("file_id",))
            .rename_columns({"file_id": "a", "content": "content_a"}))
    both = (left.rename_columns({"b": "file_id"})
            .join(slim, join_type="inner", num_partitions=nparts,
                  on=("file_id",))
            .rename_columns({"file_id": "b", "content": "content_b"}))
    return both.map_batches(
        VerifyStage, fn_constructor_args=(cfg,),
        batch_format="pyarrow", batch_size=cfg.batch_size,
        concurrency=(1, cfg.minhash_concurrency))


def duplicate_edges(verified: ray.data.Dataset,
                    cfg: PipelineConfig) -> ray.data.Dataset:
    """Scored pairs -> accepted duplicate edges (a, b)."""
    thr = cfg.jaccard_threshold
    return (verified.filter(expr=f"jaccard >= {thr}")
            .select_columns(["a", "b"]))
