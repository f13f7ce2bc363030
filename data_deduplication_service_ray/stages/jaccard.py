"""Exact character-n-gram Jaccard edges + clusters — the SQL-oracled
twin of the LSH near-dup pipeline.

The LSH pipeline (stages/neardup.py) approximates Jaccard through
MinHash banding and therefore has no value-level SQL oracle; this stage
computes the EXACT pair set at a threshold so the whole chain —
candidate generation, pair scoring, and crucially the connected-
components clustering (stages/cluster.py ``cc_min_labels``, the
flagship output's machinery) — is adjudicated by DuckDB end to end
(recursive-CTE min-label propagation on the oracle side). Reference
analog: the cluster-assignment gate of SURVEY.md §5 / the round-trip
compare kernels V1-V3 (lib/fileUtils.cpp:6-94) applied at the
north-star layer.

Exactness argument (the identity the whole stage leans on):

    J(A, B) = |A∩B| / (|A|+|B|-|A∩B|)  >=  tau
        <=>  |A∩B| >= tau * (|A|+|B|) / (1+tau)

so a pair's verdict is a pure threshold on its SHARED-GRAM COUNT. The
stage computes shared counts from 64-bit gram hashes (equal grams always
collide, distinct grams collide w.p. ~2^-64), keeps every pair within
``HASH_MARGIN`` of the bound, and re-verifies survivors on the REAL gram
strings — the final edge set equals SQL's unless >= HASH_MARGIN
independent 2^-64 hash collisions line up inside one pair (probability
~2^-128; determinism is unconditional, the hash family is fixed).

Scale shape: candidate generation reuses the house bucket machinery
(``candidate_pairs`` — hash-partitioned, never all-pairs) with UNCAPPED
buckets, because a capped bucket drops pairs and breaks the oracle
equality. That makes this the oracle-parity path: at 10^12 files a hot
gram ("        ", license boilerplate) expands O(k²) and the capped LSH
pipeline is the production path. Shared-count prefilter and the gram-
string re-verify broadcast small sides (per-doc gram counts ≈ 16 B/doc,
survivor contents bounded by true-dup density) below count gates, with
join fallbacks past them (GRAFT_FORCE_DISTRIBUTED exercises those).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from data_deduplication_service_ray.config import (PipelineConfig, gate,
                                                   join_parts)
from data_deduplication_service_ray.functions.hashing import (
    char_kgram_hashes)

#: Shared-count slack (in grams) for the hash-based prefilter: covers
#: within-pair 64-bit gram-hash collisions (each deflates the shared
#: count by at most 1; expected collisions per pair ~ m²/2^64 ≈ 0).
#: Survivors are re-verified on gram STRINGS, so the margin only needs
#: to prevent false NEGATIVES at the prefilter.
HASH_MARGIN = 2.0

#: Broadcast the per-doc gram-count table into the prefilter below this
#: many docs (16 B/doc -> 160 MB at the limit); past it, two hash joins
#: attach the counts (identical survivors — parity-tested).
BROADCAST_COUNT_LIMIT = gate(10_000_000, "broadcast_count_limit")

#: Broadcast survivor-pair contents into the exact re-verify below this
#: many surviving pairs; survivors scale with true duplicate density,
#: not corpus size. Past it, contents attach via the content join.
BROADCAST_VERIFY_LIMIT = gate(100_000, "broadcast_verify_limit")


def _doc_gram_tables(batch: pa.Table, k: int) -> pa.Table:
    """Per-doc distinct gram-hash rows (band_hash, file_id, n_grams) —
    the doc's exact distinct-gram count rides every row so counts never
    need a second corpus shingling pass. One ``char_kgram_hashes`` +
    ``np.unique`` per doc; the per-doc Python is the batch iteration
    only, hashing and dedup are vectorized."""
    fids_out, hs_out, n_out = [], [], []
    for fid, t in zip(batch["file_id"].to_pylist(),
                      batch["content"].to_pylist()):
        if not t:
            continue
        h = np.unique(char_kgram_hashes(t, k))
        fids_out.append(np.full(len(h), fid, dtype=np.int64))
        hs_out.append(h.view(np.int64))
        n_out.append(np.full(len(h), len(h), dtype=np.int64))
    if not fids_out:
        return pa.table({"band_hash": pa.array([], pa.int64()),
                         "file_id": pa.array([], pa.int64()),
                         "n_grams": pa.array([], pa.int64())})
    return pa.table({
        "band_hash": pa.array(np.concatenate(hs_out)),
        "file_id": pa.array(np.concatenate(fids_out)),
        "n_grams": pa.array(np.concatenate(n_out))})


def _block_doc_counts(batch: pa.Table) -> pa.Table:
    """Gram rows -> per-block distinct (file_id, n_grams) pairs (exact:
    n_grams is constant per doc; cross-block duplicates — a doc whose
    rows got split across blocks — are deduped by the consumer)."""
    if batch.num_rows == 0:
        return pa.table({"file_id": pa.array([], pa.int64()),
                         "n_grams": pa.array([], pa.int64())})
    f = np.asarray(batch["file_id"].to_numpy(zero_copy_only=False),
                   dtype=np.int64)
    n = np.asarray(batch["n_grams"].to_numpy(zero_copy_only=False),
                   dtype=np.int64)
    uniq, idx = np.unique(f, return_index=True)
    return pa.table({"file_id": pa.array(uniq),
                     "n_grams": pa.array(n[idx])})


def _score_gram_jaccard(batch: pa.Table, texts_a: list[str],
                        texts_b: list[str], k: int,
                        tau: float) -> pa.Table:
    """Shared exact-verify kernel for the broadcast and join paths: ONE
    scoring expression (the parity contract — inter/(na+nb-inter) on
    true gram-string sets) so the two content-fetch strategies can
    never drift apart."""
    sets_a = _gram_sets(texts_a, k)
    sets_b = _gram_sets(texts_b, k)
    jac = []
    for sa, sb in zip(sets_a, sets_b):
        inter = len(sa & sb)
        jac.append(inter / (len(sa) + len(sb) - inter))
    jarr = np.array(jac, dtype=np.float64)
    keep = jarr >= tau
    return pa.table({
        "a": batch["a"].filter(pa.array(keep)),
        "b": batch["b"].filter(pa.array(keep)),
        "jaccard": pa.array(jarr[keep], pa.float64())})


def _gram_sets(texts: list[str], k: int) -> list[set]:
    """True per-doc char k-gram STRING sets (the re-verify ground truth;
    same partial-tail rule as SQL's substring CTE)."""
    out = []
    for t in texts:
        out.append({t[i: i + k] for i in range(max(len(t) - k + 1, 1))})
    return out


def exact_jaccard_edges(docs: ray.data.Dataset, k: int = 8,
                        tau: float = 0.5,
                        cfg: PipelineConfig | None = None
                        ) -> ray.data.Dataset:
    """(file_id, content) docs -> exact Jaccard edges (a, b, jaccard)
    with a < b and jaccard >= tau over distinct char k-grams.

    Empty docs are excluded (reference empty-file guard,
    include/FileService.h:372-377 — and the oracle's length(text) > 0)."""
    from data_deduplication_service_ray.stages.neardup import (
        _join_both_sides, candidate_pairs, distinct_pairs)

    cfg = (cfg or PipelineConfig()).with_(bucket_cap=1 << 30)
    nparts = join_parts(cfg)
    slim = docs.select_columns(["file_id", "content"])

    # gram rows carry the doc's exact distinct-gram count so the corpus
    # is shingled ONCE (the former separate counts pass re-hashed every
    # doc); materialized because both the candidate machinery and the
    # counts derivation consume it. candidate_pairs keeps only
    # band_hash/file_id, so the extra column never rides the pairing.
    rows = slim.map_batches(_doc_gram_tables, batch_format="pyarrow",
                            fn_kwargs={"k": k}).materialize()
    # occurrence rows (one per shared gram per pair) are ~20x the
    # distinct pair count here — compress each block to exact partial
    # counts BEFORE the global distinct (distinct_pairs sums ``n_occ``),
    # the groupby-combiner house pattern: the all-to-all reduce sees
    # pair-sized, not occurrence-sized, input.
    occ = candidate_pairs(rows, cfg, distinct=False,
                          n_rows_hint=rows.count())

    def compress(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "n_occ": pa.array([], pa.int64()),
                             "capped": pa.array([], pa.bool_())})
        a = np.asarray(batch["a"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        b = np.asarray(batch["b"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        uniq, cnts = np.unique(np.stack([a, b], axis=1), axis=0,
                               return_counts=True)
        return pa.table({
            "a": pa.array(uniq[:, 0]), "b": pa.array(uniq[:, 1]),
            "n_occ": pa.array(cnts.astype(np.int64)),
            "capped": pa.array(np.zeros(len(uniq), dtype=bool))})

    comp = occ.map_batches(compress, batch_format="pyarrow",
                           batch_size=None).materialize()
    _empty_edges = pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "jaccard": pa.array([], pa.float64())})
    if comp.count() == 0:
        # no pair shares a gram -> no candidates, no edges. Returning
        # here also keeps a fully-empty dataset out of the count/content
        # joins below (Ray 2.49 raises ArrowInvalid on empty join sides)
        return ray.data.from_arrow(_empty_edges)
    cand = distinct_pairs(comp)

    # per-doc counts derived FROM the gram rows (no second shingling
    # pass): per-block distinct (file_id, n_grams), deduped globally by
    # the consumer (a doc's rows can be split across blocks, each copy
    # carrying the identical count)
    counts = rows.map_batches(_block_doc_counts, batch_format="pyarrow",
                              batch_size=None).materialize()
    n_docs = counts.count()

    need_scale = tau / (1.0 + tau)

    if n_docs <= BROADCAST_COUNT_LIMIT:
        ids_l, cnt_l = [], []
        for b in counts.iter_batches(batch_format="pyarrow",
                                     batch_size=None):
            ids_l.append(np.asarray(
                b["file_id"].to_numpy(zero_copy_only=False),
                dtype=np.int64))
            cnt_l.append(np.asarray(
                b["n_grams"].to_numpy(zero_copy_only=False),
                dtype=np.int64))
        ids = (np.concatenate(ids_l) if ids_l
               else np.empty(0, dtype=np.int64))
        cnt = (np.concatenate(cnt_l) if cnt_l
               else np.empty(0, dtype=np.int64))
        ids, first = np.unique(ids, return_index=True)  # cross-block dedup
        cnt = cnt[first]
        handle = ray.put((ids, cnt))

        def prefilter(batch: pa.Table) -> pa.Table:
            sids, scnt = ray.get(handle)
            a = np.asarray(batch["a"].to_numpy(zero_copy_only=False),
                           dtype=np.int64)
            b = np.asarray(batch["b"].to_numpy(zero_copy_only=False),
                           dtype=np.int64)
            shared = np.asarray(
                batch["n_bands"].to_numpy(zero_copy_only=False),
                dtype=np.int64)
            na = scnt[np.searchsorted(sids, a)]
            nb = scnt[np.searchsorted(sids, b)]
            keep = shared >= need_scale * (na + nb) - HASH_MARGIN
            return pa.table({"a": pa.array(a[keep]),
                             "b": pa.array(b[keep])})

        surv = cand.map_batches(prefilter, batch_format="pyarrow")
    else:
        from ray.data.aggregate import Max

        # global distinct (cross-block duplicate counts collapse; Max of
        # identical values) before the join fallback
        counts_d = counts.groupby("file_id").aggregate(
            Max("n_grams", alias_name="n_grams"))
        joined = _join_both_sides(cand, counts_d, "n_grams", "ng", nparts)

        def prefilter_joined(batch: pa.Table) -> pa.Table:
            shared = np.asarray(
                batch["n_bands"].to_numpy(zero_copy_only=False),
                dtype=np.int64)
            na = np.asarray(batch["ng_a"].to_numpy(zero_copy_only=False),
                            dtype=np.int64)
            nb = np.asarray(batch["ng_b"].to_numpy(zero_copy_only=False),
                            dtype=np.int64)
            keep = shared >= need_scale * (na + nb) - HASH_MARGIN
            return pa.table({
                "a": batch["a"].filter(pa.array(keep)),
                "b": batch["b"].filter(pa.array(keep))})

        surv = joined.map_batches(prefilter_joined,
                                  batch_format="pyarrow")

    surv = surv.materialize()
    n_surv = surv.count()
    if n_surv == 0:
        return ray.data.from_arrow(_empty_edges)

    if n_surv <= BROADCAST_VERIFY_LIMIT:
        # contents of involved ids only (bounded by survivor density):
        # one vectorized is_in pass over the corpus, broadcast once
        involved = set()
        for b in surv.iter_batches(batch_format="pyarrow",
                                   batch_size=None):
            involved.update(b["a"].to_pylist())
            involved.update(b["b"].to_pylist())
        id_arr = pa.array(sorted(involved), pa.int64())

        def keep_involved(batch: pa.Table) -> pa.Table:
            return batch.filter(
                pc.is_in(batch["file_id"], value_set=id_arr))

        picked = slim.map_batches(keep_involved,
                                  batch_format="pyarrow").take_all()
        content_of = {r["file_id"]: r["content"] for r in picked}
        chandle = ray.put(content_of)

        def verify(batch: pa.Table) -> pa.Table:
            lookup = ray.get(chandle)
            return _score_gram_jaccard(
                batch,
                [lookup[x] for x in batch["a"].to_pylist()],
                [lookup[x] for x in batch["b"].to_pylist()], k, tau)

        return surv.map_batches(verify, batch_format="pyarrow")

    attached = _join_both_sides(surv, slim, "content", "content", nparts)

    def verify_joined(batch: pa.Table) -> pa.Table:
        return _score_gram_jaccard(batch,
                                   batch["content_a"].to_pylist(),
                                   batch["content_b"].to_pylist(),
                                   k, tau)

    return attached.map_batches(verify_joined, batch_format="pyarrow")


def exact_jaccard_clusters(docs: ray.data.Dataset, k: int = 8,
                           tau: float = 0.5,
                           cfg: PipelineConfig | None = None
                           ) -> ray.data.Dataset:
    """(file_id, content) docs -> (file_id, cluster_id) over ALL
    non-empty docs: connected components of the exact Jaccard edge set,
    cluster_id = min member id, singletons labeled by themselves — the
    SAME ``cc_min_labels`` + ``attach_singletons`` machinery the LSH
    pipeline's flagship ``clusters()`` output uses, here against a
    DuckDB recursive-CTE oracle."""
    from data_deduplication_service_ray.stages.cluster import (
        attach_singletons, cluster_unionfind_stream)
    from data_deduplication_service_ray.stages.normalize import drop_empty

    edges = exact_jaccard_edges(docs, k=k, tau=tau, cfg=cfg)
    labels = cluster_unionfind_stream(
        edges.select_columns(["a", "b"])).materialize()
    nodes = drop_empty(docs.select_columns(["file_id", "content"]))
    return attach_singletons(labels, nodes.select_columns(["file_id"]))
