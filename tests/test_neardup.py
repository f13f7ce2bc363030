"""Near-dup pipeline tests: kernel determinism, LSH math, the recall gate
vs a blocked-exact oracle, clustering equivalence, containment.

The recall gate mirrors BASELINE.json: dup-pair recall >= 0.99 against
the set of pairs whose *exact* k-gram Jaccard clears the configured
threshold (the "blocked-exact oracle" — brute-force pairwise over the
small fixture corpus at the same shingle/signature config).
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

from data_deduplication_service_ray.config import PipelineConfig
from data_deduplication_service_ray.functions import minhash as mh
from data_deduplication_service_ray.functions.hashing import kgram_hashes
from data_deduplication_service_ray.functions.suffix import (
    containment_pairs, suffix_array)
from data_deduplication_service_ray.functions.unionfind import UnionFind
from data_deduplication_service_ray.pipelines.neardup import NearDupPipeline
from data_deduplication_service_ray.sources.readers import read_corpus

CFG = PipelineConfig(jaccard_threshold=0.7)


# ---------------------------------------------------------------------------
# kernels (no Ray)
# ---------------------------------------------------------------------------

def test_minhash_deterministic_and_jaccard_estimate():
    rng = np.random.default_rng(7)
    base = rng.integers(0, 1 << 63, size=4000, dtype=np.uint64)
    other = rng.integers(0, 1 << 63, size=4000, dtype=np.uint64)
    seeds = mh.perm_seeds(128, 42)
    assert np.array_equal(seeds, mh.perm_seeds(128, 42))
    for overlap in (0.3, 0.7, 0.9):
        k = int(4000 * overlap)
        set_b = np.concatenate([base[:k], other[: 4000 - k]])
        sig_a = mh.minhash_signature(base, seeds)
        sig_b = mh.minhash_signature(set_b, seeds)
        assert np.array_equal(sig_a, mh.minhash_signature(base, seeds))
        true_j = mh.exact_jaccard(np.unique(base), np.unique(set_b))
        est = mh.estimate_jaccard(sig_a, sig_b)
        assert abs(est - true_j) < 0.15
    # empty set -> sentinel signature
    empty = mh.minhash_signature(np.empty(0, dtype=np.uint64), seeds)
    assert (empty == np.iinfo(np.uint64).max).all()


def test_simhash_similar_inputs_low_hamming():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 1 << 63, size=2000, dtype=np.uint64)
    near = a.copy()
    near[:40] = rng.integers(0, 1 << 63, size=40, dtype=np.uint64)
    far = rng.integers(0, 1 << 63, size=2000, dtype=np.uint64)
    sa_, sn, sf = (mh.simhash64(x) for x in (a, near, far))
    d_near = mh.hamming64(np.array([sa_]), np.array([sn]))[0]
    d_far = mh.hamming64(np.array([sa_]), np.array([sf]))[0]
    assert d_near <= 8
    assert d_far >= 16


def test_band_hashes_batch_matches_single():
    rng = np.random.default_rng(5)
    sigs = rng.integers(0, 1 << 63, size=(10, 128), dtype=np.uint64)
    batch = mh.band_hashes_batch(sigs, 32)
    for i in range(10):
        assert np.array_equal(batch[i], mh.band_hashes(sigs[i], 32))


def test_lsh_config_meets_recall_target():
    """The configured (bands, rows) must catch pairs at the verification
    threshold with probability >= 0.995 (pipeline recall gate is 0.99)."""
    p = mh.lsh_candidate_probability(
        CFG.jaccard_threshold, CFG.lsh_bands, CFG.rows_per_band)
    assert p >= 0.995


def test_unionfind_min_labels():
    uf = UnionFind()
    for a, b in [(5, 3), (3, 9), (20, 21), (7, 7)]:
        uf.union(a, b)
    labels = uf.labels()
    assert labels[5] == labels[3] == labels[9] == 3
    assert labels[20] == labels[21] == 20
    assert labels[7] == 7


def test_suffix_array_matches_naive():
    import random

    rng = random.Random(11)
    for _ in range(10):
        s = "".join(rng.choice("abAB\n ") for _ in range(rng.randint(1, 300)))
        assert list(suffix_array(s)) == sorted(
            range(len(s)), key=lambda i: s[i:])


def test_containment_pairs_kernel():
    ids = [1, 2, 3]
    texts = ["needle", "hay needle stack", "unrelated"]
    assert containment_pairs(ids, texts) == [(1, 2)]


def test_containment_cap_keeps_smallest_outer_ids():
    """max_occurrences caps per-inner emission to the SMALLEST outer
    ids — deterministic and layout-independent (the rule the
    containment_capped SQL oracle reproduces with row_number)."""
    ids = [9, 50, 20, 40, 30]
    texts = ["hot", "xx hot xx", "hot hot", "--hot--", "hot!"]
    full = containment_pairs(ids, texts, max_occurrences=256)
    assert full == [(9, 20), (9, 30), (9, 40), (9, 50)]
    capped = containment_pairs(ids, texts, max_occurrences=2)
    assert capped == [(9, 20), (9, 30)]
    # cap is per INNER: another inner keeps its own smallest outers
    ids2 = [9, 50, 20, 7]
    texts2 = ["hot", "xx hot xx", "hot hot", "ho"]
    capped2 = containment_pairs(ids2, texts2, max_occurrences=1)
    assert capped2 == [(7, 9), (9, 20)]
    # order of the input rows must not change the result
    perm = [2, 0, 3, 1]
    capped2p = containment_pairs([ids2[i] for i in perm],
                                 [texts2[i] for i in perm],
                                 max_occurrences=1)
    assert capped2p == capped2


# ---------------------------------------------------------------------------
# end-to-end over the planted corpus
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def pipe(small_corpus_dir):
    docs = read_corpus(f"{small_corpus_dir}/corpus.parquet")
    return NearDupPipeline(docs, CFG)


@pytest.fixture(scope="module")
def oracle_pairs(small_corpus_dir):
    """Blocked-exact oracle: all pairs with exact k-gram Jaccard >= the
    threshold (plus exact-duplicate pairs), brute-forced over the corpus
    at the same shingle config."""
    corpus = pq.read_table(f"{small_corpus_dir}/corpus.parquet")
    from data_deduplication_service_ray.functions.hashing import stable_id64

    rows = [(stable_id64(r, p, c), t) for r, p, c, t in zip(
        corpus["repo"].to_pylist(), corpus["path"].to_pylist(),
        corpus["commit"].to_pylist(), corpus["content"].to_pylist())
        if t]
    sets = [np.unique(kgram_hashes(t.encode("utf-8"), CFG.shingle_k))
            for _, t in rows]
    truth = set()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            if mh.exact_jaccard(sets[i], sets[j]) >= CFG.jaccard_threshold:
                a, b = sorted((rows[i][0], rows[j][0]))
                truth.add((a, b))
    return truth


def test_recall_gate(pipe, oracle_pairs):
    assert len(oracle_pairs) >= 10, "fixture must plant enough dup pairs"
    labels = {r["file_id"]: r["cluster_id"]
              for r in pipe.clusters().take_all()}
    hit = sum(1 for a, b in oracle_pairs
              if labels.get(a) is not None and labels[a] == labels.get(b))
    recall = hit / len(oracle_pairs)
    assert recall >= 0.99, f"recall {recall:.4f} over {len(oracle_pairs)}"


def test_verified_pairs_are_exact_jaccard(pipe, small_corpus_dir):
    """Accepted near edges must truly clear the threshold (no estimate
    leakage): spot-check by recomputing Jaccard from contents."""
    corpus = pq.read_table(f"{small_corpus_dir}/corpus.parquet")
    from data_deduplication_service_ray.functions.hashing import stable_id64

    text_by_id = {stable_id64(r, p, c): t for r, p, c, t in zip(
        corpus["repo"].to_pylist(), corpus["path"].to_pylist(),
        corpus["commit"].to_pylist(), corpus["content"].to_pylist())}
    rows = pipe.near_edges().take_all()
    assert rows, "planted corpus must yield near-dup edges"
    for r in rows[:50]:
        sa = np.unique(kgram_hashes(
            text_by_id[r["a"]].encode("utf-8"), CFG.shingle_k))
        sb = np.unique(kgram_hashes(
            text_by_id[r["b"]].encode("utf-8"), CFG.shingle_k))
        assert mh.exact_jaccard(sa, sb) >= CFG.jaccard_threshold


def test_cluster_methods_agree(pipe):
    lp = {r["file_id"]: r["cluster_id"]
          for r in pipe.clusters("label_propagation").take_all()}
    uf = {r["file_id"]: r["cluster_id"]
          for r in pipe.clusters("unionfind").take_all()}
    assert lp == uf


def test_exact_dup_members_share_cluster(pipe, small_corpus_dir):
    truth = pq.read_table(f"{small_corpus_dir}/truth.parquet").to_pandas()
    corpus = pq.read_table(f"{small_corpus_dir}/corpus.parquet")
    from data_deduplication_service_ray.functions.hashing import stable_id64

    fids = [stable_id64(r, p, c) for r, p, c in zip(
        corpus["repo"].to_pylist(), corpus["path"].to_pylist(),
        corpus["commit"].to_pylist())]
    labels = {r["file_id"]: r["cluster_id"]
              for r in pipe.clusters().take_all()}
    for gid, grp in truth[truth.kind == "exact"].groupby("group_id"):
        ids = [fids[i] for i in grp.file_idx]
        assert len({labels[i] for i in ids}) == 1


def test_signature_determinism(pipe, small_corpus_dir):
    docs = read_corpus(f"{small_corpus_dir}/corpus.parquet")
    again = NearDupPipeline(docs, CFG)
    s1 = {r["file_id"]: (tuple(r["minhash"]), r["simhash"])
          for r in pipe.signatures().take_all()}
    s2 = {r["file_id"]: (tuple(r["minhash"]), r["simhash"])
          for r in again.signatures().take_all()}
    assert s1 == s2


def test_recall_at_2000_docs_planted_truth(t2_corpus_dir):
    """Scale-up recall check: every planted exact group and every near
    group at <=5% edit rate (expected J well above threshold) must land
    in one cluster; brute-force oracle replaced by planted truth."""
    import pyarrow.parquet as pq

    from data_deduplication_service_ray.functions.hashing import stable_id64

    docs = read_corpus(f"{t2_corpus_dir}/corpus.parquet")
    pipe2 = NearDupPipeline(docs, CFG)
    labels = {r["file_id"]: r["cluster_id"]
              for r in pipe2.clusters().take_all()}

    corpus = pq.read_table(f"{t2_corpus_dir}/corpus.parquet")
    truth = pq.read_table(f"{t2_corpus_dir}/truth.parquet").to_pandas()
    fids = [stable_id64(r, p, c) for r, p, c in zip(
        corpus["repo"].to_pylist(), corpus["path"].to_pylist(),
        corpus["commit"].to_pylist())]
    texts = corpus["content"].to_pylist()

    total = hit = 0
    for (kind, gid), grp in truth[
            truth.kind.isin(["exact", "near"])].groupby(
            ["kind", "group_id"]):
        idx = list(grp.file_idx)
        if kind == "near":
            if grp.edit_rate.iloc[0] > 0.05:
                continue
            # confirm the planted pair actually clears the threshold
            sa = np.unique(kgram_hashes(texts[idx[0]].encode(),
                                        CFG.shingle_k))
            sb = np.unique(kgram_hashes(texts[idx[1]].encode(),
                                        CFG.shingle_k))
            if mh.exact_jaccard(sa, sb) < CFG.jaccard_threshold:
                continue
        total += 1
        if len({labels[fids[i]] for i in idx}) == 1:
            hit += 1
    assert total >= 100, f"fixture too small ({total} groups)"
    assert hit / total >= 0.99, f"recall {hit}/{total}"


def test_pair_and_cluster_determinism(pipe, small_corpus_dir):
    """Two independent executions (different block layouts possible)
    must produce identical verified-pair sets and cluster labels — the
    N-vs-4N scaling runs rely on this."""
    docs = read_corpus(f"{small_corpus_dir}/corpus.parquet")
    again = NearDupPipeline(docs, CFG)
    p1 = {(r["a"], r["b"], round(r["jaccard"], 12))
          for r in pipe.verified_pairs().take_all()}
    p2 = {(r["a"], r["b"], round(r["jaccard"], 12))
          for r in again.verified_pairs().take_all()}
    assert p1 == p2
    c1 = {r["file_id"]: r["cluster_id"]
          for r in pipe.clusters().take_all()}
    c2 = {r["file_id"]: r["cluster_id"]
          for r in again.clusters().take_all()}
    assert c1 == c2


def test_simhash_pairs_pigeonhole_recall(pipe, small_corpus_dir):
    """Banded SimHash dedup finds every pair within Hamming<=3 of the
    signature table (exact by pigeonhole with 4x16-bit bands) and only
    pairs within the configured max distance."""
    from data_deduplication_service_ray.stages.neardup import simhash_pairs

    sigs = pipe.signatures()
    rows = sigs.take_all()
    sims = {r["file_id"]: np.uint64(np.int64(r["simhash"]))
            for r in rows}
    got = {(r["a"], r["b"]): r["hamming"]
           for r in simhash_pairs(sigs, CFG).take_all()}
    ids = sorted(sims)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            d = int(mh.hamming64(np.array([sims[ids[i]]]),
                                 np.array([sims[ids[j]]]))[0])
            if d <= 3:
                assert (ids[i], ids[j]) in got, (ids[i], ids[j], d)
    for (a, b), d in got.items():
        assert d <= CFG.simhash_max_hamming
        true_d = int(mh.hamming64(np.array([sims[a]]),
                                  np.array([sims[b]]))[0])
        assert d == true_d


def test_incremental_removal(pipe):
    """Removing files recomputes clusters; untouched clusters keep their
    (content-derived) labels, removed ids vanish."""
    base = {r["file_id"]: r["cluster_id"]
            for r in pipe.clusters().take_all()}
    # remove one member of some duplicate cluster
    from collections import Counter

    sizes = Counter(base.values())
    dup_cluster = next(c for c, n in sizes.items() if n > 1)
    victim = max(f for f, c in base.items() if c == dup_cluster)
    after = {r["file_id"]: r["cluster_id"]
             for r in pipe.without_files({victim}).clusters().take_all()}
    assert victim not in after
    assert set(after) == set(base) - {victim}
    unaffected = {f for f, c in base.items()
                  if c != dup_cluster and f != victim}
    for f in unaffected:
        assert after[f] == base[f]


def test_containment_stage_finds_planted(pipe, small_corpus_dir):
    from data_deduplication_service_ray.stages.containment import (
        containment_within_groups)

    # group every doc into one bucket: small corpus, full exact pass
    docs = pipe.normalized().map_batches(
        lambda t: t.append_column(
            "g", __import__("pyarrow").array([0] * t.num_rows)),
        batch_format="pyarrow")
    found = containment_within_groups(docs, group_col="g").take_all()
    got = {(r["inner"], r["outer"]) for r in found}

    corpus = pq.read_table(f"{small_corpus_dir}/corpus.parquet")
    truth = pq.read_table(f"{small_corpus_dir}/truth.parquet").to_pandas()
    from data_deduplication_service_ray.functions.hashing import stable_id64

    fids = [stable_id64(r, p, c) for r, p, c in zip(
        corpus["repo"].to_pylist(), corpus["path"].to_pylist(),
        corpus["commit"].to_pylist())]
    texts = corpus["content"].to_pylist()
    planted = 0
    for gid, grp in truth[truth.kind == "contain"].groupby("group_id"):
        idx = list(grp.file_idx)
        inner = min(idx, key=lambda i: len(texts[i]))
        outer = max(idx, key=lambda i: len(texts[i]))
        planted += 1
        assert (fids[inner], fids[outer]) in got
    assert planted >= 1


def test_simhash_band_keys_disjoint_across_bands():
    """Regression: band bucket keys from DIFFERENT bands must never
    collide. Band values span only 2**band_bits, so the band index must
    occupy disjoint (shifted) bits — xor'ing it into the value range
    merged buckets across bands (observed: 128 embedding bands
    collapsing onto ~256 keys)."""
    import pyarrow as pa
    import ray.data

    from data_deduplication_service_ray.stages.neardup import simhash_pairs

    # 256 fingerprints: value i in band 0, zero in bands 1..3
    sigs = ray.data.from_arrow(pa.table({
        "file_id": pa.array(range(256), pa.int64()),
        "simhash": pa.array(range(256), pa.int64()),
        "n_shingles": pa.array([100] * 256, pa.int64()),
    }))
    # reach into the band expansion via simhash_pairs' to_bands by
    # monkey-free reconstruction: run the full op and assert no
    # cross-band merge produced spurious Hamming<=8 pairs beyond the
    # true ones (values 0..255 differ in at most 8 low bits, so true
    # pair count is computable exactly)
    got = {(r["a"], r["b"]): r["hamming"]
           for r in simhash_pairs(sigs, CFG).take_all()}
    sims = np.arange(256, dtype=np.uint64)
    for (a, b), d in got.items():
        true_d = int(bin(int(sims[a] ^ sims[b])).count("1"))
        assert d == true_d and d <= CFG.simhash_max_hamming
    # pigeonhole: every pair at d<=3 must be found (band 1..3 all-zero
    # buckets guarantee candidacy for ALL pairs here, so exactness holds
    # even at cap — buckets of 256 < raised cap 4096)
    for i in range(256):
        for j in range(i + 1, 256):
            if bin(i ^ j).count("1") <= 3:
                assert (i, j) in got


def test_simhash_join_fallback_matches_broadcast(pipe, monkeypatch):
    """The >BROADCAST_SIG_LIMIT hash-join verification path must produce
    exactly the broadcast path's pairs."""
    from data_deduplication_service_ray.stages import neardup as nd

    sigs = pipe.signatures()
    base = {(r["a"], r["b"], r["hamming"], r["capped"])
            for r in nd.simhash_pairs(sigs, CFG).take_all()}
    monkeypatch.setattr(nd, "BROADCAST_SIG_LIMIT", 0)
    joined = {(r["a"], r["b"], r["hamming"], r["capped"])
              for r in nd.simhash_pairs(sigs, CFG).take_all()}
    assert base == joined and len(base) > 0


def test_driver_pair_expansion_matches_join(pipe, monkeypatch):
    """The driver-gated vectorized bucket expansion and the distributed
    Arrow self-join must emit identical pair multisets (cold) and
    identical window edges (hot)."""
    from collections import Counter

    from data_deduplication_service_ray.stages import neardup as nd

    bands = nd.band_rows(pipe.signatures(), CFG)
    fast = nd.candidate_pairs(bands, CFG, distinct=False)
    c_fast = Counter((r["a"], r["b"], r["capped"])
                     for r in fast.take_all())
    monkeypatch.setattr(nd, "DRIVER_PAIR_EXPAND_LIMIT", 0)
    slow = nd.candidate_pairs(bands, CFG, distinct=False)
    c_slow = Counter((r["a"], r["b"], r["capped"])
                     for r in slow.take_all())
    assert c_fast == c_slow and len(c_fast) > 0


def test_hash_partition_expansion_matches_sorted(pipe, monkeypatch):
    """Above _DRIVER_SORT_LIMIT the driver's global sort is replaced by
    hash-partitioned task-side sorts; the pair multiset must be
    identical (buckets stay whole per partition by construction)."""
    from collections import Counter

    from data_deduplication_service_ray.stages import neardup as nd

    bands = nd.band_rows(pipe.signatures(), CFG)
    base = Counter((r["a"], r["b"], r["capped"])
                   for r in nd.candidate_pairs(
                       bands, CFG, distinct=False).take_all())
    monkeypatch.setattr(nd, "_DRIVER_SORT_LIMIT", 0)
    hashed = Counter((r["a"], r["b"], r["capped"])
                     for r in nd.candidate_pairs(
                         bands, CFG, distinct=False).take_all())
    assert base == hashed and len(base) > 0
    # distinct=True exercises distinct_pairs' own gates on the new path
    d_base = {(r["a"], r["b"], r["n_bands"])
              for r in nd.candidate_pairs(bands, CFG,
                                          distinct=True).take_all()}
    monkeypatch.undo()
    d_sorted = {(r["a"], r["b"], r["n_bands"])
                for r in nd.candidate_pairs(bands, CFG,
                                            distinct=True).take_all()}
    assert d_base == d_sorted and len(d_base) > 0


def test_fused_candidates_match_distributed_chain(pipe, monkeypatch):
    """The fused expand+estimate candidates (estimate runs inside the
    expansion tasks) must produce exactly the verified pairs of the
    deepest unfused chain: raw occurrences -> estimate_filter with its
    hash-join fallback -> distributed distinct (BROADCAST_SIG_LIMIT=0
    disables the candidate fusion and the sig broadcast;
    DRIVER_EST_LIMIT=0 disables the driver est gate)."""
    from data_deduplication_service_ray.sources.readers import read_corpus
    from data_deduplication_service_ray.stages import neardup as nd

    fused = {(r["a"], r["b"], round(r["jaccard"], 12), r["n_bands"])
             for r in pipe.verified_pairs().take_all()}
    monkeypatch.setattr(nd, "DRIVER_EST_LIMIT", 0)
    monkeypatch.setattr(nd, "BROADCAST_SIG_LIMIT", 0)
    again = NearDupPipeline(read_corpus(
        f"{pipe._corpus_dir}/corpus.parquet")
        if hasattr(pipe, "_corpus_dir") else pipe._raw, CFG)
    dist = {(r["a"], r["b"], round(r["jaccard"], 12), r["n_bands"])
            for r in again.verified_pairs().take_all()}
    assert fused == dist and len(fused) > 0


def test_fused_multislice_merge_matches_single(pipe, monkeypatch):
    """Forcing many expansion slices (hash-partition path, est inside
    each task, driver merge of partial n_bands) must reproduce the
    single-slice inline result exactly."""
    from data_deduplication_service_ray.stages import neardup as nd

    single, est1 = nd.candidate_pairs_estimated(pipe.signatures(), CFG)
    assert est1
    rows1 = {(r["a"], r["b"], r["n_bands"], r["capped"],
              round(r["est"], 12), r["hamming"])
             for r in single.take_all()}
    monkeypatch.setattr(nd, "_DRIVER_SORT_LIMIT", 0)
    multi, est2 = nd.candidate_pairs_estimated(pipe.signatures(), CFG)
    assert est2
    rows2 = {(r["a"], r["b"], r["n_bands"], r["capped"],
              round(r["est"], 12), r["hamming"])
             for r in multi.take_all()}
    assert rows1 == rows2 and len(rows1) > 0


def test_exact_task_partition_matches_driver(small_corpus_dir, monkeypatch):
    """Forcing the sha-prefix-partitioned exact grouping (task path)
    must reproduce the driver-lexsort path exactly: same group rows in
    the same (sha-sorted) order, same representatives, same
    member→rep edge set."""
    import data_deduplication_service_ray.pipelines.neardup as pn

    def snapshot(p):
        groups = [(r["content_sha256"], r["file_id"], r["dup_count"])
                  for r in p.file_groups().take_all()]
        reps = {r["file_id"] for r in p.representatives().take_all()}
        edges = {(r["a"], r["b"]) for r in p.exact_edges().take_all()}
        return groups, reps, edges

    def labels(p):
        return {r["file_id"]: r["cluster_id"]
                for r in p.clusters().take_all()}

    base_pipe = NearDupPipeline(
        read_corpus(f"{small_corpus_dir}/corpus.parquet"), CFG)
    base = snapshot(base_pipe)
    base_labels = labels(base_pipe)
    monkeypatch.setattr(pn, "TASK_GROUP_LIMIT", 0)
    task_pipe = NearDupPipeline(
        read_corpus(f"{small_corpus_dir}/corpus.parquet"), CFG)
    tasked = snapshot(task_pipe)
    assert base[0] == tasked[0] and len(base[0]) > 0
    assert base[1] == tasked[1]
    assert base[2] == tasked[2] and len(base[2]) > 0
    # the raw-task cluster path (near-edge tasks + exact edge refs +
    # driver CC) only engages on the task-partitioned exact path —
    # labels must match the generic materialize/union path exactly
    assert labels(task_pipe) == base_labels and len(base_labels) > 0


def test_sort_block_tasks_handle_multichunk_unsorted_blocks():
    """The Ray Data executor bundles consecutive map outputs into one
    block by CONCATENATION (each chunk sorted, the block not) — the
    per-block sort tasks must return globally sorted SINGLE-CHUNK
    tables for such blocks, or range extraction silently splits
    groups/buckets across tasks."""
    import pyarrow as pa
    import ray

    import data_deduplication_service_ray.pipelines.neardup as pn
    from data_deduplication_service_ray.stages import neardup as nd

    sha = "aa" * 32
    lo_sha = "11" * 32
    cat = pa.concat_tables([
        pa.table({"content_sha256": [sha, "ff" + "0" * 62],
                  "file_id": [5, 9]}),
        pa.table({"content_sha256": [lo_sha, sha], "file_id": [2, 3]})])
    assert cat["content_sha256"].num_chunks == 2
    out = ray.get(pn._sort_catalog_block_task.remote(cat))
    assert out["content_sha256"].num_chunks == 1
    assert out["content_sha256"].to_pylist() == sorted(
        [sha, "ff" + "0" * 62, lo_sha, sha])

    band = pa.concat_tables([
        pa.table({"band_hash": [7, 40], "file_id": [1, 2]}),
        pa.table({"band_hash": [-3, 7], "file_id": [3, 4]})])
    bout = ray.get(nd._sort_band_block_task.remote(band))
    assert bout["band_hash"].num_chunks == 1
    assert bout["band_hash"].to_pylist() == [-3, 7, 7, 40]


def test_small_verify_matches_distributed(pipe, monkeypatch):
    """The DRIVER_VERIFY_LIMIT raw-task verify (chunked attach+score over
    doc block refs) must produce exactly the distributed locator flow's
    scored pairs."""
    from data_deduplication_service_ray.stages import neardup as nd

    key = ("a", "b", "n_bands", "capped", "est", "hamming", "jaccard",
           "contained")
    fast = {tuple(round(r[k], 12) if isinstance(r[k], float) else r[k]
                  for k in key)
            for r in pipe.verified_pairs().take_all()}
    monkeypatch.setattr(nd, "DRIVER_VERIFY_LIMIT", 0)
    again = NearDupPipeline(pipe._raw, CFG)
    slow = {tuple(round(r[k], 12) if isinstance(r[k], float) else r[k]
                  for k in key)
            for r in again.verified_pairs().take_all()}
    assert fast == slow and len(fast) > 0


def test_nibble_kernels_match_direct_compare():
    """The SWAR word kernel and the FSB byte kernel must both equal a
    direct per-nibble equality count, including the padded tail when
    num_perms % 16 != 0 (pad nibbles must never count as equal)."""
    import numpy as np

    from data_deduplication_service_ray.stages import neardup as nd

    rng = np.random.default_rng(7)
    for num_perms in (128, 20, 16, 5):
        n = 200
        m8 = rng.integers(0, 256, size=(n, num_perms), dtype=np.uint8)
        # plant identical rows so the w == 0 (all-equal word) case fires
        m8[10] = m8[11]
        packed = nd._pack_nibbles(m8)
        assert packed.shape[1] == 8 * nd._sig_words(num_perms)
        words = np.ascontiguousarray(packed).view(np.uint64)
        ia = rng.integers(0, n, 5000).astype(np.int64)
        ib = rng.integers(0, n, 5000).astype(np.int64)
        ref = ((m8 & 0x0F)[ia] == (m8 & 0x0F)[ib]).sum(
            axis=1, dtype=np.int64)
        got_w = nd._nibble_eq_counts(words[ia], words[ib], num_perms)
        got_b = nd._nibble_eq_counts_bytes(packed[ia], packed[ib],
                                           num_perms)
        assert np.array_equal(got_w, ref), num_perms
        assert np.array_equal(got_b, ref), num_perms
        # the planted identical pair scores a full match
        full = nd._nibble_eq_counts(words[[10]], words[[11]], num_perms)
        assert full[0] == num_perms


def test_bitmap_tree_merge_matches_serial():
    """The fan-in-8 task tree over (once, multi) bitmap summaries must
    equal the serial completion-order fold it replaced (the once&once
    -> multi rule is associative), for any leaf count — including one
    that exercises multiple tree levels and a ragged tail group."""
    import numpy as np
    import ray

    from data_deduplication_service_ray.stages import neardup as nd

    rng = np.random.default_rng(7)
    nbytes = 256
    for n_leaves in (1, 3, 8, 9, 20):
        parts = [(rng.integers(0, 256, nbytes).astype(np.uint8),
                  rng.integers(0, 256, nbytes).astype(np.uint8))
                 for _ in range(n_leaves)]
        once = np.zeros(nbytes, dtype=np.uint8)
        multi = np.zeros(nbytes, dtype=np.uint8)
        for o, mlt in parts:
            multi |= mlt
            multi |= once & o
            once |= o
        futs = [ray.put(p) for p in parts]
        fan = 8
        while len(futs) > fan:
            futs = [nd._bitmap_merge_task.remote(*futs[i:i + fan])
                    for i in range(0, len(futs), fan)]
        got = ray.get(nd._bitmap_merge_task.remote(*futs, final=True))
        assert np.array_equal(got, multi), n_leaves


def test_slice_content_block_task_filters_and_combines():
    """The verify wave's per-block slice task must return only the
    referenced ids as a SINGLE-chunk table, for multi-chunk inputs,
    no-match blocks, and empty needed sets alike."""
    import numpy as np
    import pyarrow as pa
    import ray

    from data_deduplication_service_ray.stages import neardup as nd

    blk = pa.concat_tables([
        pa.table({"file_id": pa.array([3, 7], pa.int64()),
                  "content": pa.array(["aa", "bb"], pa.large_string())}),
        pa.table({"file_id": pa.array([9, 12], pa.int64()),
                  "content": pa.array(["cc", "dd"], pa.large_string())})])
    assert blk["content"].num_chunks == 2

    out = ray.get(nd._slice_content_block_task.remote(
        blk, np.array([7, 9, 100], dtype=np.int64)))
    assert out["content"].num_chunks == 1
    assert out["file_id"].to_pylist() == [7, 9]
    assert out["content"].to_pylist() == ["bb", "cc"]

    none = ray.get(nd._slice_content_block_task.remote(
        blk, np.array([42], dtype=np.int64)))
    assert none.num_rows == 0
    empty = ray.get(nd._slice_content_block_task.remote(
        blk, np.empty(0, dtype=np.int64)))
    assert empty.num_rows == 0


# ---------------------------------------------------------------------------
# incremental delete (reference D1-D3 at the north-star layer)
# ---------------------------------------------------------------------------

def test_incremental_delete_matches_recompute(pipe, small_corpus_dir):
    """delete_files_incremental == full recompute on the corpus minus
    the deleted ids, for signatures, verified pairs and clusters. The
    delete set deliberately contains (a) a representative with live
    exact duplicates (successor takes over its signature/pairs), (b) a
    near-dup cluster member, (c) a singleton."""
    fg = [r for r in pipe.file_groups().take_all() if r["dup_count"] > 1]
    assert fg, "fixture must contain exact-dup groups"
    rep_with_dups = fg[0]["file_id"]

    edges = pipe.near_edges().take_all()
    assert edges, "fixture must contain near-dup edges"
    near_member = next(e["b"] for e in edges
                       if e["b"] != rep_with_dups
                       and e["a"] != rep_with_dups)

    labels_full = {r["file_id"]: r["cluster_id"]
                   for r in pipe.clusters().take_all()}
    from collections import Counter

    csize = Counter(labels_full.values())
    singleton = next(f for f, c in labels_full.items()
                     if csize[c] == 1)

    # no capped pairs in the fixture — the documented exactness domain
    assert all(not r.get("capped", False)
               for r in pipe.verified_pairs().take_all())

    dels = {rep_with_dups, near_member, singleton}
    inc = pipe.delete_files_incremental(dels)
    full = pipe.without_files(dels)

    lab_inc = {r["file_id"]: r["cluster_id"]
               for r in inc["clusters"].take_all()}
    lab_full = {r["file_id"]: r["cluster_id"]
                for r in full.clusters().take_all()}
    assert lab_inc == lab_full

    def sig_key(rows):
        return {r["file_id"]: (tuple(r["minhash"]), r["simhash"])
                for r in rows}

    si = sig_key(inc["signatures"].take_all())
    sf = sig_key(full.signatures().take_all())
    assert set(si) == set(sf)
    assert si == sf

    def pair_key(rows):
        return {(r["a"], r["b"]): (round(r["jaccard"], 12), r["hamming"])
                for r in rows}

    pi = pair_key(inc["verified_pairs"].take_all())
    pf = pair_key(full.verified_pairs().take_all())
    assert pi == pf


def test_incremental_delete_nonrep_and_absent_ids(pipe):
    """The delete set may contain no representative at all (non-rep
    exact-dup member) or ids absent from the corpus — the doomed-groups
    pull is then EMPTY and must not crash (regression: the empty-pull
    fallback called a method that exists on pyarrow.Schema but not on
    Ray's Schema wrapper)."""
    edges = pipe.exact_edges().take_all()
    assert edges, "fixture must contain exact-dup member edges"
    member = edges[0]["b"]            # a non-representative member
    dels = {member, -987654321}       # plus an id that does not exist
    inc = pipe.delete_files_incremental(dels)
    full = pipe.without_files(dels)
    lab_inc = {r["file_id"]: r["cluster_id"]
               for r in inc["clusters"].take_all()}
    lab_full = {r["file_id"]: r["cluster_id"]
                for r in full.clusters().take_all()}
    assert lab_inc == lab_full
    assert member not in lab_inc


def test_incremental_add_matches_recompute():
    """add_files_incremental == full recompute over old + new docs, for
    signatures, verified pairs (FULL schema incl. n_bands/est) and
    clusters. The new batch covers: a near-dup of an old doc, an exact
    duplicate that PROMOTES the group rep (smaller id), an exact
    duplicate that joins as a plain member, a brand-new unique doc, a
    brand-new duplicate pair, and an empty doc."""
    import pyarrow as pa
    import ray.data

    rng = np.random.default_rng(17)

    def rand_text(n):
        return "".join(chr(97 + c) for c in rng.integers(0, 26, size=n))

    old_texts, old_ids = [], []
    for i in range(30):
        old_texts.append(f"old doc {i}: {rand_text(600)}")
        old_ids.append(1000 + i)
    dup_content = "shared exact content " + rand_text(600)
    near_base = rand_text(800)
    old_texts += [dup_content, near_base]
    old_ids += [2000, 3000]            # 2000 = rep of the dup group

    new_texts = [near_base + " tail edit",   # near-dup of 3000
                 dup_content,                # promotes rep (id < 2000)
                 dup_content,                # plain member (id > 2000)
                 "brand new " + rand_text(600),
                 "twin " + rand_text(600)]
    new_texts.append(new_texts[-1])          # brand-new dup pair
    new_texts.append("")                     # empty -> dropped
    new_ids = [4000, 500, 5000, 6000, 7000, 7001, 8000]

    def ds_of(texts, ids):
        return ray.data.from_arrow(pa.table({
            "file_id": pa.array(ids, pa.int64()),
            "content": pa.array(texts, pa.string())}))

    full = NearDupPipeline(ds_of(old_texts + new_texts,
                                 old_ids + new_ids), CFG)
    old = NearDupPipeline(ds_of(old_texts, old_ids), CFG)
    inc = old.add_files_incremental(ds_of(new_texts, new_ids))

    # no capped buckets — the documented exactness domain
    assert all(not r["capped"] for r in full.verified_pairs().take_all())

    def sig_key(rows):
        return {r["file_id"]: (tuple(r["minhash"]), r["simhash"],
                               r["n_shingles"]) for r in rows}

    si = sig_key(inc["signatures"].take_all())
    sf = sig_key(full.signatures().take_all())
    assert set(si) == set(sf)
    assert si == sf
    assert 500 in si and 2000 not in si      # promotion happened

    def pair_key(rows):
        return {(r["a"], r["b"]):
                (r["n_bands"], round(r["est"], 12), r["hamming"],
                 round(r["jaccard"], 12), r["contained"])
                for r in rows}

    pi = pair_key(inc["verified_pairs"].take_all())
    pf = pair_key(full.verified_pairs().take_all())
    assert pi == pf
    assert any(4000 in k for k in pf)        # near-dup pair exists

    lab_inc = {r["file_id"]: r["cluster_id"]
               for r in inc["clusters"].take_all()}
    lab_full = {r["file_id"]: r["cluster_id"]
                for r in full.clusters().take_all()}
    assert lab_inc == lab_full
    assert 8000 not in lab_inc               # empty excluded
    assert lab_inc[2000] == lab_inc[500] == lab_inc[5000] == 500
    assert lab_inc[7000] == lab_inc[7001] == 7000
    assert lab_inc[3000] == lab_inc[4000]
