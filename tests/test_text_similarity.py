"""Tests for text-analysis and similarity-search operators."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from data_deduplication_service_ray.config import PipelineConfig
from data_deduplication_service_ray.functions.hashing import kgram_hashes
from data_deduplication_service_ray.stages import similarity as sim
from data_deduplication_service_ray.stages import text

CFG = PipelineConfig()


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

def _docs_ds(texts: list[str]) -> ray.data.Dataset:
    return ray.data.from_arrow(pa.table({
        "file_id": pa.array(range(len(texts)), pa.int64()),
        "content": pa.array(texts, pa.string())}))


def test_text_stats_counts():
    rows = (text.text_stats(_docs_ds(
        ["the cat and the dog!", "", "a\nb\nc", "   "])).to_pandas()
        .set_index("file_id"))
    assert rows.loc[0, "n_tokens_ws"] == 5
    assert rows.loc[0, "n_stopwords"] == 3   # the, and, the
    assert rows.loc[0, "n_punct"] == 1
    assert rows.loc[1, "n_chars"] == 0
    assert rows.loc[1, "stopword_ratio"] == 0.0
    assert rows.loc[2, "n_lines"] == 3
    assert rows.loc[3, "n_tokens_ws"] == 0
    assert ((rows.quality >= 0.0) & (rows.quality <= 1.0)).all()


def test_lang_id_profiles():
    rows = (text.lang_id(_docs_ds([
        "the cat is on the mat and it is good",
        "der hund ist nicht mit der katze und das ist gut",
        "le chat est dans la maison pour les amis",
        "el perro es una mascota para los amigos con sus juguetes",
    ])).to_pandas().set_index("file_id"))
    assert list(rows.lang_pred) == ["en", "de", "fr", "es"]
    assert (rows.lang_confidence > 0).all()


def test_winnow_properties():
    rng = np.random.default_rng(9)
    h = rng.integers(0, 1 << 63, size=500, dtype=np.uint64)
    w = 16
    sel = text.winnow(h, w)
    assert np.array_equal(sel, text.winnow(h, w))  # deterministic
    # every selected value is the min of SOME window; coverage: every
    # window of size w contains at least one selected position
    sel_set = set(sel.tolist())
    for start in range(len(h) - w + 1):
        window = h[start:start + w]
        assert sel_set & set(window.tolist()), f"window {start} uncovered"
    # short input -> single fingerprint
    assert len(text.winnow(h[:5], w)) == 1
    assert len(text.winnow(h[:0], w)) == 0


def test_fingerprints_near_dup_overlap():
    """Near-identical documents share most winnowed fingerprints; the
    basis of fingerprint dedup (MOSS-style)."""
    base = ("def compute(value):\n    total = value + 1\n"
            "    return total\n") * 20
    edited = base.replace("total = value + 1", "total = value + 2", 1)
    other = "completely unrelated text " * 40
    fps = {r["file_id"]: set(r["fingerprints"])
           for r in text.fingerprints(
               _docs_ds([base, edited, other]), CFG).take_all()}
    j01 = len(fps[0] & fps[1]) / len(fps[0] | fps[1])
    j02 = len(fps[0] & fps[2]) / len(fps[0] | fps[2])
    assert j01 > 0.6
    assert j02 < 0.05


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def clustered_vectors():
    """200 vectors in 8 tight clusters + 56 random, 32-dim."""
    rng = np.random.default_rng(123)
    centers = rng.standard_normal((8, 32)) * 3
    rows = []
    for i in range(144):
        c = centers[i % 8]
        rows.append(c + rng.standard_normal(32) * 0.05)
    for _ in range(56):
        rows.append(rng.standard_normal(32))
    mat = np.array(rows)
    ids = np.arange(len(mat), dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array([list(map(float, r)) for r in mat],
                              pa.list_(pa.float64()))}))
    return ds, ids, mat


def _brute_topk(mat: np.ndarray, ids: np.ndarray, q: int, k: int):
    mn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    row = mn[q] @ mn.T
    row[q] = -np.inf
    return list(ids[np.lexsort((ids, -row))][:k])


def test_knn_brute_matches_oracle(clustered_vectors):
    ds, ids, mat = clustered_vectors
    got = sim.knn_brute(ds, [0, 1, 2], k=5).to_pandas()
    for q in (0, 1, 2):
        expect = _brute_topk(mat, ids, q, 5)
        have = list(got[got.query_id == q].sort_values("rank").vec_id)
        assert have == expect


def test_ivf_recall(clustered_vectors):
    ds, ids, mat = clustered_vectors
    cents = sim.train_centroids(ds, n_centroids=8, seed=7)
    assigned = sim.assign_centroids(ds, cents).materialize()
    qids = [0, 5, 9]
    got = sim.ivf_search(assigned, cents, qids, k=5, nprobe=2).to_pandas()
    hits = total = 0
    for q in qids:
        expect = set(_brute_topk(mat, ids, q, 5))
        have = set(got[got.query_id == q].vec_id)
        hits += len(expect & have)
        total += len(expect)
    assert hits / total >= 0.8


def test_embedding_neardup_lsh_recall(clustered_vectors):
    ds, ids, mat = clustered_vectors
    tau = 0.9
    # brute truth
    mn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = mn @ mn.T
    iu = np.triu_indices(len(mat), 1)
    truth = {(int(a), int(b)) for a, b in
             zip(iu[0][sims[iu] >= tau], iu[1][sims[iu] >= tau])}
    assert len(truth) >= 50, "fixture must contain near-dup vectors"
    got = {(int(r["a"]), int(r["b"]))
           for r in sim.embedding_neardup_pairs(
               ds, dim=32, tau=tau).take_all()}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.99, f"recall {recall:.4f}"
    # verification guarantees precision
    assert got <= truth or all(
        sims[a, b] >= tau - 1e-9 for a, b in got - truth)


def test_cosine_pairs_brute_matches_numpy(clustered_vectors):
    ds, ids, mat = clustered_vectors
    tau = 0.95
    mn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = mn @ mn.T
    iu = np.triu_indices(len(mat), 1)
    truth = {(int(a), int(b)) for a, b in
             zip(iu[0][sims[iu] >= tau], iu[1][sims[iu] >= tau])}
    got = {(int(r["a"]), int(r["b"]))
           for r in sim.cosine_pairs_brute(ds, tau=tau).take_all()}
    # parity scoring vs BLAS may flip pairs within ~1 ulp of tau; allow
    # only boundary discrepancies
    sym = truth ^ got
    assert all(abs(sims[a, b] - tau) < 1e-9 for a, b in sym)


def test_ivf_pruned_read_matches_filter_path(tmp_path):
    """ivf_build + ivf_search_pruned (partition-pruned READ) must return
    exactly what ivf_search (post-read filter) returns at the same
    centroids/nprobe, and only the probe partitions may be opened."""
    import os

    from data_deduplication_service_ray.sources.readers import (
        read_embeddings)

    emb = read_embeddings("/root/testdata/sf0.001")
    idx = str(tmp_path / "ivf")
    cents = sim.ivf_build(emb, idx, n_centroids=8)
    qids = [0, 1, 2]
    pruned = {(r["query_id"], r["rank"]): r["vec_id"]
              for r in sim.ivf_search_pruned(idx, qids, k=5,
                                             nprobe=2).take_all()}
    assigned = sim.assign_centroids(emb, cents).materialize()
    base = {(r["query_id"], r["rank"]): r["vec_id"]
            for r in sim.ivf_search(assigned, cents, qids, k=5,
                                    nprobe=2).take_all()}
    assert pruned == base and len(pruned) > 0
    # the index is hive-partitioned: one dir per centroid
    parts = [d for d in os.listdir(idx) if d.startswith("centroid_id=")]
    assert len(parts) >= 2


def test_ivf_pruned_read_works_under_file_uri(tmp_path):
    """The pruned read must work through the pyarrow.fs abstraction
    (object-store path shape): a file:// URI index gives identical
    results to the plain-path read."""
    from data_deduplication_service_ray.sources.readers import (
        read_embeddings)

    emb = read_embeddings("/root/testdata/sf0.001")
    idx = str(tmp_path / "ivf_uri")
    sim.ivf_build(emb, idx, n_centroids=8)
    qids = [0, 1, 2]
    plain = {(r["query_id"], r["rank"]): r["vec_id"]
             for r in sim.ivf_search_pruned(idx, qids, k=5,
                                            nprobe=2).take_all()}
    via_uri = {(r["query_id"], r["rank"]): r["vec_id"]
               for r in sim.ivf_search_pruned(f"file://{idx}", qids,
                                              k=5, nprobe=2).take_all()}
    assert plain == via_uri and len(plain) > 0


def test_cosine_pairs_brute_gated_matches_driver(clustered_vectors,
                                                 monkeypatch):
    """Past BRUTE_PAIR_ROW_LIMIT (or forced-distributed) the block-pair
    task path must emit exactly the driver-broadcast path's pairs and
    bit-identical cosines."""
    ds, ids, mat = clustered_vectors
    tau = 0.95
    base = {(r["a"], r["b"], r["cosine"])
            for r in sim.cosine_pairs_brute(ds, tau=tau).take_all()}
    monkeypatch.setattr(sim, "BRUTE_PAIR_ROW_LIMIT", 0)
    # multi-block input exercises cross-block pair normalization
    ds4 = ds.repartition(4)
    gated = {(r["a"], r["b"], r["cosine"])
             for r in sim.cosine_pairs_brute(ds4, tau=tau).take_all()}
    assert base == gated and len(base) > 0
