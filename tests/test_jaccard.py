"""Tests for the exact char-n-gram Jaccard edge/cluster stage
(stages/jaccard.py) — the SQL-oracled twin of the LSH pipeline."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from data_deduplication_service_ray.functions.hashing import (
    char_kgram_hashes)
from data_deduplication_service_ray.stages import jaccard as jc


def _docs_ds(texts: list[str], ids=None) -> ray.data.Dataset:
    ids = ids if ids is not None else list(range(len(texts)))
    return ray.data.from_arrow(pa.table({
        "file_id": pa.array(ids, pa.int64()),
        "content": pa.array(texts, pa.string())}))


def _naive_edges(texts, ids, k, tau):
    """Blocked-exact oracle: per-doc char k-gram string sets, all pairs."""
    sets = {i: {t[j:j + k] for j in range(max(len(t) - k + 1, 1))}
            for i, t in zip(ids, texts) if t}
    out = []
    live = sorted(sets)
    for x in range(len(live)):
        for y in range(x + 1, len(live)):
            a, b = live[x], live[y]
            inter = len(sets[a] & sets[b])
            j = inter / (len(sets[a]) + len(sets[b]) - inter)
            if j >= tau:
                out.append((a, b, j))
    return sorted(out)


# ---------------------------------------------------------------------------
# char k-gram hashing: CHARACTER semantics, not bytes
# ---------------------------------------------------------------------------

def test_char_kgram_counts_and_equality():
    t = "héllo wörld — ünïcode"        # multibyte utf-8
    h = char_kgram_hashes(t, 8)
    assert len(h) == len(t) - 8 + 1    # char positions, not byte positions
    # equal char grams at different positions hash equal
    t2 = "abcdefgh XX abcdefgh"
    h2 = char_kgram_hashes(t2, 8)
    assert h2[0] == h2[12]
    # short text -> one partial-tail hash; empty -> empty
    assert len(char_kgram_hashes("abc", 8)) == 1
    assert len(char_kgram_hashes("", 8)) == 0
    # distinct grams (prefix-shifted) hash distinct
    assert len(np.unique(char_kgram_hashes("abcdefghi", 8))) == 2


def test_char_vs_byte_hash_positions_differ_on_multibyte():
    from data_deduplication_service_ray.functions.hashing import (
        kgram_hashes)

    t = "ö" * 4 + "abcd"               # 8 chars, 12 utf-8 bytes
    assert len(char_kgram_hashes(t, 8)) == 1
    assert len(kgram_hashes(t.encode("utf-8"), 8)) == 5


# ---------------------------------------------------------------------------
# exact edges vs the blocked-exact oracle
# ---------------------------------------------------------------------------

def _rand_text(rng, n: int) -> str:
    return "".join(chr(97 + c) for c in rng.integers(0, 26, size=n))


@pytest.fixture(scope="module")
def planted():
    rng = np.random.default_rng(7)
    texts, ids = [], []
    for i in range(40):
        # unique filler docs (random 8-grams are pairwise disjoint)
        texts.append(f"unique doc {i}: {_rand_text(rng, 200)}")
        ids.append(100 + i)
    # near-dup pairs: independent random bodies + a short tail edit
    # (J = m/(m+t) well above 0.5; cross-pair J ~ 0)
    for i in range(6):
        body = _rand_text(rng, 400)
        texts.append(body)
        ids.append(500 + 2 * i)
        texts.append(body + f" tail comment {i}")
        ids.append(500 + 2 * i + 1)
    # chain a~b~c with the DIRECT a~c edge below threshold: tails sized
    # 0.75*m each, so J(a,b)~0.57, J(b,c)~0.69, J(a,c)~0.39 — the
    # cluster must still merge all three (transitivity through b)
    m = _rand_text(rng, 400)
    t1 = _rand_text(rng, 300)
    t2 = _rand_text(rng, 300)
    texts += [m, m + t1, m + t1 + t2]
    ids += [900, 901, 902]
    texts.append("")                   # empty doc must be excluded
    ids.append(999)
    return texts, ids


def test_exact_jaccard_edges_match_naive(planted):
    texts, ids = planted
    want = _naive_edges(texts, ids, k=8, tau=0.5)
    got = jc.exact_jaccard_edges(_docs_ds(texts, ids),
                                 k=8, tau=0.5).take_all()
    got_t = sorted((r["a"], r["b"], r["jaccard"]) for r in got)
    assert [(a, b) for a, b, _ in got_t] == [(a, b) for a, b, _ in want]
    for (_, _, jg), (_, _, jw) in zip(got_t, want):
        assert jg == jw                # identical double arithmetic
    assert len(want) >= 6              # fixture really has planted dups


def test_exact_jaccard_edges_forced_fallbacks(planted, monkeypatch):
    """Zeroing the broadcast gates must route through the join fallbacks
    (count join + content join) and produce the identical edge set."""
    texts, ids = planted
    want = _naive_edges(texts, ids, k=8, tau=0.5)
    monkeypatch.setattr(jc, "BROADCAST_COUNT_LIMIT", 0)
    monkeypatch.setattr(jc, "BROADCAST_VERIFY_LIMIT", 0)
    got = jc.exact_jaccard_edges(_docs_ds(texts, ids),
                                 k=8, tau=0.5).take_all()
    got_t = sorted((r["a"], r["b"], r["jaccard"]) for r in got)
    assert got_t == want


def test_exact_jaccard_clusters_transitive(planted):
    texts, ids = planted
    labels = {r["file_id"]: r["cluster_id"]
              for r in jc.exact_jaccard_clusters(
                  _docs_ds(texts, ids), k=8, tau=0.5).take_all()}
    # empty doc excluded; all non-empty docs labeled
    assert 999 not in labels
    assert len(labels) == len(ids) - 1
    # the direct 900-902 edge is below threshold by construction, yet
    # all three merge through 901 (connected-components transitivity)
    edges = {(r["a"], r["b"])
             for r in jc.exact_jaccard_edges(
                 _docs_ds(texts, ids), k=8, tau=0.5).take_all()}
    assert (900, 901) in edges and (901, 902) in edges
    assert (900, 902) not in edges
    assert labels[900] == labels[901] == labels[902] == 900
    # planted pairs cluster to their min member
    for i in range(6):
        assert labels[500 + 2 * i] == labels[500 + 2 * i + 1] == 500 + 2 * i
    # unique docs are singletons
    for i in range(40):
        assert labels[100 + i] == 100 + i


def test_simhash_parity_signatures_deterministic():
    """Parity fingerprints: empty docs excluded, same input -> same
    64-bit fingerprints (value parity itself is oracle-gated by the
    simhash_pairs_sql row in CORRECTNESS)."""
    from data_deduplication_service_ray.stages.neardup import (
        simhash_parity_signatures)

    texts = ["the quick brown fox jumps", "", "pack my box with jugs",
             "the quick brown fox jumps"]
    ds = _docs_ds(texts, [1, 2, 3, 4])
    a = {r["file_id"]: r["simhash"]
         for r in simhash_parity_signatures(ds).take_all()}
    b = {r["file_id"]: r["simhash"]
         for r in simhash_parity_signatures(ds).take_all()}
    assert a == b
    assert 2 not in a                      # empty excluded
    assert a[1] == a[4]                    # identical docs, identical fp
    assert a[1] != a[3]


def test_minhash_parity_signatures_estimator():
    """Parity MinHash: deterministic, empty docs excluded, identical
    docs identical, and slot-agreement estimates Jaccard (the
    min-sketch property; value parity itself is oracle-gated by the
    minhash_sql row)."""
    from data_deduplication_service_ray.stages.neardup import (
        minhash_parity_signatures)

    rng = np.random.default_rng(5)
    base = _rand_text(rng, 2000)
    texts = [base, base, base + _rand_text(rng, 500),
             _rand_text(rng, 2000), ""]
    ds = _docs_ds(texts, [1, 2, 3, 4, 5])
    rows = minhash_parity_signatures(ds).take_all()
    sig = {}
    for r in rows:
        sig.setdefault(r["file_id"], {})[r["slot"]] = r["minhash"]
    assert 5 not in sig
    assert all(len(v) == 32 for v in sig.values())
    assert sig[1] == sig[2]                       # identical docs
    agree_13 = sum(sig[1][s] == sig[3][s] for s in sig[1]) / 32
    agree_14 = sum(sig[1][s] == sig[4][s] for s in sig[1]) / 32
    # J(1,3) ~ 2000/2500 = 0.8; J(1,4) ~ 0 — the estimator must
    # separate them decisively even at 32 slots
    assert agree_13 >= 0.5
    assert agree_14 <= 0.2
    rows2 = minhash_parity_signatures(ds).take_all()
    assert sorted(map(tuple, (r.values() for r in rows))) == \
        sorted(map(tuple, (r.values() for r in rows2)))


def test_no_edges_returns_empty_and_singletons():
    texts = ["alpha beta gamma delta", "zzz yyy xxx www", ""]
    ds = _docs_ds(texts, [1, 2, 3])
    edges = jc.exact_jaccard_edges(ds, k=8, tau=0.5).take_all()
    assert edges == []
    labels = {r["file_id"]: r["cluster_id"]
              for r in jc.exact_jaccard_clusters(ds, k=8,
                                                 tau=0.5).take_all()}
    assert labels == {1: 1, 2: 2}


def test_no_shared_grams_forced_distributed(monkeypatch):
    """A corpus with zero shared grams must yield empty edges on BOTH
    the gated and the forced-distributed paths (regression: the count
    join planned against a fully-empty candidate dataset raised
    ArrowInvalid in Ray 2.49)."""
    texts = ["alpha beta gamma delta", "zzz yyy xxx www",
             "0123456789 abcdefgh"]
    ds = _docs_ds(texts, [1, 2, 3])
    monkeypatch.setattr(jc, "BROADCAST_COUNT_LIMIT", 0)
    monkeypatch.setattr(jc, "BROADCAST_VERIFY_LIMIT", 0)
    assert jc.exact_jaccard_edges(ds, k=8, tau=0.5).take_all() == []
    labels = {r["file_id"]: r["cluster_id"]
              for r in jc.exact_jaccard_clusters(ds, k=8,
                                                 tau=0.5).take_all()}
    assert labels == {1: 1, 2: 2, 3: 3}
