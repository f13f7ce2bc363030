"""Property-based tests (hypothesis) for the pure kernels.

The reference's test strategy is deliberate fixtures only (SURVEY.md §5);
these extend it with randomized invariants over the kernels that the
distributed stages compose — segmentation round-trips, suffix-array
order, containment soundness, sketch bounds, union-find canonicalization.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from data_deduplication_service_ray.config import PipelineConfig
from data_deduplication_service_ray.functions import minhash as mh
from data_deduplication_service_ray.functions.hashing import (
    kgram_hashes, stable_id64)
from data_deduplication_service_ray.functions.suffix import (
    containment_pairs, suffix_array)
from data_deduplication_service_ray.functions.unionfind import UnionFind
from data_deduplication_service_ray.stages.segment import (
    _cdc_segments, _fixed_segments)
from data_deduplication_service_ray.stages.text import winnow

TEXT = st.text(min_size=0, max_size=400)
SMALL_TEXT = st.text(alphabet="abAB\n\x00 é", min_size=0, max_size=120)


@settings(max_examples=60, deadline=None)
@given(TEXT, st.integers(min_value=1, max_value=128))
def test_fixed_segmentation_roundtrip(text, size):
    segs = _fixed_segments(text, size)
    assert "".join(segs) == text
    assert all(len(s) <= size for s in segs)
    assert all(len(s) == size for s in segs[:-1])  # only tail partial


@settings(max_examples=40, deadline=None)
@given(TEXT)
def test_cdc_roundtrip_and_bounds(text):
    cfg = PipelineConfig(shingle_mode="cdc")
    segs = _cdc_segments(text, cfg)
    assert "".join(segs) == text
    # multi-byte deferral may overshoot cdc_max by at most 3 bytes
    assert all(len(s.encode()) <= cfg.cdc_max + 3 for s in segs)
    assert segs == _cdc_segments(text, cfg)  # deterministic


@settings(max_examples=40, deadline=None)
@given(SMALL_TEXT)
def test_suffix_array_is_sorted_suffix_order(s):
    sa = suffix_array(s)
    assert sorted(sa.tolist()) == list(range(len(s)))
    for i in range(len(sa) - 1):
        assert s[sa[i]:] <= s[sa[i + 1]:]


@settings(max_examples=30, deadline=None)
@given(st.lists(st.text(alphabet="abc", min_size=1, max_size=20),
                min_size=2, max_size=6))
def test_containment_soundness_and_completeness(texts):
    ids = list(range(100, 100 + len(texts)))
    got = set(containment_pairs(ids, texts))
    expect = {(ids[i], ids[j])
              for i in range(len(texts)) for j in range(len(texts))
              if i != j and texts[i] in texts[j]}
    assert got == expect


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1),
                min_size=0, max_size=500),
       st.integers(min_value=2, max_value=32))
def test_winnow_subset_and_coverage(values, window):
    h = np.array(values, dtype=np.uint64)
    sel = winnow(h, window)
    sel_set = set(sel.tolist())
    assert sel_set <= set(h.tolist())
    for start in range(max(len(h) - window + 1, 0)):
        assert sel_set & set(h[start:start + window].tolist())


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1),
                min_size=0, max_size=300, unique=True),
       st.lists(st.integers(min_value=0, max_value=2**63 - 1),
                min_size=0, max_size=300, unique=True))
def test_jaccard_bounds_and_symmetry(a, b):
    sa = np.unique(np.array(a, dtype=np.uint64))
    sb = np.unique(np.array(b, dtype=np.uint64))
    j = mh.exact_jaccard(sa, sb)
    assert 0.0 <= j <= 1.0
    assert j == mh.exact_jaccard(sb, sa)
    if list(sa) == list(sb):
        assert j == 1.0


@settings(max_examples=20, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 50), st.integers(0, 50)),
                min_size=0, max_size=60))
def test_unionfind_labels_are_component_minima(edges):
    uf = UnionFind()
    for a, b in edges:
        uf.union(a, b)
    labels = uf.labels()
    # canonical: every node's label is the min of its component
    comp: dict[int, set[int]] = {}
    for node, lab in labels.items():
        comp.setdefault(lab, set()).add(node)
    for lab, members in comp.items():
        assert lab == min(members | {lab})
    # connectivity respected
    for a, b in edges:
        assert labels[a] == labels[b]


@settings(max_examples=30, deadline=None)
@given(st.text(min_size=0, max_size=50), st.text(min_size=0, max_size=50))
def test_stable_id_deterministic_and_separator_safe(x, y):
    assert stable_id64(x, y) == stable_id64(x, y)
    if x != y:
        # NUL-joined: ("ab","c") must differ from ("a","bc")
        assert stable_id64(x, y) != stable_id64(y, x) or x == y


@settings(max_examples=20, deadline=None)
@given(st.binary(min_size=0, max_size=200),
       st.integers(min_value=1, max_value=16))
def test_kgram_count(data, k):
    h = kgram_hashes(data, k)
    if len(data) == 0:
        assert len(h) == 0
    elif len(data) < k:
        assert len(h) == 1
    else:
        assert len(h) == len(data) - k + 1


@settings(max_examples=10, deadline=None)
@given(st.lists(st.lists(st.integers(0, 2**63 - 1), min_size=0,
                         max_size=200), min_size=1, max_size=8))
def test_oph_matches_itself_and_shapes(sets):
    arrs = [np.array(s, dtype=np.uint64) for s in sets]
    a = mh.oph_signatures_batch(arrs, 128, 42)
    b = mh.oph_signatures_batch([x.copy() for x in arrs], 128, 42)
    assert np.array_equal(a, b)
    assert a.shape == (len(sets), 128)


@settings(max_examples=15, deadline=None)
@given(st.lists(st.lists(st.integers(0, 2**64 - 1), min_size=0,
                         max_size=300), min_size=1, max_size=10))
def test_simhash_batch_matches_per_doc(sets):
    arrs = [np.array(s, dtype=np.uint64) for s in sets]
    batch = mh.simhash64_batch(arrs)
    per_doc = np.array([mh.simhash64(a) for a in arrs], dtype=np.uint64)
    assert np.array_equal(batch, per_doc)


def test_oph_sort_and_scatter_branches_agree():
    """OPH picks a sort-based path for long-doc batches and a scatter-min
    path for short-doc batches; a document's signature must not depend on
    which branch its batch landed in (padding with empty docs flips the
    mean-length branch condition without touching the real docs)."""
    rng = np.random.default_rng(11)
    sets = [rng.integers(0, 2**63, size=n, dtype=np.uint64)
            for n in (500, 900, 384, 2000)]
    a = mh.oph_signatures_batch(sets, 128, 42)          # mean >= 384
    padded = sets + [np.empty(0, np.uint64)] * 60       # mean ~59
    b = mh.oph_signatures_batch(padded, 128, 42)
    assert np.array_equal(a, b[:4])
    s_long = mh.simhash64_batch(sets)                   # per-doc bincount
    s_short = mh.simhash64_batch(padded)                # batched reduceat
    assert np.array_equal(s_long, s_short[:4])


def test_simhash_batch_chunk_spanning_and_empty_edges():
    """A document longer than the internal chunk must accumulate across
    chunks; leading/trailing empty docs must keep fingerprint 0; OPH must
    agree with the single-doc path under the same edge layout."""
    rng = np.random.default_rng(7)
    big = rng.integers(0, 2**63, size=40000, dtype=np.uint64)
    small = rng.integers(0, 2**63, size=5, dtype=np.uint64)
    arrs = [np.empty(0, np.uint64), big, np.empty(0, np.uint64),
            small, np.empty(0, np.uint64)]
    batch = mh.simhash64_batch(arrs)
    per_doc = np.array([mh.simhash64(a) for a in arrs], dtype=np.uint64)
    assert np.array_equal(batch, per_doc)
    assert batch[0] == 0 and batch[2] == 0 and batch[4] == 0
    oph = mh.oph_signatures_batch(arrs, 128, 42)
    solo = mh.oph_signatures_batch([big], 128, 42)
    assert np.array_equal(oph[1], solo[0])
    assert np.array_equal(oph[0], np.full(128, np.iinfo(np.uint64).max,
                                          dtype=np.uint64))


def test_range_bounds_cover_int64_disjointly():
    """The expansion ranges must partition the full int64 space:
    contiguous, disjoint, starting at INT64_MIN, last open-ended."""
    from data_deduplication_service_ray.stages.neardup import _range_bounds

    for nparts in (1, 3, 8, 64, 128):
        bounds = _range_bounds(nparts)
        assert len(bounds) == nparts
        assert bounds[0][0] == -(1 << 63)
        assert bounds[-1][1] is None
        for (lo1, hi1), (lo2, _hi2) in zip(bounds, bounds[1:]):
            assert hi1 == lo2 and lo1 < hi1


def test_fsb_matrix_roundtrip():
    """fsb_from_matrix/fsb_to_matrix must round-trip arbitrary dtypes
    bit-exactly (the join payload packing)."""
    import numpy as np

    from data_deduplication_service_ray.stages.neardup import (
        fsb_from_matrix, fsb_to_matrix)

    rng = np.random.default_rng(3)
    for dtype, w in ((np.uint8, 128), (np.float64, 16), (np.int64, 4)):
        mat = rng.integers(0, 100, size=(37, w)).astype(dtype)
        arr = fsb_from_matrix(mat)
        assert arr.type.byte_width == w * mat.itemsize
        back = fsb_to_matrix(arr, dtype)
        assert np.array_equal(back, mat)


def test_gate_env_flag(monkeypatch):
    """config.gate returns the value normally and 0 under
    GRAFT_FORCE_DISTRIBUTED=1 (the forced-fallback switch)."""
    import importlib

    from data_deduplication_service_ray import config as cfgmod

    assert cfgmod.gate(123) == 123
    monkeypatch.setenv("GRAFT_FORCE_DISTRIBUTED", "1")
    assert cfgmod.gate(123) == 0
    monkeypatch.delenv("GRAFT_FORCE_DISTRIBUTED")
    assert cfgmod.gate(123) == 123
