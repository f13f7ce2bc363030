"""End-to-end exact-dedup core over the synthetic corpus.

Invariants from FIXTURES.md §3 / the reference's integration suite:
- round-trip reconstruction equals original content byte-for-byte
  (test/testUtils.h:164-202 golden checks);
- refcount invariant: recounted recipe == stored counts
  (checkSegmentCount, lib/dbCommon.cpp:192-202);
- per-row content sha256 preserved end-to-end (BASELINE.json input_hint);
- delete + GC recompute semantics (lib/dbManager.cpp:92-161).
"""

import hashlib

import pytest

from data_deduplication_service_ray.config import PipelineConfig
from data_deduplication_service_ray.pipelines.dedup_core import DedupCore
from data_deduplication_service_ray.sources.readers import read_corpus
from data_deduplication_service_ray.stages import exact


@pytest.fixture(scope="module")
def core(small_corpus_dir):
    docs = read_corpus(f"{small_corpus_dir}/corpus.parquet")
    return DedupCore(docs, PipelineConfig(segment_size=64))


def test_empty_rows_filtered(core, small_corpus_dir):
    import pyarrow.parquet as pq

    raw = pq.read_table(f"{small_corpus_dir}/corpus.parquet")
    n_empty = sum(1 for t in raw["content"].to_pylist() if not t)
    assert n_empty >= 2  # fixture guarantees empty rows exist
    assert core.docs.count() == raw.num_rows - n_empty


def test_roundtrip_byte_equality(core):
    recon = core.reconstructed().to_pandas()
    orig = core.docs.to_pandas()[["file_id", "content"]]
    m = recon.merge(orig, on="file_id", suffixes=("_r", "_o"))
    assert len(m) == len(orig)
    assert (m.content_r == m.content_o).all()


def test_sha256_invariant_through_reconstruction(core):
    recon = core.reconstructed().to_pandas()
    orig = core.normalized().to_pandas()[["file_id", "content_sha256"]]
    m = recon.merge(orig, on="file_id")
    rehash = m["content"].map(
        lambda t: hashlib.sha256(t.encode()).hexdigest())
    assert (rehash == m.content_sha256).all()


def test_refcount_invariant(core):
    assert exact.refcount_invariant(core.recipe(), core.store()) == 0


def test_exact_file_dedup_finds_planted_groups(core, small_corpus_dir):
    import pyarrow.parquet as pq

    fd = core.file_dedup().to_pandas()
    truth = pq.read_table(f"{small_corpus_dir}/truth.parquet").to_pandas()
    n_exact_rows = (truth.kind == "exact").sum()
    n_exact_groups = truth[truth.kind == "exact"].group_id.nunique()
    dup_rows = int(fd[fd.dup_count > 1].dup_count.sum())
    # every planted exact group collapses to one representative
    assert dup_rows >= n_exact_rows
    assert (fd.dup_count > 1).sum() >= n_exact_groups
    # representatives are unique per hash
    assert fd.content_sha256.is_unique


def test_delete_files_recomputes_counts(core):
    store_before = core.store().to_pandas()
    some_ids = set(core.docs.take(5)[i]["file_id"] for i in range(5))
    recipe = core.recipe()
    store_after = exact.delete_files(recipe, some_ids).to_pandas()
    # deleted files' private segments are gone (GC analog: count==0 rows
    # never materialize), shared ones have decremented counts
    assert store_after.segment_count.sum() < store_before.segment_count.sum()
    assert (store_after.segment_count > 0).all()
    m = store_before.merge(store_after, on="segment_hash", how="left",
                           suffixes=("_b", "_a"))
    dec = m.dropna()
    assert (dec.segment_count_a <= dec.segment_count_b).all()


def test_store_payload_consistent(core):
    store = core.store().to_pandas()
    for _, row in store.sample(20, random_state=7).iterrows():
        assert hashlib.sha256(
            row.segment.encode()).hexdigest() == row.segment_hash
