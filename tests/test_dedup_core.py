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

CFG = PipelineConfig()
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
            row.segment.encode()).digest() == row.segment_hash


def test_delete_antijoin_matches_small_path(core):
    """The large-delete anti-join recomputes the exact same store as the
    broadcast small-delete path on a ~10%-of-corpus delete set."""
    import pyarrow as pa
    import ray.data

    all_ids = sorted({r["file_id"] for r in core.docs.take_all()})
    doom = all_ids[:: 10]                       # every 10th file
    recipe = core.recipe()
    small = {r["segment_hash"]: (r["segment_count"], r["segment"])
             for r in exact.delete_files(recipe, set(doom)).take_all()}
    doomed_ds = ray.data.from_arrow(
        pa.table({"file_id": pa.array(doom, pa.int64())}))
    big = {r["segment_hash"]: (r["segment_count"], r["segment"])
           for r in exact.delete_files_antijoin(recipe,
                                                doomed_ds).take_all()}
    assert small == big and len(big) > 0
    # empty doomed set degrades to the plain store
    empty = ray.data.from_arrow(
        pa.table({"file_id": pa.array([], pa.int64())}))
    full = {r["segment_hash"]: r["segment_count"]
            for r in exact.delete_files_antijoin(recipe, empty).take_all()}
    base = {r["segment_hash"]: r["segment_count"]
            for r in core.store().take_all()}
    assert full == base


def test_export_files_tree_roundtrip(small_corpus_dir, tmp_path):
    """S5 byte-export: originals -> tree A; pipeline reconstruction ->
    tree B; the trees must be byte-identical (reference
    compareDirectories gate, lib/fileUtils.cpp:6-94). Also exercises the
    on_exists policies (include/fileUtils.h:35-40)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from data_deduplication_service_ray.sources.writers import (
        compare_directories, export_files)

    docs = read_corpus(f"{small_corpus_dir}/corpus.parquet")

    def nonempty(batch):
        return batch.filter(pc.greater(pc.utf8_length(batch["content"]),
                                       0))

    docs_ne = docs.map_batches(nonempty, batch_format="pyarrow")
    dir_a = str(tmp_path / "orig")
    dir_b = str(tmp_path / "rebuilt")
    res = export_files(docs_ne, dir_a)
    assert res["written"] > 0 and res["skipped"] == 0

    # reconstruct through the dedup core, re-attach paths, export
    paths = {r["file_id"]: r["path"]
             for r in docs_ne.select_columns(
                 ["file_id", "path"]).take_all()}
    core2 = DedupCore(docs_ne, PipelineConfig(segment_size=64))

    def attach_path(batch):
        p = [paths[f] for f in batch["file_id"].to_pylist()]
        return batch.append_column("path", pa.array(p, pa.string()))

    rebuilt = core2.reconstructed().map_batches(attach_path,
                                                batch_format="pyarrow")
    export_files(rebuilt, dir_b)
    assert compare_directories(dir_a, dir_b) == []

    # on_exists policies
    res2 = export_files(docs_ne, dir_a, on_exists="skip")
    assert res2["written"] == 0 and res2["skipped"] == res["written"]
    with pytest.raises(Exception):
        export_files(docs_ne.limit(1), dir_a, on_exists="error")


def test_ingest_latency_matches_recipe():
    """ingest_latency rows: one per non-empty file, n_segments equals the
    recipe's per-file segment count, wall micros non-negative."""
    from collections import Counter

    from data_deduplication_service_ray import api

    sf = "/root/testdata/sf0.001"
    rows = api.q_ingest_latency(sf).take_all()
    assert rows
    assert all(r["ingest_us"] >= 0 and r["n_segments"] >= 1 for r in rows)
    recipe_counts = Counter(
        r["file_id"] for r in api._core(sf).recipe(
            keep_data=False).take_all())
    assert {r["file_id"]: r["n_segments"] for r in rows} == dict(
        recipe_counts)


def test_sha_s64_zero_copy_and_fallback():
    """The zero-copy S64 view must equal the to_pylist conversion for
    uniform 64-char sha columns, and fall back safely when lengths vary
    (the guard condition, not an expected production shape)."""
    import numpy as np
    import pyarrow as pa

    from data_deduplication_service_ray.pipelines.neardup import (
        NearDupPipeline)

    shas = ["%064x" % (i * 7919) for i in range(100)]
    col = pa.chunked_array([shas[:40], shas[40:]], pa.string())
    got = NearDupPipeline._sha_s64(col)
    assert np.array_equal(got, np.array(shas, dtype="S64"))
    ragged = pa.chunked_array([["ab", "c" * 64, ""]], pa.string())
    got2 = NearDupPipeline._sha_s64(ragged)
    assert np.array_equal(got2, np.array(["ab", "c" * 64, ""],
                                         dtype="S64"))


def test_input_validation_clear_errors(tmp_path):
    """M5 analog (lib/fileUtils.cpp:101-143): missing or corrupt parquet
    inputs must fail fast with a clear error, not a deep Ray-task
    traceback."""
    import pytest

    from data_deduplication_service_ray.sources.readers import (
        read_corpus, validate_parquet_input)

    with pytest.raises(FileNotFoundError, match="does not exist"):
        read_corpus(str(tmp_path / "nope.parquet"))
    empty = tmp_path / "emptydir"
    empty.mkdir()
    with pytest.raises(ValueError, match="no \\*.parquet files"):
        validate_parquet_input(str(empty))
    junk = tmp_path / "bad.parquet"
    junk.write_bytes(b"this is not parquet at all")
    with pytest.raises(ValueError, match="not readable parquet"):
        read_corpus(str(junk))


def test_export_retrieval_remove_returns_ids(small_corpus_dir, tmp_path):
    """retrieval="remove" (the reference's dataRetrievalStrategy,
    include/FileService.h:237-247) must export the same tree AND hand
    back the exported file ids for the delete path."""
    from data_deduplication_service_ray.pipelines.neardup import (
        NearDupPipeline)
    from data_deduplication_service_ray.sources.readers import read_corpus
    from data_deduplication_service_ray.sources.writers import export_files

    docs = read_corpus(f"{small_corpus_dir}/corpus.parquet").limit(20)
    docs = docs.materialize()
    res = export_files(docs, str(tmp_path / "out"),
                       retrieval="remove")
    assert res["written"] > 0
    ids = res["removed_ids"]
    assert ids == sorted({r["file_id"] for r in
                          docs.select_columns(["file_id"]).take_all()})
    # feeding the ids to without_files drops them from the pipeline
    p = NearDupPipeline(
        read_corpus(f"{small_corpus_dir}/corpus.parquet"), CFG)
    p2 = p.without_files(set(ids))
    remaining = {r["file_id"] for r in p2.sha_fid().take_all()}
    assert not (remaining & set(ids))
