"""Driver-facing query registry: Ray pipelines + DuckDB oracle SQL.

Every implemented operator from SURVEY.md §2 appears here twice: as a Ray
Data pipeline (``QUERIES``) and, where ANSI-SQL-expressible, as an
equivalent DuckDB query over the same parquet tables (``ORACLE_SQL``).
Column names match exactly between the two sides; doubles are derived from
integer aggregates with one identical arithmetic expression on both sides
so parallel reduction order cannot perturb them.

The queries run over the driver testdata ``documents`` table
(doc_id->file_id, text->content) — the dedup engine itself is
schema-agnostic over (file_id, content).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from data_deduplication_service_ray.config import PipelineConfig
from data_deduplication_service_ray.pipelines.dedup_core import DedupCore
from data_deduplication_service_ray.sources.readers import (
    read_documents, read_embeddings)

CFG = PipelineConfig(segment_size=64, segment_hash="sha256")

# Shared SQL fragment: fixed-size segmentation of documents at segment 64,
# 1-based positions, last partial block kept (lib/dbManager.cpp:204-234).
_SEGS_CTE = """
WITH exploded AS (
  SELECT d.doc_id AS file_id, d.text,
         CAST(unnest(generate_series(1,
             CAST(ceil(length(d.text)/{S}.0) AS BIGINT))) AS BIGINT) AS pos
  FROM documents d WHERE length(d.text) > 0
), segs AS (
  SELECT file_id, pos,
         substring(text, CAST((pos-1)*{S}+1 AS BIGINT), {S}) AS segment
  FROM exploded
)
""".format(S=64)


def _core(sf_dir: str) -> DedupCore:
    return DedupCore(read_documents(sf_dir), CFG)


# --------------------------------------------------------------------------
# Ray-side queries
# --------------------------------------------------------------------------

def q_exact_dedup(sf_dir: str):
    """Whole-file exact dedup (D4 analog): one representative per sha256."""
    return _core(sf_dir).file_dedup()


def q_segment_store(sf_dir: str):
    """Refcounted segment store (A2 upsert-merge analog)."""
    return _core(sf_dir).store()


def q_file_recipe(sf_dir: str):
    """Per-file recipe rows (the reference's ``data`` table)."""
    return _core(sf_dir).recipe(keep_data=False)


def q_reconstruct(sf_dir: str):
    """Round-trip reconstruction (S4/J1/O1): recipe ⋈ store, ordered."""
    return _core(sf_dir).reconstructed()


def q_dedup_report(sf_dir: str):
    """Per-file dedup characteristics (A4, getDedupCharacteristics)."""
    return _core(sf_dir).report()


def q_global_coefficient(sf_dir: str):
    """Global unique-segment percentage (A3, getCoefficient)."""
    return _core(sf_dir).coefficient()


def q_delete_refcounts(sf_dir: str):
    """Directory delete + GC (D2/D3/J5): drop docs of source 'src0' and
    recompute the store; zero-count segments vanish."""
    from data_deduplication_service_ray.stages import exact

    core = _core(sf_dir)
    doomed = (read_documents(sf_dir, columns=["doc_id", "source"])
              .filter(expr="source == 'src0'"))
    ids = {r["file_id"] for r in doomed.take_all()}
    return exact.delete_files(core.recipe(), ids)


def q_dir_listing(sf_dir: str):
    """Prefix listing (J3 analog: LIKE 'prefix%' over the catalog)."""
    docs = read_documents(sf_dir, columns=["doc_id", "source", "lang"])

    def keep(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.starts_with(batch["source"], "src1"))

    return docs.map_batches(keep, batch_format="pyarrow")


QUERIES = {
    "exact_dedup": q_exact_dedup,
    "segment_store": q_segment_store,
    "file_recipe": q_file_recipe,
    "reconstruct": q_reconstruct,
    "dedup_report": q_dedup_report,
    "global_coefficient": q_global_coefficient,
    "delete_refcounts": q_delete_refcounts,
    "dir_listing": q_dir_listing,
}


# --------------------------------------------------------------------------
# DuckDB oracle SQL (ANSI-ish; tables pre-registered as views)
# --------------------------------------------------------------------------

ORACLE_SQL = {
    "exact_dedup": """
        SELECT sha256(text) AS content_sha256,
               CAST(min(doc_id) AS BIGINT) AS file_id,
               CAST(count(*) AS BIGINT) AS dup_count
        FROM documents WHERE length(text) > 0
        GROUP BY 1
    """,
    "segment_store": _SEGS_CTE + """
        SELECT sha256(segment) AS segment_hash,
               min(segment) AS segment,
               CAST(count(*) AS BIGINT) AS segment_count
        FROM segs GROUP BY 1
    """,
    "file_recipe": _SEGS_CTE + """
        SELECT file_id, pos, sha256(segment) AS segment_hash FROM segs
    """,
    "reconstruct": """
        SELECT doc_id AS file_id, text AS content
        FROM documents WHERE length(text) > 0
    """,
    "dedup_report": _SEGS_CTE + """
        , per_hash AS (
            SELECT file_id, sha256(segment) AS segment_hash,
                   count(*) AS n, min(length(segment)) AS seg_chars
            FROM segs GROUP BY 1, 2
        )
        SELECT file_id,
               CAST(sum(n) AS BIGINT) AS total_segments,
               CAST(count(*) AS BIGINT) AS unique_segments,
               CAST(sum(seg_chars) AS BIGINT) AS stored_chars,
               CAST(count(*) AS DOUBLE) * 100 / CAST(sum(n) AS DOUBLE)
                   AS unique_pct
        FROM per_hash GROUP BY 1
    """,
    "global_coefficient": _SEGS_CTE + """
        , store AS (
            SELECT sha256(segment) AS h, count(*) AS c FROM segs GROUP BY 1
        )
        SELECT CAST(count(*) AS BIGINT) AS unique_segments,
               CAST(sum(c) AS BIGINT) AS total_segments,
               CAST(count(*) AS DOUBLE) * 100 / CAST(sum(c) AS DOUBLE)
                   AS unique_pct
        FROM store
    """,
    "delete_refcounts": """
        WITH exploded AS (
          SELECT d.doc_id AS file_id, d.text,
                 CAST(unnest(generate_series(1,
                     CAST(ceil(length(d.text)/64.0) AS BIGINT)))
                     AS BIGINT) AS pos
          FROM documents d
          WHERE length(d.text) > 0 AND d.source <> 'src0'
        ), segs AS (
          SELECT file_id, pos,
                 substring(text, CAST((pos-1)*64+1 AS BIGINT), 64)
                     AS segment
          FROM exploded
        )
        SELECT sha256(segment) AS segment_hash,
               min(segment) AS segment,
               CAST(count(*) AS BIGINT) AS segment_count
        FROM segs GROUP BY 1
    """,
    "dir_listing": """
        SELECT doc_id AS file_id, source, lang
        FROM documents WHERE source LIKE 'src1%'
    """,
}


def flagship(sf_dir: str = "/root/testdata/sf0.001") -> ray.data.Dataset:
    """Flagship pipeline for the driver smoke check."""
    return q_dedup_report(sf_dir)
