"""Segmentation (shingling) stages.

Reference parity: the ingest loop cuts a file into fixed-size segments with
the last partial block kept at its true length and hashes each segment
(lib/dbManager.cpp:196-247, segment loop 206-234; positions are 1-based
bigints, blockIndex=1 at lib/dbManager.cpp:204). Here that is one
``map_batches`` flat-map: one document row in -> ceil(len/size) segment rows
out, emitted as ``(file_id, pos, segment, segment_hash)``.

Segments are cut on *characters* (code points), matching DuckDB's
``substring`` semantics so the oracle SQL reproduces the exact same rows.

Also provides content-defined chunking (Gear rolling hash) as the CDC
shingle mode mandated by the north_star's "fixed/content-defined segments".
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from data_deduplication_service_ray.config import HASH_REGISTRY, PipelineConfig
from data_deduplication_service_ray.functions.hashing import kgram_hashes  # noqa: F401

# Gear table for CDC: 256 deterministic uint64 constants (seeded PRNG).
_GEAR = np.random.default_rng(0xCDC).integers(
    0, 1 << 63, size=256, dtype=np.uint64)


def _fixed_segments(text: str, size: int) -> list[str]:
    """Fixed-size character segments; last partial kept at true length."""
    return [text[i:i + size] for i in range(0, len(text), size)]


def _cdc_segments(text: str, cfg: PipelineConfig) -> list[str]:
    """Content-defined chunking via a Gear rolling hash over utf-8 bytes.

    Cut when (hash & mask)==0 after cdc_min bytes; force a cut at cdc_max.
    Deterministic; identical content always chunks identically, so shifted
    duplicate regions still align (the property fixed-size segmentation
    lacks). Cuts at byte boundaries are mapped back to character offsets
    only for ASCII-safe cut points; a multi-byte boundary defers the cut.
    """
    data = text.encode("utf-8")
    n = len(data)
    if n == 0:
        return []
    mask = (1 << cfg.cdc_avg_bits) - 1
    cuts = [0]
    h = 0
    last = 0
    for i in range(n):
        h = ((h << 1) + int(_GEAR[data[i]])) & 0xFFFFFFFFFFFFFFFF
        ln = i + 1 - last
        if ln >= cfg.cdc_min and (h & mask) == 0 or ln >= cfg.cdc_max:
            # defer cuts that would split a utf-8 multi-byte sequence
            if i + 1 < n and (data[i + 1] & 0xC0) == 0x80:
                continue
            cuts.append(i + 1)
            last = i + 1
            h = 0
    if cuts[-1] != n:
        cuts.append(n)
    return [data[a:b].decode("utf-8") for a, b in zip(cuts, cuts[1:])]


class Segmenter:
    """Flat-map actor: document rows -> segment rows.

    Stateful per the actor-pool pattern: the digest callable is resolved
    once per actor (reference analog: hash fn chosen once per database,
    include/HashUtils.h:86-100).
    """

    def __init__(self, cfg: PipelineConfig, mode: str | None = None,
                 keep_data: bool = True):
        self.cfg = cfg
        self.mode = mode or ("cdc" if cfg.shingle_mode == "cdc" else "fixed")
        self.digest, _ = HASH_REGISTRY[cfg.segment_hash]
        self.keep_data = keep_data

    def __call__(self, batch: pa.Table) -> pa.Table:
        fids, poss, segs, hashes = [], [], [], []
        ids = batch["file_id"].to_pylist()
        texts = batch["content"].to_pylist()
        for fid, text in zip(ids, texts):
            if not text:
                continue  # empty-file guard (include/FileService.h:372-377)
            parts = (_fixed_segments(text, self.cfg.segment_size)
                     if self.mode == "fixed"
                     else _cdc_segments(text, self.cfg))
            for pos, seg in enumerate(parts, start=1):  # 1-based positions
                fids.append(fid)
                poss.append(pos)
                segs.append(seg)
                hashes.append(self.digest(seg.encode("utf-8")))
        # RAW digest bytes internally (the reference stores bytea,
        # lib/dbManager.cpp:212-233): segment_hash rides every store/
        # recipe/reconstruct shuffle, and hex doubles its key bytes —
        # queries hexify at the DuckDB-oracle boundary only
        # (api.hexify_col).
        cols = {
            "file_id": pa.array(fids, pa.int64()),
            "pos": pa.array(poss, pa.int64()),
            "segment_hash": pa.array(hashes, pa.binary()),
        }
        if self.keep_data:
            cols["segment"] = pa.array(segs, pa.string())
        return pa.table(cols)


def segment_recipe(ds: ray.data.Dataset, cfg: PipelineConfig,
                   mode: str | None = None,
                   keep_data: bool = True) -> ray.data.Dataset:
    """documents -> (file_id, pos, segment_hash[, segment]) recipe rows.

    The reference's ``data`` table (lib/dbManager.cpp:583-588) as a derived
    Dataset; the per-file temp-table staging (lib/dbManager.cpp:344-349) is
    unnecessary — Ray blocks are the staging buffer.
    """
    return ds.map_batches(Segmenter(cfg, mode, keep_data),
                          batch_format="pyarrow",
                          batch_size=cfg.batch_size)


def shingle_array(text: str, cfg: PipelineConfig) -> np.ndarray:
    """uint64 shingle hashes for the near-dup path (char k-grams, token
    k-grams, or CDC chunk identities — ``cfg.shingle_mode``)."""
    from data_deduplication_service_ray.functions.hashing import (
        kgram_hashes, token_kgram_hashes)

    if cfg.shingle_mode == "cdc":
        segs = _cdc_segments(text, cfg)
        if not segs:
            return np.empty(0, dtype=np.uint64)
        raw = np.array([hash_bytes_u64(s.encode("utf-8")) for s in segs],
                       dtype=np.uint64)
        return raw
    if cfg.shingle_mode == "token":
        return token_kgram_hashes(text.encode("utf-8"),
                                  cfg.shingle_token_k)
    return kgram_hashes(text.encode("utf-8"), cfg.shingle_k)


def hash_bytes_u64(data: bytes) -> np.uint64:
    """One 64-bit hash of a byte string (for CDC chunk identities)."""
    import hashlib

    return np.uint64(int.from_bytes(
        hashlib.blake2b(data, digest_size=8).digest(), "big"))
