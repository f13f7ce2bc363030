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


def _cdc_cuts_naive(data: bytes, cfg: PipelineConfig) -> list[int]:
    """Reference per-byte Gear loop (the reference's segmenter shape,
    lib/dbManager.cpp:206-234, content-defined variant). ~1 µs/byte of
    interpreter time — kept ONLY as the parity oracle for the
    vectorized kernel below (tests/test_segment.py)."""
    n = len(data)
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
    return cuts


#: near-zone shift templates (cut candidates closer than 64 bytes to the
#: previous cut need the prefix correction; see _cdc_cuts)
_CDC_SH = np.arange(64, dtype=np.uint64)


def _gear_prefix(b: np.ndarray) -> np.ndarray:
    """A[i] = sum_{j > i-64} GEAR[d_j] << (i-j) (mod 2^64): the Gear
    rolling hash WITHOUT cut resets, for every position at once. The
    <<1-per-byte recurrence forgets bytes 64 positions back (their
    contribution shifts out of the word), so six doubling passes
    (s = 1..32) compute all positions exactly — contributions at
    distance >= 64 are ≡ 0 mod 2^64 and need no s=64 pass."""
    a = _GEAR[b]
    for s in (1, 2, 4, 8, 16, 32):
        a[s:] += a[:-s] << np.uint64(s)   # uint64 wraps
    return a


def _cdc_cuts(data: bytes, cfg: PipelineConfig) -> list[int]:
    """Vectorized Gear CDC cut positions — bit-identical to
    ``_cdc_cuts_naive`` (fuzz-parity-tested incl. multi-byte utf-8 and
    degenerate min/max configs).

    Two identities make this O(chunks) Python instead of O(bytes):

    1. The post-cut hash restarted at ``last`` equals
       ``A[i] - (A[last-1] << (i-last+1))`` (mod 2^64) — shifts >= 64
       vanish — so the no-reset prefix ``A`` (``_gear_prefix``, 6
       vectorized passes) serves every cut with a correction term.
    2. The cut test only reads the LOW ``cdc_avg_bits`` bits, and the
       correction term's low bits are zero once ``i-last+1 >=
       cdc_avg_bits`` — so for any sane config (cdc_min >= avg bits,
       e.g. the 32/6 default) the reset is INVISIBLE to the mask test
       and all candidate positions are one precomputed vectorized pass;
       the per-cut walk is a monotone pointer over that candidate list
       (amortized O(candidates) total). Only configs with cdc_min <
       avg bits check the tiny corrected window per cut.

    Measured ~16x over the per-byte loop on real ~5 KB source docs at
    the default config; the batch variant (``cdc_cuts_batch``) reaches
    ~22x (this host; parity gates in tests/test_segment.py).
    """
    n = len(data)
    min_, max_ = cfg.cdc_min, cfg.cdc_max
    bits = cfg.cdc_avg_bits
    b = np.frombuffer(data, dtype=np.uint8)
    a = _gear_prefix(b)
    mask = np.uint64((1 << bits) - 1)
    zero = np.uint64(0)
    utf8_ok = np.ones(n, dtype=bool)
    if n > 1:
        utf8_ok[:-1] = (b[1:] & 0xC0) != 0x80
    # candidate positions where the UNCORRECTED masked hash is zero and
    # a cut is utf-8-legal; exact for any position with ln >= bits
    cand = np.flatnonzero(((a & mask) == zero) & utf8_ok).tolist()
    n_cand = len(cand)
    cuts = [0]
    last = 0
    aprev = 0   # A[last-1]
    p = 0   # monotone pointer into cand
    guard = min(min_, max_)
    std = min_ >= bits >= 1   # the corrected zone is empty for every cut
    cm1, cm2 = min_ - 1, max_ - 2
    while n - last >= guard:
        cut = -1
        if std:
            # tight path: cut = first candidate with ln in [min, max-1]
            flo = last + cm1
            while p < n_cand and cand[p] < flo:
                p += 1
            if p < n_cand and cand[p] <= last + cm2:
                cut = cand[p]
        else:
            lo = max(last + min_ - 1, last)
            # corrected zone: ln in [min, bits-1] — cdc_min < avg bits
            hi_corr = min(last + bits - 2, last + max_ - 2, n - 1)
            if lo <= hi_corr:
                m = hi_corr - lo + 1
                sh = _CDC_SH[lo - last + 1:lo - last + 1 + m]
                hv = a[lo:hi_corr + 1] - (np.uint64(aprev) << sh)
                zs = np.flatnonzero(((hv & mask) == zero)
                                    & utf8_ok[lo:hi_corr + 1])
                if len(zs):
                    cut = lo + int(zs[0])
            if cut < 0:
                # uncorrected zone: candidates with ln in [bits, max-1]
                flo = max(lo, last + bits - 1)
                fhi = min(last + max_ - 2, n - 1)
                while p < n_cand and cand[p] < flo:
                    p += 1
                if p < n_cand and cand[p] <= fhi:
                    cut = cand[p]
        if cut < 0:
            # forced cut at ln >= max, deferred past utf-8 continuations
            i = last + max_ - 1
            if i >= n - 1:
                break
            while i < n - 1 and not utf8_ok[i]:
                i += 1
            cut = i
        if cut >= n - 1:
            break   # a cut at the last byte equals the tail append
        cuts.append(cut + 1)
        last = cut + 1
        if not std:
            aprev = int(a[cut])
    if cuts[-1] != n:
        cuts.append(n)
    return cuts


def _walk_cuts_std(n: int, cand: list, utf8_ok, min_: int, max_: int
                   ) -> list[int]:
    """Tight per-doc cut walk for the standard config (cdc_min >= avg
    bits): next cut = first candidate with ln in [min, max-1], else the
    forced cut deferred past utf-8 continuations. ``cand`` holds
    doc-local candidate indices; ``utf8_ok`` is the doc's legality
    slice."""
    cuts = [0]
    last = 0
    p = 0
    n_cand = len(cand)
    guard = min(min_, max_)
    cm1, cm2 = min_ - 1, max_ - 2
    while n - last >= guard:
        flo = last + cm1
        while p < n_cand and cand[p] < flo:
            p += 1
        if p < n_cand and cand[p] <= last + cm2:
            cut = cand[p]
        else:
            i = last + max_ - 1
            if i >= n - 1:
                break
            while i < n - 1 and not utf8_ok[i]:
                i += 1
            cut = i
        if cut >= n - 1:
            break
        cuts.append(cut + 1)
        last = cut + 1
    if cuts[-1] != n:
        cuts.append(n)
    return cuts


def cdc_cuts_batch(datas: list[bytes], cfg: PipelineConfig
                   ) -> list[list[int]]:
    """CDC cut positions for a whole batch of documents at once —
    bit-identical to per-doc ``_cdc_cuts`` (parity-tested).

    All docs are concatenated and the Gear prefix + candidate scan run
    ONCE over the batch, amortizing the per-doc numpy dispatch that
    dominated the per-doc kernel. Exactness across doc boundaries: a
    position < 64 bytes into a doc carries contamination from the
    previous doc in ``A``, but the contamination is invisible to the
    masked cut test once i+1 >= avg bits, and every usable candidate
    has i+1 >= cdc_min >= avg bits in the standard config; utf-8
    legality is boundary-safe because a valid document never starts
    with a continuation byte. Non-standard configs (cdc_min < avg
    bits) fall back to the exact per-doc kernel."""
    bits = cfg.cdc_avg_bits
    min_, max_ = cfg.cdc_min, cfg.cdc_max
    if not (min_ >= bits >= 1) or not datas:
        return [_cdc_cuts(d, cfg) for d in datas]
    # L2-sized doc groups: one giant concat would cross glibc's mmap
    # threshold and the doubling passes' temporaries become page-fault
    # bound (the known whole-block-temporary trap — CLAUDE.md), which
    # measured SLOWER than the per-doc kernel
    if sum(len(d) for d in datas) > 131072 and len(datas) > 1:
        out: list[list[int]] = []
        group: list[bytes] = []
        size = 0
        for d in datas:
            if group and size + len(d) > 98304:
                out.extend(cdc_cuts_batch(group, cfg))
                group, size = [], 0
            group.append(d)
            size += len(d)
        if group:
            out.extend(cdc_cuts_batch(group, cfg))
        return out
    lens = np.fromiter((len(d) for d in datas), dtype=np.int64,
                       count=len(datas))
    buf = np.frombuffer(b"".join(datas), dtype=np.uint8)
    n_all = len(buf)
    if n_all == 0:
        return [[0] if ln == 0 else [0, int(ln)] for ln in lens]
    a = _gear_prefix(buf)
    mask = np.uint64((1 << bits) - 1)
    utf8_ok = np.ones(n_all, dtype=bool)
    if n_all > 1:
        utf8_ok[:-1] = (buf[1:] & 0xC0) != 0x80
    cand_all = np.flatnonzero(((a & mask) == np.uint64(0)) & utf8_ok)
    bounds = np.concatenate(([0], np.cumsum(lens)))
    cpos = np.searchsorted(cand_all, bounds)
    out = []
    for d in range(len(datas)):
        lo, hi = int(bounds[d]), int(bounds[d + 1])
        n = hi - lo
        if n == 0:
            out.append([0])
            continue
        cand = (cand_all[cpos[d]:cpos[d + 1]] - lo).tolist()
        out.append(_walk_cuts_std(n, cand, utf8_ok[lo:hi], min_, max_))
    return out


def _cdc_segments(text: str, cfg: PipelineConfig) -> list[str]:
    """Content-defined chunking via a Gear rolling hash over utf-8 bytes.

    Cut when (hash & mask)==0 after cdc_min bytes; force a cut at cdc_max.
    Deterministic; identical content always chunks identically, so shifted
    duplicate regions still align (the property fixed-size segmentation
    lacks). Cuts at byte boundaries are mapped back to character offsets
    only for ASCII-safe cut points; a multi-byte boundary defers the cut.
    """
    data = text.encode("utf-8")
    if len(data) == 0:
        return []
    cuts = _cdc_cuts(data, cfg)
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

    _EMPTY_SCHEMA = {"file_id": pa.int64(), "pos": pa.int64(),
                     "segment_hash": pa.binary(), "segment": pa.string()}

    def _empty(self) -> pa.Table:
        cols = {k: pa.array([], t) for k, t in self._EMPTY_SCHEMA.items()
                if self.keep_data or k != "segment"}
        return pa.table(cols)

    def _emit(self, ids: np.ndarray, nseg: np.ndarray,
              seg_offs: np.ndarray, mv: memoryview,
              value_buf, offs_dtype) -> pa.Table:
        """Assemble segment rows from absolute byte offsets.

        ``seg_offs`` has one start per segment plus the final end; both
        fixed and CDC segmentation PARTITION each doc contiguously and
        consecutive docs are adjacent in the Arrow value buffer, so the
        output segment column reuses the INPUT value buffer with new
        offsets — zero bytes of segment text are copied. Only the
        cryptographic digest touches each segment (memoryview slice,
        one hashlib call — inherent; the reference hashes per segment
        too, lib/dbManager.cpp:212-233)."""
        total = len(seg_offs) - 1
        # RAW digest bytes internally (the reference stores bytea):
        # hex only at the DuckDB-oracle boundary (api.hexify_col)
        digest = self.digest
        so = seg_offs.tolist()
        hashes = [digest(mv[a:b]) for a, b in zip(so, so[1:])]
        first = np.repeat(np.cumsum(nseg) - nseg, nseg)
        pos = np.arange(total, dtype=np.int64) - first + 1
        cols = {
            "file_id": pa.array(np.repeat(ids, nseg)),
            "pos": pa.array(pos),
            "segment_hash": pa.array(hashes, pa.binary()),
        }
        if self.keep_data:
            typ = pa.string() if offs_dtype == np.int32 else pa.large_string()
            cols["segment"] = pa.Array.from_buffers(
                typ, total,
                [None, pa.py_buffer(seg_offs.astype(offs_dtype)),
                 value_buf])
        return pa.table(cols)

    def __call__(self, batch: pa.Table) -> pa.Table:
        col0 = batch["content"]
        import pyarrow.compute as pc

        # empty-file guard (include/FileService.h:372-377), vectorized;
        # the filter also rebuilds the batch contiguously, which the
        # zero-copy offset trick in _emit relies on
        keep = pc.and_(col0.is_valid(), pc.greater(pc.utf8_length(col0),
                                                   0))
        if not (pc.all(keep).as_py() if batch.num_rows else False):
            batch = batch.filter(keep)
        n = batch.num_rows
        if n == 0:
            return self._empty()
        col = batch["content"].combine_chunks()
        ids = np.asarray(batch["file_id"].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        offs_dtype = (np.int64 if pa.types.is_large_string(col.type)
                      else np.int32)
        offs = np.frombuffer(col.buffers()[1], dtype=offs_dtype)[
            col.offset:col.offset + n + 1].astype(np.int64)
        value_buf = col.buffers()[2]
        mv = memoryview(value_buf)
        size = self.cfg.segment_size

        if self.mode == "cdc":
            # CDC cuts are byte offsets into the utf-8 bytes — exactly
            # the Arrow value buffer; batch kernel, no decode at all
            datas = [bytes(mv[offs[i]:offs[i + 1]]) for i in range(n)]
            cuts_list = cdc_cuts_batch(datas, self.cfg)
            nseg = np.fromiter((len(c) - 1 for c in cuts_list),
                               dtype=np.int64, count=n)
            seg_offs = np.concatenate(
                [offs[i] + np.asarray(c[:-1], dtype=np.int64)
                 for i, c in enumerate(cuts_list)] + [offs[-1:]])
            return self._emit(ids, nseg, seg_offs, mv, value_buf,
                              offs_dtype)

        # fixed mode cuts on CHARACTERS (DuckDB substring parity);
        # char == byte only for ascii rows, so split the batch
        ascii_mask = np.asarray(pc.string_is_ascii(col).to_numpy(
            zero_copy_only=False), dtype=bool)
        out_tables = []
        if ascii_mask.all():
            asc = batch
        else:
            asc = batch.filter(pa.array(ascii_mask))
            non = batch.filter(pa.array(~ascii_mask))
            out_tables.append(self._fixed_python(non))
        if asc.num_rows:
            acol = asc["content"].combine_chunks()
            a_offs_dt = (np.int64 if pa.types.is_large_string(acol.type)
                         else np.int32)
            aoffs = np.frombuffer(acol.buffers()[1], dtype=a_offs_dt)[
                acol.offset:acol.offset + asc.num_rows + 1].astype(
                np.int64)
            avb = acol.buffers()[2]
            amv = memoryview(avb)
            aids = np.asarray(asc["file_id"].to_numpy(
                zero_copy_only=False), dtype=np.int64)
            doc_lens = np.diff(aoffs)
            nseg = -(-doc_lens // size)
            total = int(nseg.sum())
            first = np.repeat(np.cumsum(nseg) - nseg, nseg)
            k = np.arange(total, dtype=np.int64) - first
            starts = np.repeat(aoffs[:-1], nseg) + k * size
            seg_offs = np.append(starts, aoffs[-1])
            out_tables.insert(0, self._emit(aids, nseg, seg_offs, amv,
                                            avb, a_offs_dt))
        if not out_tables:
            return self._empty()
        return (out_tables[0] if len(out_tables) == 1
                else pa.concat_tables(out_tables))

    def _fixed_python(self, batch: pa.Table) -> pa.Table:
        """Per-row fallback for non-ascii rows in fixed mode (char
        slicing != byte slicing there)."""
        fids, poss, segs, hashes = [], [], [], []
        for fid, text in zip(batch["file_id"].to_pylist(),
                             batch["content"].to_pylist()):
            for pos, seg in enumerate(
                    _fixed_segments(text, self.cfg.segment_size),
                    start=1):
                fids.append(fid)
                poss.append(pos)
                segs.append(seg)
                hashes.append(self.digest(seg.encode("utf-8")))
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
