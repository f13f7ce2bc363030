"""Vectorized MinHash / SimHash / Jaccard kernels (pure numpy, no Ray).

The north_star generalizes the reference's per-segment digest loop
(lib/dbManager.cpp:206-234) into sketch signatures: MinHash(128) for
Jaccard estimation, SimHash-64 for Hamming-distance scoring. Kernels are
pure functions of (shingle hashes, seed) so that two runs — and the
N-vs-4N scaling runs — produce bit-identical signatures (the reference's
digest determinism, include/HashUtils.h:48-69, carried over).

Two signature schemes, both producing a 128-slot minwise signature:

- **k-perm** (``minhash_signature``): h_i(x) = splitmix64(x XOR seed_i),
  the classic independent-permutation sketch (Broder 1997). Each seed
  induces a bijection of the 2^64 key space; slots are independent.
  O(num_perms · n) mixing work. (A cheaper multiply-only family
  h_i = a_i·mix(x) was tried and REJECTED: its slots share the argmin
  ordering of mix(x), the correlated slots fat-tail the Jaccard
  estimator, and the estimate prefilter collapsed — candidate survivors
  grew 13x.)
- **OPH** (``oph_signatures_batch``): One-Permutation Hashing (Li, Owen,
  Zhang, NIPS 2012) with rotation densification (Shrivastava & Li, ICML
  2014): ONE splitmix64 per shingle, shingles partitioned into
  num_perms bins by their top bits, slot = bin minimum, empty bins
  borrow cyclically from the right. Unbiased minwise estimator with
  ~J(1-J)/num_perms variance for documents ≫ num_perms shingles;
  O(n) work — ~20x less mixing than k-perm. The default for the
  signature stage (``PipelineConfig.minhash_scheme``).
"""

from __future__ import annotations

import numpy as np

from data_deduplication_service_ray.functions.hashing import (
    combine_rows_u64, splitmix64)

U64 = np.uint64
_SIMHASH_SEED = U64(0x51A4A54D_C0FFEE01)

# Chunk bound for per-shingle intermediates. 2048 keeps the simhash bit
# matrix (2048 x 64 uint8 = 128 KiB) and the k-perm chunk inside L2, so
# the per-doc memory traffic stays cache-resident — measured to matter at
# 32 concurrent workers sharing one memory bus (cpu-time inflation ~1.9x
# with larger chunks under full load).
_CHUNK = 2048


def perm_seeds(num_perms: int, seed: int) -> np.ndarray:
    """Deterministic per-permutation XOR seeds (uint64[num_perms])."""
    rng = np.random.default_rng(seed)
    return rng.integers(0, 1 << 63, size=num_perms, dtype=np.uint64)


def minhash_signature(shingles: np.ndarray, seeds: np.ndarray) -> np.ndarray:
    """MinHash signature: uint64[num_perms] of a uint64 shingle-hash set.

    Empty input returns all-max sentinel (documents with no shingles are
    filtered upstream by the empty-content guard,
    include/FileService.h:372-377).
    """
    num_perms = len(seeds)
    if len(shingles) == 0:
        return np.full(num_perms, np.iinfo(np.uint64).max, dtype=np.uint64)
    sig = np.full(num_perms, np.iinfo(np.uint64).max, dtype=np.uint64)
    col = seeds[:, None]
    for off in range(0, len(shingles), _CHUNK):
        chunk = shingles[off:off + _CHUNK]
        h = splitmix64(chunk[None, :] ^ col)      # (num_perms, chunk)
        np.minimum(sig, h.min(axis=1), out=sig)
    return sig


_OPH_SEED = U64(0x0F4A7C15_5851F42D)
_SENTINEL = np.iinfo(np.uint64).max


def oph_signatures_batch(shingle_sets: list[np.ndarray],
                         num_perms: int, seed: int) -> np.ndarray:
    """One-Permutation-Hashing signatures for a whole batch at once.

    All documents' shingles are concatenated; one splitmix64 pass mixes
    them (xor'd with a seed derived from ``seed``), bins come from the
    top log2(num_perms) bits, and a single scatter-min
    (``np.minimum.at``) fills every document's slots simultaneously.
    Empty bins are densified by cyclic borrow from the next non-empty
    bin to the right (rotation densification) — deterministic, so equal
    shingle sets always produce equal signatures. Documents with no
    shingles keep the all-max sentinel signature.
    """
    assert num_perms & (num_perms - 1) == 0, "num_perms must be 2^k"
    shift = U64(64 - int(num_perms).bit_length() + 1)
    n_docs = len(shingle_sets)
    flat = np.full(n_docs * num_perms, _SENTINEL, dtype=np.uint64)
    lens = np.array([len(s) for s in shingle_sets], dtype=np.int64)
    total = int(lens.sum())
    if total >= 384 * n_docs:
        # Long documents: the bin is the TOP bits of the mixed hash, so
        # sorting a document's mixed values groups them by bin with the
        # first element of each group being the bin minimum — a plain
        # np.sort + run-starts mask replaces the unbuffered
        # np.minimum.at scatter (~300 ns/elem, the whole stage's
        # bottleneck at profile); measured 6.6x faster, identical
        # output. Falls through to the shared densification pass.
        xseed = _OPH_SEED + U64(seed)
        for d in np.flatnonzero(lens):
            mixed = np.sort(splitmix64(shingle_sets[d] ^ xseed))
            bins = (mixed >> shift).astype(np.int64)
            mask = np.empty(len(bins), dtype=bool)
            mask[0] = True
            np.not_equal(bins[1:], bins[:-1], out=mask[1:])
            flat[d * num_perms + bins[mask]] = mixed[mask]
    elif total > 0:
        concat = np.concatenate(
            [s for s in shingle_sets if len(s)])
        # doc index per concat element: boundary-marks + cumsum is ~2x
        # faster than np.repeat for long documents (one C pass vs a
        # per-segment copy loop), but the np.add.at over n_docs boundary
        # positions dominates when documents are short — measured
        # crossover near 256 shingles/doc, so pick by batch shape.
        # Identical result either way (np.add.at handles coincident
        # boundaries from zero-length docs).
        if total >= 256 * n_docs:
            marks = np.zeros(total, dtype=np.int64)
            pos = np.cumsum(lens)[:-1]
            np.add.at(marks, pos[pos < total], 1)
            doc_idx = np.cumsum(marks)
        else:
            doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
        xseed = _OPH_SEED + U64(seed)
        # L2-sized chunks: the splitmix temporaries and the bin vector
        # for a full batch (tens of MB) would stream through main
        # memory — at 32 concurrent workers on one socket that bus
        # traffic is the contended resource. 64Ki shingles keeps every
        # intermediate ~0.5 MiB; results are identical (scatter-min is
        # order- and chunk-independent).
        step = 1 << 16
        for off in range(0, len(concat), step):
            mixed = splitmix64(concat[off:off + step] ^ xseed)
            bins = (doc_idx[off:off + step] * num_perms
                    + (mixed >> shift).astype(np.int64))
            np.minimum.at(flat, bins, mixed)
    sigs = flat.reshape(n_docs, num_perms)

    # densification: only rows with at least one empty-but-not-all-empty
    # bin need the (cheap) borrow pass
    empty = sigs == _SENTINEL
    n_empty = empty.sum(axis=1)
    for d in np.flatnonzero((n_empty > 0) & (n_empty < num_perms)):
        row = sigs[d]
        nonempty_idx = np.flatnonzero(row != _SENTINEL)
        holes = np.flatnonzero(row == _SENTINEL)
        pos = np.searchsorted(nonempty_idx, holes)
        row[holes] = row[nonempty_idx[pos % len(nonempty_idx)]]
    return sigs


def minhash_signatures_batch(shingle_sets: list[np.ndarray],
                             seeds: np.ndarray) -> np.ndarray:
    """Signatures for a batch of documents: uint64[n_docs, num_perms]."""
    out = np.empty((len(shingle_sets), len(seeds)), dtype=np.uint64)
    for i, sh in enumerate(shingle_sets):
        out[i] = minhash_signature(sh, seeds)
    return out


def simhash64(shingles: np.ndarray) -> np.uint64:
    """SimHash-64 fingerprint of a uint64 shingle-hash multiset.

    Bit b of the result is the majority vote of bit b across
    splitmix64-mixed shingle hashes (Charikar 2002, unweighted). Empty
    input returns 0.

    Bit extraction via ``np.unpackbits`` on the little-endian byte view
    (bitorder='little' => column j IS bit j) — one C pass instead of a
    64-wide shift broadcast; measured 3.2x faster at ~5 KB documents
    with bit-identical output.
    """
    if len(shingles) == 0:
        return U64(0)
    counts = np.zeros(64, dtype=np.int64)
    n = 0
    for off in range(0, len(shingles), _CHUNK):
        mixed = splitmix64(shingles[off:off + _CHUNK] ^ _SIMHASH_SEED)
        bits = np.unpackbits(mixed.view(np.uint8).reshape(-1, 8),
                             axis=1, bitorder="little")
        counts += bits.sum(axis=0, dtype=np.int64)
        n += len(mixed)
    maj = (counts * 2 >= n).astype(np.uint64)
    return U64((maj << np.arange(64, dtype=np.uint64)).sum())


#: bit-count LUT: row v = the 8 bits of byte value v, little-endian.
_BYTE_BITS = np.unpackbits(
    np.arange(256, dtype=np.uint8)[:, None], axis=1,
    bitorder="little").astype(np.int64)
_BYTE_POS_OFF = (np.arange(8, dtype=np.int64) * 256)[None, :]

#: per-process scratch for the per-doc simhash key matrix (workers run
#: one task at a time; grown to the largest document seen)
_SIMHASH_KEY_SCRATCH = np.empty((0, 8), dtype=np.int64)


def simhash64_batch(shingle_sets: list[np.ndarray]) -> np.ndarray:
    """SimHash-64 for a whole batch at once: uint64[n_docs].

    Bit-identical to per-document ``simhash64`` (same mix, same
    majority rule), chosen by batch shape:

    - long documents (mean ≥ 384 shingles): per-doc byte histogram —
      ``np.bincount`` over (byte-position, byte-value) keys, then an
      (8x256)@(256x8) LUT matmul recovers per-bit counts. ~28 ns per
      shingle, measured 7x faster than both the per-doc unpackbits loop
      and a segment-``reduceat`` variant (reduceat's scalar inner loop
      costs ~3 ns per *bit-matrix element*, i.e. ~200 ns/shingle).
    - short documents: one concatenated unpackbits + segment-reduceat
      pass, where per-doc Python dispatch (not per-shingle work) would
      dominate. Chunks bound the bit-matrix temporary; a document
      spanning chunks accumulates across them, so results don't depend
      on chunk size.

    Empty documents keep fingerprint 0.
    """
    n_docs = len(shingle_sets)
    out = np.zeros(n_docs, dtype=np.uint64)
    lens = np.array([len(s) for s in shingle_sets], dtype=np.int64)
    total = int(lens.sum())
    if total == 0:
        return out
    bitcols = np.arange(64, dtype=np.uint64)[None, :]
    if total >= 384 * n_docs:
        global _SIMHASH_KEY_SCRATCH
        nz = np.flatnonzero(lens)
        counts = np.empty((len(nz), 64), dtype=np.int64)
        for i, d in enumerate(nz):
            mixed = splitmix64(shingle_sets[d] ^ _SIMHASH_SEED)
            n = len(mixed)
            # reused per-process scratch: a fresh (n, 8) int64 key was
            # ~320 KB/doc — past glibc's mmap threshold, so every doc
            # paid mmap+page-zeroing, which serializes across workers
            if _SIMHASH_KEY_SCRATCH.shape[0] < n:
                _SIMHASH_KEY_SCRATCH = np.empty((n, 8), dtype=np.int64)
            key = _SIMHASH_KEY_SCRATCH[:n]
            key[:] = mixed.view(np.uint8).reshape(-1, 8)
            key += _BYTE_POS_OFF
            hist = np.bincount(key.ravel(), minlength=2048)
            counts[i] = (hist.reshape(8, 256) @ _BYTE_BITS).ravel()
        maj = (counts * 2 >= lens[nz, None]).astype(np.uint64)
        out[nz] = (maj << bitcols).sum(axis=1)
        return out
    concat = np.concatenate([s for s in shingle_sets if len(s)])
    nz = np.flatnonzero(lens)
    nzlens = lens[nz]
    bounds = np.concatenate(([0], np.cumsum(nzlens)))
    counts = np.zeros((len(nz), 64), dtype=np.int64)
    step = _CHUNK * 8  # bits-matrix temp = step x 64 int16 = 2 MiB
    for off in range(0, total, step):
        end = min(off + step, total)
        mixed = splitmix64(concat[off:end] ^ _SIMHASH_SEED)
        # int16: reduceat keeps the input dtype and a segment is at
        # most `step` rows (16384 < 2^15), so uint8 would overflow
        # but int16 cannot.
        bits = np.unpackbits(mixed.view(np.uint8).reshape(-1, 8),
                             axis=1, bitorder="little").astype(np.int16)
        lo = int(np.searchsorted(bounds, off, side="right")) - 1
        hi = int(np.searchsorted(bounds, end, side="left"))
        starts = np.maximum(bounds[lo:hi] - off, 0)
        counts[lo:hi] += np.add.reduceat(bits, starts, axis=0)
    maj = (counts * 2 >= nzlens[:, None]).astype(np.uint64)
    out[nz] = (maj << bitcols).sum(axis=1)
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Element-wise Hamming distance between two uint64 arrays."""
    x = np.bitwise_xor(a.astype(np.uint64), b.astype(np.uint64))
    # vectorized popcount via unpackbits on the byte view
    bytes_view = x.view(np.uint8).reshape(len(x), 8)
    return np.unpackbits(bytes_view, axis=1).sum(axis=1).astype(np.int64)


def band_hashes(sig: np.ndarray, bands: int) -> np.ndarray:
    """Collapse a uint64[num_perms] signature into uint64[bands] band keys.

    Row-combine then mix with the band index so identical row-values in
    different bands never collide into one bucket key.
    """
    rows = len(sig) // bands
    per_band = combine_rows_u64(sig.reshape(bands, rows))
    return splitmix64(per_band ^ np.arange(bands, dtype=np.uint64))


def band_hashes_batch(sigs: np.ndarray, bands: int) -> np.ndarray:
    """uint64[n_docs, num_perms] -> uint64[n_docs, bands]."""
    n, num_perms = sigs.shape
    rows = num_perms // bands
    resh = sigs.reshape(n * bands, rows)
    combined = combine_rows_u64(resh).reshape(n, bands)
    return splitmix64(combined ^ np.arange(bands, dtype=np.uint64)[None, :])


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    """MinHash Jaccard estimate: fraction of agreeing signature slots."""
    return float(np.mean(sig_a == sig_b))


def exact_jaccard(set_a: np.ndarray, set_b: np.ndarray) -> float:
    """Exact Jaccard of two *sorted unique-valued* uint64 arrays
    (``np.unique`` output). Intersection by binary search of the smaller
    set into the larger — O(m log n) with no concat+sort, ~3x faster
    than ``np.intersect1d`` at verifier sizes."""
    if len(set_a) == 0 and len(set_b) == 0:
        return 1.0
    if len(set_a) > len(set_b):
        set_a, set_b = set_b, set_a
    if len(set_a) == 0:
        return 0.0
    pos = np.searchsorted(set_b, set_a)
    pos[pos == len(set_b)] = len(set_b) - 1
    inter = int((set_b[pos] == set_a).sum())
    union = len(set_a) + len(set_b) - inter
    return inter / union if union else 1.0


def lsh_candidate_probability(jaccard: float, bands: int,
                              rows: int) -> float:
    """P(pair becomes an LSH candidate) = 1 - (1 - J^r)^b — used by tests
    to assert the configured (b, r) meets the recall target at the
    verification threshold."""
    return 1.0 - (1.0 - jaccard ** rows) ** bands
