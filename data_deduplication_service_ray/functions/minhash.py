"""Vectorized MinHash / SimHash / Jaccard kernels (pure numpy, no Ray).

The north_star generalizes the reference's per-segment digest loop
(lib/dbManager.cpp:206-234) into sketch signatures: MinHash(128) for
Jaccard estimation, SimHash-64 for Hamming-distance scoring. Kernels are
pure functions of (shingle hashes, seed) so that two runs — and the
N-vs-4N scaling runs — produce bit-identical signatures (the reference's
digest determinism, include/HashUtils.h:48-69, carried over).

MinHash permutation family: h_i(x) = splitmix64(x XOR seed_i). splitmix64
is a bijective 64-bit finalizer, so each seed induces a permutation of the
2^64 key space; taking min over a shingle set yields the classic
permutation-min sketch (Broder 1997) without the modular-arithmetic
overflow pitfalls of (a*x+b) mod p in uint64.
"""

from __future__ import annotations

import numpy as np

from data_deduplication_service_ray.functions.hashing import (
    combine_rows_u64, splitmix64)

U64 = np.uint64
_SIMHASH_SEED = U64(0x51A4A54D_C0FFEE01)

# Chunk bound for the (num_perms x n_shingles) intermediate: 128 perms x
# 8192 shingles x 8 B = 8 MiB per chunk, independent of document size.
_CHUNK = 8192


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
        h = splitmix64(chunk[None, :] ^ col)        # (num_perms, chunk)
        np.minimum(sig, h.min(axis=1), out=sig)
    return sig


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
    """
    if len(shingles) == 0:
        return U64(0)
    counts = np.zeros(64, dtype=np.int64)
    n = 0
    for off in range(0, len(shingles), _CHUNK):
        mixed = splitmix64(shingles[off:off + _CHUNK] ^ _SIMHASH_SEED)
        bits = (mixed[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
        counts += (bits & U64(1)).astype(np.int64).sum(axis=0)
        n += len(mixed)
    maj = (counts * 2 >= n).astype(np.uint64)
    return U64((maj << np.arange(64, dtype=np.uint64)).sum())


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
    """Exact Jaccard of two *unique-valued* uint64 arrays."""
    if len(set_a) == 0 and len(set_b) == 0:
        return 1.0
    inter = len(np.intersect1d(set_a, set_b, assume_unique=True))
    union = len(set_a) + len(set_b) - inter
    return inter / union if union else 1.0


def lsh_candidate_probability(jaccard: float, bands: int,
                              rows: int) -> float:
    """P(pair becomes an LSH candidate) = 1 - (1 - J^r)^b — used by tests
    to assert the configured (b, r) meets the recall target at the
    verification threshold."""
    return 1.0 - (1.0 - jaccard ** rows) ** bands
