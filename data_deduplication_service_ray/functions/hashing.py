"""Vectorized, deterministic hashing kernels.

The reference hashes every segment client-side with an OpenSSL digest
(lib/dbManager.cpp:212-233, include/HashUtils.h:86-100). Here the
cryptographic digests stay (hashlib, per-segment), while the *near-dup* path
uses cheap 64-bit rolling hashes computed with numpy so a whole batch of
documents is shingled without a per-shingle Python call.

All constants are fixed (not config-dependent) so that two runs — and the
N-vs-4N scaling runs — produce bit-identical hashes (SURVEY.md §7.4
determinism requirement).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np

U64 = np.uint64
_MASK64 = U64(0xFFFFFFFFFFFFFFFF)

# splitmix64 finalizer constants (public domain, Vigna 2015).
_SM_GAMMA = U64(0x9E3779B97F4A7C15)
_SM_C1 = U64(0xBF58476D1CE4E5B9)
_SM_C2 = U64(0x94D049BB133111EB)

# Odd multipliers for positional k-gram combination, derived once from a
# fixed-seed PRNG (seed 0xD5ED0 "dedup"); independent of PipelineConfig.seed.
_KGRAM_MULT = (np.random.default_rng(0xD5ED0).integers(
    1, 1 << 63, size=64, dtype=np.uint64) << U64(1)) | U64(1)


_SM_S30, _SM_S27, _SM_S31 = U64(30), U64(27), U64(31)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer: uniform 64-bit mixing.

    Callers pass uint64 (wrap-around is the native semantics, no mask
    needed). Two buffers total via out= ops — the expression form
    allocated ~10 temporaries per call, and at 32 concurrent workers
    that allocation traffic contends on the shared memory bus (the
    signature stage is bandwidth-bound at high CPU counts)."""
    z = x + _SM_GAMMA                       # uint64 wraps
    t = np.right_shift(z, _SM_S30)
    np.bitwise_xor(z, t, out=z)
    np.multiply(z, _SM_C1, out=z)
    np.right_shift(z, _SM_S27, out=t)
    np.bitwise_xor(z, t, out=z)
    np.multiply(z, _SM_C2, out=z)
    np.right_shift(z, _SM_S31, out=t)
    np.bitwise_xor(z, t, out=z)
    return z


def kgram_hashes(data: bytes, k: int) -> np.ndarray:
    """All overlapping k-gram 64-bit hashes of ``data`` (uint64 array).

    A document shorter than ``k`` yields a single hash of the whole content
    (mirrors the reference's keep-the-partial-tail segmentation semantics,
    lib/dbManager.cpp:224-234, applied to shingling). Empty input yields an
    empty array (callers filter empty docs first — the reference's
    empty-file guard, include/FileService.h:372-377).
    """
    b = np.frombuffer(data, dtype=np.uint8)
    n = b.shape[0]
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if n < k:
        acc = np.zeros(1, dtype=np.uint64)
        for j in range(n):
            acc = (acc * _KGRAM_MULT[j % 64] + U64(b[j])) & _MASK64
        return splitmix64(acc)
    m = n - k + 1
    acc = np.zeros(m, dtype=np.uint64)
    b64 = b.astype(np.uint64)
    for j in range(k):
        # in-place horner round (uint64 wraps; the expression form
        # allocated 3 temporaries per round)
        np.multiply(acc, _KGRAM_MULT[j % 64], out=acc)
        np.add(acc, b64[j:j + m], out=acc)
    return splitmix64(acc)


def char_kgram_hashes(text: str, k: int) -> np.ndarray:
    """All overlapping CHARACTER k-gram 64-bit hashes of ``text``.

    Character (code-point) semantics, not bytes: the utf-32-LE encoding
    is exactly one uint32 word per code point, so this Horner walk hashes
    the same grams ANSI SQL's ``substring(text, i, k)`` slices — the
    parity requirement of the ``jaccard_edges``/``jaccard_clusters``
    oracles (``kgram_hashes`` above is byte-based and diverges from SQL
    on non-ASCII content). Same partial-tail rule as the byte variant:
    fewer than ``k`` chars yields one hash of the whole text; empty
    yields empty. Equal grams always hash equal; distinct grams collide
    with ~2^-64 per pair (callers that need exactness re-verify on the
    gram strings — see stages/jaccard.py's margin rationale)."""
    cp = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
    n = cp.shape[0]
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    m = max(n - k + 1, 1)
    kk = min(k, n)
    acc = np.zeros(m, dtype=np.uint64)
    c64 = cp.astype(np.uint64)
    for j in range(kk):
        np.multiply(acc, _KGRAM_MULT[j % 64], out=acc)
        np.add(acc, c64[j:j + m], out=acc)
    return splitmix64(acc)


#: token pattern for token-mode shingling: identifiers/numbers plus
#: single punctuation marks — whitespace (indentation, line breaks) never
#: reaches a shingle, the property char k-grams lack on source code.
_TOKEN_RE = re.compile(rb"\w+|[^\w\s]")

#: per-process token -> 64-bit-hash memo (source code repeats a small
#: vocabulary massively; bounded, cleared wholesale when full)
_TOKEN_HASH_MEMO: dict[bytes, int] = {}
_TOKEN_MEMO_MAX = 1 << 20


def _token_hash(tok: bytes) -> int:
    h = _TOKEN_HASH_MEMO.get(tok)
    if h is None:
        if len(_TOKEN_HASH_MEMO) >= _TOKEN_MEMO_MAX:
            _TOKEN_HASH_MEMO.clear()
        h = int.from_bytes(
            hashlib.blake2b(tok, digest_size=8).digest(), "big")
        _TOKEN_HASH_MEMO[tok] = h
    return h


def token_kgram_hashes(data: bytes, k: int) -> np.ndarray:
    """All overlapping k-token-gram 64-bit hashes of ``data``.

    The token shingle mode for source-code dedup (the reference's
    segmentation mode is a first-class free parameter,
    test/bencmark.cpp:18-19; token k-grams are the standard choice for
    code near-dup): re-indented / re-flowed code keeps an identical
    token stream, hence an identical shingle set. Fewer than ``k``
    tokens yields one shingle of the whole stream (partial-tail
    semantics as in ``kgram_hashes``); no tokens yields empty.
    """
    toks = _TOKEN_RE.findall(data)
    n = len(toks)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    th = np.fromiter((_token_hash(t) for t in toks),
                     dtype=np.uint64, count=n)
    m = max(n - k + 1, 1)
    kk = min(k, n)
    acc = np.zeros(m, dtype=np.uint64)
    for j in range(kk):
        acc = (acc * _KGRAM_MULT[j % 64] + th[j:j + m]) & _MASK64
    return splitmix64(acc)


def combine_rows_u64(mat: np.ndarray) -> np.ndarray:
    """Combine each row of a (n, r) uint64 matrix into one uint64 hash.

    Used for LSH band keys: r signature slots -> one bucket key.
    """
    acc = np.zeros(mat.shape[0], dtype=np.uint64)
    for j in range(mat.shape[1]):
        acc = (acc * _KGRAM_MULT[j % 64] + mat[:, j]) & _MASK64
    return splitmix64(acc)


def stable_id64(*parts: str) -> int:
    """Deterministic signed-int64 id from string parts (length-prefixed).

    Replaces the reference's Postgres ``serial`` file_id
    (lib/dbManager.cpp:572-581) with a coordination-free content-derived id
    so id assignment needs no global counter on a cluster. Each part is
    length-prefixed (4-byte big-endian) before hashing, which makes the
    encoding injective for ANY part content — a plain separator join is
    not when a part may contain the separator (hypothesis found
    ``('', '\\x00')`` vs ``('\\x00', '')`` colliding under NUL-join).
    Collision probability ~ n^2 / 2^63 — negligible below ~10^8 rows per
    namespace; at larger scale widen to 128 bits.
    """
    h = hashlib.blake2b(digest_size=8)
    for p in parts:
        b = p.encode("utf-8")
        h.update(len(b).to_bytes(4, "big"))
        h.update(b)
    v = int.from_bytes(h.digest(), "big")
    return v - (1 << 64) if v >= (1 << 63) else v


def sha256_hex(texts) -> list[str]:
    """Lowercase-hex sha256 per text (matches DuckDB's sha256())."""
    return [hashlib.sha256(t.encode("utf-8")).hexdigest() for t in texts]


def digest_hex(texts, hash_name: str) -> list[str]:
    """Hex digest per text for any HASH_REGISTRY entry."""
    from data_deduplication_service_ray.config import HASH_REGISTRY

    fn, _ = HASH_REGISTRY[hash_name]
    return [fn(t.encode("utf-8")).hex() for t in texts]
