"""Text-analysis operators: token counts, quality scoring, language ID,
winnowing fingerprints.

Large-scale training-data pipeline stages over the ``documents``-shaped
corpus. Every counting kernel is an RE2 regex evaluated by
``pyarrow.compute.count_substring_regex`` (vectorized C++, zero-copy
Arrow) — DuckDB's ``regexp_extract_all`` uses RE2 too, so the oracle SQL
in ``api.py`` reproduces identical integer counts, and every derived
double uses one identical arithmetic expression on both sides.

Fingerprints implement robust winnowing (Schleimer, Wilkerson, Aiken,
SIGMOD 2003): the rightmost-minimal k-gram hash of each sliding window —
the standard document-fingerprinting scheme for large-scale code/text
similarity; not SQL-expressible (rows-only driver check + unit tests).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from data_deduplication_service_ray.config import PipelineConfig
from data_deduplication_service_ray.functions.hashing import kgram_hashes

# Fixed probe vocabularies — part of the operator contract (mirrored
# verbatim in the oracle SQL). ASCII word-boundary regexes, RE2 syntax.
STOPWORDS_EN = ("the", "and", "of", "to", "in", "is", "for", "with", "on",
                "as", "by", "at", "from", "that", "this", "it", "are", "be",
                "or", "an")
_PROFILES = {
    "en": STOPWORDS_EN,
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein",
           "eine", "zu", "den", "von", "auf", "im"),
    "fr": ("le", "la", "les", "et", "est", "une", "des", "dans", "pour",
           "que", "qui", "au", "avec", "sur"),
    "es": ("el", "la", "los", "las", "es", "una", "del", "para", "por",
           "con", "como", "sus", "este", "esta"),
}
_LANG_ORDER = ("en", "de", "fr", "es")  # deterministic argmax tie-break

RE_WS_TOKEN = r"\S+"
RE_BPE_TOKEN = r"\w+|[^\w\s]"       # word runs + single non-space symbols
RE_PUNCT = r"[[:punct:]]"
RE_ALPHA = r"[A-Za-z]"
RE_NEWLINE = r"\n"


def _word_alt_regex(words: tuple[str, ...]) -> str:
    return r"\b(" + "|".join(words) + r")\b"


def _count(col: pa.ChunkedArray | pa.Array, pattern: str) -> np.ndarray:
    return np.asarray(
        pc.count_substring_regex(col, pattern=pattern).to_numpy(
            zero_copy_only=False), dtype=np.int64)


def _ratio(num: np.ndarray, den: np.ndarray) -> np.ndarray:
    """num/den as float64, 0.0 where den == 0 (mirrors the oracle CASE)."""
    return np.where(den == 0, 0.0,
                    num.astype(np.float64)
                    / np.where(den == 0, 1, den).astype(np.float64))


def text_stats_batch(batch: pa.Table,
                     content_col: str = "content") -> pa.Table:
    """Append token/line/punct counts + quality score to a batch."""
    col = batch[content_col]
    n_chars = np.asarray(pc.utf8_length(col).to_numpy(
        zero_copy_only=False), dtype=np.int64)
    n_lines = _count(col, RE_NEWLINE) + 1
    n_tok_ws = _count(col, RE_WS_TOKEN)
    n_tok_bpe = _count(col, RE_BPE_TOKEN)
    n_punct = _count(col, RE_PUNCT)
    n_alpha = _count(col, RE_ALPHA)
    n_stop = _count(col, _word_alt_regex(STOPWORDS_EN))

    stop_ratio = _ratio(n_stop, n_tok_ws)
    punct_ratio = _ratio(n_punct, n_chars)
    alpha_ratio = _ratio(n_alpha, n_chars)
    # quality: mean of 4 unit-range factors; expression mirrored in SQL
    tok_f = np.minimum(n_tok_ws.astype(np.float64) / 256.0, 1.0)
    punct_f = 1.0 - np.minimum(punct_ratio * 5.0, 1.0)
    quality = (tok_f + stop_ratio + punct_f + alpha_ratio) / 4.0

    out = batch
    for name, arr in [
            ("n_chars", pa.array(n_chars)), ("n_lines", pa.array(n_lines)),
            ("n_tokens_ws", pa.array(n_tok_ws)),
            ("n_tokens_bpe", pa.array(n_tok_bpe)),
            ("n_punct", pa.array(n_punct)),
            ("n_stopwords", pa.array(n_stop)),
            ("stopword_ratio", pa.array(stop_ratio)),
            ("punct_ratio", pa.array(punct_ratio)),
            ("alpha_ratio", pa.array(alpha_ratio)),
            ("quality", pa.array(quality))]:
        out = out.append_column(name, arr)
    return out


def text_stats(docs: ray.data.Dataset,
               content_col: str = "content") -> ray.data.Dataset:
    return docs.map_batches(
        lambda b: text_stats_batch(b, content_col), batch_format="pyarrow")


def lang_id_batch(batch: pa.Table,
                  content_col: str = "content") -> pa.Table:
    """Append stopword-profile language ID (+ per-language hit counts)."""
    col = batch[content_col]
    hits = {lang: _count(col, _word_alt_regex(words))
            for lang, words in _PROFILES.items()}
    n_tok = _count(col, RE_WS_TOKEN)
    # first maximal language in fixed order == the oracle's CASE chain
    best = np.full(batch.num_rows, _LANG_ORDER[0], dtype=object)
    best_hits = hits[_LANG_ORDER[0]].copy()
    for lang in _LANG_ORDER[1:]:
        better = hits[lang] > best_hits
        best[better] = lang
        best_hits = np.maximum(best_hits, hits[lang])
    confidence = _ratio(best_hits, n_tok)

    out = batch
    for lang in _LANG_ORDER:
        out = out.append_column(f"hits_{lang}", pa.array(hits[lang]))
    out = out.append_column("lang_pred",
                            pa.array(best.tolist(), pa.string()))
    out = out.append_column("lang_confidence", pa.array(confidence))
    return out


def lang_id(docs: ray.data.Dataset,
            content_col: str = "content") -> ray.data.Dataset:
    return docs.map_batches(
        lambda b: lang_id_batch(b, content_col), batch_format="pyarrow")


def quality_filter(docs: ray.data.Dataset, min_quality: float = 0.3,
                   content_col: str = "content") -> ray.data.Dataset:
    """Keep documents whose quality score clears the threshold."""
    return (text_stats(docs, content_col)
            .filter(expr=f"quality >= {min_quality}"))


# ---------------------------------------------------------------------------
# winnowing fingerprints
# ---------------------------------------------------------------------------

def winnow(hashes: np.ndarray, window: int) -> np.ndarray:
    """Robust winnowing: rightmost minimal hash per sliding window,
    deduplicated by position. Returns selected hash values (uint64),
    in document order."""
    n = len(hashes)
    if n == 0:
        return hashes
    if n <= window:
        i = n - 1 - int(np.argmin(hashes[::-1]))
        return hashes[[i]]
    win = np.lib.stride_tricks.sliding_window_view(hashes, window)
    # rightmost argmin: argmin of reversed window, mapped back
    rev_arg = np.argmin(win[:, ::-1], axis=1)
    pos = np.arange(len(win)) + (window - 1 - rev_arg)
    keep = np.ones(len(pos), dtype=bool)
    keep[1:] = pos[1:] != pos[:-1]
    return hashes[pos[keep]]


class FingerprintStage:
    """Actor: winnowing fingerprints per document.

    Output: (file_id, fingerprints:list<int64>, n_fingerprints:int64).
    Window/k are config-pinned; two runs produce identical selections.
    """

    def __init__(self, cfg: PipelineConfig, window: int = 16):
        self.cfg = cfg
        self.window = window

    def __call__(self, batch: pa.Table) -> pa.Table:
        fids = batch["file_id"]
        prints: list[np.ndarray] = []
        for text in batch["content"].to_pylist():
            kg = kgram_hashes((text or "").encode("utf-8"),
                              self.cfg.shingle_k)
            prints.append(winnow(kg, self.window).view(np.int64))
        offsets = np.zeros(len(prints) + 1, dtype=np.int32)
        np.cumsum([len(p) for p in prints], out=offsets[1:])
        values = (np.concatenate(prints) if prints
                  else np.empty(0, dtype=np.int64))
        return pa.table({
            "file_id": fids,
            "fingerprints": pa.ListArray.from_arrays(
                pa.array(offsets), pa.array(values)),
            "n_fingerprints": pa.array(
                [len(p) for p in prints], pa.int64()),
        })


def fingerprints(docs: ray.data.Dataset, cfg: PipelineConfig,
                 window: int = 16) -> ray.data.Dataset:
    from data_deduplication_service_ray.stages.neardup import _pool_max

    return docs.map_batches(
        FingerprintStage, fn_constructor_args=(cfg, window),
        batch_format="pyarrow", batch_size=cfg.batch_size,
        concurrency=(1, _pool_max(cfg)))


#: SQL-parity fingerprint constants: polynomial char-code hash mod a
#: Mersenne prime — both sides (numpy and the DuckDB oracle) evaluate
#: the SAME congruence, so the winnowed selections match exactly.
#: Products stay < 2^62 in uint64 (acc < p ~ 2^31, base 31) and the SQL
#: side's unrolled sum stays < 2^63 in BIGINT.
_FP_PRIME = 2147483647
_FP_BASE = 31


def _poly_kgram_codes(text: str, k: int) -> np.ndarray:
    """Code-point k-gram polynomial hashes mod ``_FP_PRIME`` (uint64).

    Operates on Unicode CODE POINTS (not utf-8 bytes) because the
    DuckDB oracle's ``ord(substr(...))`` sees code points; a doc
    shorter than ``k`` yields one hash of the whole content (same
    partial-tail semantics as ``kgram_hashes``)."""
    cp = np.frombuffer(text.encode("utf-32-le"),
                       dtype=np.uint32).astype(np.uint64)
    n = len(cp)
    p = np.uint64(_FP_PRIME)
    base = np.uint64(_FP_BASE)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if n < k:
        acc = np.uint64(0)
        for c in cp:
            acc = (acc * base + c) % p
        return np.array([acc], dtype=np.uint64)
    m = n - k + 1
    acc = np.zeros(m, dtype=np.uint64)
    for j in range(k):
        np.multiply(acc, base, out=acc)
        np.add(acc, cp[j:j + m], out=acc)
        np.mod(acc, p, out=acc)
    return acc


def fingerprints_parity(docs: ray.data.Dataset, k: int = 8,
                        window: int = 16) -> ray.data.Dataset:
    """Winnowing fingerprints over the SQL-expressible polynomial hash:
    flat (file_id, fp_hash) rows, one per selected window position (the
    oracle-checked variant of ``fingerprints`` — same robust-winnowing
    selection rule, hash function swapped for one DuckDB can compute)."""

    def fp(batch: pa.Table) -> pa.Table:
        fids_out, vals_out = [], []
        for fid, text in zip(batch["file_id"].to_pylist(),
                             batch["content"].to_pylist()):
            if not text:
                continue
            sel = winnow(_poly_kgram_codes(text, k), window)
            if len(sel):
                fids_out.append(np.full(len(sel), fid, dtype=np.int64))
                vals_out.append(sel.astype(np.int64))
        if not fids_out:
            return pa.table({"file_id": pa.array([], pa.int64()),
                             "fp_hash": pa.array([], pa.int64())})
        return pa.table({
            "file_id": pa.array(np.concatenate(fids_out)),
            "fp_hash": pa.array(np.concatenate(vals_out))})

    return docs.map_batches(fp, batch_format="pyarrow")
