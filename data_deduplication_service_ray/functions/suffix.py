"""Suffix-array construction + exact substring-containment detection.

North-star component: "a suffix-array pass for exact substring containment"
(BASELINE.json). Pure-python/numpy kernels; the distributed stage
(``stages.containment``) applies them per group (LSH bucket / cluster /
repo), keeping each suffix array memory-bounded by the group's text size
(SURVEY.md §7.4 "Suffix arrays").

Suffix array: prefix-doubling with numpy lexsort — O(n log² n) time,
O(n) extra memory, no recursion (safe for multi-MB groups).
"""

from __future__ import annotations

from bisect import bisect_left, bisect_right

import numpy as np

_SEP = "\x00"  # separator assumed absent from content; enforced below


def suffix_array(s: str) -> np.ndarray:
    """Suffix array of ``s`` (int64 positions, lexicographic order)."""
    n = len(s)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    rank = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32
                         ).astype(np.int64)
    sa = np.argsort(rank, kind="stable").astype(np.int64)
    tmp = np.empty(n, dtype=np.int64)
    k = 1
    while k < n:
        # sort by (rank[i], rank[i+k]) via lexsort (last key is primary)
        second = np.full(n, -1, dtype=np.int64)
        second[:n - k] = rank[k:]
        order = np.lexsort((second, rank))
        sa = order.astype(np.int64)
        # re-rank: equal (r1, r2) pairs share a rank
        r1 = rank[sa]
        r2 = second[sa]
        changed = np.ones(n, dtype=np.int64)
        changed[1:] = (r1[1:] != r1[:-1]) | (r2[1:] != r2[:-1])
        tmp[sa] = np.cumsum(changed) - 1
        rank, tmp = tmp, rank
        if rank[sa[-1]] == n - 1:
            break
        k <<= 1
    return sa


def _sa_range(s: str, sa: np.ndarray, query: str) -> tuple[int, int]:
    """[lo, hi) range of suffixes having ``query`` as a prefix."""
    keys = _SAKeyView(s, sa, len(query))
    lo = bisect_left(keys, query)
    hi = bisect_right(keys, query)
    return lo, hi


class _SAKeyView:
    """Lazy sequence view: sa index -> fixed-length suffix prefix."""

    __slots__ = ("s", "sa", "m")

    def __init__(self, s: str, sa: np.ndarray, m: int):
        self.s, self.sa, self.m = s, sa, m

    def __len__(self) -> int:
        return len(self.sa)

    def __getitem__(self, i: int) -> str:
        p = int(self.sa[i])
        return self.s[p:p + self.m]


def containment_pairs(ids: list[int], texts: list[str],
                      max_occurrences: int = 256
                      ) -> list[tuple[int, int]]:
    """All (inner_id, outer_id) pairs where texts[i] ⊆ texts[j], i≠j.

    One generalized suffix array over the NUL-joined group text; each
    document's full content is then located by binary search — every
    occurrence inside a *different* document is a containment. Matches
    cannot cross document boundaries because content never contains the
    separator (asserted; such rows fall back to pairwise scanning).

    ``max_occurrences`` caps, PER INNER DOCUMENT, the number of emitted
    pairs to the ``max_occurrences`` SMALLEST outer ids — the same
    bounded-blowup discipline as the LSH bucket cap (a short hot string
    inside thousands of group members would otherwise emit O(k) pairs
    per member), but as a deterministic, layout-independent rule: the
    previous truncation in suffix-array order depended on the group's
    concatenation order (run-order sensitive) and was not expressible
    in SQL; smallest-outer-ids is reproduced exactly by the oracle's
    ``row_number() OVER (PARTITION BY inner ORDER BY outer)`` (api.py
    ``containment_capped``). The SA occurrence scan itself stays
    uncapped — it is O(occurrences) integer work bounded by the group
    text size the SA already paid for; only pair EMISSION is capped.
    """
    clean_idx = [i for i, t in enumerate(texts) if _SEP not in t]
    dirty_idx = [i for i, t in enumerate(texts) if _SEP in t]
    outers_of: dict[int, set[int]] = {}

    if len(clean_idx) >= 2:
        ctexts = [texts[i] for i in clean_idx]
        cids = [ids[i] for i in clean_idx]
        concat = _SEP.join(ctexts)
        starts = np.zeros(len(ctexts), dtype=np.int64)
        for j in range(1, len(ctexts)):
            starts[j] = starts[j - 1] + len(ctexts[j - 1]) + 1
        sa = suffix_array(concat)
        for j, text in enumerate(ctexts):
            if not text:
                continue
            lo, hi = _sa_range(concat, sa, text)
            owners = np.searchsorted(starts, sa[lo:hi], side="right") - 1
            tgt = outers_of.setdefault(cids[j], set())
            # np.unique keeps the dedup vectorized: the occurrence scan
            # is unbounded now that the emission cap moved to
            # smallest-outer-ids, so a hot string's O(occurrences) work
            # must not run through a Python generator
            for o in np.unique(owners):
                if cids[o] != cids[j]:
                    tgt.add(cids[o])

    # rare fallback: rows whose content contains the separator char
    for i in dirty_idx:
        for j in range(len(texts)):
            if i == j:
                continue
            if texts[i] and texts[i] in texts[j]:
                outers_of.setdefault(ids[i], set()).add(ids[j])
            if texts[j] and texts[j] in texts[i]:
                outers_of.setdefault(ids[j], set()).add(ids[i])

    out: list[tuple[int, int]] = []
    for iid in outers_of:
        for oid in sorted(outers_of[iid])[:max_occurrences]:
            out.append((iid, oid))
    return sorted(out)
