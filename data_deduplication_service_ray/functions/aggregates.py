"""Custom distributed aggregations (ray.data.aggregate.AggregateFnV2).

These run inside Ray's hash-aggregate operator: per-block partials, merged
combiner-style, finalized once per group — the same partial-then-merge
discipline the reference uses with its per-file temp-table GROUP BY before
the global upsert (lib/dbManager.cpp:263-281).
"""

from __future__ import annotations

import numpy as np
from ray.data.aggregate import AggregateFnV2
from ray.data.block import BlockAccessor


class OrderedConcat(AggregateFnV2):
    """Ordered string reassembly: concat ``seg_col`` by ascending ``pos_col``.

    The Ray-native form of the reference's reconstruction
    ``ORDER BY segment_num`` + streamed concat (lib/dbManager.cpp:171-194).
    Accumulator = list of (pos, segment) pairs; finalize sorts once. Rows
    of one group may arrive from many blocks in any order — order is
    restored at finalize, never assumed from block order (SURVEY.md §7.4).
    """

    def __init__(self, pos_col: str = "pos", seg_col: str = "segment",
                 alias_name: str = "content"):
        self._pos, self._seg = pos_col, seg_col
        # accumulator = {"pos": [...], "seg": [...]} — a struct of lists,
        # which Arrow serializes natively when partials shuffle between
        # the partial and final aggregation stages.
        super().__init__(alias_name,
                         zero_factory=lambda: {"pos": [], "seg": []},
                         on=None, ignore_nulls=True)

    def aggregate_block(self, block):
        t = BlockAccessor.for_block(block).to_arrow()
        return {"pos": t[self._pos].to_pylist(),
                "seg": t[self._seg].to_pylist()}

    def combine(self, a, b):
        return {"pos": list(a["pos"]) + list(b["pos"]),
                "seg": list(a["seg"]) + list(b["seg"])}

    def finalize(self, acc):
        order = sorted(range(len(acc["pos"])), key=acc["pos"].__getitem__)
        return "".join(acc["seg"][i] for i in order)


class CollectList(AggregateFnV2):
    """Collect a column's values per group into a list (unordered)."""

    def __init__(self, on: str, alias_name: str | None = None):
        super().__init__(alias_name or f"collect({on})",
                         zero_factory=lambda: [], on=on, ignore_nulls=True)

    def aggregate_block(self, block):
        t = BlockAccessor.for_block(block).to_arrow()
        return t[self._target_col_name].to_pylist()

    def combine(self, a, b):
        return a + b

    def finalize(self, acc):
        return acc


class UniqueCount(AggregateFnV2):
    """Exact distinct count per group via set union of partials.

    Memory is O(distinct values per group); for heavy-cardinality groups
    switch to a sketch (HLL) — the store/report paths here have bounded
    per-file distinct counts (segments of one file).
    """

    def __init__(self, on: str, alias_name: str | None = None):
        super().__init__(alias_name or f"nunique({on})",
                         zero_factory=lambda: [], on=on,
                         ignore_nulls=True)

    def aggregate_block(self, block):
        t = BlockAccessor.for_block(block).to_arrow()
        return sorted(set(t[self._target_col_name].to_pylist()))

    def combine(self, a, b):
        return sorted(set(a) | set(b))

    def finalize(self, acc):
        return len(acc)


class MinBy(AggregateFnV2):
    """argmin: value of ``val_col`` at the minimum of ``key_col``."""

    def __init__(self, key_col: str, val_col: str, alias_name: str):
        self._key, self._val = key_col, val_col
        super().__init__(alias_name, zero_factory=lambda: {"k": None,
                                                           "v": None},
                         on=None, ignore_nulls=True)

    def aggregate_block(self, block):
        t = BlockAccessor.for_block(block).to_arrow()
        keys = t[self._key].to_numpy(zero_copy_only=False)
        if len(keys) == 0:
            return {"k": None, "v": None}
        i = int(np.argmin(keys))
        return {"k": keys[i].item() if hasattr(keys[i], "item")
                else keys[i], "v": t[self._val][i].as_py()}

    def combine(self, a, b):
        if a["k"] is None:
            return b
        if b["k"] is None:
            return a
        return a if a["k"] <= b["k"] else b

    def finalize(self, acc):
        return acc["v"]
