"""Event-stream operators: tumbling-window aggregates + sessionization.

The reference has NO streaming features (SURVEY.md §2.9) — these are the
training-data-pipeline additions for event-shaped tables
(event_id, ts, user_id, event_type, value, props).

Batch-on-stream semantics: windows are computed over the full dataset
(event-time, not arrival-time), so results are deterministic and
SQL-mirrorable. Monetary sums ride as integer cents until ONE final
division — distributed reduction order can never perturb the doubles
(the engine-wide float discipline; see api.py).

Sessionization is the canonical *stateful windowed* operator: per-user
event gaps > ``gap`` open a new session. Partitioning assumption: one
user's events fit one group (true at any realistic user cardinality —
groups are per-user, the corpus is sharded across users).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum


def _cents(col: pa.ChunkedArray) -> pa.ChunkedArray:
    """value DOUBLE -> integer cents (round-half-even, like DuckDB
    round())."""
    return pc.cast(pc.round(pc.multiply(col, pa.scalar(100.0))),
                   pa.int64())


def window_aggregate(events: ray.data.Dataset, unit: str = "day"
                     ) -> ray.data.Dataset:
    """Tumbling event-time windows per event_type:
    (window_start, event_type, n_events, sum_value)."""

    def bucket(batch: pa.Table) -> pa.Table:
        return pa.table({
            "window_start": pc.floor_temporal(batch["ts"], unit=unit),
            "event_type": batch["event_type"],
            "cents": _cents(batch["value"]),
        })

    agg = (events.map_batches(bucket, batch_format="pyarrow")
           .groupby(["window_start", "event_type"])
           .aggregate(Count(alias_name="n_events"),
                      Sum("cents", alias_name="sum_cents")))

    def finish(batch: pa.Table) -> pa.Table:
        sum_value = pc.divide(
            pc.cast(batch["sum_cents"], pa.float64()), pa.scalar(100.0))
        return (batch.drop_columns(["sum_cents"])
                .append_column("sum_value", sum_value))

    return agg.map_batches(finish, batch_format="pyarrow")


def sessionize(events: ray.data.Dataset, gap_minutes: int = 30
               ) -> ray.data.Dataset:
    """Gap-based sessions per user:
    (user_id, session_idx, n_events, start_ts, end_ts).

    session_idx is 0-based in (ts, event_id) order; a gap strictly
    greater than ``gap_minutes`` opens a new session.
    """
    gap_us = float(gap_minutes * 60 * 1_000_000)

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts", "event_id"], kind="mergesort")
        ts = df["ts"].to_numpy()  # datetime64 of WHATEVER resolution
        new_session = np.ones(len(df), dtype=np.int64)
        if len(df) > 1:
            # unit-safe gap: dividing timedelta64 by a 1-us timedelta64
            # yields float microseconds regardless of the column's native
            # resolution (int64-view comparison would silently follow the
            # pandas/pyarrow datetime unit — us vs ns is a 1000x trap)
            gaps_us = np.diff(ts) / np.timedelta64(1, "us")
            new_session[1:] = (gaps_us > gap_us).astype(np.int64)
        idx = np.cumsum(new_session) - 1
        out = df.assign(session_idx=idx)
        g = (out.groupby("session_idx", sort=True)
             .agg(n_events=("event_id", "size"),
                  start_ts=("ts", "min"), end_ts=("ts", "max"))
             .reset_index())
        g.insert(0, "user_id", df["user_id"].iloc[0])
        g["session_idx"] = g["session_idx"].astype("int64")
        g["n_events"] = g["n_events"].astype("int64")
        return g

    slim = events.select_columns(["user_id", "ts", "event_id"])
    return slim.groupby("user_id").map_groups(per_user,
                                              batch_format="pandas")


def event_type_rollup(events: ray.data.Dataset) -> ray.data.Dataset:
    """Per-type totals: (event_type, n_events, sum_value, min_ts, max_ts)."""

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": batch["event_type"],
            "cents": _cents(batch["value"]),
            "ts": batch["ts"],
        })

    agg = (events.map_batches(prep, batch_format="pyarrow")
           .groupby("event_type")
           .aggregate(Count(alias_name="n_events"),
                      Sum("cents", alias_name="sum_cents"),
                      Min("ts", alias_name="min_ts"),
                      Max("ts", alias_name="max_ts")))

    def finish(batch: pa.Table) -> pa.Table:
        sum_value = pc.divide(
            pc.cast(batch["sum_cents"], pa.float64()), pa.scalar(100.0))
        return (batch.drop_columns(["sum_cents"])
                .append_column("sum_value", sum_value))

    return agg.map_batches(finish, batch_format="pyarrow")
