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

from data_deduplication_service_ray.config import gate
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


#: Stitch partial sessions on the driver below this count. Partial
#: sessions ≈ true sessions + one potential split per block boundary, so
#: the stitch input is session-sized, not event-sized.
SESSION_STITCH_LIMIT = gate(5_000_000, "session_stitch_limit")


def sessionize_sorted(events: ray.data.Dataset, gap_minutes: int = 30
                      ) -> ray.data.Dataset:
    """Scale-path sessionization: ONE global sort by (user_id, ts,
    event_id), a vectorized per-block scan, then a session-level stitch.

    The per-user ``map_groups`` variant (``sessionize``) pays Python per
    group — fine at realistic user cardinality, hopeless at 10^8 users.
    Here the only per-event work is the range-partitioned sort plus one
    numpy scan per sorted block. Exactness: a user's events may span
    adjacent sorted blocks, so block-local sessions are exact EXCEPT
    that a session can be split at a block boundary; merging is the same
    gap rule applied to the (far smaller) partial-session list ordered
    by (user, start_ts) — sessionization is associative under
    concatenation of ordered runs. The stitch runs on the driver below
    ``SESSION_STITCH_LIMIT`` partial sessions; past it, fall back to
    ``sessionize`` (or recurse block-wise).

    Output schema and values are identical to ``sessionize`` — both are
    checked against the same DuckDB oracle.
    """
    gap_us = float(gap_minutes * 60 * 1_000_000)
    slim = events.select_columns(["user_id", "ts", "event_id"])
    sorted_ds = slim.sort(["user_id", "ts", "event_id"])

    def block_sessions(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "user_id": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "start_ts": pa.array([], batch.schema.field("ts").type),
                "end_ts": pa.array([], batch.schema.field("ts").type)})
        u = np.asarray(batch["user_id"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        ts = batch["ts"].to_numpy(zero_copy_only=False)  # datetime64[*]
        new = np.ones(len(u), dtype=bool)
        if len(u) > 1:
            gaps = np.diff(ts) / np.timedelta64(1, "us")
            new[1:] = (u[1:] != u[:-1]) | (gaps > gap_us)
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(u)) - 1
        n = np.diff(np.append(starts, len(u)))
        return pa.table({
            "user_id": pa.array(u[starts]),
            "n_events": pa.array(n.astype(np.int64)),
            "start_ts": pa.array(ts[starts]),
            "end_ts": pa.array(ts[ends])})

    partials = sorted_ds.map_batches(block_sessions,
                                     batch_format="pyarrow",
                                     batch_size=None).materialize()
    if partials.count() > SESSION_STITCH_LIMIT:
        return sessionize(events, gap_minutes)

    tbl = pa.concat_tables(partials.iter_batches(batch_format="pyarrow",
                                                 batch_size=None))
    if tbl.num_rows == 0:
        return ray.data.from_arrow(tbl.append_column(
            "session_idx", pa.array([], pa.int64())))
    u = np.asarray(tbl["user_id"].to_numpy(zero_copy_only=False),
                   dtype=np.int64)
    st = tbl["start_ts"].to_numpy(zero_copy_only=False)
    en = tbl["end_ts"].to_numpy(zero_copy_only=False)
    n = np.asarray(tbl["n_events"].to_numpy(zero_copy_only=False),
                   dtype=np.int64)
    order = np.lexsort((st, u))
    u, st, en, n = u[order], st[order], en[order], n[order]
    new = np.ones(len(u), dtype=bool)
    if len(u) > 1:
        gaps = (st[1:] - en[:-1]) / np.timedelta64(1, "us")
        new[1:] = (u[1:] != u[:-1]) | (gaps > gap_us)
    starts = np.flatnonzero(new)
    ends = np.append(starts[1:], len(u)) - 1
    m_n = np.add.reduceat(n, starts)
    m_u = u[starts]
    # per-user 0-based session ordinal over the merged, start-ordered runs
    user_first = np.ones(len(m_u), dtype=bool)
    user_first[1:] = m_u[1:] != m_u[:-1]
    run_start = np.flatnonzero(user_first)
    idx = np.arange(len(m_u)) - np.repeat(run_start,
                                          np.diff(np.append(run_start,
                                                            len(m_u))))
    return ray.data.from_arrow(pa.table({
        "user_id": pa.array(m_u),
        "session_idx": pa.array(idx.astype(np.int64)),
        "n_events": pa.array(m_n.astype(np.int64)),
        "start_ts": pa.array(st[starts]),
        "end_ts": pa.array(en[ends])}))


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
