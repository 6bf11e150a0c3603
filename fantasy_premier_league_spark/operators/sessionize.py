"""Batch sessionization — gaps-and-islands session assignment.

The batch sibling of ``streaming/sessions.py`` (which uses
``F.session_window`` / ``applyInPandasWithState`` on a stream): identical
session semantics — a session closes after ``gap`` of inactivity — expressed
as two windows over the keyed, time-ordered history:

1. ``lag(ts)`` per key → flag rows that OPEN a new session (gap exceeded or
   first event),
2. running ``sum(flag)`` per key → dense session sequence number.

Scale: both windows partition on the session key (user_id — high
cardinality), so work distributes evenly at any scale; there is exactly ONE
shuffle (the two windows and the final per-session aggregate all share the
same partitioning, which Catalyst reuses). A single user's full history must
sort within one task — the same bound every keyed-window operator has; a
user whose timeline outgrows a task is the documented salting case
(operators/skew.py).

Timestamps compare in integer microseconds (``unix_micros``) so gap
arithmetic is exact and engine-portable (DuckDB: ``epoch_us``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Assign a dense per-key ``session_seq`` (1-based) to every row.

    Rows belong to the same session while consecutive gaps are
    <= ``gap_seconds``; ordering ties break on ``tiebreak_col`` so the
    assignment is deterministic under duplicate timestamps.
    """
    # .cast("timestamp") tolerates TIMESTAMP_NTZ inputs (unix_micros rejects
    # them); under a UTC session the cast is epoch-exact either way
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    order = W.partitionBy(key_col).orderBy(us, F.col(tiebreak_col))
    gap_us = F.lit(int(gap_seconds) * 1_000_000)
    opens = (
        F.when(F.lag(us).over(order).isNull(), 1)
        .when(us - F.lag(us).over(order) > gap_us, 1)
        .otherwise(0)
    )
    running = order.rowsBetween(W.unboundedPreceding, W.currentRow)
    return df.withColumn("session_seq", F.sum(opens).over(running).cast("int"))


def session_stats(
    df: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    value_col: str | None = "value",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Per-session aggregates: (key, session_seq, n_events, session_start,
    session_end, total_value). One shuffle total — the groupBy reuses the
    sessionize partitioning."""
    s = sessionize(
        df, key_col=key_col, ts_col=ts_col, tiebreak_col=tiebreak_col, gap_seconds=gap_seconds
    )
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
    ]
    if value_col is not None:
        aggs.append(F.round(F.sum(value_col), 2).alias("total_value"))
    return s.groupBy(key_col, "session_seq").agg(*aggs)
