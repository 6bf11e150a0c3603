"""Stream-stream joins with watermark-bounded state.

The streaming twin of ``operators/rangejoin.py::lookback_join``: join a
purchase (anchor) stream to the same user's click/event stream within a
look-back interval, as events arrive. Structured Streaming keeps both
sides' unmatched rows in state; the watermark plus the event-time range
condition lets it EVICT state older than ``watermark + window`` — without
both constraints the state store grows without bound, which is the classic
stream-join production failure.

At scale: state is hash-partitioned by the join key (user_id — high
cardinality, even distribution), each micro-batch shuffles only its new
rows, and RocksDB-backed state stores handle key counts far beyond heap.

The batch/stream parity test (tests/test_sources_streaming.py) drains this
join with an availableNow trigger and asserts it matches the batch
``lookback_join`` row-for-row — same semantics, two execution modes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribution_join_stream(
    events: DataFrame,
    anchors: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "user_id",
    anchor_id_col: str = "event_id",
    window_seconds: int = 1800,
    watermark: str = "2 hours",
) -> DataFrame:
    """(anchor_id, anchor_ts, user_id, event_id, ts, value) pairs — every
    event in ``[anchor_ts - window, anchor_ts)`` for the same user, both
    sides streaming.

    The range condition on two watermarked event-time columns is what makes
    the state bounded: Spark derives the eviction horizon from
    ``watermark + window_seconds``.
    """
    e = events.withWatermark(ts_col, watermark)
    a = (
        anchors.withWatermark(ts_col, watermark)
        .select(
            F.col(key_col).alias("__akey"),
            F.col(anchor_id_col).alias("anchor_id"),
            F.col(ts_col).alias("anchor_ts"),
        )
    )
    cond = (
        (F.col("__akey") == F.col(key_col))
        & (F.col(ts_col) >= F.col("anchor_ts") - F.expr(f"INTERVAL {window_seconds} SECONDS"))
        & (F.col(ts_col) < F.col("anchor_ts"))
    )
    return a.join(e, cond).drop("__akey")
