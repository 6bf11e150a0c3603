"""Streaming deduplication — the ingest-time twin of the batch dedup family.

A production corpus pipeline dedups twice: once at ingest (drop replayed /
double-delivered records before they ever land) and once at corpus scale
(operators/dedup.py). This module is the ingest half, built on Spark's
watermark-bounded streaming state:

- :func:`dedup_stream` — drop re-deliveries of the same key within the
  watermark horizon (``dropDuplicatesWithinWatermark``): state holds one
  entry per key seen inside the horizon and is evicted as the watermark
  advances, so memory is bounded by arrival rate x horizon, not by history.
- :func:`content_dedup_stream` — same machinery keyed on the normalized
  content hash (the q40 exact-dedup key), for sources that re-deliver the
  same document under fresh ids.

Both run identically under ``availableNow`` backfill and continuous
micro-batch; batch/stream parity is asserted in
tests/test_sources_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import normalize_text


def dedup_stream(
    df: DataFrame,
    keys: list[str],
    *,
    ts: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exactly-once-per-key delivery within the watermark horizon.

    State: one row per distinct key currently inside the horizon, evicted
    by watermark advance — the bounded-state form of ``dropDuplicates``
    (whose streaming state otherwise grows forever).
    """
    return df.withWatermark(ts, watermark).dropDuplicatesWithinWatermark(keys)


def content_dedup_stream(
    docs: DataFrame,
    text_col: str,
    *,
    ts: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Ingest-time exact content dedup: key = md5 of normalized text (the
    same canonical key batch ``exact_dedup``/q40 uses, so ingest and
    corpus-scale dedup agree on what "identical" means)."""
    keyed = docs.withColumn("__content_key", F.md5(normalize_text(F.col(text_col))))
    return (
        keyed.withWatermark(ts, watermark)
        .dropDuplicatesWithinWatermark(["__content_key"])
        .drop("__content_key")
    )
