"""As-of join (point-in-time join).

Reference semantics: M1.ipynb § 20 ``get_closest_dates`` — for each gameweek
deadline, pick the latest snapshot file strictly/inclusively before it. The
reference does a cross join on a constant key, filters, then keeps the group
max. That shape is O(L×R) pairs.

Spark-first design — the **union-merge** form:

    1. union left probe rows and right reference rows into one keyed stream,
    2. one shuffle: partition by join key, order by (ts, side),
    3. ``last(value, ignorenulls=True)`` over an unbounded-preceding window
       carries the most recent right-hand value onto each left row.

Cost is one shuffle + one sort of |L|+|R| rows — no pair blowup, no skew
amplification beyond the key distribution itself (AQE skew-join handles hot
keys). This is the plan you want at 100 TB; a range-join would rescan, and a
per-key join + row_number would shuffle the same data *and* materialize the
multiplied pairs first.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    right_value_cols: Sequence[str],
    allow_exact_matches: bool = True,
    direction: str = "backward",
    prefix: str = "asof_",
) -> DataFrame:
    """For each left row, attach the latest right row with the same key and
    ``right_ts <= left_ts`` (or ``<`` when ``allow_exact_matches=False``).
    ``direction="forward"`` flips the semantics: the *earliest* right row
    with ``right_ts >= left_ts`` (next-upcoming, not most-recent).

    Ties among right rows at the same timestamp resolve deterministically
    (max of the ``right_value_cols`` tuple for backward, min for forward).

    Returns all left columns plus ``{prefix}{col}`` for each right value
    column (null when no right row qualifies).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    # forward = backward over reversed time: negate the ordering key (and
    # flip the tie-break) — the union-merge machinery is shared
    if direction == "forward":
        ts_key = lambda c: -F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    else:
        ts_key = F.col
    left_cols = left.columns
    rv = F.struct(*[F.col(c) for c in right_value_cols]).alias("__rv")
    right_side_order = 0 if allow_exact_matches else 2
    r = right.select(
        F.col(right_on).alias("__key"),
        ts_key(right_ts).alias("__t"),
        F.lit(right_side_order).alias("__side"),
        rv,
    ).filter(F.col("__t").isNotNull())
    rv_type = r.schema["__rv"].dataType.simpleString()
    l = left.select(  # noqa: E741
        F.col(left_on).alias("__key"),
        ts_key(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(rv_type).alias("__rv"),
        F.struct(*[F.col(c) for c in left_cols]).alias("__lrow"),
    )
    r = r.withColumn("__lrow", F.lit(None).cast(l.schema["__lrow"].dataType.simpleString()))
    merged = r.unionByName(l)
    # right rows sort before (exact-inclusive) or after (strict) left rows at
    # equal timestamps; among right ties the struct order makes `last` the
    # max (backward) / min (forward, via reversed struct order)
    rv_order = F.col("__rv").asc_nulls_first() if direction == "backward" else F.col("__rv").desc_nulls_first()
    w = (
        W.partitionBy("__key")
        .orderBy(F.col("__t").asc_nulls_first(), F.col("__side").asc(), rv_order)
        .rowsBetween(W.unboundedPreceding, 0)
    )
    carried = merged.withColumn("__carry", F.last("__rv", ignorenulls=True).over(w))
    out = carried.filter(F.col("__side") == 1).select(
        *[F.col(f"__lrow.{c}").alias(c) for c in left_cols],
        *[F.col(f"__carry.{c}").alias(f"{prefix}{c}") for c in right_value_cols],
    )
    return out
