"""Global ranking without a single-partition window (SURVEY §2.5 W4 note).

``row_number() over (order by ...)`` funnels every row through one task —
fine for the 20-row league table, fatal at 100 TB. The scalable two-phase
form, expressed entirely in DataFrame ops (no Python row round-trip):

1. range-partition sort on the rank keys (Spark's ``orderBy`` — each
   partition holds a contiguous key range),
2. per-partition row counts via ``spark_partition_id()`` + a tiny groupBy
   (map-side partial agg collapses each partition to ONE row),
3. cumulative offsets over that numPartitions-row frame (the only
   single-partition window runs over ~tens of rows, not the data),
4. rank = broadcast-joined partition offset + partition-local
   ``row_number()`` (no cross-partition shuffle: the window partitions by
   the physical partition id the sort already established).

The sorted frame feeds both the count branch and the rank branch of one
lazy plan; Spark's exchange reuse (``spark.sql.exchange.reuse``, default
on, honored under AQE) evaluates the expensive range shuffle once and
guarantees both branches see the same sampled range boundaries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_cumsum(df: DataFrame, order: list[Column], value: Column, *, out: str = "cumsum") -> DataFrame:
    """Running sum of ``value`` under a total order, without funnelling the
    data through one partition (the prefix-sum twin of :func:`global_rank`).

    Same two-phase shape: range sort on the order keys, per-partition
    totals collapsed map-side to one row each, cumulative offsets over the
    numPartitions-row frame (the only single-partition window — tens of
    rows), then partition-local running sum + broadcast offset. The value
    expression is summed as-is, so exact types (DECIMAL, integers) stay
    exact — callers needing bit-identical totals across engines should pass
    a decimal-cast column, as with any Spark sum.
    """
    sorted_df = (
        df.orderBy(*order)
        .withColumn("__pid", F.spark_partition_id())
        .withColumn("__v", value)
    )

    sizes = sorted_df.groupBy("__pid").agg(F.sum("__v").alias("__s"))
    cum = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = sizes.select("__pid", F.sum("__s").over(cum).alias("__off"))

    local = (
        Window.partitionBy("__pid").orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    )
    running = F.sum("__v").over(local)
    return (
        sorted_df.join(F.broadcast(offsets), "__pid")
        .withColumn(out, running + F.coalesce(F.col("__off"), F.lit(0)))
        .drop("__pid", "__off", "__v")
    )


def global_rank(df: DataFrame, order: list[Column], *, out: str = "rank", start: int = 1) -> DataFrame:
    """Dense global row numbering under a total order (ties must be broken
    by the caller's ``order`` — append a unique key for determinism).

    Pure-DataFrame two-phase rank: one range sort, zero Python, no
    driver-side collect. Plan contains no BatchEvalPython / PythonRDD
    node (asserted in tests/test_crosschecks.py).
    """
    sorted_df = df.orderBy(*order).withColumn("__pid", F.spark_partition_id())

    # numPartitions rows after map-side combine — tiny by construction.
    sizes = sorted_df.groupBy("__pid").agg(F.count(F.lit(1)).alias("__n"))
    cum = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = sizes.select(
        "__pid",
        (F.coalesce(F.sum("__n").over(cum), F.lit(0)) + F.lit(start)).alias("__off"),
    )

    local = Window.partitionBy("__pid").orderBy(*order)
    return (
        sorted_df.join(F.broadcast(offsets), "__pid")
        .withColumn(out, (F.row_number().over(local) - 1 + F.col("__off")).cast("long"))
        .drop("__pid", "__off")
    )
