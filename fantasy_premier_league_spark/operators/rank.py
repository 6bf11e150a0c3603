"""Global ranking without a single-partition window (SURVEY §2.5 W4 note).

``row_number() over (order by ...)`` funnels every row through one task —
fine for the 20-row league table, fatal at 100 TB. The scalable two-phase
form:

1. range-partition sort on the rank keys (Spark's ``orderBy`` — each
   partition holds a contiguous key range),
2. count rows per partition (one tiny job over partition indices),
3. rank = cumulative offset of the partition + local position.

No data moves beyond the sort itself; the offsets are a driver-side array
of numPartitions integers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def global_rank(df: DataFrame, order: list[Column], *, out: str = "rank", start: int = 1) -> DataFrame:
    """Dense global row numbering under a total order (ties must be broken
    by the caller's ``order`` — append a unique key for determinism)."""
    sorted_df = df.orderBy(*order)

    def with_local_index(pdx: int, it):
        for i, row in enumerate(it):
            yield (pdx, i, row)

    indexed = sorted_df.rdd.mapPartitionsWithIndex(
        lambda pdx, it: with_local_index(pdx, it), preservesPartitioning=True
    )
    sizes = dict(
        indexed.mapPartitionsWithIndex(
            lambda pdx, it: [(pdx, sum(1 for _ in it))], preservesPartitioning=True
        ).collect()
    )
    offsets = {}
    acc = start
    for pdx in sorted(sizes):
        offsets[pdx] = acc
        acc += sizes[pdx]
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(offsets)

    def attach_rank(t):
        pdx, i, row = t
        return (*row, bc.value[pdx] + i)

    schema = sorted_df.schema.add(out, "long", False)
    return spark.createDataFrame(indexed.map(attach_rank), schema)
