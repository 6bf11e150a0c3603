"""Incremental (algebraic) aggregate maintenance — merge partial
aggregates instead of re-scanning history.

The pattern behind every incrementally-maintained rollup / materialized
view at warehouse scale: keep per-key ALGEBRAIC partial states
(count, sum, min, max — each mergeable by an associative+commutative
combine), and fold each new delta batch into the stored state with a
state-sized union+groupBy. The 100 TB property is that maintenance cost
is O(|delta| + |state|), never O(|history|): the raw historical rows are
read exactly once, ever. Derived metrics that are NOT algebraic (avg,
range) are computed at read time from the merged state (``finalize``) —
the classic partial-aggregate decomposition Spark itself uses for
map-side combine (partial_sum/partial_count under HashAggregate).

Reference analogue: the reference recomputes its summary tables from the
full event log on every run (etl/run_transform.py league-table rebuild);
this operator family is the incremental form of the same aggregates.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: the mergeable state columns every partial-aggregate frame carries
STATE_COLS = ("cnt", "sum_v", "min_v", "max_v")


def partial_aggs(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """Per-key algebraic state over one batch: (keys, cnt, sum, min, max).

    One shuffle with map-side partial aggregation — this is the only
    operation that ever touches raw rows.
    """
    v = F.col(value_col)
    return df.groupBy(*keys).agg(
        F.count(v).alias("cnt"),
        F.sum(v).alias("sum_v"),
        F.min(v).alias("min_v"),
        F.max(v).alias("max_v"),
    )


def merge_partial_aggs(*parts: DataFrame) -> DataFrame:
    """Combine partial states by key: counts/sums add, min/max fold.

    Input frames must share (keys..., cnt, sum_v, min_v, max_v) schemas.
    Cost is state-sized: one union (narrow) + one groupBy shuffle on the
    keys — the delta-maintenance step. Associativity means any merge
    tree (per-hour → per-day → total) yields identical state.
    """
    if not parts:
        raise ValueError("merge_partial_aggs needs at least one partial frame")
    keys = [c for c in parts[0].columns if c not in STATE_COLS]
    unioned = reduce(lambda a, b: a.unionByName(b), parts)
    return unioned.groupBy(*keys).agg(
        F.sum("cnt").alias("cnt"),
        F.sum("sum_v").alias("sum_v"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    )


def finalize_aggs(state: DataFrame, *, round_avg: int = 6) -> DataFrame:
    """Read-time derived metrics from merged state: avg (non-algebraic —
    computed from sum/cnt, never maintained directly) and range."""
    return state.select(
        *[c for c in state.columns if c not in STATE_COLS],
        "cnt",
        "sum_v",
        "min_v",
        "max_v",
        F.round(F.col("sum_v") / F.col("cnt"), round_avg).alias("avg_v"),
        (F.col("max_v") - F.col("min_v")).alias("range_v"),
    )
