"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)`` — flagship query (revenue-by-nation join chain) on
  sf0.001; smoke check.
- ``queries()`` — the oracle-checked inventory from
  ``fantasy_premier_league_spark.queries`` (one entry per implemented
  operator family, SURVEY.md §2).
- ``oracle_sql()`` — DuckDB-runnable SQL per query. Omitted only for
  genuinely non-replayable operators: approximate engine-internal
  sketches (q69 HLL/quantile, r20 HLL merge state) and zlib DEFLATE
  (r31) — every hash-sketch query (MinHash, SimHash, LSH, PQ, IVF) runs
  portable hashing and IS value-hash checked, including the trained
  quantizer (q54 unrolls its Lloyd's rounds in the oracle) and the
  topic pipeline's deterministic pre-LDA stages (q62).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from fantasy_premier_league_spark.queries import all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    q = all_queries()["q02_revenue_by_nation"]
    return q.fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in sorted(all_queries().items())}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in sorted(all_queries().items()) if q.oracle is not None}
