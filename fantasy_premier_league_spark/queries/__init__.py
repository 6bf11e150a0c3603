"""Oracle-checked query inventory (the driver contract).

Each query is registered with:
- ``fn(spark, sf_dir) -> DataFrame`` — the Spark implementation (DataFrame
  API or spark.sql), lazily built so Catalyst sees the whole plan;
- ``oracle`` — an equivalent SQL string DuckDB can run over the same parquet
  tables (views pre-registered by the driver), or ``None`` for genuinely
  non-SQL-expressible operators (hash-based sketches whose hash function is
  engine-specific) → the driver records a weaker rows-only check.

Column names are aliased identically on both sides — the driver sorts
columns by name before value-hashing.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, "Query"] = {}


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


def query(name: str, oracle: str | None, *, doc: str = "", tags: tuple[str, ...] = ()):
    """Decorator registering a query implementation with its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""), tags=tags)
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    # import side-effect registers every module's queries exactly once
    from . import (  # noqa: F401
        advanced,
        curation,
        dedup,
        relational,
        sampling_text,
        selection,
        similarity,
        text,
    )

    return dict(REGISTRY)
