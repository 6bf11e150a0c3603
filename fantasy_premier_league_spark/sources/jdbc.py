"""JDBC scans and batch sinks (SURVEY §2.1 S8-S11).

The reference loads through sqlalchemy/psycopg2 with hand-written DDL
(etl/load.py): drop-cascade → create → insert for overwrite (S9),
create-if-absent → insert for append (S10), plus a single-row audit record
per load (S11) and column re-alignment against the live table
(load.py:22-24,81-82 ``table_get_columns`` + reindex).

Spark mapping: ``spark.read.jdbc`` / ``df.write.jdbc`` carry the same
semantics; column alignment happens before the write. Integration runs
use the embedded Apache Derby database that ships in Spark's own jars
directory (tests/test_jdbc_roundtrip.py round-trips every helper through
a real ``jdbc:derby:`` URL); any other database is just a different
``url`` + driver property.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_table(spark: SparkSession, url: str, table: str, *, properties: dict | None = None) -> DataFrame:
    """S8: full/projected table scan (predicates push down through JDBC)."""
    return spark.read.jdbc(url, table, properties=properties or {})


def read_query(spark: SparkSession, url: str, query: str, *, properties: dict | None = None) -> DataFrame:
    """S8: arbitrary SELECT pushed to the database."""
    reader = spark.read.format("jdbc").option("url", url).option("query", query)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def align_columns(
    df: DataFrame, target_columns: list[str], *, types: dict | None = None
) -> DataFrame:
    """Column re-alignment before load (≙ load.py:22-24,81-82): order to
    the target table's columns, null-fill ones the frame lacks, refuse
    extras loudly (the reference silently dropped them — an error is the
    safer contract).

    ``types`` maps column name -> Spark DataType (or DDL string) for the
    null-filled columns. Without it a bare ``lit(None)`` is NullType
    ("void"), which JDBC writers cannot map to a SQL type — the real-DB
    round-trip in tests/test_jdbc_roundtrip.py caught exactly that, so
    untyped fills fall back to string."""
    extra = [c for c in df.columns if c not in target_columns]
    if extra:
        raise ValueError(f"frame has columns not in target table: {extra}")
    types = types or {}
    return df.select(
        *[
            F.col(c) if c in df.columns
            else F.lit(None).cast(types.get(c, "string")).alias(c)
            for c in target_columns
        ]
    )


def batch_overwrite(df: DataFrame, url: str, table: str, *, target_columns: list[str] | None = None,
                    properties: dict | None = None) -> None:
    """S9: drop-and-recreate load (mode=overwrite ≙ DROP CASCADE → CREATE →
    INSERT, load.py:27-63)."""
    if target_columns:
        df = align_columns(df, target_columns)
    df.write.mode("overwrite").jdbc(url, table, properties=properties or {})


def batch_append(df: DataFrame, url: str, table: str, *, target_columns: list[str] | None = None,
                 properties: dict | None = None) -> None:
    """S10: create-if-absent append (load.py:65-70).

    When the frame lacks target columns, their types are read from the
    live table's JDBC metadata (schema-only fetch, no row scan) so the
    null-fill is typed — the Spark analogue of the reference's
    ``table_get_columns`` re-alignment against the live table."""
    if target_columns:
        types = None
        if set(target_columns) - set(df.columns):
            live = df.sparkSession.read.jdbc(url, table, properties=properties or {}).schema
            types = {f.name: f.dataType for f in live.fields}
        df = align_columns(df, target_columns, types=types)
    df.write.mode("append").jdbc(url, table, properties=properties or {})


#: FK-dependency load order for the FPL catalog (≙ the "Table create
#: order: N" sequence in etl/load.py:111-472 — dims before facts so
#: REFERENCES constraints validate on insert)
CATALOG_LOAD_ORDER = [
    "players_previous_seasons",
    "positions",
    "teams",
    "league_table",
    "players_summary",
    "gameweeks",
    "fixtures",
    "players_future",
    "players_past",
    "players_full",
    "team_results",
]


def ordered_tables(catalog: dict) -> list[str]:
    """FK-dependency ordering; tables outside the known catalog append
    after, deterministic by name."""
    ordered = [t for t in CATALOG_LOAD_ORDER if t in catalog]
    return ordered + sorted(set(catalog) - set(ordered))


def load_catalog(
    catalog: dict, url: str, *, mode: str = "overwrite", properties: dict | None = None
) -> list[str]:
    """S9/S10 over the whole 11-table catalog in FK-dependency order.
    Returns the tables written, in order."""
    names = ordered_tables(catalog)
    for name in names:
        writer = batch_overwrite if mode == "overwrite" else batch_append
        writer(catalog[name], url, name, properties=properties)
    return names


def audit_record(
    spark: SparkSession, *, load_datetime: str, gameweek_now: str | None, user: str
) -> DataFrame:
    """S11: the single-row ``record`` audit frame (load.py:86-108,466-472);
    append it with :func:`batch_append`."""
    return spark.createDataFrame(
        [(load_datetime, gameweek_now, user)],
        "load_datetime string, gameweek_now string, login_user string",
    ).select(
        F.to_timestamp("load_datetime").alias("load_datetime"),
        F.col("gameweek_now"),
        F.col("login_user"),
    )
