"""Sampling, cross-join, and text-cleaning inventory (SURVEY §2.6 O4,
§2.3 J8, §2.8 F8/F10)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..operators.dedup import words
from . import query

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_WORDS = f"string_split({_NORM}, ' ')"


@query(
    "q25_hash_sample",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE substr(md5(o_orderkey::VARCHAR), 1, 1) = '0'
    """,
    doc="Deterministic sampling O4 (df.sample, EDA § 3,68): hash-based "
    "~1/16 sample via md5 prefix — reproducible across engines and runs, "
    "unlike rand(); the pattern for stable sampled pipelines at scale.",
    tags=("sample",),
)
def q25_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return orders.filter(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1) == "0"
    ).select("o_orderkey", "o_custkey", "o_totalprice")


@query(
    "q26_cross_grid",
    """
    SELECT r.r_name AS region, t.event_type,
           coalesce(c.n, 0) AS n_events
    FROM region r
    CROSS JOIN (SELECT DISTINCT event_type FROM events) t
    LEFT JOIN (
        SELECT n.n_regionkey, e.event_type, count(*) AS n
        FROM events e
        JOIN customer cu ON cu.c_custkey = e.user_id
        JOIN nation n ON n.n_nationkey = cu.c_nationkey
        GROUP BY n.n_regionkey, e.event_type
    ) c ON c.n_regionkey = r.r_regionkey AND c.event_type = t.event_type
    """,
    doc="Explicit cross join J8 (the fuzzy-match candidate grid, "
    "etl/additional_fifa.py:314-340): dense region x event_type grid with "
    "zero-filled counts — both sides dimension-sized, so the product is "
    "broadcastable; the J8-at-scale variant lives in operators/fuzzy.py.",
    tags=("crossjoin",),
)
def q26_cross_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load(spark, sf_dir, "region")
    events = load(spark, sf_dir, "events")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    types = events.select("event_type").distinct()
    grid = region.crossJoin(types)
    counts = (
        events.join(cust, events.user_id == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_regionkey", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        grid.join(
            counts,
            (grid.r_regionkey == counts.n_regionkey) & (grid.event_type == counts.event_type),
            "left",
        )
        .select(
            F.col("r_name").alias("region"),
            grid.event_type,
            F.coalesce("n", F.lit(0)).alias("n_events"),
        )
    )


@query(
    "q27_stopword_removal",
    f"""
    SELECT doc_id,
           array_to_string(list_filter({_WORDS},
               w -> NOT list_contains(['the','a','an','of','and','or','is','to','in'], w)), ' ') AS text_clean,
           len(list_filter({_WORDS},
               w -> list_contains(['the','a','an','of','and','or','is','to','in'], w))) AS n_removed
    FROM documents
    """,
    doc="Stop-word removal F8 (NLTK english removal, M1.ipynb § 24) as an "
    "array filter — JVM-side, no MLlib transformer needed for the scan "
    "path (StopWordsRemover covers the ML-pipeline path).",
    tags=("text",),
)
def q27_stopword_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    stop = F.array(*[F.lit(w) for w in ("the", "a", "an", "of", "and", "or", "is", "to", "in")])
    docs = load(spark, sf_dir, "documents")
    w = words(F.col("text"))
    kept = F.filter(w, lambda t: ~F.array_contains(stop, t))
    removed = F.filter(w, lambda t: F.array_contains(stop, t))
    return docs.select(
        "doc_id",
        F.array_join(kept, " ").alias("text_clean"),
        F.size(removed).cast("long").alias("n_removed"),
    )


@query(
    "q28_keyword_flags",
    """
    SELECT doc_id,
           (text LIKE '%spark%')::INT AS has_spark,
           regexp_matches(text, '(join|merge)')::INT AS has_join_or_merge,
           regexp_matches(text, '(stream|window)')::INT AS has_streaming_terms
    FROM documents
    """,
    doc="Keyword-class flags F10 (injury/suspension news flags via "
    "check_for_words, M1.ipynb § 23-24): contains + rlike OR-chains as "
    "boolean feature columns.",
    tags=("text",),
)
def q28_keyword_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.col("text").contains("spark").cast("int").alias("has_spark"),
        F.col("text").rlike("(join|merge)").cast("int").alias("has_join_or_merge"),
        F.col("text").rlike("(stream|window)").cast("int").alias("has_streaming_terms"),
    )
