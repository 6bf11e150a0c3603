"""Sampling, cross-join, and text-cleaning inventory (SURVEY §2.6 O4,
§2.3 J8, §2.8 F8/F10)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load
from ..operators.dedup import words
from . import query

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_WORDS = f"string_split({_NORM}, ' ')"


@query(
    "v25_hash_sample",
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
def v25_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return orders.filter(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1) == "0"
    ).select("o_orderkey", "o_custkey", "o_totalprice")


@query(
    "v67_cross_grid",
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
def v67_cross_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    "v74_stopword_removal",
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
def v74_stopword_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    "v75_keyword_flags",
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
def v75_keyword_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.col("text").contains("spark").cast("int").alias("has_spark"),
        F.col("text").rlike("(join|merge)").cast("int").alias("has_join_or_merge"),
        F.col("text").rlike("(stream|window)").cast("int").alias("has_streaming_terms"),
    )


@query(
    "v28_tfidf",
    """
    WITH w AS (
        SELECT doc_id,
               unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS term
        FROM documents
    ),
    tf AS (
        SELECT doc_id, term, count(*)::BIGINT AS tf
        FROM w WHERE term != '' GROUP BY doc_id, term
    ),
    dfreq AS (SELECT term, count(*)::BIGINT AS dfq FROM tf GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT doc_id, term, tfidf FROM (
        SELECT doc_id, term,
               round(tf * (ln((n_docs + 1.0) / (dfq + 1.0)) + 1.0), 6) AS tfidf,
               row_number() OVER (
                   PARTITION BY doc_id
                   ORDER BY tf * (ln((n_docs + 1.0) / (dfq + 1.0)) + 1.0) DESC, term
               ) AS rn
        FROM tf JOIN dfreq USING (term) CROSS JOIN n
    ) WHERE rn <= 3
    """,
    doc="TF-IDF top-3 terms per document (smoothed idf = ln((N+1)/(df+1))+1, "
    "sklearn's formula): tokenize -> per-(doc,term) tf -> document "
    "frequency as a COUNT window over the tf frame (not a second aggregate "
    "branch — the expensive explode+groupBy is scanned once, Catalyst "
    "can't reuse-exchange across re-derived branches) -> score -> top-k "
    "window. Three keyed shuffles total: (doc,term), term, doc.",
    tags=("text", "tfidf"),
)
def v28_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    w = docs.select("doc_id", F.explode(F.split(norm, " ")).alias("term")).filter(
        F.col("term") != ""
    )
    tf = w.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfq = F.count(F.lit(1)).over(W.partitionBy("term"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    score = F.col("tf") * (
        F.log((F.col("n_docs") + 1.0) / (dfq + 1.0)) + 1.0
    )
    scored = tf.crossJoin(F.broadcast(n)).withColumn("__s", score)
    win = W.partitionBy("doc_id").orderBy(F.desc("__s"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", F.round("__s", 6).alias("tfidf"))
    )


#: per-stratum sampling thresholds out of 256 (first md5 byte of the key):
#: urgent orders oversampled 4x relative to low-priority ones
_STRATA_RATES = {
    "1-URGENT": 64,     # ~25%
    "2-HIGH": 32,       # ~12.5%
    "3-MEDIUM": 16,     # ~6.25%
    "4-NOT SPECIFIED": 16,
    "5-LOW": 16,
}


@query(
    "v76_stratified_sample",
    """
    SELECT o_orderkey, o_orderpriority, o_totalprice
    FROM orders
    WHERE ('0x' || substr(md5(o_orderkey::VARCHAR), 1, 2))::INT <
          CASE o_orderpriority
    """
    + "\n".join(
        f"          WHEN '{k}' THEN {v}" for k, v in _STRATA_RATES.items()
    )
    + """
          ELSE 0 END
    """,
    doc="Stratified deterministic sampling: per-stratum rates applied via "
    "the first md5 byte of the key — reproducible across engines/runs and "
    "rebalances class skew (urgent orders oversampled 4x) the way a "
    "training-data pipeline downsamples dominant classes. Pure scan-side "
    "filter: no shuffle, pushes column pruning to the parquet scan.",
    tags=("sample", "stratified"),
)
def v76_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    byte0 = F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 2), 16, 10).cast("int")
    threshold = F.when(F.lit(False), F.lit(0))
    for k, v in _STRATA_RATES.items():
        threshold = threshold.when(F.col("o_orderpriority") == k, F.lit(v))
    return orders.filter(byte0 < threshold.otherwise(F.lit(0))).select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )


@query(
    "v77_group_sample_topk",
    """
    SELECT user_id, event_id, event_type FROM (
        SELECT user_id, event_id, event_type,
               row_number() OVER (
                   PARTITION BY user_id ORDER BY md5(event_id::VARCHAR), event_id
               ) AS rn
        FROM events
    ) WHERE rn <= 5
    """,
    doc="Uniform k-per-group sample (deterministic reservoir): rank each "
    "group by a hash of the row key, keep the first k — every group "
    "contributes exactly min(k, |group|) rows regardless of group skew. "
    "The hash order is engine-portable (md5 hex sorts identically "
    "everywhere); one shuffle on the group key.",
    tags=("sample", "per-group"),
)
def v77_group_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    win = W.partitionBy("user_id").orderBy(
        F.md5(F.col("event_id").cast("string")), F.col("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= 5)
        .select("user_id", "event_id", "event_type")
    )
