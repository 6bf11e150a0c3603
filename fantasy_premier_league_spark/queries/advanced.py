"""Advanced inventory: baseline-model queries, KS test, fuzzy matching,
multimodal plumbing (SURVEY §2.10/§2.12 surfaces that are expressible as
queries over the driver tables).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load
from ..operators import multimodal
from ..operators.fuzzy import token_set_ratio_udf
from . import query


@query(
    "q23_baseline_accuracy",
    """
    WITH preds AS (
        SELECT o_orderpriority,
               CASE WHEN o_totalprice >= 1000 THEN 1 ELSE 0 END AS target,
               CASE WHEN lag(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) >= 1000
                    THEN 1 ELSE 0 END AS pred
        FROM orders
    )
    SELECT o_orderpriority,
           count(*) AS n,
           round(avg(CASE WHEN pred = target THEN 1.0 ELSE 0.0 END), 6) AS accuracy,
           round(avg(target), 6) AS target_rate
    FROM preds GROUP BY o_orderpriority
    """,
    doc="Baseline heuristic model M12 + target construction M16 (previous_"
    "points>=4 predictor, M1.ipynb § 6): lagged predictor vs binary target, "
    "per-group accuracy — pure Column exprs, no MLlib needed.",
    tags=("ml", "baseline"),
)
def q23_baseline_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    target = (F.col("o_totalprice") >= 1000).cast("int")
    pred = F.coalesce((F.lag("o_totalprice").over(w) >= 1000).cast("int"), F.lit(0))
    preds = orders.select(
        "o_orderpriority", target.alias("target"), pred.alias("pred")
    )
    return preds.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg((F.col("pred") == F.col("target")).cast("double")), 6).alias("accuracy"),
        F.round(F.avg("target"), 6).alias("target_rate"),
    )


@query(
    "q24_ks_two_sample",
    """
    WITH vals AS (
        SELECT o_totalprice AS v, CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS g1
        FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
    ),
    per_value AS (
        SELECT v, count(*) FILTER (WHERE g1 = 1) AS c1, count(*) FILTER (WHERE g1 = 0) AS c2
        FROM vals GROUP BY v
    ),
    cum AS (
        SELECT v,
               sum(c1) OVER (ORDER BY v) AS cum1, sum(c2) OVER (ORDER BY v) AS cum2,
               sum(c1) OVER () AS n1, sum(c2) OVER () AS n2
        FROM per_value
    )
    SELECT round(max(abs(cum1 / n1 - cum2 / n2)), 6) AS ks_stat,
           max(n1)::BIGINT AS n1, max(n2)::BIGINT AS n2
    FROM cum
    """,
    doc="Two-sample KS statistic M15 (M2.ipynb § 18) via per-distinct-value "
    "cumulative ECDFs — MLlib only ships 1-sample KS. The global ordered "
    "window runs over distinct values (already aggregated), which bounds "
    "the single-partition sort; at extreme cardinality switch to a binned "
    "ECDF.",
    tags=("ml", "stats"),
)
def q24_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    vals = orders.filter(F.col("o_orderpriority").isin("1-URGENT", "5-LOW")).select(
        F.col("o_totalprice").alias("v"),
        (F.col("o_orderpriority") == "1-URGENT").cast("int").alias("g1"),
    )
    per_value = vals.groupBy("v").agg(
        F.sum("g1").alias("c1"), F.sum(1 - F.col("g1")).alias("c2")
    )
    w = W.orderBy("v").rowsBetween(W.unboundedPreceding, 0)
    wall = W.partitionBy()
    cum = per_value.select(
        "v",
        F.sum("c1").over(w).alias("cum1"),
        F.sum("c2").over(w).alias("cum2"),
        F.sum("c1").over(wall).alias("n1"),
        F.sum("c2").over(wall).alias("n2"),
    )
    return cum.agg(
        F.round(F.max(F.abs(F.col("cum1") / F.col("n1") - F.col("cum2") / F.col("n2"))), 6).alias("ks_stat"),
        F.max("n1").alias("n1"),
        F.max("n2").alias("n2"),
    )


@query(
    "q60_fuzzy_part_match",
    None,  # difflib-based pandas UDF: not expressible in the oracle
    doc="Fuzzy entity resolution F9/J8/J9/A12 surface (etl/additional_fifa "
    "pipeline): within each brand (blocking equi-join — never all-pairs), "
    "find the most similar other part name by token_set_ratio (Arrow-"
    "batched pandas UDF), exact-prefix short-circuit JVM-side, top-1 per "
    "part via window. Deterministic; rows-only check.",
    tags=("fuzzy", "pandas-udf"),
)
def q60_fuzzy_part_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part").filter(F.col("p_partkey") < 200)
    a = part.select(
        F.col("p_partkey").alias("id_a"), F.col("p_brand").alias("brand"), F.col("p_name").alias("name_a")
    )
    b = part.select(
        F.col("p_partkey").alias("id_b"), F.col("p_brand").alias("brand"), F.col("p_name").alias("name_b")
    )
    cand = a.join(b, "brand").filter(F.col("id_a") != F.col("id_b"))
    score = F.when(F.col("name_a") == F.col("name_b"), F.lit(100.0)).otherwise(
        token_set_ratio_udf("name_a", "name_b")
    )
    scored = cand.withColumn("score", F.round(score, 2))
    w = W.partitionBy("id_a").orderBy(F.desc("score"), F.asc("id_b"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("id_a", "id_b", "score")
    )


@query(
    "q61_multimodal_features",
    # the stub decoder is md5-derived, so the oracle replays it exactly:
    # feature i = byte i of md5(payload) / 255
    """
    SELECT doc_id,
           strlen(text)::BIGINT AS n_bytes,
           round("""
    + " + ".join(f"('0x' || substr(md5(text), {2 * i + 1}, 2))::INT / 255.0" for i in range(8))
    + """, 6) AS feature_sum
    FROM documents
    """,
    doc="Multimodal decode plumbing (mapInPandas + Arrow): documents' text "
    "bytes treated as opaque payloads, decoded by the deterministic stub "
    "decoder into fixed-dim feature vectors; real codecs slot into the same "
    "operator (operators/multimodal.py). The md5-derived stub is replayed "
    "by the oracle value-for-value, so the whole Arrow round-trip is "
    "hash-checked.",
    tags=("multimodal", "pandas-udf"),
)
def q61_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    feats = multimodal.extract_features(
        docs, "doc_id", "payload", decoder=multimodal.fake_image_decoder
    )
    return feats.select(
        F.col("id").alias("doc_id"),
        "n_bytes",
        F.round(F.aggregate("features", F.lit(0.0), lambda a, x: a + x), 6).alias("feature_sum"),
    )
