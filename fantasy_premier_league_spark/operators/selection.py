"""Targeted data selection: DSIR-style hashed-n-gram importance weights.

Data Selection with Importance Resampling (Xie et al., NeurIPS 2023,
arXiv:2302.03169) scores every document in a raw pool by how much it
looks like a small *target* corpus, using nothing heavier than hashed
n-gram counts and two categorical distributions:

    weight(doc) = mean over tokens t of
        ln p_target(bucket(t)) - ln p_background(bucket(t))

with add-alpha smoothing over ``n_buckets`` hash buckets. Documents with
high weight are the ones importance resampling keeps for pre-training.

Dataflow (the 100 TB shape):
- pass 1: explode tokens, bucket with the portable 32-bit md5 hash, one
  groupBy(bucket) building BOTH distributions in a single shuffle whose
  key space is ``n_buckets`` — the model state is bucket-sized, never
  corpus-sized, and partial aggregation collapses the token stream
  map-side;
- pass 2: re-join the token stream to the bucket→log-ratio table (a
  broadcast: ``n_buckets`` rows) and average per document — one
  groupBy(doc) with partial agg.

Nothing is collected to the driver; both passes are linear scans. The
portable hash keeps the whole computation replayable in ANSI SQL, so the
query built on this operator is value-hash checked against DuckDB.

Reference provenance: the reference repo has no data-selection stage —
this extends its curation surface (SURVEY.md §2, training-data additions)
the same way operators/curation.py does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import portable_hash32, words


def dsir_weights(
    df: DataFrame,
    id_col: str,
    text_col: str,
    is_target_col: str,
    *,
    n_buckets: int = 256,
    alpha: float = 1.0,
    threshold: float = 0.0,
) -> DataFrame:
    """Per-document DSIR importance weights against a target slice.

    ``is_target_col`` is a boolean column on ``df`` marking the target
    (reference) documents; everything else is the raw pool being scored.
    Returns one row per document::

        doc_id, is_target, n_tokens, dsir_score, selected

    ``dsir_score`` is the mean per-token log-likelihood ratio (rounded to
    6 places); ``selected`` flags pool documents whose rounded score
    clears ``threshold`` — thresholding on the rounded value keeps the
    flag bit-stable across engines.
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(is_target_col).cast("boolean").alias("is_target"),
        F.explode(words(F.col(text_col))).alias("word"),
    ).withColumn("bucket", portable_hash32(F.col("word")) % n_buckets)

    buckets = toks.groupBy("bucket").agg(
        F.sum(F.when(F.col("is_target"), 1).otherwise(0)).alias("ct"),
        F.sum(F.when(~F.col("is_target"), 1).otherwise(0)).alias("cb"),
    )
    totals = buckets.agg(
        F.sum("ct").alias("tt"), F.sum("cb").alias("tb")
    )
    a = F.lit(float(alpha))
    b = F.lit(float(n_buckets))
    ratio = buckets.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log((F.col("ct") + a) / (F.col("tt") + a * b))
            - F.log((F.col("cb") + a) / (F.col("tb") + a * b))
        ).alias("log_ratio"),
    )

    score = F.round(F.avg("log_ratio"), 6)
    return (
        toks.join(F.broadcast(ratio), "bucket")
        .groupBy("doc_id", "is_target")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            score.alias("dsir_score"),
        )
        .select(
            "doc_id",
            F.col("is_target").cast("int").alias("is_target"),
            "n_tokens",
            "dsir_score",
            (
                (~F.col("is_target").cast("boolean"))
                & (F.col("dsir_score") >= F.lit(float(threshold)))
            )
            .cast("int")
            .alias("selected"),
        )
    )
