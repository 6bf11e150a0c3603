"""Corpus-curation operators a training-data pipeline runs after dedup.

These extend the reference's cleaning surface (quality filters and
drop-duplicates, etl/run_transform.py:366-370, additional_fifa.py:111-168)
with the corpus-level operations an LLM data pipeline needs at 100 TB:

- benchmark decontamination (n-gram overlap of every corpus doc against an
  eval-set shingle universe — the standard train/test contamination check),
- sequence packing (assign docs to fixed token-budget shards for training),
- domain-mix rebalancing (per-group sampling rates toward a target mix).

Every operator is pure DataFrame/Column (no Python UDFs); the only shuffles
are on the natural keys (shingle, pack partition, group key), each with
map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from .dedup import doc_shingles, words


def decontaminate_overlap(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 5,
    threshold: float = 0.2,
) -> DataFrame:
    """Per-document n-gram overlap with an evaluation set's shingle universe.

    The contamination check every training pipeline runs before a data
    release: a corpus document whose word n-grams substantially appear in
    the benchmark/eval set is flagged so it can be dropped from training.

    Returns (id, n_shingles, n_hit, overlap, contaminated) for every corpus
    doc with >= 1 shingle (docs shorter than ``n`` words have no n-grams and
    are trivially clean; callers needing them re-attach with a left join).

    Scale shape: the eval universe is DISTINCT shingles only — typically
    millions of rows even for large benchmark suites, so the probe is a
    shuffle (or, when genuinely tiny, AQE-promoted broadcast) hash join on
    the shingle key, never a cross product. Corpus side streams through one
    explode -> join -> groupBy(id) with partial aggregation. No collect.
    """
    corpus_sh = doc_shingles(corpus, id_col, text_col, n)
    eval_sh = (
        doc_shingles(eval_df, id_col, text_col, n)
        .select("shingle")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    return (
        corpus_sh.join(eval_sh, "shingle", "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.coalesce(F.sum("__hit"), F.lit(0)).alias("n_hit"),
        )
        .withColumn("overlap", F.round(F.col("n_hit") / F.col("n_shingles"), 6))
        .withColumn("contaminated", (F.col("overlap") >= F.lit(threshold)).cast("int"))
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    budget: int = 512,
    partition_col: str | None = None,
    sub_buckets: int = 1,
) -> DataFrame:
    """Assign documents to fixed token-budget training shards.

    Sequence packing for pretraining: within each pack partition, documents
    are laid end-to-end in a deterministic order (id) and cut into shards of
    ``budget`` tokens — shard k holds the docs whose running token total
    falls in (k*budget, (k+1)*budget]. A document straddling a boundary
    belongs to the shard its cumulative end lands in (greedy fill-forward;
    real packers then split the straddler — that is a tokenizer-side concern).

    Scale shape: ONE window (running sum) per pack partition. A raw
    per-source window would put a whole source on one task, so the pack key
    is (partition_col, id % sub_buckets): packing is embarrassingly parallel
    across sub-buckets — raise ``sub_buckets`` until each task's slice fits.
    Shard numbering is bucket-local, so parallelism never changes results.
    """
    n_tokens = F.size(words(F.col(text_col)))
    parts = [F.col(partition_col)] if partition_col else []
    bucket = F.pmod(F.col(id_col), F.lit(sub_buckets)).cast("long")
    w = W.partitionBy(*parts, bucket).orderBy(id_col)
    running = F.sum(n_tokens).over(w)
    out = [F.col(id_col)] + ([F.col(partition_col)] if partition_col else [])
    return df.select(
        *out,
        bucket.alias("pack_bucket"),
        n_tokens.cast("long").alias("n_tokens"),
        running.alias("running_tokens"),
        F.floor((running - 1) / F.lit(budget)).cast("long").alias("shard_id"),
    )


def domain_mix_rates(
    df: DataFrame,
    group_cols: list[str],
    *,
    target_shares: dict[tuple, float] | None = None,
) -> DataFrame:
    """Per-group downsampling rates toward a target corpus mix.

    With no explicit target, the target is the uniform mix (every observed
    group gets total/n_groups docs). ``sample_rate`` = min(1, target_n / n):
    over-represented domains are downsampled, under-represented ones kept
    whole (rate 1 — upsampling is a repetition policy, not a filter).

    Scale shape: one groupBy on the (bounded-cardinality) domain key
    collapses 100 TB to n_groups rows; totals come from a single-row
    aggregate cross-joined back (broadcast of 1 row), not a window over the
    data. The emitted rates pair with the deterministic hash-sampler
    (queries/sampling_text.py) to materialize the rebalanced corpus.
    """
    counts = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("n_docs"))
    totals = counts.agg(
        F.sum("n_docs").alias("__total"), F.count(F.lit(1)).alias("__n_groups")
    )
    out = counts.crossJoin(F.broadcast(totals))
    if target_shares is None:
        target_n = F.col("__total") / F.col("__n_groups")
    else:  # explicit share lookup (small literal map)
        mapping = F.create_map(
            *[
                lit
                for key, share in target_shares.items()
                for lit in (F.lit("|".join(map(str, key))), F.lit(share))
            ]
        )
        target_n = mapping[F.concat_ws("|", *group_cols)] * F.col("__total")
    return out.select(
        *group_cols,
        "n_docs",
        F.round(target_n, 6).alias("target_n"),
        F.round(F.least(F.lit(1.0), target_n / F.col("n_docs")), 6).alias("sample_rate"),
        F.round(F.least(target_n, F.col("n_docs").cast("double")), 6).alias("expected_n"),
    )
