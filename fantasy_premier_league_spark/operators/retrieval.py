"""Hybrid retrieval: fuse lexical (BM25) and semantic (ANN) rankings.

The standard RAG retrieval stack runs BOTH retrievers and fuses with
Reciprocal Rank Fusion (Cormack et al., SIGIR 2009):

    rrf(d) = Σ_lists 1 / (k_rrf + rank_list(d))

RRF needs only ranks (no score calibration between BM25's unbounded sums
and cosine's [-1, 1]), which is why it is the default fusion in hybrid
search engines. Scale shape: both inputs are already top-k-sized per
query (the heavy lifting — postings aggregation, ANN scan — happened
upstream), so the fusion is a broadcast-sized full-outer join + one
windowed top-k. Nothing here touches corpus-sized data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def rrf_fuse_topk(
    sem: DataFrame,
    lex: DataFrame,
    *,
    k: int = 10,
    k_rrf: int = 60,
) -> DataFrame:
    """Fuse per-query semantic rankings with a global lexical ranking.

    ``sem``: (query_id, doc_id, rank) — e.g. ``cosine_topk`` output.
    ``lex``: (doc_id, rank) — a query-independent lexical top list (the
    corpus-level BM25 ranking acts as a static relevance prior; a
    per-query lexical list would carry query_id and join directly).

    A document missing from one list contributes 0 for that list
    (truncated-list RRF, the standard form). Returns (query_id, doc_id,
    rrf, rank) with rrf rounded to 6dp and ties broken on doc_id — both
    engine-stable.
    """
    s = sem.select("query_id", "doc_id", F.col("rank").alias("__r_sem"))
    queries = s.select("query_id").distinct()
    lx = queries.crossJoin(
        F.broadcast(lex.select("doc_id", F.col("rank").alias("__r_lex")))
    )
    fused = s.join(lx, ["query_id", "doc_id"], "full_outer").select(
        "query_id",
        "doc_id",
        F.round(
            F.coalesce(F.lit(1.0) / (F.lit(k_rrf) + F.col("__r_sem")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(k_rrf) + F.col("__r_lex")), F.lit(0.0)),
            6,
        ).alias("rrf"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("rrf"), F.asc("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def phrase_search(
    df: DataFrame,
    id_col: str,
    text_col: str,
    phrase: str,
) -> DataFrame:
    """Exact phrase search via POSITIONAL postings — the inverted-index
    counterpart to :func:`~..operators.textstats.bm25_scores`' bag of
    words: BM25 ranks by term statistics, phrase search needs term
    ADJACENCY, which is what search engines keep positions in their
    postings for.

    Plan: posexplode the normalized token stream, keep ONLY the phrase's
    terms (the filter lands before the shuffle, so the postings that
    move are phrase-term-sized, not corpus-sized), then chain equi-joins
    aligning term i at offset i from the start position — a k-term
    phrase is k-1 joins on (id, aligned position), each shrinking the
    candidate starts. At 100 TB the postings table is the thing you
    persist (sources/warehouse.py bucketed by term); the probe is then
    partition-pruned exactly like the LSH signature index.

    Returns (id, n_occurrences) for docs containing the phrase at least
    once; oracle = the naive positional scan over the word arrays.
    """
    from .dedup import words

    terms = [t for t in phrase.strip().lower().split() if t]
    if not terms:
        raise ValueError("phrase_search needs a non-empty phrase")
    postings = (
        df.select(
            F.col(id_col).alias("id"),
            F.posexplode(words(F.col(text_col))).alias("pos", "word"),
        )
        .filter(F.col("word").isin(terms))
    )
    starts = (
        postings.filter(F.col("word") == terms[0])
        .select("id", F.col("pos").alias("start"))
    )
    for i, t in enumerate(terms[1:], start=1):
        nxt = postings.filter(F.col("word") == t).select(
            "id", (F.col("pos") - i).alias("start")
        )
        starts = starts.join(nxt, ["id", "start"])
    return (
        starts.groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
