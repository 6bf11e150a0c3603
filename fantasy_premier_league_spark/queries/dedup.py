"""Deduplication queries over the documents table.

ALL of the dedup family is hash-matched against the DuckDB oracle — including
MinHash+LSH and SimHash: the queries run the operators with ``portable=True``
(md5-derived base hash, bit-identical in any ANSI engine) and the oracle SQL
below replays the full sketch — shingle → 64 seeded permutations → banded
LSH self-join → signature-estimated Jaccard — value-for-value in DuckDB.
The SQL is generated from the same seeded permutation parameters the Spark
operator uses, so the check covers the hashing, the banding, and the
estimator, not just row counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..operators import dedup as D
from ..operators.dedup import _MASK30, _MERSENNE31, _hash_params
from . import query

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_WORDS = f"string_split({_NORM}, ' ')"

# shared shingle CTE body: distinct (id, 3-gram shingle) pairs
_SH_CTE = f"""sh AS (
        SELECT DISTINCT id, shingle FROM (
            SELECT doc_id AS id,
                   unnest(CASE WHEN len(w) >= 3
                               THEN list_transform(generate_series(1, len(w) - 2),
                                                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
                               ELSE []::VARCHAR[] END) AS shingle
            FROM (SELECT doc_id, {_WORDS} AS w FROM documents)
        )
    )"""


def _minhash_oracle(
    num_hashes: int, bands: int, threshold: float, seed: int, max_bucket_size: int | None = None
) -> str:
    """DuckDB SQL replaying minhash_dedup_pairs(portable=True) exactly:
    same md5-derived base hash, same seeded (a,b) permutation parameters,
    same banding, same agreement-fraction estimator. With
    ``max_bucket_size`` the candidate join is restricted to band buckets
    of at most that many members — replaying the Spark-side degenerate-
    bucket guard (operators/dedup.py::_cap_band_buckets) value-for-value."""
    params = _hash_params(num_hashes, seed)
    mins = ",\n               ".join(
        f"min((h * {a} + {b}) % {_MERSENNE31}) AS h{i}" for i, (a, b) in enumerate(params)
    )
    rpb = num_hashes // bands
    band_keys = ",\n                   ".join(
        f"'b{bidx}|' || " + " || ',' || ".join(f"h{bidx * rpb + j}::VARCHAR" for j in range(rpb))
        for bidx in range(bands)
    )
    eq_sum = " + ".join(f"(sa.h{i} = sb.h{i})::INT" for i in range(num_hashes))
    if max_bucket_size is not None:
        cap_cte = f""",
    keep AS (
        SELECT band_key FROM (
            SELECT band_key, count(*) AS n FROM banded GROUP BY band_key
        ) WHERE n <= {max_bucket_size}
    )"""
        banded_src = "(SELECT banded.* FROM banded JOIN keep USING (band_key))"
    else:
        cap_cte = ""
        banded_src = "banded"
    return f"""
    WITH {_SH_CTE},
    hv AS (
        SELECT id, ('0x' || substr(md5(shingle), 1, 8))::BIGINT & {_MASK30} AS h
        FROM sh
    ),
    sig AS (
        SELECT id, {mins}
        FROM hv GROUP BY id
    ),
    banded AS (
        SELECT id, unnest([{band_keys}]) AS band_key
        FROM sig
    ){cap_cte},
    cand AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM {banded_src} a JOIN {banded_src} b
        ON a.band_key = b.band_key AND a.id < b.id
    )
    SELECT c.id_a, c.id_b, round(({eq_sum}) / {num_hashes}.0, 6) AS jaccard_est
    FROM cand c
    JOIN sig sa ON sa.id = c.id_a
    JOIN sig sb ON sb.id = c.id_b
    WHERE round(({eq_sum}) / {num_hashes}.0, 6) >= {threshold}
    """


def _simhash_oracle(max_hamming: int) -> str:
    """DuckDB SQL replaying simhash_near_dup_pairs(portable=True): tf-weighted
    bit votes from the two md5 halves, 4x16-bit bands, exact hamming rerank."""
    sums = ",\n               ".join(
        f"sum(CASE WHEN ({'hlo' if i < 32 else 'hhi'} >> {i % 32}) & 1 = 1 THEN tf ELSE -tf END) AS b{i}"
        for i in range(64)
    )
    bitcols = ", ".join(f"(b{i} > 0)::INT AS s{i}" for i in range(64))
    band_keys = ",\n                   ".join(
        f"'b{bidx}|' || " + " || ".join(f"s{bidx * 16 + j}::VARCHAR" for j in range(16))
        for bidx in range(4)
    )
    ham = " + ".join(f"(sa.s{i} != sb.s{i})::INT" for i in range(64))
    return f"""
    WITH tf AS (
        SELECT doc_id AS id, w AS word, count(*) AS tf
        FROM (SELECT doc_id, unnest({_WORDS}) AS w FROM documents)
        WHERE w != ''
        GROUP BY 1, 2
    ),
    wh AS (
        SELECT id, tf,
               ('0x' || substr(md5(word), 1, 8))::BIGINT AS hlo,
               ('0x' || substr(md5(word), 9, 8))::BIGINT AS hhi
        FROM tf
    ),
    bitsum AS (
        SELECT id, {sums}
        FROM wh GROUP BY id
    ),
    bits AS (SELECT id, {bitcols} FROM bitsum),
    banded AS (
        SELECT id, unnest([{band_keys}]) AS band_key
        FROM bits
    ),
    cand AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM banded a JOIN banded b ON a.band_key = b.band_key AND a.id < b.id
    )
    SELECT c.id_a, c.id_b, ({ham}) AS hamming
    FROM cand c
    JOIN bits sa ON sa.id = c.id_a
    JOIN bits sb ON sb.id = c.id_b
    WHERE ({ham}) <= {max_hamming}
    """


@query(
    "v40_exact_dedup",
    f"""
    SELECT md5({_NORM}) AS content_key,
           min(doc_id) AS keep_doc_id,
           count(*) AS n_dups
    FROM documents
    GROUP BY 1
    """,
    doc="Exact dedup by normalized-content hash (hash-groupBy; A11/A12 "
    "analog). Representative = min doc_id.",
    tags=("dedup",),
)
def v40_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5(D.normalize_text(F.col("text"))).alias("content_key"))
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_dups"))
    )


@query(
    "v41_ngram_jaccard_pairs",
    f"""
    WITH sh AS (
        SELECT DISTINCT id, shingle FROM (
            SELECT doc_id AS id,
                   unnest(CASE WHEN len(w) >= 3
                               THEN list_transform(generate_series(1, len(w) - 2),
                                                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
                               ELSE []::VARCHAR[] END) AS shingle
            FROM (SELECT doc_id, {_WORDS} AS w FROM documents)
        )
    ),
    sizes AS (SELECT id, count(*) AS n_shingles FROM sh GROUP BY id),
    common AS (
        SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
        GROUP BY a.id, b.id
    )
    SELECT id_a, id_b, n_common,
           round(n_common / (sa.n_shingles + sb.n_shingles - n_common), 6) AS jaccard
    FROM common
    JOIN sizes sa ON sa.id = id_a
    JOIN sizes sb ON sb.id = id_b
    WHERE n_common / (sa.n_shingles + sb.n_shingles - n_common) >= 0.12
    """,
    doc="Exact n-gram (3-shingle) Jaccard near-dup pairs via inverted-index "
    "self-join — the exact-verification stage of a MinHash pipeline.",
    tags=("dedup", "jaccard"),
)
def v41_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return D.ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.12)


@query(
    "q38_dedup_threshold_curve",
    f"""
    WITH sh AS (
        SELECT DISTINCT id, shingle FROM (
            SELECT doc_id AS id,
                   unnest(CASE WHEN len(w) >= 3
                               THEN list_transform(generate_series(1, len(w) - 2),
                                                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
                               ELSE []::VARCHAR[] END) AS shingle
            FROM (SELECT doc_id, {_WORDS} AS w FROM documents)
        )
    ),
    sizes AS (SELECT id, count(*) AS n_shingles FROM sh GROUP BY id),
    common AS (
        SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
        GROUP BY a.id, b.id
    ),
    pairs AS (
        SELECT id_a, id_b,
               round(n_common / (sa.n_shingles + sb.n_shingles - n_common), 6) AS jaccard
        FROM common
        JOIN sizes sa ON sa.id = id_a
        JOIN sizes sb ON sb.id = id_b
        WHERE n_common / (sa.n_shingles + sb.n_shingles - n_common) >= 0.12
    ),
    th AS (SELECT unnest(generate_series(2, 9)) / 10.0 AS threshold),
    f AS (
        SELECT th.threshold, p.id_a, p.id_b
        FROM pairs p JOIN th ON p.jaccard >= th.threshold
    ),
    pc AS (SELECT threshold, count(*)::BIGINT AS n_pairs FROM f GROUP BY 1),
    dc AS (
        SELECT threshold, count(DISTINCT id)::BIGINT AS n_docs
        FROM (SELECT threshold, unnest([id_a, id_b]) AS id FROM f)
        GROUP BY 1
    )
    SELECT th.threshold,
           coalesce(pc.n_pairs, 0)::BIGINT AS n_pairs,
           coalesce(dc.n_docs, 0)::BIGINT AS n_docs
    FROM th LEFT JOIN pc USING (threshold) LEFT JOIN dc USING (threshold)
    """,
    doc="Dedup-rate-vs-threshold curve — the tuning readout a corpus "
    "curator reads BEFORE picking a near-dup threshold: for each "
    "candidate tau in 0.2..0.9, how many exact-Jaccard pairs survive "
    "and how many distinct documents they touch. One exact-pair pass "
    "(v41's inverted-index self-join at a permissive 0.12 floor) fans "
    "out through a broadcast 8-row threshold frame — the curve costs "
    "one pair enumeration, not eight. At scale the base pass swaps to "
    "the banded MinHash candidates (v42) unchanged: the curve only "
    "consumes (id_a, id_b, jaccard). Zero-pair thresholds stay visible "
    "as explicit 0 rows (left join from the threshold frame).",
    tags=("dedup", "jaccard", "evaluation", "llm-pipeline"),
)
def q38_dedup_threshold_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.12)
    th = spark.range(2, 10).select((F.col("id") / F.lit(10.0)).alias("threshold"))
    f = pairs.join(
        F.broadcast(th), F.col("jaccard") >= F.col("threshold")
    ).select("threshold", "id_a", "id_b")
    pc = f.groupBy("threshold").agg(F.count(F.lit(1)).alias("n_pairs"))
    dc = (
        f.select("threshold", F.explode(F.array("id_a", "id_b")).alias("id"))
        .groupBy("threshold")
        .agg(F.countDistinct("id").alias("n_docs"))
    )
    # pc/dc are <= 8 rows by construction — broadcast them so the curve
    # assembly never sorts (SMJ) an 8-row frame
    return (
        th.join(F.broadcast(pc), "threshold", "left")
        .join(F.broadcast(dc), "threshold", "left")
        .select(
            "threshold",
            F.coalesce("n_pairs", F.lit(0).cast("long")).alias("n_pairs"),
            F.coalesce("n_docs", F.lit(0).cast("long")).alias("n_docs"),
        )
    )


@query(
    "v36_source_overlap",
    f"""
    WITH pairs AS ({_minhash_oracle(num_hashes=64, bands=16, threshold=0.5, seed=42)}),
    meta AS (SELECT doc_id, source FROM documents),
    tagged AS (
        SELECT least(ma.source, mb.source) AS source_a,
               greatest(ma.source, mb.source) AS source_b,
               p.id_a, p.id_b
        FROM pairs p
        JOIN meta ma ON ma.doc_id = p.id_a
        JOIN meta mb ON mb.doc_id = p.id_b
    ),
    ex AS (
        SELECT source_a, source_b, unnest([id_a, id_b]) AS doc FROM tagged
    )
    SELECT source_a, source_b,
           (count(*) / 2)::BIGINT AS n_dup_pairs,
           count(DISTINCT doc)::BIGINT AS n_docs_involved
    FROM ex
    GROUP BY source_a, source_b
    """,
    doc="Cross-SOURCE duplication matrix: MinHash-LSH near-dup pairs "
    "(est. Jaccard >= 0.5) tagged with both documents' sources and "
    "aggregated per unordered source pair — the 'which domains "
    "duplicate each other' diagnostic a curation pipeline reads before "
    "setting mixture weights (two mirrors of the same crawl show up as "
    "an off-diagonal spike; within-source boilerplate as a diagonal "
    "one). Reuses the portable sketch, so the oracle replays hashing, "
    "banding, estimation, the source tagging and the matrix exactly. "
    "Scale shape: the sketch's own shuffles plus two broadcast-able "
    "doc->source joins and a source-pair-bounded aggregate.",
    tags=("dedup", "curation", "llm-pipeline"),
)
def v36_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    pairs = D.minhash_dedup_pairs(
        docs, "doc_id", "text", n=3, num_hashes=64, bands=16, est_threshold=0.5, portable=True
    )
    meta = docs.select("doc_id", "source")
    # no explicit broadcast on the doc->source joins: the meta frame is
    # corpus-sized (AQE broadcasts it at test SFs; at 100 TB these are
    # id-keyed shuffle joins of a 2-column projection, which is correct)
    tagged = (
        pairs.join(meta.withColumnsRenamed({"doc_id": "id_a", "source": "__sa"}), "id_a")
        .join(meta.withColumnsRenamed({"doc_id": "id_b", "source": "__sb"}), "id_b")
        .select(
            F.least("__sa", "__sb").alias("source_a"),
            F.greatest("__sa", "__sb").alias("source_b"),
            "id_a",
            "id_b",
        )
    )
    # one endpoint-exploded pass: every pair contributes exactly 2 rows
    # (so pairs = rows/2) and the distinct-doc count is over the UNION of
    # endpoints — countDistinct(id_a) + countDistinct(id_b) would count a
    # doc appearing on both sides of different pairs twice (code review)
    ex = tagged.select(
        "source_a", "source_b", F.explode(F.array("id_a", "id_b")).alias("doc")
    )
    return ex.groupBy("source_a", "source_b").agg(
        (F.count(F.lit(1)) / 2).cast("long").alias("n_dup_pairs"),
        F.countDistinct("doc").cast("long").alias("n_docs_involved"),
    )


@query(
    "v45_curate_corpus",
    f"""
    WITH t AS (
        SELECT doc_id, {_WORDS} AS w FROM documents
    ),
    scored AS (
        SELECT doc_id,
               0.4 * (CASE WHEN len(w) BETWEEN 20 AND 1000 THEN 1.0
                           WHEN len(w) < 20 THEN len(w) / 20.0
                           ELSE 1000.0 / len(w) END)
             + 0.3 * (len(list_filter(w, t -> regexp_full_match(t, '[a-z]+'))) / len(w))
             + 0.3 * (len(list_distinct(w)) / len(w)) AS quality
        FROM t
    ),
    sh AS (
        SELECT DISTINCT id, shingle FROM (
            SELECT doc_id AS id,
                   unnest(CASE WHEN len(w) >= 3
                               THEN list_transform(generate_series(1, len(w) - 2),
                                                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
                               ELSE []::VARCHAR[] END) AS shingle
            FROM (SELECT doc_id, {_WORDS} AS w FROM documents)
        )
    ),
    sizes AS (SELECT id, count(*) AS n_shingles FROM sh GROUP BY id),
    dup_losers AS (
        SELECT DISTINCT b.id AS id_b
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
        JOIN sizes sa ON sa.id = a.id
        JOIN sizes sb ON sb.id = b.id
        GROUP BY a.id, b.id, sa.n_shingles, sb.n_shingles
        HAVING count(*) / (sa.n_shingles + sb.n_shingles - count(*)) >= 0.12
    )
    SELECT s.doc_id, round(s.quality, 6) AS quality
    FROM scored s
    WHERE s.quality >= 0.75 AND s.doc_id NOT IN (SELECT id_b FROM dup_losers)
    """,
    doc="Corpus curation capstone: quality-score filter (>= 0.75) composed "
    "with near-dup removal (n-gram Jaccard >= 0.12 pairs; the higher id of "
    "each pair is dropped — the keep-lowest-id rule). The full "
    "training-data cleaning shape: score -> dedup -> filter in one lazy "
    "plan, every stage JVM-side.",
    tags=("dedup", "curation"),
)
def v45_curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import textstats

    docs = load(spark, sf_dir, "documents")
    quality = textstats.quality_score(docs, "doc_id", "text").select(
        "doc_id", "quality"
    )
    losers = (
        D.ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.12)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    return (
        quality.filter(F.col("quality") >= 0.75)
        .join(losers, "doc_id", "left_anti")
        .select("doc_id", "quality")
    )


@query(
    "q47_minhash_lsh_pairs",
    _minhash_oracle(num_hashes=64, bands=16, threshold=0.3, seed=42),
    doc="MinHash(64 hashes) + 16-band LSH candidate pairs with signature- "
    "estimated Jaccard >= 0.3. Portable md5-derived base hash + seeded "
    "permutations, so the DuckDB oracle replays the ENTIRE sketch "
    "value-for-value; candidates generated per LSH bucket, never all-pairs "
    "— the 100 TB dedup path.",
    tags=("dedup", "minhash"),
)
def q47_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return D.minhash_dedup_pairs(
        docs, "doc_id", "text", n=3, num_hashes=64, bands=16, est_threshold=0.3, portable=True
    )


@query(
    "v96_capped_lsh_pairs",
    _minhash_oracle(num_hashes=64, bands=16, threshold=0.2, seed=42, max_bucket_size=2),
    doc="MinHash LSH pairs under the degenerate-bucket guard "
    "(max_bucket_size=2): band buckets with more than two members are "
    "dropped before the candidate self-join — the cap that keeps one "
    "boilerplate bucket from becoming an O(b^2) task at corpus scale "
    "(operators/dedup.py::_cap_band_buckets; dropped buckets are "
    "logged, never silent). The oracle replays sketch, banding, bucket "
    "counting, the cap, and the estimator value-for-value, so the "
    "guard's exact semantics — not just its row count — are checked.",
    tags=("dedup", "minhash", "guard", "llm-pipeline"),
)
def v96_capped_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return D.minhash_dedup_pairs(
        docs,
        "doc_id",
        "text",
        n=3,
        num_hashes=64,
        bands=16,
        est_threshold=0.2,
        portable=True,
        max_bucket_size=2,
    )


@query(
    "v43_simhash_near_dups",
    _simhash_oracle(max_hamming=12),
    doc="SimHash-64 near-dup candidate pairs (4×16-bit bands, exact hamming "
    "<= 12 rerank). Portable md5-half word hashes — oracle replays the "
    "fingerprint bit-for-bit.",
    tags=("dedup", "simhash"),
)
def v43_simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return D.simhash_near_dup_pairs(docs, "doc_id", "text", max_hamming=12, portable=True)


def _cluster_oracle(max_hamming: int) -> str:
    """Recursive min-label closure over the SimHash pair graph: DuckDB
    replays the pair generation (same SQL as q43) and then the connected-
    components result — every node's cluster is the min reachable id,
    which is exactly what label propagation converges to."""
    pairs_sql = _simhash_oracle(max_hamming)
    return f"""
    WITH RECURSIVE pairs AS (
        {pairs_sql}
    ),
    edges AS (
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION
        SELECT id_b AS u, id_a AS v FROM pairs
    ),
    nodes AS (SELECT DISTINCT u AS id FROM edges),
    reach AS (
        SELECT id, id AS label FROM nodes
        UNION
        SELECT e.v AS id, r.label FROM reach r JOIN edges e ON r.id = e.u
    )
    SELECT id AS doc_id, min(label)::BIGINT AS cluster_id
    FROM reach GROUP BY id
    """


@query(
    "q43_dedup_clusters",
    _cluster_oracle(max_hamming=8),
    doc="Duplicate-group formation — the final dedup step at 100 TB: "
    "SimHash near-dup pairs (q43's graph) -> connected components "
    "(operators/dedup.py::connected_components, min-label propagation, one "
    "edge-keyed shuffle per round, fixpoint in ~diameter rounds) -> "
    "(doc, cluster) with the min doc id as the canonical survivor. The "
    "DuckDB oracle replays pair generation AND the component closure via a "
    "recursive CTE, so the iterative distributed algorithm is value-hash "
    "checked end-to-end.",
    tags=("dedup", "graph", "iterative"),
)
def q43_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    # hamming <= 8: TIGHT near-dup groups (the survivor-selection use case);
    # q43's looser <=12 radius is for recall-side candidate review
    pairs = D.simhash_near_dup_pairs(docs, "doc_id", "text", max_hamming=8, portable=True)
    cc = D.connected_components(pairs)
    return cc.select(F.col("id").alias("doc_id"), "cluster_id")


@query(
    "v33_cluster_representatives",
    f"""
    WITH RECURSIVE pairs AS (
        {_simhash_oracle(8)}
    ),
    edges AS (
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION
        SELECT id_b AS u, id_a AS v FROM pairs
    ),
    nodes AS (SELECT DISTINCT u AS id FROM edges),
    reach AS (
        SELECT id, id AS label FROM nodes
        UNION
        SELECT e.v AS id, r.label FROM reach r JOIN edges e ON r.id = e.u
    ),
    cc AS (SELECT id AS doc_id, min(label)::BIGINT AS cluster_id FROM reach GROUP BY id),
    scored AS (
        SELECT doc_id,
               round(0.4 * (CASE WHEN len(w) BETWEEN 20 AND 1000 THEN 1.0
                           WHEN len(w) < 20 THEN len(w) / 20.0
                           ELSE 1000.0 / len(w) END)
             + 0.3 * (len(list_filter(w, t -> regexp_full_match(t, '[a-z]+'))) / len(w))
             + 0.3 * (len(list_distinct(w)) / len(w)), 6) AS quality
        FROM (SELECT doc_id, {_WORDS} AS w FROM documents)
    ),
    members AS (
        SELECT s.doc_id, coalesce(cc.cluster_id, s.doc_id) AS cluster_id, s.quality
        FROM scored s LEFT JOIN cc ON cc.doc_id = s.doc_id
    )
    SELECT cluster_id,
           doc_id AS rep_doc_id,
           n_members,
           quality AS rep_quality
    FROM (
        SELECT *,
               row_number() OVER (PARTITION BY cluster_id ORDER BY quality DESC, doc_id) AS rn,
               count(*) OVER (PARTITION BY cluster_id)::BIGINT AS n_members
        FROM members
    ) WHERE rn = 1
    """,
    doc="Curation capstone: duplicate clusters (q29's SimHash -> connected "
    "components) with the BEST-quality member kept per cluster instead of "
    "min-id — the survivor-selection policy real corpus dedup wants "
    "(quality argmax, doc-id tie-break; singletons represent themselves "
    "via a left join, no second pass). One lazy plan composes the "
    "iterative closure, the quality scorer, and the argmax window; the "
    "oracle replays sketch, recursive closure, scoring, and selection.",
    tags=("dedup", "curation", "graph", "llm-pipeline"),
)
def v33_cluster_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import textstats

    docs = load(spark, sf_dir, "documents")
    pairs = D.simhash_near_dup_pairs(docs, "doc_id", "text", max_hamming=8, portable=True)
    cc = D.connected_components(pairs)
    quality = textstats.quality_score(docs, "doc_id", "text").select("doc_id", "quality")
    members = quality.join(
        cc.withColumnRenamed("id", "doc_id"), "doc_id", "left"
    ).withColumn("cluster_id", F.coalesce("cluster_id", "doc_id"))
    from pyspark.sql import Window as W

    w = W.partitionBy("cluster_id")
    ordered = W.partitionBy("cluster_id").orderBy(F.desc("quality"), F.asc("doc_id"))
    return (
        members.withColumn("__rn", F.row_number().over(ordered))
        .withColumn("n_members", F.count(F.lit(1)).over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("rep_doc_id"),
            "n_members",
            F.col("quality").alias("rep_quality"),
        )
    )


@query(
    "q26_passage_dedup",
    f"""
    WITH w AS (SELECT doc_id, {_WORDS} AS words FROM documents),
    p AS (
        SELECT doc_id,
               unnest(list_transform(
                   generate_series(0, ((len(words) + 9) // 10) - 1),
                   i -> array_to_string(words[(i * 10 + 1):(i * 10 + 10)], ' '))) AS passage
        FROM w
    ),
    freq AS (SELECT passage, count(*) AS n_occ FROM p GROUP BY passage)
    SELECT p.doc_id,
           count(*)::BIGINT AS n_passages,
           count(*) FILTER (WHERE freq.n_occ > 1)::BIGINT AS n_dup_passages,
           round(count(*) FILTER (WHERE freq.n_occ > 1)::DOUBLE / count(*), 6) AS dup_ratio
    FROM p JOIN freq USING (passage)
    GROUP BY p.doc_id
    """,
    doc="Passage-level (sub-document) dedup — the unit real corpus "
    "pipelines dedup at when whole-document hashes miss boilerplate "
    "shared across pages: normalized text splits into non-overlapping "
    "10-word passages, a hash-groupBy counts each passage's corpus-wide "
    "occurrences, and every doc gets its duplicated-passage ratio. Two "
    "shuffles (passage frequency, doc rollup), both on high-cardinality "
    "keys; the passage explode is the only fan-out (~n_words/10 rows per "
    "doc). At 100 TB the frequency table is the same hash-groupBy that "
    "exact dedup uses — linear, uniform keys.",
    tags=("dedup", "text", "llm-pipeline"),
)
def q26_passage_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..catalog import spread_partitions

    # the passage explode feeds TWO consumers (the frequency aggregate
    # and the join side), so the tokenize runs twice — each pass was one
    # 0.7s single-core task on the local single-file scan. Spread the
    # scan (no-op at real scale); the two passes stay (materializing the
    # corpus-sized passage stream would cost more than re-tokenizing,
    # the q15 caching rule), they just parallelize.
    docs = spread_partitions(load(spark, sf_dir, "documents"))
    words = D.words(F.col("text"))
    n_pass = F.ceil(F.size(words) / F.lit(10)).cast("int")
    passages = docs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_pass - 1),
                lambda i: F.array_join(F.slice(words, i * 10 + 1, 10), " "),
            )
        ).alias("passage"),
    )
    freq = passages.groupBy("passage").agg(F.count(F.lit(1)).alias("n_occ"))
    dup = (F.col("n_occ") > 1).cast("int")
    return (
        passages.join(freq, "passage")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_passages"),
            F.sum(dup).alias("n_dup_passages"),
            F.round(F.sum(dup) / F.count(F.lit(1)), 6).alias("dup_ratio"),
        )
    )


@query(
    "v89_repetition_score",
    f"""
    WITH w AS (
        SELECT doc_id, unnest({_WORDS}) AS word FROM documents
    ),
    wf AS (SELECT doc_id, word, count(*) AS n FROM w GROUP BY doc_id, word)
    SELECT doc_id,
           sum(n)::BIGINT AS n_words,
           count(*)::BIGINT AS n_distinct,
           round(count(*)::DOUBLE / sum(n), 6) AS distinct_ratio,
           round(max(n)::DOUBLE / sum(n), 6) AS top_word_ratio
    FROM wf GROUP BY doc_id
    """,
    doc="Within-document repetition quality signal (the Gopher-style "
    "repetition filters): distinct-word ratio and the mass of the single "
    "most frequent word. One explode + one (doc_id, word) hash-groupBy + "
    "one doc rollup — high-cardinality composite key, partial aggregation "
    "map-side, no window. Pairs with q31's surface-quality score to form "
    "the standard two-axis quality filter.",
    tags=("text", "quality", "llm-pipeline"),
)
def v89_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    wf = (
        docs.select("doc_id", F.explode(D.words(F.col("text"))).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return wf.groupBy("doc_id").agg(
        F.sum("n").alias("n_words"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.round(F.count(F.lit(1)) / F.sum("n"), 6).alias("distinct_ratio"),
        F.round(F.max("n") / F.sum("n"), 6).alias("top_word_ratio"),
    )


def _minhash_incremental_oracle(num_hashes: int, bands: int, threshold: float, seed: int) -> str:
    """DuckDB SQL replaying minhash_incremental_pairs(portable=True): the
    full sketch for BOTH sides (same md5 base hash + seeded permutations),
    banded join restricted to new-batch (doc_id % 3 = 0) vs index rows."""
    params = _hash_params(num_hashes, seed)
    mins = ",\n               ".join(
        f"min((h * {a} + {b}) % {_MERSENNE31}) AS h{i}" for i, (a, b) in enumerate(params)
    )
    rpb = num_hashes // bands
    band_keys = ",\n                   ".join(
        f"'b{bidx}|' || " + " || ',' || ".join(f"h{bidx * rpb + j}::VARCHAR" for j in range(rpb))
        for bidx in range(bands)
    )
    eq_sum = " + ".join(f"(sa.h{i} = sb.h{i})::INT" for i in range(num_hashes))
    return f"""
    WITH {_SH_CTE},
    hv AS (
        SELECT id, ('0x' || substr(md5(shingle), 1, 8))::BIGINT & {_MASK30} AS h
        FROM sh
    ),
    sig AS (
        SELECT id, {mins}
        FROM hv GROUP BY id
    ),
    banded AS (
        SELECT id, unnest([{band_keys}]) AS band_key
        FROM sig
    ),
    cand AS (
        SELECT DISTINCT a.id AS new_id, b.id AS index_id
        FROM banded a JOIN banded b
          ON a.band_key = b.band_key AND a.id % 3 = 0 AND b.id % 3 != 0
    )
    SELECT c.new_id, c.index_id, round(({eq_sum}) / {num_hashes}.0, 6) AS jaccard_est
    FROM cand c
    JOIN sig sa ON sa.id = c.new_id
    JOIN sig sb ON sb.id = c.index_id
    WHERE round(({eq_sum}) / {num_hashes}.0, 6) >= {threshold}
    """


@query(
    "q48_incremental_dedup",
    _minhash_incremental_oracle(num_hashes=64, bands=16, threshold=0.3, seed=42),
    doc="Incremental dedup — a new ingest batch (doc_id % 3 == 0) checked "
    "against the stored MinHash signature index of the existing corpus "
    "(the rest): only the new batch is sketched; candidates come from the "
    "new-bands ⋈ index-bands join (at scale: band-partitioned index table, "
    "partition-pruned bucket probing), estimates from signature agreement. "
    "The oracle replays both sides' sketches and the asymmetric band join "
    "value-for-value.",
    tags=("dedup", "minhash", "incremental", "llm-pipeline"),
)
def q48_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    index_docs = docs.filter(F.col("doc_id") % 3 != 0)
    new_batch = docs.filter(F.col("doc_id") % 3 == 0)
    index_sigs = D.minhash_signatures(
        index_docs, "doc_id", "text", n=3, num_hashes=64, seed=42, portable=True
    )
    return D.minhash_incremental_pairs(
        new_batch, index_sigs, "doc_id", "text",
        n=3, num_hashes=64, bands=16, est_threshold=0.3, portable=True,
    )


_NAIVE_T03 = f"""
    WITH {_SH_CTE},
    sizes AS (SELECT id, count(*) AS n_shingles FROM sh GROUP BY id),
    common AS (
        SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
        GROUP BY a.id, b.id
    )
    SELECT id_a, id_b
    FROM common
    JOIN sizes sa ON sa.id = id_a
    JOIN sizes sb ON sb.id = id_b
    WHERE n_common / (sa.n_shingles + sb.n_shingles - n_common) >= 0.3
"""


@query(
    "q45_lsh_recall_eval",
    f"""
    WITH lsh AS (
        SELECT id_a, id_b FROM ({_minhash_oracle(num_hashes=64, bands=16, threshold=0.3, seed=42)})
    ),
    ex AS (
        SELECT id_a, id_b FROM ({_NAIVE_T03})
    ),
    c AS (
        SELECT (SELECT count(*) FROM lsh)::BIGINT AS lsh_pairs,
               (SELECT count(*) FROM ex)::BIGINT AS exact_pairs,
               (SELECT count(*) FROM lsh JOIN ex USING (id_a, id_b))::BIGINT AS hits
    )
    SELECT lsh_pairs, exact_pairs, hits,
           CASE WHEN lsh_pairs > 0
                THEN round(hits / lsh_pairs::DOUBLE, 6) END AS prec,
           CASE WHEN exact_pairs > 0
                THEN round(hits / exact_pairs::DOUBLE, 6) END AS recall
    FROM c
    """,
    doc="In-engine evaluation of the MinHash-LSH dedup path against "
    "ground truth: the sketch's candidate pairs (q42's operator, "
    "portable hashing) joined against the exact Jaccard >= 0.3 pairs "
    "(q41's operator) to yield pair-level precision and recall — the "
    "dedup sibling of q96's ANN recall eval, answering 'how much does "
    "the sketch miss?' as a query instead of a notebook. The oracle "
    "replays BOTH pipelines (full sketch replay + naive join) and the "
    "evaluation join value-for-value. Empty sides yield null metrics.",
    tags=("dedup", "minhash", "evaluation", "llm-pipeline"),
)
def q45_lsh_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    # both pair sets are distinct-by-construction (band candidates are
    # deduped; the exact side is one row per grouped pair), so the three
    # counts (|lsh|, |exact|, |lsh ∩ exact|) all fall out of ONE tagged
    # full-outer join + ONE aggregate: each child pipeline executes exactly
    # once as a join input and nothing needs a persist or its own count
    # job (the previous form paid two cache materializations plus three
    # aggregate jobs for the same numbers).
    lsh = (
        D.minhash_dedup_pairs(
            docs, "doc_id", "text", n=3, num_hashes=64, bands=16, est_threshold=0.3, portable=True
        )
        .select("id_a", "id_b")
        .withColumn("__l", F.lit(1))
    )
    exact = (
        D.ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.3)
        .select("id_a", "id_b")
        .withColumn("__e", F.lit(1))
    )
    row = lsh.join(exact, ["id_a", "id_b"], "full_outer").agg(
        F.count("__l").alias("lsh_pairs"),
        F.count("__e").alias("exact_pairs"),
        F.count(F.when(F.col("__l").isNotNull() & F.col("__e").isNotNull(), 1)).alias("hits"),
    )
    prec = F.when(
        F.col("lsh_pairs") > 0, F.round(F.col("hits") / F.col("lsh_pairs"), 6)
    ).otherwise(F.lit(None).cast("double"))
    rec = F.when(
        F.col("exact_pairs") > 0, F.round(F.col("hits") / F.col("exact_pairs"), 6)
    ).otherwise(F.lit(None).cast("double"))
    return row.select(
        "lsh_pairs", "exact_pairs", "hits", prec.alias("prec"), rec.alias("recall")
    )


@query(
    "q44_cc_star",
    _cluster_oracle(max_hamming=8),
    doc="Duplicate-group formation via ALTERNATING small-star/large-star "
    "contraction (operators/dedup.py::connected_components_star, Kiveris "
    "et al. SoCC'14) over the q29 SimHash pair graph — the hub-robust "
    "closure for graphs where min-label propagation's per-round message "
    "join would fan a high-degree node's whole neighborhood into one "
    "reduce group. Both phases are partial-aggregated groupBy(min) + "
    "join-back (map-side combine absorbs the hub), edge count is "
    "non-increasing, and convergence is O(log^2 n) rounds. Same output "
    "contract as q29 (cluster = min reachable id), checked against the "
    "same recursive-CTE oracle.",
    tags=("dedup", "graph", "iterative"),
)
def q44_cc_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    pairs = D.simhash_near_dup_pairs(docs, "doc_id", "text", max_hamming=8, portable=True)
    cc = D.connected_components_star(pairs)
    return cc.select(F.col("id").alias("doc_id"), "cluster_id")


_SPAN_K = 10


@query(
    "v05_span_dedup",
    f"""
    WITH w AS (SELECT doc_id, {_WORDS} AS words FROM documents),
    win AS (
        SELECT doc_id, i AS start,
               array_to_string(words[(i + 1):(i + {_SPAN_K})], ' ') AS span
        FROM w, LATERAL unnest(generate_series(0, len(words) - {_SPAN_K})) AS t(i)
        WHERE len(words) >= {_SPAN_K}
    ),
    dupspan AS (SELECT span FROM win GROUP BY span HAVING count(*) >= 2),
    dup AS (SELECT doc_id, start FROM win JOIN dupspan USING (span)),
    cov AS (
        SELECT DISTINCT doc_id, start + j AS pos
        FROM dup, LATERAL unnest(generate_series(0, {_SPAN_K - 1})) AS u(j)
    ),
    toks AS (
        SELECT doc_id, i - 1 AS pos, words[i] AS tok
        FROM w, LATERAL unnest(generate_series(1, len(words))) AS t(i)
    ),
    kept AS (SELECT t.doc_id, t.pos, t.tok FROM toks t ANTI JOIN cov c USING (doc_id, pos)),
    agg AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS cleaned_text FROM kept GROUP BY doc_id),
    d AS (SELECT doc_id, count(*)::BIGINT AS n_dup_spans FROM dup GROUP BY doc_id),
    c2 AS (SELECT doc_id, count(*)::BIGINT AS n_covered FROM cov GROUP BY doc_id)
    SELECT w.doc_id AS id, len(w.words)::BIGINT AS n_words,
           coalesce(d.n_dup_spans, 0)::BIGINT AS n_dup_spans,
           coalesce(c2.n_covered, 0)::BIGINT AS n_covered,
           coalesce(agg.cleaned_text, '') AS cleaned_text
    FROM w
    LEFT JOIN d ON d.doc_id = w.doc_id
    LEFT JOIN c2 ON c2.doc_id = w.doc_id
    LEFT JOIN agg ON agg.doc_id = w.doc_id
    """,
    doc="Exact-substring span dedup with destructive trimming (Lee et "
    "al. ACL 2022, the suffix-array pass re-expressed as a sliding "
    f"{_SPAN_K}-word rolling window over a hash-groupBy — "
    "operators/curation.py::trim_duplicate_spans): any run of >= k "
    "words whose normalized text occurs twice anywhere in the corpus "
    "(including twice in ONE doc) is cut from every document, and the "
    "text is rebuilt from the surviving token positions. Catches the "
    "boundary-straddling and offset-shifted duplicates the fixed "
    "10-word passage form (q38) structurally misses. The oracle "
    "replays windows, frequency cut, position blacklist, and the "
    "ordered reconstruction value-for-value, cleaned text included.",
    tags=("dedup", "text", "llm-pipeline"),
)
def v05_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import trim_duplicate_spans

    docs = load(spark, sf_dir, "documents")
    return trim_duplicate_spans(docs, "doc_id", "text", k=_SPAN_K, min_occ=2)


@query(
    "q40_cluster_agreement",
    f"""
    WITH RECURSIVE lshp AS (
        SELECT id_a, id_b FROM ({_minhash_oracle(num_hashes=64, bands=16, threshold=0.3, seed=42)})
    ),
    exp_ AS (
        SELECT id_a, id_b FROM ({_NAIVE_T03})
    ),
    ea AS (SELECT id_a AS u, id_b AS v FROM lshp UNION SELECT id_b, id_a FROM lshp),
    eb AS (SELECT id_a AS u, id_b AS v FROM exp_ UNION SELECT id_b, id_a FROM exp_),
    ra AS (
        SELECT u AS id, u AS label FROM (SELECT DISTINCT u FROM ea)
        UNION
        SELECT e.v, r.label FROM ra r JOIN ea e ON r.id = e.u
    ),
    rb AS (
        SELECT u AS id, u AS label FROM (SELECT DISTINCT u FROM eb)
        UNION
        SELECT e.v, r.label FROM rb r JOIN eb e ON r.id = e.u
    ),
    ca AS (SELECT id, min(label) AS c FROM ra GROUP BY id),
    cb AS (SELECT id, min(label) AS c FROM rb GROUP BY id),
    part AS (
        SELECT d.doc_id,
               coalesce(ca.c, d.doc_id) AS c_lsh,
               coalesce(cb.c, d.doc_id) AS c_exact
        FROM documents d
        LEFT JOIN ca ON ca.id = d.doc_id
        LEFT JOIN cb ON cb.id = d.doc_id
    ),
    cont AS (SELECT c_lsh, c_exact, count(*) AS nij FROM part GROUP BY 1, 2),
    arow AS (SELECT c_lsh, sum(nij) AS ai FROM cont GROUP BY 1),
    bcol AS (SELECT c_exact, sum(nij) AS bj FROM cont GROUP BY 1),
    s AS (
        SELECT (SELECT count(*) FROM part)::BIGINT AS n,
               (SELECT count(*) FROM arow)::BIGINT AS clusters_lsh,
               (SELECT count(*) FROM bcol)::BIGINT AS clusters_exact,
               (SELECT sum(nij * (nij - 1) / 2) FROM cont)::BIGINT AS comb_ij,
               (SELECT sum(ai * (ai - 1) / 2) FROM arow)::BIGINT AS comb_a,
               (SELECT sum(bj * (bj - 1) / 2) FROM bcol)::BIGINT AS comb_b
    )
    SELECT n AS n_docs, clusters_lsh, clusters_exact, comb_ij, comb_a, comb_b,
           CASE WHEN (comb_a + comb_b) / 2.0 - comb_a::DOUBLE * comb_b / (n * (n - 1) / 2.0) = 0
                THEN NULL
                ELSE round((comb_ij - comb_a::DOUBLE * comb_b / (n * (n - 1) / 2.0))
                           / ((comb_a + comb_b) / 2.0 - comb_a::DOUBLE * comb_b / (n * (n - 1) / 2.0)), 6)
           END AS ari
    FROM s
    """,
    doc="CLUSTER-level agreement between the MinHash-LSH dedup partition "
    "and the exact-Jaccard partition — the Adjusted Rand Index over the "
    "two cluster assignments (q37 answers 'which candidate PAIRS does "
    "the sketch miss'; this answers 'how differently would the corpus "
    "actually partition', the metric that matters when a whole near-dup "
    "GROUP fuses or splits). Both pipelines run in-engine: pairs -> "
    "connected components -> full partition (unpaired docs are "
    "singletons of their own id) -> contingency table -> pair-counting "
    "ARI from C(n,2) sums in 64-bit integer arithmetic (exactness "
    "bounds documented on pair_counting_ari). The "
    "oracle replays both sketches, both recursive closures, and the "
    "arithmetic; ARI is NULL when the expected and maximum indices "
    "coincide (both partitions all-singletons). Above 10k docs both "
    "pipelines run on the same deterministic md5-sampled ~10k-doc "
    "stratum (q02's convention: ground-truth evaluation is sampled at "
    "scale, full-replayed at every driver/oracle SF).",
    tags=("dedup", "evaluation", "llm-pipeline"),
)
def q40_cluster_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    # The exact n-gram side is evaluation ground truth exactly like
    # q02's: full replay is super-linear in corpus density (sf1 measured
    # 53.5s on 10x sf0.1's data) and exists only to grade the sketch.
    # Past the bound, BOTH pipelines run on the same deterministic
    # md5-sampled document stratum (~10k docs): the metric becomes the
    # ARI between the two partitions OF THE SAMPLED SUBCORPUS — a
    # consistent agreement estimate at bounded cost (documented with a
    # measured estimate-vs-full row in SCALE.md) — while every
    # driver/oracle SF stays below the bound on full replay,
    # value-identical to the oracle SQL.
    full_replay_max_docs = 10_000
    n_docs = docs.count()
    if n_docs > full_replay_max_docs:
        p = full_replay_max_docs / n_docs
        docs = docs.filter(D.md5_fraction(F.col("doc_id"), salt="cluster_agreement:") < F.lit(p))
    # TOKENIZE ONCE: the sketch side and the exact side both consume the
    # per-doc shingle arrays — without the shared frame each pipeline
    # re-tokenizes the corpus (measured ~0.5s of the sf0.1 warm runtime).
    # Eager: two independent subtrees consume it inside one action, so a
    # lazy cut would race them into recomputing (cache.py contract).
    from ..operators.cache import tracked_materialize

    arr = tracked_materialize(
        D.doc_shingle_arrays(docs, "doc_id", "text", 3), eager=True
    )
    lsh = D.minhash_dedup_pairs(
        docs, "doc_id", "text", n=3, num_hashes=64, bands=16, est_threshold=0.3,
        portable=True, shingle_arrays=arr,
    )
    exact = D.ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.3, shingle_arrays=arr
    )
    # The two pipelines are independent until the partition join, and
    # each one is a chain of ~10 SMALL jobs (profiled: 21 jobs total,
    # none above 0.25s wall, job-gap driver orchestration ≈ half the
    # runtime) ending in a bounded union-find collect. Overlap them on
    # two driver threads (guide §2.6): one side's scheduling gaps and
    # straggler tails back-fill with the other side's tasks. Both sides
    # read the SAME eagerly-materialized shingle frame, so no work is
    # duplicated; cache tracking is append-only under the GIL and
    # release is idempotent.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        fa = pool.submit(D.connected_components, lsh)
        fb = pool.submit(D.connected_components, exact)
        pa = fa.result()
        pb = fb.result()
    part = (
        docs.select("doc_id")
        .join(pa.withColumnsRenamed({"id": "doc_id", "cluster_id": "__ca"}), "doc_id", "left")
        .join(pb.withColumnsRenamed({"id": "doc_id", "cluster_id": "__cb"}), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("__ca", "doc_id").alias("c_lsh"),
            F.coalesce("__cb", "doc_id").alias("c_exact"),
        )
    )
    return pair_counting_ari(part)


def pair_counting_ari(part: DataFrame) -> DataFrame:
    """Pair-counting Adjusted Rand Index over a (doc_id, c_lsh, c_exact)
    partition frame — one row: (n_docs, clusters_lsh, clusters_exact,
    comb_ij, comb_a, comb_b, ari); ARI is NULL when expected and maximum
    indices coincide (both partitions all-singletons).

    Arithmetic stays in 64-bit integers until the ARI division, with the
    usual long-arithmetic bounds: the C(c,2) terms compute c*(c-1) in a
    long (exact while the largest cluster or marginal stays below ~3e9
    members) through a double-precision /2 (exact while the pair counts
    stay below 2^53 ≈ 9e15 — a ~10^8-doc marginal). Past those bounds
    the combinatorial counts themselves outgrow 64-bit pair arithmetic
    and the metric needs a decimal-typed variant, not this kernel.

    ONE grouping-sets pass over the contingency cells computes the row
    marginals (ai: gid=1), column marginals (bj: gid=2) and the global
    cell sums (gid=3) together — the previous shape fanned the
    contingency into three independent aggregate branches (global + two
    broadcast crossJoins), so the upstream joins+groupBy ran three times
    (VERDICT r8 finding 2). The Expand triples only the cluster-pair-
    cells-bounded cont rows, never the corpus; the second aggregate runs
    over marginals-sized input. Unit-pinned against a hand-computed
    contingency in tests/test_operators.py::TestPairCountingAri."""
    cont = part.groupBy("c_lsh", "c_exact").agg(F.count(F.lit(1)).alias("nij"))
    comb = lambda c: (F.col(c) * (F.col(c) - 1) / 2).cast("long")  # noqa: E731
    gs = cont.groupingSets([["c_lsh"], ["c_exact"], []], "c_lsh", "c_exact").agg(
        F.sum("nij").alias("tot"),
        F.sum(comb("nij")).alias("combn"),
        F.grouping_id().alias("gid"),
    )
    tot2 = (F.col("tot") * (F.col("tot") - 1) / 2).cast("long")
    s = gs.agg(
        F.max(F.when(F.col("gid") == 3, F.col("tot"))).alias("n"),
        F.max(F.when(F.col("gid") == 3, F.col("combn"))).alias("comb_ij"),
        F.sum(F.when(F.col("gid") == 1, tot2)).alias("comb_a"),
        F.count(F.when(F.col("gid") == 1, 1)).alias("clusters_lsh"),
        F.sum(F.when(F.col("gid") == 2, tot2)).alias("comb_b"),
        F.count(F.when(F.col("gid") == 2, 1)).alias("clusters_exact"),
    )
    exp_idx = F.col("comb_a").cast("double") * F.col("comb_b") / (
        F.col("n") * (F.col("n") - 1) / F.lit(2.0)
    )
    max_idx = (F.col("comb_a") + F.col("comb_b")) / F.lit(2.0)
    ari = F.when(
        max_idx - exp_idx == 0, F.lit(None).cast("double")
    ).otherwise(F.round((F.col("comb_ij") - exp_idx) / (max_idx - exp_idx), 6))
    return s.select(
        F.col("n").cast("long").alias("n_docs"),
        F.col("clusters_lsh").cast("long").alias("clusters_lsh"),
        F.col("clusters_exact").cast("long").alias("clusters_exact"),
        F.col("comb_ij").cast("long").alias("comb_ij"),
        F.col("comb_a").cast("long").alias("comb_a"),
        F.col("comb_b").cast("long").alias("comb_b"),
        ari.alias("ari"),
    )
