"""Text-analysis queries over the documents table (training-data surface:
token counting, quality scoring, language ID, fingerprinting, word counts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..operators import textstats
from ..operators.dedup import words
from . import query

# DuckDB equivalents of the shared normalization in operators/dedup.py
_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_WORDS = f"string_split({_NORM}, ' ')"

# MLlib's default English stop-word list (StopWordsRemover.
# loadDefaultStopWords("english") — org/apache/spark/ml/feature/stopwords/
# english.txt), embedded so the q21 oracle can replay the topic pipeline's
# pre-LDA stages in DuckDB without a JVM. Pinned against the live list in
# tests/test_fifa_ml_extras.py so an MLlib upgrade cannot drift silently.
MLLIB_EN_STOPWORDS = (
    "i", "me", "my", "myself", "we", "our", "ours", "ourselves", "you",
    "your", "yours", "yourself", "yourselves", "he", "him", "his",
    "himself", "she", "her", "hers", "herself", "it", "its", "itself",
    "they", "them", "their", "theirs", "themselves", "what", "which",
    "who", "whom", "this", "that", "these", "those", "am", "is", "are",
    "was", "were", "be", "been", "being", "have", "has", "had", "having",
    "do", "does", "did", "doing", "a", "an", "the", "and", "but", "if",
    "or", "because", "as", "until", "while", "of", "at", "by", "for",
    "with", "about", "against", "between", "into", "through", "during",
    "before", "after", "above", "below", "to", "from", "up", "down", "in",
    "out", "on", "off", "over", "under", "again", "further", "then",
    "once", "here", "there", "when", "where", "why", "how", "all", "any",
    "both", "each", "few", "more", "most", "other", "some", "such", "no",
    "nor", "not", "only", "own", "same", "so", "than", "too", "very", "s",
    "t", "can", "will", "just", "don", "should", "now", "i'll", "you'll",
    "he'll", "she'll", "we'll", "they'll", "i'd", "you'd", "he'd",
    "she'd", "we'd", "they'd", "i'm", "you're", "he's", "she's", "it's",
    "we're", "they're", "i've", "we've", "you've", "they've", "isn't",
    "aren't", "wasn't", "weren't", "haven't", "hasn't", "hadn't",
    "don't", "doesn't", "didn't", "won't", "wouldn't", "shan't",
    "shouldn't", "mustn't", "can't", "couldn't", "cannot", "could",
    "here's", "how's", "let's", "ought", "that's", "there's", "what's",
    "when's", "where's", "who's", "why's", "would",
)

_SW_SQL = ", ".join("'" + w.replace("'", "''") + "'" for w in MLLIB_EN_STOPWORDS)


@query(
    "v30_token_stats",
    f"""
    WITH t AS (
        SELECT doc_id, {_NORM} AS norm, {_WORDS} AS w FROM documents
    )
    SELECT doc_id,
           len(w) AS n_tokens,
           length(norm) AS n_chars,
           round((length(norm) - (len(w) - 1)) / len(w), 6) AS avg_token_len,
           round(len(list_filter(w, t -> list_contains(['the','a','an','of','and','or','is','to','in'], t))) / len(w), 6) AS stopword_ratio,
           round(len(list_filter(w, t -> regexp_full_match(t, '[a-z]+'))) / len(w), 6) AS alpha_ratio
    FROM t
    """,
    doc="Token counting + ratio features (F8/F10 analog; quality signals for "
    "a training-data pipeline). Pure Column exprs — codegen'd scan.",
    tags=("text",),
)
def v30_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return textstats.token_stats(docs, "doc_id", "text")


@query(
    "v31_quality_score",
    f"""
    WITH t AS (SELECT doc_id, {_WORDS} AS w FROM documents)
    SELECT doc_id,
           len(w) AS n_tokens,
           round(0.4 * (CASE WHEN len(w) BETWEEN 20 AND 1000 THEN 1.0
                             WHEN len(w) < 20 THEN len(w) / 20.0
                             ELSE 1000.0 / len(w) END)
               + 0.3 * (len(list_filter(w, t -> regexp_full_match(t, '[a-z]+'))) / len(w))
               + 0.3 * (len(list_distinct(w)) / len(w)), 6) AS quality
    FROM t
    """,
    doc="Heuristic document quality score (length band, alpha ratio, "
    "repetition) — deterministic and SQL-checkable.",
    tags=("text",),
)
def v31_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return textstats.quality_score(docs, "doc_id", "text")


@query(
    "v32_langid",
    f"""
    WITH t AS (SELECT doc_id, {_WORDS} AS w FROM documents),
    s AS (
        SELECT doc_id,
               len(list_filter(w, x -> list_contains(['the','a','of','and','is'], x))) AS score_en,
               len(list_filter(w, x -> list_contains(['le','la','et','les','des'], x))) AS score_fr,
               len(list_filter(w, x -> list_contains(['el','los','y','las','por'], x))) AS score_es,
               len(list_filter(w, x -> list_contains(['der','die','und','das','ein'], x))) AS score_de
        FROM t
    )
    SELECT doc_id, score_en, score_fr, score_es, score_de,
           CASE WHEN score_en >= greatest(score_fr, score_es, score_de, 1) THEN 'en'
                WHEN score_fr >= greatest(score_es, score_de, 1) THEN 'fr'
                WHEN score_es >= greatest(score_de, 1) THEN 'es'
                WHEN score_de >= 1 THEN 'de'
                ELSE 'und' END AS lang_pred
    FROM s
    """,
    doc="Marker-lexicon language ID with deterministic argmax tie order "
    "(n-gram-heuristic langid, SQL-expressible form).",
    tags=("text", "langid"),
)
def v32_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return textstats.langid(docs, "doc_id", "text")


@query(
    "r45_fingerprint",
    f"""
    SELECT doc_id, md5({_NORM}) AS content_md5, substr(md5({_NORM}), 1, 8) AS bucket_key
    FROM documents
    """,
    doc="Document fingerprinting: md5 over normalized content + bucket "
    "prefix (exact-dup key / shard key).",
    tags=("text", "fingerprint"),
)
def r45_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return textstats.fingerprint(docs, "doc_id", "text")


@query(
    "v82_word_counts",
    f"""
    SELECT w AS word, count(*) AS n
    FROM (SELECT unnest({_WORDS}) AS w FROM documents)
    WHERE w <> ''
    GROUP BY w
    """,
    doc="Tag/token explosion F23 (split → explode → count, EDA.ipynb § 45): "
    "corpus word frequencies via explode + hash agg (map-side combine).",
    tags=("text", "explode"),
)
def v82_word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(words(F.col("text"))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "q33_ngram_diversity",
    f"""
    WITH toks AS (
        SELECT source, w
        FROM (SELECT source, unnest({_WORDS}) AS w FROM documents)
        WHERE w <> ''
    ),
    uni AS (
        SELECT source, count(*)::BIGINT AS n_tokens,
               count(DISTINCT w)::BIGINT AS n_types
        FROM toks GROUP BY source
    ),
    bg AS (
        SELECT source,
               unnest(CASE WHEN len(w) >= 2
                           THEN list_transform(generate_series(1, len(w) - 1),
                                               i -> w[i] || ' ' || w[i+1])
                           ELSE []::VARCHAR[] END) AS g
        FROM (SELECT source, {_WORDS} AS w FROM documents)
    ),
    bi AS (
        SELECT source, count(*)::BIGINT AS n_bigrams,
               count(DISTINCT g)::BIGINT AS n_distinct_bigrams
        FROM bg GROUP BY source
    )
    SELECT u.source, n_tokens, n_types,
           round(n_types / n_tokens, 6) AS type_token_ratio,
           coalesce(n_bigrams, 0)::BIGINT AS n_bigrams,
           coalesce(n_distinct_bigrams, 0)::BIGINT AS n_distinct_bigrams,
           round(coalesce(n_distinct_bigrams / n_bigrams, 0), 6) AS distinct_2
    FROM uni u LEFT JOIN bi ON bi.source = u.source
    """,
    doc="Per-domain lexical-diversity fingerprint: type-token ratio and "
    "distinct-2 (unique bigrams / total bigrams) per source — the "
    "standard repetitiveness/diversity diagnostic a curation pipeline "
    "reads before weighting a source (a templated or boilerplate-heavy "
    "domain shows a collapsed distinct-2 long before perplexity "
    "filters flag it; complements q39's per-document repetition score "
    "with a corpus-level view). Scale shape: two (source, gram) "
    "aggregates with map-side partial counts — bounded group keys, "
    "nothing corpus-sized past the first shuffle.",
    tags=("text", "diversity", "llm-pipeline"),
)
def q33_ngram_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cache import tracked_persist
    from ..operators.dedup import shingle_array_from_words

    docs = load(spark, sf_dir, "documents")
    # tokenize once: the unigram and bigram subtrees both read the
    # persisted words frame (shingle_array on raw text would re-run the
    # tokenizer O(n) more times per row — its own docstring's warning)
    wf = tracked_persist(docs.select("source", words(F.col("text")).alias("w")))
    toks = wf.select("source", F.explode("w").alias("t")).filter(F.col("t") != "")
    uni = toks.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.countDistinct("t").cast("long").alias("n_types"),
    )
    bg = wf.select(
        "source", F.explode(shingle_array_from_words(F.col("w"), 2)).alias("g")
    )
    bi = bg.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.countDistinct("g").cast("long").alias("n_distinct_bigrams"),
    )
    return uni.join(bi, "source", "left").select(
        "source",
        "n_tokens",
        "n_types",
        F.round(F.col("n_types") / F.col("n_tokens"), 6).alias("type_token_ratio"),
        F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
        F.coalesce("n_distinct_bigrams", F.lit(0)).cast("long").alias("n_distinct_bigrams"),
        F.round(
            F.coalesce(F.col("n_distinct_bigrams") / F.col("n_bigrams"), F.lit(0.0)), 6
        ).alias("distinct_2"),
    )


@query(
    "q34_length_drift",
    f"""
    WITH lens AS (
        SELECT source, len(list_filter({_WORDS}, w -> w <> '')) AS l
        FROM documents
    ),
    pts AS (SELECT DISTINCT l FROM lens),
    src AS (SELECT source, count(*)::BIGINT AS n_s FROM lens GROUP BY source),
    tot AS (SELECT count(*)::BIGINT AS n FROM lens),
    gcum AS (
        SELECT p.l, count(x.l)::BIGINT AS c_g
        FROM pts p LEFT JOIN lens x ON x.l <= p.l
        GROUP BY p.l
    ),
    scnt AS (SELECT source, l, count(*)::BIGINT AS c FROM lens GROUP BY source, l),
    grid AS (
        SELECT s.source, p.l, s.n_s,
               sum(coalesce(sc.c, 0)) OVER (PARTITION BY s.source ORDER BY p.l) AS c_s
        FROM src s CROSS JOIN pts p
        LEFT JOIN scnt sc ON sc.source = s.source AND sc.l = p.l
    )
    SELECT g.source,
           any_value(g.n_s) AS n_docs,
           round(max(abs(g.c_s / g.n_s - gc.c_g / t.n)), 6) AS ks_stat
    FROM grid g
    JOIN gcum gc ON gc.l = g.l
    CROSS JOIN tot t
    GROUP BY g.source
    """,
    doc="Per-domain document-LENGTH drift: the exact two-sample KS "
    "statistic between each source's token-length distribution and the "
    "corpus-wide one — the sibling of q08's token-distribution KL for "
    "the length axis (a source of fragments or concatenated pages "
    "shifts lengths before it shifts vocabulary). Exact sup over the "
    "union of jump points: both ECDFs are step functions, so the "
    "supremum is attained at an observed length; the evaluation grid "
    "is sources x distinct-lengths — BOUNDED (domain cardinality x "
    "observed length values), never corpus-sized, with the per-source "
    "cumulative built by one window over the grid. Same pattern as "
    "q24's windowed KS, lifted to group-vs-corpus.",
    tags=("text", "drift", "evaluation", "llm-pipeline"),
)
def q34_length_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..operators.cache import tracked_persist

    docs = load(spark, sf_dir, "documents")
    # five consumers (points, per-source sizes, global/per-source counts,
    # total) — persist the 2-column lengths frame so the tokenizer runs
    # once per document, not once per subtree
    lens = tracked_persist(
        docs.select(
            "source",
            F.size(F.filter(words(F.col("text")), lambda w: w != F.lit(""))).alias("l"),
        )
    )
    pts = lens.select("l").distinct()
    src = lens.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n_s"))
    n_total = F.broadcast(lens.agg(F.count(F.lit(1)).cast("long").alias("n")))
    # global ECDF at each observed length: cumulative window over the
    # bounded per-length counts
    gcnt = lens.groupBy("l").agg(F.count(F.lit(1)).alias("c"))
    gcum = gcnt.withColumn(
        "c_g", F.sum("c").over(W.orderBy("l").rowsBetween(W.unboundedPreceding, 0))
    ).select("l", "c_g")
    scnt = lens.groupBy("source", "l").agg(F.count(F.lit(1)).alias("c"))
    grid = (
        src.crossJoin(F.broadcast(pts))
        .join(scnt, ["source", "l"], "left")
        .withColumn(
            "c_s",
            F.sum(F.coalesce("c", F.lit(0))).over(
                W.partitionBy("source").orderBy("l").rowsBetween(W.unboundedPreceding, 0)
            ),
        )
    )
    return (
        grid.join(F.broadcast(gcum), "l")
        .crossJoin(n_total)
        .groupBy("source")
        .agg(
            F.any_value("n_s").alias("n_docs"),
            F.round(
                F.max(F.abs(F.col("c_s") / F.col("n_s") - F.col("c_g") / F.col("n"))), 6
            ).alias("ks_stat"),
        )
    )


@query(
    "v71_topic_features",
    f"""
    WITH cleaned AS (
        SELECT doc_id,
               trim(regexp_replace(regexp_replace(lower(coalesce(text, '')),
                                                  '[^a-z\\s\\d]', '', 'g'),
                                   '\\s+', ' ', 'g')) AS tc
        FROM documents
    ),
    toks AS (
        SELECT doc_id,
               list_filter(string_split(tc, ' '),
                           t -> t NOT IN ({_SW_SQL})) AS tok
        FROM cleaned
    ),
    bags AS (
        SELECT doc_id, tok,
               list_concat(
                   tok,
                   CASE WHEN len(tok) >= 2
                        THEN list_transform(generate_series(1, len(tok) - 1),
                                            i -> tok[i] || ' ' || tok[i+1])
                        ELSE []::VARCHAR[] END) AS bag
        FROM toks
    )
    SELECT doc_id,
           len(tok)::BIGINT AS n_terms,
           len(list_distinct(bag))::BIGINT AS n_distinct_grams,
           coalesce(list_sum(list_transform(
               bag, g -> ('0x' || substr(md5(g), 1, 8))::BIGINT)), 0)::BIGINT
               AS bag_hash_sum
    FROM bags
    """,
    doc="Topic-model pipeline M13 (news-text LDA, M1.ipynb § 28-29) over "
    "the documents table: clean -> MLlib StopWordsRemover -> 1-2-gram "
    "bag, run through the real pipeline's Transformer stages "
    "(ml/text.py::build_topic_pipeline). The ORACLE'D PROJECTION is the "
    "deterministic pre-LDA surface: post-stopword term count, distinct "
    "1-2-gram count, and an order-insensitive md5 hash-sum over the "
    "whole n-gram bag — value-checking the clean/tokenize/stopword/"
    "n-gram stages content-exactly (the bag hash-sum pins every gram "
    "string). Topic ASSIGNMENT stays out of the projection: LDA "
    "training is iterative/engine-internal (the round-8 rows-only "
    "rationale) and CountVectorizer's vocab tie-break is not oracle-"
    "replayable. Round 14: the CountVectorizer/LDA FITS no longer "
    "execute inside the query — they contributed NOTHING to the "
    "declared output (their columns were projected away; guide §1.2, "
    "don't compute what you throw away) yet cost ~75%% of the query's "
    "runtime. The full fit path (ml/text.py::topic_features) stays "
    "exercised and quality-gated in tests/test_fifa_ml_extras.py.",
    tags=("text", "ml", "lda"),
)
def v71_topic_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..catalog import spread_partitions
    from ..ml.text import build_topic_pipeline, clean_text_column

    docs = load(spark, sf_dir, "documents")
    cleaned = spread_partitions(clean_text_column(docs, text_col="text"))
    # the pure Transformer prefix of the SAME pipeline topic_features
    # fits (SQL tokenize, stopwords, n-gram, bag concat) — identical
    # __tok_clean/__bag values, no CV/LDA fit jobs
    out = cleaned
    for s in build_topic_pipeline(
        n_topics=4, vocab_size=100, max_ngram=2, lda_max_iter=6
    ).getStages()[:-2]:
        out = s.transform(out)
    h = lambda c: F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")  # noqa: E731
    bag_sum = F.aggregate("__bag", F.lit(0).cast("long"), lambda acc, x: acc + h(x))
    return out.select(
        "doc_id",
        F.size("__tok_clean").cast("long").alias("n_terms"),
        F.size(F.array_distinct("__bag")).cast("long").alias("n_distinct_grams"),
        bag_sum.alias("bag_hash_sum"),
    )


@query(
    "v35_binary_meta",
    """
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS digest,
           n_chars
    FROM documents
    """,
    doc="Multimodal-column plumbing: treat payload as opaque bytes with "
    "typed metadata (byte length + digest). The decode/feature path lives in "
    "operators/multimodal.py (mapInPandas, stubbed decoders).",
    tags=("multimodal",),
)
def v35_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        F.length(payload).cast("long").alias("n_bytes"),
        F.md5(payload).alias("digest"),
        "n_chars",
    )


@query(
    "v49_bm25_retrieval",
    f"""
    WITH tok AS (
        SELECT doc_id, unnest({_WORDS}) AS word FROM documents
    ),
    tok2 AS (SELECT * FROM tok WHERE word != ''),
    tf AS (SELECT doc_id, word, count(*)::BIGINT AS tf FROM tok2 GROUP BY doc_id, word),
    dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM tok2 GROUP BY doc_id),
    stats AS (SELECT count(*)::BIGINT AS n_docs, avg(dl) AS avgdl FROM dl),
    dfq AS (SELECT word, count(*)::BIGINT AS df FROM tf GROUP BY word),
    q AS (SELECT word, df FROM dfq ORDER BY df DESC, word ASC LIMIT 3)
    SELECT tf.doc_id,
           count(*)::BIGINT AS n_terms_hit,
           round(sum(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
                     * tf * (1.2 + 1)
                     / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 6) AS bm25
    FROM tf JOIN q USING (word) JOIN dl USING (doc_id) CROSS JOIN stats
    GROUP BY tf.doc_id
    """,
    doc="BM25 lexical retrieval (operators/textstats.py::bm25_scores, "
    "k1=1.2, b=0.75, Lucene idf): every document scored against the "
    "corpus's top-3-df terms — the keyword half of a hybrid-retrieval "
    "pipeline (the embedding half is q50-q17). Postings from two "
    "partial-agg shuffles of the token stream; the query-term table and "
    "the N/avgdl scalars broadcast, so scoring touches only matching "
    "postings. No UDFs, no collect.",
    tags=("text", "retrieval", "llm-pipeline"),
)
def v49_bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return textstats.bm25_scores(docs, "doc_id", "text", n_query_terms=3)


@query(
    "q02_token_zipf",
    f"""
    WITH freq AS (
        SELECT word, count(*)::BIGINT AS n
        FROM (SELECT unnest({_WORDS}) AS word FROM documents)
        WHERE word != ''
        GROUP BY word
    ),
    ranked AS (
        SELECT n, row_number() OVER (ORDER BY n DESC, word ASC) AS r
        FROM freq ORDER BY n DESC, word ASC LIMIT 100
    ),
    pts AS (SELECT ln(r) AS x, ln(n) AS y FROM ranked)
    SELECT count(*)::BIGINT AS n_points,
           round((sum(x * y) - sum(x) * sum(y) / count(*))
                 / (sum(x * x) - sum(x) * sum(x) / count(*)), 6) AS zipf_slope,
           round((sum(y) - (sum(x * y) - sum(x) * sum(y) / count(*))
                 / (sum(x * x) - sum(x) * sum(x) / count(*)) * sum(x)) / count(*), 6) AS log_intercept
    FROM pts
    """,
    doc="Zipf fit of the corpus vocabulary: OLS slope/intercept of "
    "ln(freq) on ln(rank) over the top-100 terms — the standard "
    "vocabulary-health diagnostic (natural text slopes near -1; word "
    "salad or boilerplate-heavy corpora deviate sharply). One partial-agg "
    "shuffle to the frequency table, a distributed top-k, then closed-"
    "form OLS over 100 rows; the 6dp rounding absorbs cross-engine "
    "float-summation ordering.",
    tags=("text", "corpus-stats", "llm-pipeline"),
)
def q02_token_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..operators.dedup import words

    docs = load(spark, sf_dir, "documents")
    freq = (
        docs.select(F.explode(words(F.col("text"))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    order = (F.desc("n"), F.asc("word"))
    ranked = (
        freq.orderBy(*order)
        .limit(100)
        .withColumn("r", F.row_number().over(W.orderBy(*order)))
    )
    pts = ranked.select(F.log("r").alias("x"), F.log("n").alias("y"))
    n = F.count(F.lit(1))
    sx, sy, sxy, sxx = F.sum("x"), F.sum("y"), F.sum(F.col("x") * F.col("y")), F.sum(
        F.col("x") * F.col("x")
    )
    slope = (sxy - sx * sy / n) / (sxx - sx * sx / n)
    intercept = (sy - slope * sx) / n
    return pts.agg(
        n.cast("long").alias("n_points"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round(intercept, 6).alias("log_intercept"),
    )


@query(
    "v68_bpe_token_count",
    f"""
    SELECT doc_id,
           len(regexp_extract_all({_NORM},
               '''(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^ a-z0-9'']+|'''))::BIGINT
               AS n_bpe_tokens,
           len({_WORDS})::BIGINT AS n_ws_tokens,
           round(len(regexp_extract_all({_NORM},
               '''(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^ a-z0-9'']+|'''))::DOUBLE
               / len({_WORDS}), 6) AS fertility
    FROM documents
    """,
    doc="BPE-ish pre-tokenizer token counting (operators/textstats.py::"
    "bpe_token_count): GPT-2-style pattern restricted to the Java∩RE2 "
    "regex subset so the oracle replays it byte-for-byte. The corpus-"
    "budgeting proxy for billed tokens (real BPE merges only split "
    "pre-tokens further). One regexp_extract_all, zero shuffles.",
    tags=("text", "tokenization", "llm-pipeline"),
)
def v68_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return textstats.bpe_token_count(docs, "doc_id", "text")


@query(
    "v58_domain_kl",
    f"""
    WITH toks AS (
        SELECT source AS grp, unnest({_WORDS}) AS tok FROM documents
    ),
    gt AS (SELECT grp, tok, count(*) AS n_gt FROM toks GROUP BY grp, tok),
    g_tot AS (SELECT grp, sum(n_gt) AS n_g FROM gt GROUP BY grp),
    t_tot AS (SELECT tok, sum(n_gt) AS n_t FROM gt GROUP BY tok),
    v AS (SELECT count(DISTINCT tok) AS v, sum(n_gt) AS n_all FROM gt),
    scored AS (
        SELECT gt.grp, gt.tok, n_gt, n_g, n_t, v.v, v.n_all,
               (n_gt + 0.5) / (n_g + 0.5 * v.v) AS p_g,
               (n_t + 0.5) / (n_all + 0.5 * v.v) AS p_all
        FROM gt JOIN g_tot USING (grp) JOIN t_tot USING (tok) CROSS JOIN v
    ),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY grp
                                     ORDER BY p_g / p_all DESC, tok) AS rk
        FROM scored
    ),
    top AS (
        SELECT grp, string_agg(tok, ' ' ORDER BY rk) AS top_overrepresented
        FROM ranked WHERE rk <= 5 GROUP BY grp
    ),
    kl AS (
        SELECT grp,
               round(sum(p_g * ln(p_g / p_all)), 6) AS kl_divergence,
               count(*)::BIGINT AS n_distinct_tokens,
               max(n_g)::BIGINT AS n_tokens
        FROM scored GROUP BY grp
    )
    SELECT grp AS source, n_tokens, n_distinct_tokens, kl_divergence, top_overrepresented
    FROM kl JOIN top USING (grp)
    """,
    doc="Per-source unigram KL divergence from the corpus distribution "
    "(operators/textstats.py::domain_kl_divergence, smoothing 0.5) — the "
    "drift fingerprint run when a new source lands: hard divergence means "
    "the source needs its own mixture weight or is contaminated. Only "
    "observed (domain, token) cells carry mass (never domains x vocab); "
    "the diagnostic top-5 over-represented tokens rank by the pure-"
    "rational p_g/p_all ratio so ordering is bit-deterministic across "
    "engines (ln appears only inside the rounded KL sum).",
    tags=("text", "curation", "llm-pipeline"),
)
def v58_domain_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return textstats.domain_kl_divergence(docs, "source", "text", smoothing=0.5, top_tokens=5)


@query(
    "v59_oov_rate",
    f"""
    WITH toks AS (
        SELECT source AS grp, unnest({_WORDS}) AS tok FROM documents
    ),
    freq AS (SELECT tok, count(*) AS n FROM toks GROUP BY tok),
    vocab AS (SELECT tok FROM freq ORDER BY n DESC, tok LIMIT 1000),
    gt AS (SELECT grp, tok, count(*) AS n_gt FROM toks GROUP BY grp, tok),
    f AS (
        SELECT gt.*, (vocab.tok IS NOT NULL) AS in_vocab
        FROM gt LEFT JOIN vocab ON gt.tok = vocab.tok
    )
    SELECT grp AS source,
           sum(n_gt)::BIGINT AS n_tokens,
           sum(CASE WHEN NOT in_vocab THEN n_gt ELSE 0 END)::BIGINT AS n_oov,
           count(CASE WHEN NOT in_vocab THEN 1 END)::BIGINT AS n_oov_types,
           round(sum(CASE WHEN NOT in_vocab THEN n_gt ELSE 0 END)
                 / sum(n_gt), 6) AS oov_rate
    FROM f GROUP BY grp
    """,
    doc="Per-source out-of-vocabulary rate against the corpus top-1000 "
    "vocabulary (operators/textstats.py::oov_rate) — the tokenizer-"
    "coverage check before committing a shared vocab: high-OOV domains "
    "fragment into byte-level sequences or unks and need vocab budget. "
    "Deterministic vocab cut (count desc, token asc); one broadcast "
    "semi-join against the bounded (domain, token) aggregate.",
    tags=("text", "tokenization", "llm-pipeline"),
)
def v59_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return textstats.oov_rate(docs, "source", "text", vocab_size=1000)
