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

from .dedup import doc_shingles, normalize_text, words


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


def gopher_quality_rules(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    min_words: int = 15,
    max_words: int = 10_000,
    min_mean_len: float = 3.0,
    max_mean_len: float = 10.0,
    min_stop_hits: int = 2,
    min_alpha_ratio: float = 0.7,
    max_top_freq: float = 0.3,
) -> DataFrame:
    """Gopher-style per-document quality rules (Rae et al. 2021, §A1.1).

    Emits the raw statistics, one 0/1 flag per rule, and the conjunction:

    - word count within [min_words, max_words],
    - mean word length within [min_mean_len, max_mean_len],
    - at least ``min_stop_hits`` stop-word occurrences,
    - alphabetic-token ratio >= min_alpha_ratio (symbol-soup guard),
    - most-frequent-word share <= max_top_freq (repetition guard).

    Scale shape: every stat except the repetition share is a pure Column
    expression over the words array (scan-speed, whole-stage codegen). The
    top-word share needs per-(doc, word) counts: one explode with two-level
    partial aggregation keyed by doc_id — no window over the corpus, no
    collect. Both shuffles are on doc_id, so AQE coalesces them together.
    """
    from .textstats import STOPWORDS

    w = words(F.col(text_col))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_words = F.size(w)
    base = df.select(
        F.col(id_col).alias("doc_id"),
        n_words.cast("long").alias("n_words"),
        F.round(
            (F.length(normalize_text(F.col(text_col))) - (n_words - 1)) / n_words,
            6,
        ).alias("mean_word_len"),
        F.size(F.filter(w, lambda t: F.array_contains(stop_arr, t))).cast("long").alias("stop_hits"),
        F.round(F.size(F.filter(w, lambda t: t.rlike("^[a-z]+$"))) / n_words, 6).alias("alpha_ratio"),
    )
    tok = df.select(F.col(id_col).alias("doc_id"), F.explode(w).alias("word"))
    top = (
        tok.groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("__n"))
        .groupBy("doc_id")
        .agg(F.max("__n").alias("__top_n"))
    )
    scored = base.join(top, "doc_id").withColumn(
        "top_word_ratio", F.round(F.col("__top_n") / F.col("n_words"), 6)
    )
    r_count = ((F.col("n_words") >= min_words) & (F.col("n_words") <= max_words)).cast("int")
    r_mean = (
        (F.col("mean_word_len") >= min_mean_len) & (F.col("mean_word_len") <= max_mean_len)
    ).cast("int")
    r_stop = (F.col("stop_hits") >= min_stop_hits).cast("int")
    r_alpha = (F.col("alpha_ratio") >= min_alpha_ratio).cast("int")
    r_rep = (F.col("top_word_ratio") <= max_top_freq).cast("int")
    return scored.select(
        "doc_id",
        "n_words",
        "mean_word_len",
        "stop_hits",
        "alpha_ratio",
        "top_word_ratio",
        r_count.alias("r_word_count"),
        r_mean.alias("r_mean_len"),
        r_stop.alias("r_stopwords"),
        r_alpha.alias("r_alpha"),
        r_rep.alias("r_repetition"),
        (r_count * r_mean * r_stop * r_alpha * r_rep).alias("quality_pass"),
    )


def bigram_logprob(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    add_k: float = 0.5,
) -> DataFrame:
    """Bigram-LM cross-entropy per document, model trained on the corpus.

    The classic perplexity-style quality signal one LM up from q89's unigram
    scorer: P(w2 | w1) = (c(w1 w2) + k) / (c(w1 ·) + k·V) with add-k
    smoothing, V = vocabulary size. Emits per-doc bigram count, mean log
    probability, and bits/bigram (cross-entropy).

    Scale shape: the model IS aggregation — bigram counts from one explode,
    prefix counts derived from the bigram table (no second corpus pass),
    vocab size a single-row broadcast. Scoring joins each doc's bigrams to
    the model on the bigram key: shuffle-on-key hash joins with partial
    aggregation everywhere, never a collect of the model to the driver.
    """
    w = words(F.col(text_col))
    bigrams = F.expr(
        "transform(sequence(1, size(__w) - 1), "
        "i -> concat(element_at(__w, i), ' ', element_at(__w, i + 1)))"
    )
    bg = (
        df.select(F.col(id_col).alias("doc_id"), w.alias("__w"))
        .filter(F.size("__w") >= 2)
        .select("doc_id", F.explode(bigrams).alias("bigram"))
    )
    bgc = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("__c_bg"))
    pc = (
        bgc.withColumn("__prefix", F.split("bigram", " ").getItem(0))
        .groupBy("__prefix")
        .agg(F.sum("__c_bg").alias("__c_prefix"))
    )
    vocab = (
        df.select(F.explode(w).alias("word")).agg(F.countDistinct("word").alias("__v"))
    )
    logp = F.log(
        (F.col("__c_bg") + F.lit(add_k)) / (F.col("__c_prefix") + F.lit(add_k) * F.col("__v"))
    )
    return (
        bg.join(bgc, "bigram")
        .withColumn("__prefix", F.split("bigram", " ").getItem(0))
        .join(pc, "__prefix")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(logp), 6).alias("avg_logprob"),
            F.round(-F.avg(logp) / F.log(F.lit(2.0)), 6).alias("bits_per_bigram"),
        )
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


def dedup_passages_keep_first(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    passage_words: int = 10,
) -> DataFrame:
    """C4-style exact passage dedup that REWRITES documents, keeping the
    first occurrence of every duplicated passage corpus-wide.

    q81 scores sub-document duplication; this operator removes it: text
    splits into non-overlapping ``passage_words``-word passages, each
    passage survives only at its lexicographically-first occurrence
    (min doc id, then min position within that doc — C4 dedups exact
    three-sentence spans this way, Raffel et al. 2020 §2.2), and each doc is
    reassembled from its surviving passages in original order.

    Scale shape: one explode (~n_words/passage_words rows per doc), two
    window functions over the SAME passage-keyed sort (Catalyst runs them
    in one shuffle: partition by passage covers partition by passage+doc),
    then one groupBy(doc) that rebuilds the text with an ordered
    array_sort/array_join — no collect, no second corpus scan. The passage
    key is high-cardinality and uniform, so the shuffle is skew-free.
    """
    wds = words(F.col(text_col))
    pw = passage_words
    n_pass = F.ceil(F.size(wds) / F.lit(pw)).cast("int")
    passages = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_pass - 1),
                lambda i: F.array_join(F.slice(wds, i * pw + 1, pw), " "),
            )
        ).alias("pos", "passage"),
    )
    w_first_doc = W.partitionBy("passage")
    w_first_pos = W.partitionBy("passage", "doc_id")
    flagged = passages.select(
        "doc_id",
        "pos",
        "passage",
        (
            (F.col("doc_id") == F.min("doc_id").over(w_first_doc))
            & (F.col("pos") == F.min("pos").over(w_first_pos))
        )
        .cast("int")
        .alias("kept"),
    )
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_passages"),
        F.sum("kept").cast("long").alias("n_kept"),
        F.array_join(
            F.transform(
                F.filter(
                    F.array_sort(F.collect_list(F.struct("pos", "kept", "passage"))),
                    lambda s: s["kept"] == 1,
                ),
                lambda s: s["passage"],
            ),
            " ",
        ).alias("text_dedup"),
    )


def token_budget_sample(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    *,
    budget: int,
    salt: str = "tb",
) -> DataFrame:
    """Deterministic per-domain token-budget cap: within each group, docs
    are taken in seeded-hash order until the cumulative token count would
    exceed ``budget``.

    This is how a mixture spec ("at most N tokens from source X") is
    enforced when materializing a training corpus. Hash order makes the
    sample uniform AND reproducible across engines/runs; the budget is a
    prefix-sum cut, so adding documents to the corpus never changes which
    earlier-hashed docs survive.

    Scale shape: one window (running token sum) per group — the same
    single-shuffle prefix-sum as pack_sequences. Group cardinality is the
    domain count (bounded); if one domain is 100 TB alone, the two-phase
    global-rank decomposition (operators/rank.py) applies verbatim since
    the hash order is arbitrary-tie-breakable.
    """
    n_tokens = F.size(words(F.col(text_col))).cast("long")
    order_key = F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    w = (
        W.partitionBy(group_col)
        .orderBy(order_key, F.col(id_col))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        df.select(
            F.col(id_col),
            F.col(group_col),
            n_tokens.alias("n_tokens"),
            F.sum(n_tokens).over(w).alias("cum_tokens"),
        )
        .filter(F.col("cum_tokens") <= budget)
    )


def materialize_mixture(
    df: DataFrame,
    id_col: str,
    group_col: str,
    *,
    multipliers: dict[str, float],
    default_mult: float = 1.0,
    salt: str = "mix",
) -> DataFrame:
    """Materialize a target corpus mixture as explicit (doc, epoch) rows.

    Each group's target size is round(multiplier * n_docs) (half-up).
    Docs are ranked by seeded hash within the group; every doc gets
    floor(target / n) copies and the first (target mod n) ranked docs get
    one extra — so upsampling (mult > 1) repeats docs evenly ("epochs" of
    the domain) and downsampling (mult < 1) keeps a deterministic hash
    prefix, exactly the repetition policy domain_mix_rates leaves to the
    sampler. Output is one row per (doc, epoch) — the corpus a trainer
    would actually iterate.

    Scale shape: group counts are a bounded-cardinality aggregate joined
    back broadcast; the rank is the same one-shuffle per-group window as
    token_budget_sample; repetition is sequence+explode (row fan-out
    proportional to the OUTPUT size, never materialized on the driver).
    """
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    mult_map = F.create_map(*[F.lit(x) for kv in multipliers.items() for x in kv])
    order_key = F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    w = W.partitionBy(group_col).orderBy(order_key, F.col(id_col))
    mult = F.coalesce(mult_map[F.col(group_col)], F.lit(float(default_mult)))
    ranked = df.join(F.broadcast(counts), group_col).select(
        F.col(id_col),
        F.col(group_col),
        F.col("__n"),
        F.floor(mult * F.col("__n") + F.lit(0.5)).cast("long").alias("__target"),
        F.row_number().over(w).alias("__rank"),
    )
    copies = (
        F.floor(F.col("__target") / F.col("__n")).cast("long")
        + (F.col("__rank") <= F.col("__target") % F.col("__n")).cast("long")
    )
    return (
        ranked.withColumn("n_copies", copies)
        .withColumn(
            "epoch",
            F.explode(
                F.when(copies >= 1, F.sequence(F.lit(1).cast("long"), copies)).otherwise(
                    F.array().cast("array<long>")
                )
            ),
        )
        .select(F.col(id_col), F.col(group_col), "n_copies", "epoch")
    )
