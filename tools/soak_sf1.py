#!/usr/bin/env python3
"""Scale soak: run the heavy operator family at sf0.1 and the generated
sf1 (tools/gen_sf1.py) and report per-query scaling factors.

Usage: python tools/soak_sf1.py [query ...|--all]   (default: the heavy seven)

Each query runs once per scale through the no-op sink (full plan, no
driver materialization), with operator caches released between runs.
Prints one JSON line: {"queries": {name: {"sf0.1": s, "sf1": s,
"scale_factor": x, "data_factor": y}}} — scale_factor ≈ data_factor
(or below) is the linear-scaling evidence SCALE.md cites.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fantasy_premier_league_spark.operators.cache import release_operator_caches
from fantasy_premier_league_spark.queries import all_queries
from fantasy_premier_league_spark.session import get_spark

HEAVY = [
    "q43_dedup_clusters",
    "v41_ngram_jaccard_pairs",
    "q47_minhash_lsh_pairs",
    "q48_incremental_dedup",
    "q53_embedding_near_dups",
    "q46_ivf_pq_topk",
    "q50_part_pagerank",
]

#: rows at sf1 / rows at sf0.1 for the table each query is bound by
DATA_FACTOR = {
    "q43_dedup_clusters": 10.0,
    "v41_ngram_jaccard_pairs": 10.0,
    "q47_minhash_lsh_pairs": 10.0,
    "q48_incremental_dedup": 10.0,
    "q53_embedding_near_dups": 4.0,
    "q46_ivf_pq_topk": 4.0,
    "q50_part_pagerank": 10.0,
    # round-5 extensions: documents-bound = 10x, embeddings-bound = 4x
    "q05_dsir_weights": 10.0,
    "q06_int8_quantize": 4.0,
    "v60_bpe_merges": 10.0,
    "q07_ccnet_buckets": 10.0,
    "v61_bpe_apply": 10.0,
    "q08_quantized_recall": 4.0,
    "q09_corpus_report": 10.0,
    "q49_cluster_safe_split": 10.0,
    "q10_event_funnel": 10.0,
    "q11_retention_cohorts": 10.0,
    "q41_triangle_stats": 10.0,
    "q12_weighted_sample": 10.0,
    "v18_prefix_jaccard": 10.0,
    "q42_label_communities": 10.0,
    "q13_incremental_rollup": 10.0,
    "q14_decayed_activity": 10.0,
    "q15_frequent_tokens": 10.0,
    "q16_rolling_outliers": 10.0,
    "q17_event_transitions": 10.0,
    "v11_incremental_distinct": 10.0,
    "v64_ab_conversion_test": 10.0,
    "q19_growth_accounting": 10.0,
    "q20_calendar_fill": 10.0,
    "q21_pmi_collocations": 10.0,
    "q22_loo_target_encoding": 10.0,
    "q23_phrase_search": 10.0,
    "q24_latency_bands": 10.0,
    "q25_also_bought": 10.0,
    "v65_cuped_ab_test": 10.0,
    "q45_lsh_recall_eval": 10.0,
    "v17_compression_quality": 10.0,
    "q27_pareto_abc": 10.0,
    "q28_mad_outliers": 10.0,
    "q29_rolling_wau": 10.0,
    "q30_sql_exists": 10.0,
    "q31_decile_lift": 10.0,
    "q32_session_entry_analysis": 10.0,
    "r44_state_history": 10.0,
    "r45_fingerprint": 10.0,
    "r46_rolling_spend": 10.0,
    "q44_cc_star": 10.0,
    "q39_semantic_dedup": 4.0,
    "v36_source_overlap": 10.0,
}

#: embeddings tile 4x (500 -> 2,000 -> 8,000 sub-linear driver scaling)
for _n in (
    "v26_pq_topk", "v46_embedding_dup_clusters", "v50_cosine_topk",
    "q51_cosine_topk_block", "q52_label_centroid_sim", "q18_ivf_topk",
    "q55_lsh_topk", "q56_ivf_topk_seeded", "v83_vector_stats",
    "q01_ann_recall_eval", "q03_hard_negatives",
):
    DATA_FACTOR[_n] = 4.0
#: customer tiles 5x (orders spreads o_custkey over 5 tiles only)
for _n in (
    "v08_acctbal_deciles", "v09_argmax_customer", "r62_roleswap_union",
    "r57_balance_bins", "v20_exact_quantiles", "v80_decile_edges",
    "v81_full_outer_activity",
):
    DATA_FACTOR[_n] = 5.0


def main() -> None:
    if sys.argv[1:] == ["--all"]:
        names = sorted(all_queries())
    else:
        names = sys.argv[1:] or HEAVY
    sf1_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch", "sf1"
    )
    spark = get_spark("soak-sf1")
    registry = all_queries()
    # warm the JVM so sf0.1 timings aren't charged the session cold-start
    registry["v01_pricing_summary"].fn(spark, "/root/testdata/sf0.1").write.mode(
        "overwrite"
    ).format("noop").save()
    out: dict[str, dict[str, float]] = {}
    for name in names:
        row: dict[str, float] = {}
        for label, sf_dir in (("sf0.1", "/root/testdata/sf0.1"), ("sf1", sf1_dir)):
            t0 = time.time()
            registry[name].fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            row[label] = round(time.time() - t0, 2)
            release_operator_caches()
        row["scale_factor"] = round(row["sf1"] / row["sf0.1"], 2)
        row["data_factor"] = DATA_FACTOR.get(name, 10.0)
        out[name] = row
        print(f"{name}: {row}", file=sys.stderr)
    print(json.dumps({"queries": out}))


if __name__ == "__main__":
    main()
