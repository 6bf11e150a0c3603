#!/usr/bin/env python3
"""Physical-plan audit over the whole query inventory.

For every registered query, compile the plan at the given sf dir and
tabulate the properties the 100 TB arguments rest on. Compilation is
normally execution-free, but queries with plan-build-time driver state
execute bounded jobs while their plan is built (v61_bpe_apply runs its
3-round BPE training collect; the q48/q21/r41 graph builders run their
node-stat probes and eager lineage checkpoints; q18's dispatch probe
materializes its shingle index) — the audit is therefore slower than a
pure compile over those entries, and it releases the operator caches
those builds leave behind after every query.

Tabulated:
shuffle count, join strategies, Python nodes, and cartesian products
(codegen is decided at execution under AQE, so it is not tabulated
here — test_plan_quality pins it where it matters). Writes PLANS.md (markdown table) so plan
regressions are reviewable in diffs, and exits non-zero if any query
acquires a CartesianProduct or a Python node outside the known set.

Usage: python tools/plan_audit.py [sf_dir] [--write]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fantasy_premier_league_spark.queries import all_queries
from fantasy_premier_league_spark.session import get_spark

#: queries whose plan legitimately contains a Python node (the one pandas
#: UDF family and the mapInPandas scans) — anything else is a regression
KNOWN_PYTHON = {
    "v26_pq_topk",  # ADC scan: mapInPandas over the encoded corpus
    "q51_cosine_topk_block",  # blocked-BLAS matmul: mapInPandas
    "q53_embedding_near_dups",  # block pair grid: applyInPandas (was
    # invisible before round 10 — FlatMapGroupsInPandas matched none of
    # the old substrings, so the applyInPandas family escaped the audit)
    "q39_semantic_dedup",  # per-cell tiled-BLAS pairing: applyInPandas
    "v62_multimodal_features",  # image decode UDF stage
    "v63_frame_samples",  # frame-sampling UDF stage
    "v17_compression_quality",  # zlib ratio: mapInPandas by necessity
    "q46_ivf_pq_topk",  # r13: fused IVF-cell + PQ-code + ADC numpy pass
}


def audit(sf_dir: str) -> tuple[list[dict], list[str]]:
    spark = get_spark("plan-audit")
    rows, violations = [], []
    from fantasy_premier_league_spark.operators.cache import release_operator_caches

    for name, q in sorted(all_queries().items()):
        try:
            plan = q.fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # pragma: no cover - audit robustness
            violations.append(f"{name}: plan build failed: {e}")
            continue
        finally:
            # plan-build-time driver state (graph probes, dispatch
            # probes, eager checkpoints) would otherwise accumulate
            # across the whole 137-query audit
            release_operator_caches()
        row = {
            "query": name,
            "exchanges": len(re.findall(r"Exchange (hash|range|SinglePartition)", plan)),
            "bhj": plan.count("BroadcastHashJoin"),
            "smj": plan.count("SortMergeJoin"),
            "bnlj": plan.count("BroadcastNestedLoopJoin"),
            "cartesian": plan.count("CartesianProduct"),
            "python": int("Python" in plan or "ArrowEval" in plan or "InPandas" in plan),
        }
        rows.append(row)
        if row["cartesian"]:
            violations.append(f"{name}: CartesianProduct in plan")
        if row["python"] and name not in KNOWN_PYTHON:
            violations.append(f"{name}: unexpected Python node")
    return rows, violations


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else "/root/testdata/sf0.001"
    rows, violations = audit(sf_dir)
    header = "| query | exchanges | BHJ | SMJ | BNLJ | python |"
    lines = [
        "# PLANS — physical-plan audit of the query inventory",
        "",
        f"Compiled (not executed) at `{sf_dir}`. Regenerate: "
        "`python tools/plan_audit.py [sf_dir] --write`. BHJ/SMJ/BNLJ = "
        "broadcast-hash / sort-merge / broadcast-nested-loop join counts; "
        "`python` marks the eight documented Arrow-UDF stages (PQ ADC scan, "
        "blocked-BLAS top-k matmul, block pair grid, SemDeDup per-cell "
        "pairing, multimodal decode, frame sampling, zlib compression "
        "ratio, and — since round 13 — the fused IVF-PQ quantize+ADC "
        "pass). "
        "CartesianProduct anywhere fails the audit.",
        "",
        "Two reading notes: (1) exchange counts are TEXTUAL — the "
        "co_occurrence mirror union (q21/q48) embeds its distinct subtree "
        "twice in the compiled plan and runtime exchange reuse dedups the "
        "actual shuffle work, so those rows overcount what executes "
        "(measured faster than the pre-mirror form); the two-phase "
        "rank/cumsum/ntile family (r32/r36/r63) duplicates its sorted "
        "subtree the same way (sort branch + offsets branch), with "
        "ReusedExchange asserted at execution in test_plan_quality — e.g. "
        "r36's 18 textual exchanges execute as one range sort + one "
        "user-keyed agg + the 10-row frames (0.9s at sf0.01, flat 0.91x "
        "sf0.1→sf1). (2) stats-gated "
        "hybrids compile to their SMALL-GRAPH route at this audit's scale "
        "(q34's closure is a driver union-find over the bounded pair "
        "graph, hence 0 exchanges); the distributed plans they take past "
        "their thresholds are exercised and measured at sf1 in SCALE.md.",
        "",
        header,
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['query']} | {r['exchanges']} | {r['bhj']} | {r['smj']} | "
            f"{r['bnlj']} | {'yes' if r['python'] else ''} |"
        )
    out = "\n".join(lines) + "\n"
    if "--write" in sys.argv:
        path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
        with open(path, "w") as f:
            f.write(out)
        print(f"wrote {path} ({len(rows)} queries)", file=sys.stderr)
    else:
        print(out)
    for v in violations:
        print(f"VIOLATION: {v}", file=sys.stderr)
    sys.exit(1 if violations else 0)


if __name__ == "__main__":
    main()
