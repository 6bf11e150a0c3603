#!/usr/bin/env python3
"""Per-query micro-bench under bench discipline (release between runs).

Usage: python tools/microbench.py v90_decontaminate q45_lsh_recall_eval [-n 3]
Times each named query at $SPARK_GRAFT_SF_DIR (default sf0.1) via the noop
sink, releasing operator caches between runs, and prints per-run + median
seconds. The first run of the session is JVM-cold; runs after the warmup
query are comparable to driver-bench numbers.
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fantasy_premier_league_spark.operators.cache import release_operator_caches
from fantasy_premier_league_spark.queries import all_queries
from fantasy_premier_league_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("-n", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()
    spark = get_spark("microbench")
    registry = all_queries()
    # JVM/parquet-footer warmup, mirrors bench.py
    registry["v01_pricing_summary"].fn(spark, args.sf_dir).write.mode("overwrite").format("noop").save()
    for name in args.names:
        q = registry[name]
        runs = []
        for _ in range(args.n):
            t0 = time.time()
            q.fn(spark, args.sf_dir).write.mode("overwrite").format("noop").save()
            runs.append(round(time.time() - t0, 3))
            release_operator_caches()
        print(f"{name}: runs={runs} median={statistics.median(runs):.3f}", flush=True)


if __name__ == "__main__":
    main()
