#!/usr/bin/env python3
"""Spark-vs-DuckDB side-by-side timings for the oracle-checked queries.

Context tool (not the graded bench): DuckDB running the oracle SQL is a
strong single-node columnar baseline — far stronger than the reference's
pandas — so the ratio shows where Spark's distribution overhead sits at
laptop scale. Spark wins nothing at sf0.1 and is not supposed to; the
engine's case is the 100 TB shape (SCALE.md). Usage:

    python tools/bench_compare.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from fantasy_premier_league_spark.queries import all_queries
from fantasy_premier_league_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("bench-compare")
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    rows = []
    for name, q in sorted(all_queries().items()):
        if q.oracle is None:
            continue
        t0 = time.time()
        q.fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        spark_s = time.time() - t0
        t0 = time.time()
        con.execute(q.oracle).fetchall()
        duck_s = time.time() - t0
        rows.append((name, spark_s, duck_s))
        print(f"{name:32s} spark {spark_s:7.2f}s   duckdb {duck_s:7.2f}s   ratio {spark_s / max(duck_s, 1e-9):6.1f}x")
    ts = sum(r[1] for r in rows)
    td = sum(r[2] for r in rows)
    print(f"{'TOTAL':32s} spark {ts:7.2f}s   duckdb {td:7.2f}s   ratio {ts / td:6.1f}x  ({len(rows)} queries)")


if __name__ == "__main__":
    main()
