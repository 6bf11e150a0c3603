#!/usr/bin/env python3
"""Dump .explain("formatted") output for named queries to plans/<tag>/.

Usage: python tools/dump_plans.py --tag r13 --suffix before q42_label_communities ...
       python tools/dump_plans.py --tag r13 --suffix before --all

Writes plans/<tag>/<query>_<suffix>.txt. Compilation is execution-free for
most queries; stats-gated builders run their bounded probes (same caveat as
tools/plan_audit.py). Operator caches are released after each query.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fantasy_premier_league_spark.operators.cache import release_operator_caches
from fantasy_premier_league_spark.queries import all_queries
from fantasy_premier_league_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--tag", required=True)
    ap.add_argument("--suffix", required=True)
    ap.add_argument("--all", action="store_true")
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()
    spark = get_spark("dump-plans")
    registry = all_queries()
    names = sorted(registry) if args.all else args.names
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", args.tag
    )
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        q = registry[name]
        try:
            df = q.fn(spark, args.sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # pragma: no cover - tool robustness
            print(f"FAIL {name}: {e}", file=sys.stderr)
            continue
        finally:
            release_operator_caches()
        path = os.path.join(outdir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} @ {args.sf_dir} — explain('formatted')\n")
            f.write(txt)
        print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
