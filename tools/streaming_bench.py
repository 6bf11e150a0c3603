#!/usr/bin/env python3
"""Measured streaming throughput for SCALE.md — the three ingest surfaces.

Two-drop harness at sf0.1 drop size (each drop coalesced to ONE parquet
file of ~5k documents / ~100k events so maxFilesPerTrigger=1 really means
one drop per micro-batch): write drop 1, write drop 2 (containing
re-deliveries / near-dups of drop 1), run the query with
``maxFilesPerTrigger=1`` + ``availableNow`` so each drop is exactly one
micro-batch, then read per-batch ``numInputRows`` / ``triggerExecution``
from the query progress log. Prints one JSON line:

  {"content_dedup": {"batches": [{rows, sec, rows_per_sec}...], ...},
   "near_dup_ingest": {...}, "dsir_gate": {...}, "exact_dedup": {...}}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from fantasy_premier_league_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def progress_rows(query) -> list[dict]:
    out = []
    for p in query.recentProgress:
        n = int(p["numInputRows"])
        if n == 0:
            continue
        sec = float(p["durationMs"]["triggerExecution"]) / 1000.0
        out.append(
            {"rows": n, "sec": round(sec, 2), "rows_per_sec": int(n / max(sec, 1e-9))}
        )
    return out


def bench_content_dedup(spark, docs, work) -> list[dict]:
    from fantasy_premier_league_spark.streaming.dedup import content_dedup_stream

    src = f"{work}/content_src"
    stamped = docs.withColumn("ts", F.timestamp_seconds(F.lit(1_700_000_000) + F.col("doc_id") % 600))
    stamped.coalesce(1).write.parquet(f"{src}/drop1.parquet")
    # drop 2: the same texts re-delivered under fresh ids + half new
    redelivered = stamped.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    fresh = stamped.filter(F.col("doc_id") % 2 == 0).withColumn(
        "text", F.concat(F.col("text"), F.lit(" fresh-suffix"))
    ).withColumn("doc_id", F.col("doc_id") + 2_000_000)
    redelivered.unionByName(fresh).coalesce(1).write.parquet(f"{src}/drop2.parquet")
    stream = (
        spark.readStream.schema(stamped.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*.parquet")
    )
    out = content_dedup_stream(stream, "text", ts="ts", watermark="1 hour")
    q = (
        out.writeStream.format("noop")
        .option("checkpointLocation", f"{work}/content_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    return progress_rows(q)


def bench_exact_key_dedup(spark, work) -> list[dict]:
    from fantasy_premier_league_spark.streaming.dedup import dedup_stream

    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"), "event_type"
    )
    src = f"{work}/events_src"
    ev.coalesce(1).write.parquet(f"{src}/drop1.parquet")
    ev.coalesce(1).write.parquet(f"{src}/drop2.parquet")  # full replay: all dup keys
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*.parquet")
    )
    out = dedup_stream(stream, ["event_id"], ts="ts", watermark="10 minutes")
    q = (
        out.writeStream.format("noop")
        .option("checkpointLocation", f"{work}/events_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    return progress_rows(q)


def bench_near_dup_ingest(spark, docs, work) -> list[dict]:
    from fantasy_premier_league_spark.streaming.dedup import run_near_dup_ingest

    src = f"{work}/near_src"
    docs.coalesce(1).write.parquet(f"{src}/drop1.parquet")
    # drop 2: half the docs lightly perturbed (near-dups of drop 1), half new
    near = docs.filter(F.col("doc_id") % 2 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    fresh = docs.filter(F.col("doc_id") % 2 == 1).withColumn(
        "text", F.concat(F.lit("entirely reworded start "), F.reverse(F.col("text")))
    ).withColumn("doc_id", F.col("doc_id") + 2_000_000)
    near.unionByName(fresh).coalesce(1).write.parquet(f"{src}/drop2.parquet")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*.parquet")
    )
    phases: list[dict] = []
    q = run_near_dup_ingest(
        stream,
        index_path=f"{work}/near_index",
        out_path=f"{work}/near_out",
        checkpoint=f"{work}/near_ckpt",
        phase_log=phases,
    )
    q.awaitTermination(600)
    rows = progress_rows(q)
    return {"batches": rows, "phases": phases}


def bench_dsir_gate(spark, docs, work) -> list[dict]:
    from fantasy_premier_league_spark.operators.selection import dsir_bucket_model
    from fantasy_premier_league_spark.streaming.quality import run_dsir_gate

    # offline model: target slice = english docs, background = the rest
    model = dsir_bucket_model(
        docs.withColumn("is_target", F.col("lang") == "en"), "text", "is_target"
    )
    model = model.cache()
    model.count()
    src = f"{work}/dsir_src"
    docs.coalesce(1).write.parquet(f"{src}/drop1.parquet")
    docs.withColumn("doc_id", F.col("doc_id") + 1_000_000).coalesce(1).write.parquet(
        f"{src}/drop2.parquet"
    )
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*.parquet")
    )
    q = run_dsir_gate(
        stream,
        model,
        accept_path=f"{work}/dsir_accept",
        reject_path=f"{work}/dsir_reject",
        checkpoint=f"{work}/dsir_ckpt",
    )
    q.awaitTermination(600)
    return progress_rows(q)


def bench_kmv_monitor(spark, work) -> list[dict]:
    from fantasy_premier_league_spark.streaming.distinct import (
        run_kmv_distinct_monitor,
    )

    ev = spark.read.parquet(f"{SF}/events.parquet").select("event_type", "user_id")
    src = f"{work}/kmv_src"
    ev.coalesce(1).write.parquet(f"{src}/drop1.parquet")
    # drop 2: half re-deliveries (sketch must not move), half new users
    ev.withColumn(
        "user_id",
        F.when(F.col("user_id") % 2 == 0, F.col("user_id")).otherwise(
            F.col("user_id") + 10_000_000
        ),
    ).coalesce(1).write.parquet(f"{src}/drop2.parquet")
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*.parquet")
    )
    q = run_kmv_distinct_monitor(
        stream,
        keys=["event_type"],
        value_col="user_id",
        store_path=f"{work}/kmv_store",
        checkpoint=f"{work}/kmv_ckpt",
    )
    q.awaitTermination(600)
    return progress_rows(q)


def main() -> None:
    spark = get_spark("streaming-bench")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    work = tempfile.mkdtemp(prefix="stream_bench_")
    try:
        out = {
            "exact_dedup": bench_exact_key_dedup(spark, work),
            "content_dedup": bench_content_dedup(spark, docs, work),
            "near_dup_ingest": bench_near_dup_ingest(spark, docs, work),
            "dsir_gate": bench_dsir_gate(spark, docs, work),
            "kmv_monitor": bench_kmv_monitor(spark, work),
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
